package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Packing
import graft.sim.WarehouseSim

/** Sequence-packing invariants: the greedy packer is checked against a
  * sequential reference implementation and its structural guarantees; the
  * contiguous packer against its closed-form bin arithmetic. */
class PackingSpec extends TestBase {

  private val sfDir = "/root/testdata/sf0.01"
  private val budget = 512L

  private def tokenized = WarehouseSim.read(spark, sfDir, "documents")
    .select(col("source"), col("doc_id"),
      size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))
        .cast("long").as("n_tok"))

  /** Sequential reference: first-fit-in-order greedy per group. */
  private def referenceGreedy(rows: Seq[(String, Long, Long)])
      : Map[(String, Long), (Long, Long)] =
    rows.groupBy(_._1).flatMap { case (grp, rs) =>
      var bin = 0L; var fill = 0L
      rs.sortBy(_._2).map { case (_, id, tok) =>
        if (fill > 0 && fill + tok > budget) { bin += 1; fill = 0L }
        fill += tok
        (grp, id) -> (bin, fill)
      }
    }

  test("greedy packing matches the sequential reference exactly") {
    val in = tokenized.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = referenceGreedy(in)
    val got = Packing.packGreedy(tokenized, "source", "doc_id", "n_tok", budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.size == in.size, "every document packed exactly once")
    assert(got == expected)
  }

  test("greedy invariants: no overflow, tight bins, consecutive ids") {
    val packed = Packing.packGreedy(tokenized, "source", "doc_id", "n_tok", budget)
    val rows = packed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byBin = rows.groupBy(t => (t._1, t._4))
    byBin.foreach { case ((grp, bin), ds) =>
      val total = ds.map(_._3).sum
      // a bin over budget may only be a single over-budget document
      assert(total <= budget || ds.size == 1,
        s"$grp bin $bin overflows with ${ds.size} docs, $total tokens")
    }
    // greedy-tight: the first doc of bin k+1 would overflow bin k
    rows.groupBy(_._1).foreach { case (grp, rs) =>
      val sorted = rs.sortBy(_._2)
      val binIds = sorted.map(_._4).distinct.toSeq
      assert(binIds == (0L until binIds.size.toLong).toSeq,
        s"$grp bins not consecutive")
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        if (b._4 == a._4 + 1) {
          val prevFill = sorted.filter(t => t._4 == a._4).map(_._3).sum
          assert(prevFill + b._3 > budget,
            s"$grp: doc ${b._2} started bin ${b._4} but fit in ${a._4}")
        }
      }
    }
  }

  test("contiguous packing: offsets stay in [0, budget) and bins are contiguous") {
    val packed = Packing.packContiguous(
      tokenized, "source", "doc_id", "n_tok", budget)
    val rows = packed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.foreach { case (grp, id, _, bin, off) =>
      assert(off >= 0 && off < budget, s"$grp/$id offset $off")
      assert(bin >= 0)
    }
    // bin_id reproduces floor(prefix/budget) of the id-ordered prefix sum
    rows.groupBy(_._1).foreach { case (grp, rs) =>
      var cum = 0L
      rs.sortBy(_._2).foreach { case (_, id, tok, bin, off) =>
        assert(bin == cum / budget, s"$grp/$id")
        assert(off == cum - (cum / budget) * budget, s"$grp/$id")
        cum += tok
      }
    }
  }

  test("bin stats roll up the packed frame") {
    val packed = Packing.packGreedy(tokenized, "source", "doc_id", "n_tok", budget)
    val stats = Packing.binStats(packed, budget).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val manual = packed.collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(2)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, vs) => k -> (vs.size.toLong, vs.map(_._3).sum) }
    assert(stats == manual)
  }

  test("curriculumOrder: tier-major within every shard, a permutation, salt reshuffles within tier") {
    import graft.pipeline.CorpusWriter
    val docs = WarehouseSim.read(spark, sfDir, "documents")
    val out = CorpusWriter.curriculumOrder(docs, shards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc exactly once; positions are 0..n_s-1 per shard
    assert(out.length == docs.count())
    out.groupBy(_._3).foreach { case (shard, rows) =>
      assert(rows.map(_._4).sorted.sameElements(0L until rows.length),
        s"shard $shard positions must be dense from 0")
      // tier never decreases along the shard's position order
      val tiers = rows.sortBy(_._4).map(_._2)
      assert(tiers.sameElements(tiers.sorted),
        s"shard $shard must consume tiers in order")
    }
    // a new salt keeps (doc -> tier) fixed but changes within-tier order
    val next = CorpusWriter.curriculumOrder(docs, shards = 4, salt = "epoch1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(t => t._1 -> t._2).toMap == next.map(t => t._1 -> t._2).toMap,
      "tiers are salt-independent")
    assert(out.map(t => t._1 -> (t._3, t._4)).toMap !=
      next.map(t => t._1 -> (t._3, t._4)).toMap,
      "a new salt must mint a different permutation")
  }
}
