package graft.pipeline

import org.apache.spark.sql.functions._

import graft.TestBase
import graft.sim.WarehouseSim

/** Round-16 operator-internal changes, pinned:
  *
  *  - [[Dedup.unpushable]] must be a pure plan barrier: identical
  *    values/rows, and a filter on the wrapped derived column must NOT
  *    be pushed below a spread exchange (the pushed copy re-inlines the
  *    whole deriving expression into the scan-side predicate — the
  *    duplicated-expensive-expression trap this round measured at
  *    2.1 s single-task CPU inside the LshIndex admit line).
  *  - [[Similarity.pqTrainOnSub]]'s fused Lloyd's step (nearest-cid as
  *    a nested-literal expression + one groupBy) must train the same
  *    codebook the broadcast-join assignment shape reads back
  *    ([[Similarity.pqAssignFrame]] is that shape — the encode path
  *    above the literal threshold still uses it).
  */
class SpreadInternalsSpec extends TestBase {

  private lazy val docs =
    WarehouseSim.read(spark, "/root/testdata/sf0.001", "documents")
  private lazy val emb =
    WarehouseSim.read(spark, "/root/testdata/sf0.001", "embeddings")

  test("unpushable: values unchanged, filter stays above the spread exchange") {
    val plain = Dedup.shingled(docs)
      .filter(size(col("shingles")) >= 1)
    val walled = Dedup.shingled(docs)
      .select(col("doc_id"), Dedup.unpushable(col("shingles")).as("shingles"))
      .filter(size(col("shingles")) >= 1)
    assert(plain.exceptAll(walled).isEmpty && walled.exceptAll(plain).isEmpty)
    // the barrier plan must not evaluate the tokenizer below the
    // exchange: no Filter inside the repartition subtree may mention
    // the tokenizer's split
    def scanSideFilterHasSplit(df: org.apache.spark.sql.DataFrame): Boolean = {
      import org.apache.spark.sql.catalyst.plans.logical.{
        Filter, RepartitionByExpression}
      var found = false
      df.queryExecution.optimizedPlan.foreach {
        case r: RepartitionByExpression => r.foreach {
          case f: Filter =>
            if (f.condition.toString.contains("split")) found = true
          case _ => ()
        }
        case _ => ()
      }
      found
    }
    assert(scanSideFilterHasSplit(plain),
      "precondition: the unwalled filter IS pushed below the exchange " +
        "(if this stops holding, the barrier may be obsolete — re-measure)")
    assert(!scanSideFilterHasSplit(walled),
      "unpushable failed to keep the shingle filter above the exchange")
  }

  test("fused PQ Lloyd's step trains the codebook the join-shape assignment agrees with") {
    val m = 8
    val all = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .limit(64)
    val dim = all.select(size(col("v"))).head().getInt(0)
    val sub = Similarity.pqSubFrame(all, m, dim / m)
    val cents = Similarity.pqTrainOnSub(all, sub, ks = 4, iters = 2, m = m)
    // every subspace trained, cids within [0, ks)
    assert(cents.map(_._1).distinct.sorted == (0 until m))
    assert(cents.forall(c => c._2 >= 0 && c._2 < 4))
    assert(cents.forall(_._3.length == dim / m))
    // the codebook must be consumable by the broadcast-join assignment
    // (the encode shape): every (vec_id, s) gets exactly one cid that
    // is the true argmin under the same (distance, cid) rule
    val assigned = Similarity.pqAssignFrame(sub, cents)
    assert(assigned.count() == sub.count())
    val byBrute = sub.collect().map { r =>
      val s = r.getInt(1)
      val v = r.getSeq[Double](2)
      val best = cents.filter(_._1 == s).map { case (_, cid, cv) =>
        (v.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
      }.min
      ((r.getLong(0), s), best._2)
    }.toMap
    assigned.collect().foreach { r =>
      assert(byBrute((r.getLong(0), r.getInt(1))) == r.getInt(2),
        s"assignment mismatch at (${r.getLong(0)}, ${r.getInt(1)})")
    }
  }
}
