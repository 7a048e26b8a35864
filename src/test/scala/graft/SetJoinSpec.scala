package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Exact prefix-filter set-similarity join ([[Dedup.setSimilarityJoin]]):
 * hand-checkable matches, the no-false-negative contract against brute
 * force on a pseudo-random corpus, and threshold edge behavior.
 */
class SetJoinSpec extends TestBase {

  import spark.implicits._

  private def join(docs: Seq[(Long, String)],
      tauMilli: Int): Map[(Long, Long), Double] =
    Dedup.setSimilarityJoin(docs.toDF("doc_id", "text"), tauMilli)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("near-identical documents match; disjoint ones do not") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over dogs",
      2L -> "the quick brown fox jumps over cats", // J = 6/8 = 0.75
      3L -> "entirely different words appear here now")
    val got = join(docs, 700)
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == 0.75)
  }

  test("exact threshold boundary: J exactly tau is kept, just below " +
      "is dropped") {
    // |a|=|b|=4, sharing 3 -> J = 3/5 = 0.6
    val docs = Seq(1L -> "aa bb cc dd", 2L -> "aa bb cc ee")
    assert(join(docs, 600).keySet == Set((1L, 2L)), "J = 0.6 at tau 0.6")
    assert(join(docs, 601).isEmpty, "and dropped one milli above")
  }

  test("no false negatives: equals brute force over a pseudo-random " +
      "corpus") {
    // 40 docs over a 30-word vocabulary, 6-10 words each, deterministic
    val vocab = (0 until 30).map(i => s"w$i")
    val docs = (1L to 40L).map { d =>
      val n = 6 + (d % 5).toInt
      val words = (0 until n)
        .map(j => vocab(((d * 7 + j * 11) % 30).toInt)).distinct
      d -> words.mkString(" ")
    }
    val got = join(docs, 500)
    // brute force on the driver
    val sets = docs.map { case (d, t) => d -> t.split(" ").toSet }.toMap
    val brute = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      inter = (sets(a) intersect sets(b)).size
      uni = (sets(a) union sets(b)).size
      if inter * 1000 >= 500 * uni
    } yield (a, b) -> math.rint(inter.toDouble / uni * 1e6) / 1e6).toMap
    assert(got.keySet == brute.keySet,
      s"missing=${brute.keySet -- got.keySet} extra=${got.keySet -- brute.keySet}")
    assert(brute.nonEmpty, "fixture must actually produce matches")
    got.foreach { case (k, j) =>
      assert(math.abs(j - brute(k)) < 1e-9, s"jaccard mismatch at $k")
    }
  }

  test("incremental join = exactly the full join's pairs touching " +
      "the increment (no false negatives, no old-old pairs)") {
    val vocab = (0 until 30).map(i => s"w$i")
    val docs = (1L to 40L).map { d =>
      val n = 6 + (d % 5).toInt
      d -> (0 until n)
        .map(j => vocab(((d * 7 + j * 11) % 30).toInt)).distinct
        .mkString(" ")
    }
    val isNew = (id: Long) => id % 10 < 2
    val full = join(docs, 500)
    val want = full.filter { case ((a, b), _) => isNew(a) || isNew(b) }
    val got = Dedup.setSimilarityJoinIncremental(
        docs.toDF("doc_id", "text"), id => id % 10 < 2, 500)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == want,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    assert(want.nonEmpty, "fixture must produce increment pairs")
    assert(got.size < full.size, "old-old pairs must be absent")
  }

  test("no cartesian product in the plan") {
    val docs = Seq(1L -> "a b c", 2L -> "a b d").toDF("doc_id", "text")
    val plan = Dedup.setSimilarityJoin(docs, 700)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
