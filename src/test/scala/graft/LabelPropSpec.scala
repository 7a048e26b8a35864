package graft

import graft.pipeline.Dedup

/**
 * Clamped synchronous label propagation ([[Dedup.labelPropagation]]):
 * hand-checkable spread, mode tie-breaks, seed clamping, hop-radius
 * bounding, and the isolated-seed / unreached-node edges.
 */
class LabelPropSpec extends TestBase {

  import spark.implicits._

  private def lp(pairs: Seq[(Long, Long)], seeds: Seq[(Long, String)],
      iters: Int): Map[Long, Option[String]] =
    Dedup.labelPropagation(pairs.toDF("doc_a", "doc_b"),
        seeds.toDF("doc_id", "label"), iters)
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap

  test("labels spread along a path exactly one hop per round") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val seeds = Seq((1L, "good"))
    assert(lp(path, seeds, 1) == Map(1L -> Some("good"),
      2L -> Some("good"), 3L -> None, 4L -> None))
    assert(lp(path, seeds, 3) == Map(1L -> Some("good"),
      2L -> Some("good"), 3L -> Some("good"), 4L -> Some("good")))
  }

  test("mode wins; count ties break to the lexicographically " +
      "smaller label") {
    // node 10 hears bad from 2 neighbors, good from 1 -> bad
    val g1 = Seq((1L, 10L), (2L, 10L), (3L, 10L))
    val s1 = Seq((1L, "bad"), (2L, "bad"), (3L, "good"))
    assert(lp(g1, s1, 1)(10L) == Some("bad"))
    // 1-1 tie: 'aaa' < 'zzz'
    val g2 = Seq((1L, 10L), (2L, 10L))
    val s2 = Seq((1L, "zzz"), (2L, "aaa"))
    assert(lp(g2, s2, 1)(10L) == Some("aaa"))
  }

  test("seeds are clamped: a seed surrounded by the other label " +
      "keeps its own and keeps broadcasting it") {
    val g = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 20L))
    val s = Seq((1L, "bad"), (2L, "bad"), (3L, "bad"), (9L, "good"))
    val got = lp(g, s, 2)
    assert(got(9L) == Some("good"), "the seed must not flip")
    assert(got(20L) == Some("good"), "and must broadcast its own label")
  }

  test("isolated seeds appear in the output; non-seed graph nodes " +
      "unreached stay NULL") {
    val got = lp(Seq((5L, 6L)), Seq((99L, "tag")), 2)
    assert(got == Map(99L -> Some("tag"), 5L -> None, 6L -> None))
  }

  test("an unlabeled dense cluster converges to its single seed's " +
      "label within the cluster diameter") {
    // triangle 1-2-3 plus pendant 4; seed only at 4
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = lp(g, Seq((4L, "keep")), 3)
    assert(Seq(1L, 2L, 3L).forall(got(_) == Some("keep")), got.toString)
  }
}
