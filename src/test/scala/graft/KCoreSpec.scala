package graft

import graft.pipeline.Dedup

/**
 * k-core peeling ([[Dedup.kCore]]): hand-checkable cores, cascade
 * peeling (removals trigger removals), cycles as 2-cores, input
 * normalization, and the loud non-convergence refusal.
 */
class KCoreSpec extends TestBase {

  import spark.implicits._

  private def core(pairs: Seq[(Long, Long)], k: Int,
      maxIter: Int = 50): Map[Long, Long] =
    Dedup.kCore(pairs.toDF("doc_a", "doc_b"), k, maxIter = maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain peels to nothing at k=2; a cycle survives whole") {
    assert(core(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 2) == Map.empty)
    // square + tail: the cycle is a 2-core, the tail cascades away
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L),
      (5L, 6L))
    assert(core(g, 2) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    val (_, rounds) = Dedup.kCoreWithRounds(g.toDF("doc_a", "doc_b"), 2)
    assert(rounds >= 2, "the two-link tail needs cascading rounds")
  }

  test("triangle + pendant at k=2 keeps exactly the triangle") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(core(g, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k=3: a diamond (4-clique minus one edge) dies, a 4-clique " +
      "survives with core degree 3") {
    val diamond = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    assert(core(diamond, 3) == Map.empty)
    val clique = diamond :+ ((2L, 4L))
    assert(core(clique, 3) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("duplicate / reversed / self-loop inputs normalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(core(messy, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("an exhausted round budget refuses loudly instead of " +
      "returning a half-peeled subgraph") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L),
      (5L, 6L))
    val ex = intercept[IllegalStateException] { core(g, 2, maxIter = 1) }
    assert(ex.getMessage.contains("did not converge"))
  }
}
