package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Incremental connected components
 * ([[Dedup.connectedComponentsIncremental]]): the folded state equals
 * a full recompute bit for bit (the condensation argument), across
 * old-old merge edges, new-node chains, batch-internal components, and
 * untouched clusters.
 */
class CcIncrementalSpec extends TestBase {

  import spark.implicits._

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def full(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    labelsOf(Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b")))

  private def inc(oldPairs: Seq[(Long, Long)],
      newPairs: Seq[(Long, Long)]): Map[Long, Long] =
    labelsOf(Dedup.connectedComponentsIncremental(
      Dedup.connectedComponents(oldPairs.toDF("doc_a", "doc_b")),
      newPairs.toDF("doc_a", "doc_b")))

  test("hand-built shapes: old-old merge, new chain onto a cluster, " +
      "batch-internal component, untouched cluster") {
    // old graph: {1,2,3} (label 1), {10,11} (label 10), {20,21} (label 20)
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    // batch: an old-old edge merging clusters 1 and 10; a chain of new
    // nodes 30-31 hanging off 11; a purely-new component {40,41};
    // cluster 20 untouched
    val batch = Seq((3L, 10L), (11L, 30L), (30L, 31L), (40L, 41L))
    val got = inc(old, batch)
    assert(got == full(old ++ batch))
    assert(got(31L) == 1L, "new chain reaches the merged min through 11")
    assert(got(40L) == 40L && got(41L) == 40L)
    assert(got(20L) == 20L && got(21L) == 20L, "untouched cluster intact")
  }

  test("randomized: incremental == full over many edge splits") {
    // pseudo-random graph over 120 nodes; split edges by a rolling rule
    val edges = (0 until 240).map { i =>
      val a = ((i * 37) % 120).toLong
      val b = ((i * 59 + 13) % 120).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    for (mod <- Seq(3, 5)) {
      val (nw, old) = edges.zipWithIndex.partition(_._2 % mod == 0)
      val got = inc(old.map(_._1), nw.map(_._1))
      assert(got == full(edges), s"split mod=$mod diverged")
    }
  }

  test("a batch that only re-asserts existing pairs is a no-op; a " +
      "batch whose edges all collapse inside one cluster changes " +
      "nothing") {
    val old = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val st = full(old)
    assert(inc(old, Seq((1L, 4L), (2L, 4L))) == st)
  }
}
