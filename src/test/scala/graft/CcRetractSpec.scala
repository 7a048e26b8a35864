package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Cluster-state retraction ([[Dedup.connectedComponentsRetract]]):
 * removing documents from the standing pair frame yields the SAME
 * state as a full recompute over the surviving pairs — including the
 * case the label state alone cannot express, a retraction that
 * genuinely SPLITS one cluster into several.
 */
class CcRetractSpec extends TestBase {

  import spark.implicits._

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def full(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    labelsOf(Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b")))

  private def retract(pairs: Seq[(Long, Long)],
      victims: Seq[Long]): Map[Long, Long] =
    labelsOf(Dedup.connectedComponentsRetract(
      Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b")),
      pairs.toDF("doc_a", "doc_b"),
      victims.toDF("doc_id")))

  private def fullAfter(pairs: Seq[(Long, Long)],
      victims: Seq[Long]): Map[Long, Long] = {
    val v = victims.toSet
    full(pairs.filter(e => !v.contains(e._1) && !v.contains(e._2)))
  }

  test("a retraction that SPLITS a cluster: removing the bridge of a " +
      "path yields two clusters, bit-identical to a full recompute") {
    // path 1-2-3-4-5: removing 3 splits into {1,2} and {4,5}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = retract(pairs, Seq(3L))
    assert(got == fullAfter(pairs, Seq(3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L),
      s"got $got")
  }

  test("mixed shapes: victims that isolate singletons (paired docs " +
      "leave the state), untouched clusters pass through verbatim, " +
      "victims outside the state are no-ops, and the new min can be " +
      "a non-label member") {
    // clusters: {1,2,3} (1 is the label AND a victim — the survivors'
    // min becomes 2), {10,11} (victim 11 isolates 10 → leaves the
    // state), {20,21,22} untouched
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L))
    val victims = Seq(1L, 11L, 999L) // 999 was never paired
    val got = retract(pairs, victims)
    assert(got == fullAfter(pairs, victims))
    assert(got == Map(2L -> 2L, 3L -> 2L,
      20L -> 20L, 21L -> 20L, 22L -> 20L), s"got $got")
  }

  test("randomized: retract == full-recompute-over-survivors across " +
      "many victim sets") {
    val edges = (0 until 240).map { i =>
      val a = ((i * 37) % 120).toLong
      val b = ((i * 59 + 13) % 120).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    for (mod <- Seq(7, 11, 17)) {
      val victims = (0L until 120L).filter(_ % mod == 2)
      assert(retract(edges, victims) == fullAfter(edges, victims),
        s"victims mod=$mod diverged")
    }
  }

  test("retract then re-admit composes with the incremental fold: " +
      "state stays bit-identical to the from-scratch recompute") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val victims = Seq(3L)
    val readmit = Seq((2L, 4L), (11L, 12L))
    val afterRetract = Dedup.connectedComponentsRetract(
      Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b")),
      pairs.toDF("doc_a", "doc_b"), victims.toDF("doc_id"))
    val got = labelsOf(Dedup.connectedComponentsIncremental(
      afterRetract, readmit.toDF("doc_a", "doc_b")))
    val v = victims.toSet
    val want = full(pairs.filter(e =>
      !v.contains(e._1) && !v.contains(e._2)) ++ readmit)
    assert(got == want, s"got $got want $want")
  }
}
