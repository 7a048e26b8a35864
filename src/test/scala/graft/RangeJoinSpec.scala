package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** The bucketized interval join vs the naive theta join it replaces:
  * row-for-row equality on a generated fixture, boundary semantics
  * (start-inclusive / end-exclusive), overlap multiplicity, the
  * runaway-explosion guard, and the no-nested-loop plan pin. Fixtures
  * use epoch-seconds longs (cast through TIMESTAMP inside the
  * operator, the ingestion contract's micro precision). */
class RangeJoinSpec extends TestBase {
  import spark.implicits._

  // 400 events across 2 keys, ~50 intervals of mixed lengths (some
  // overlapping, some degenerate, some spanning many buckets)
  private def events =
    (0 until 400).map(i => (i.toLong, s"k${i % 2}", (i * 37 % 3600).toLong))
      .toDF("event_id", "k", "t")
  private def intervals =
    (0 until 50).map { i =>
      val s = (i * 211 % 3500).toLong
      (i.toLong, s"k${i % 2}", s, s + (i % 5) * 300L) // 0..1200s long
    }.toDF("iid", "k", "s", "e")

  private def naive =
    events.as("l").join(intervals.as("r"),
        col("l.k") === col("r.k") &&
          col("l.t") >= col("r.s") && col("l.t") < col("r.e"))
      .select(col("event_id"), col("iid"))
      .as[(Long, Long)].collect().toSet

  test("overlapJoin equals the naive theta join, across bucket widths") {
    for (w <- Seq(60L, 300L, 1800L)) {
      val got = RangeJoin.overlapJoin(events, intervals, Seq("k"),
          "t", "s", "e", bucketSeconds = w)
        .select(col("event_id"), col("iid"))
        .as[(Long, Long)].collect()
      // exactly once per matching pair — multi-bucket intervals must
      // not duplicate matches
      assert(got.length === got.toSet.size, s"duplicate pairs at w=$w")
      assert(got.toSet === naive, s"mismatch vs theta join at w=$w")
    }
  }

  test("start is inclusive, end is exclusive, degenerate intervals drop") {
    val l = Seq((1L, "a", 100L), (2L, "a", 199L), (3L, "a", 200L),
      (4L, "a", 99L)).toDF("event_id", "k", "t")
    val r = Seq((10L, "a", 100L, 200L), (11L, "a", 150L, 150L))
      .toDF("iid", "k", "s", "e")
    val got = RangeJoin.overlapJoin(l, r, Seq("k"), "t", "s", "e", 60L)
      .select("event_id", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L))) // t=200 (end) and t=99 out
  }

  test("overlapping intervals each match — one output row per interval") {
    val l = Seq((1L, "a", 500L)).toDF("event_id", "k", "t")
    val r = Seq((10L, "a", 0L, 1000L), (11L, "a", 400L, 600L),
      (12L, "a", 501L, 900L)).toDF("iid", "k", "s", "e")
    val got = RangeJoin.overlapJoin(l, r, Seq("k"), "t", "s", "e", 60L)
      .select("iid").as[Long].collect().toSet
    assert(got === Set(10L, 11L))
  }

  test("a mis-sized bucket fails loudly instead of exploding") {
    val l = Seq((1L, "a", 5L)).toDF("event_id", "k", "t")
    val r = Seq((10L, "a", 0L, 100000L)).toDF("iid", "k", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.overlapJoin(l, r, Seq("k"), "t", "s", "e",
        bucketSeconds = 1L, maxBucketsPerInterval = 64).collect()
    }
    assert(e.getMessage.contains("maxBucketsPerInterval"))
  }

  test("autoBucketSeconds sizes from the interval-length quantile; " +
      "auto-sized join equals the fixed-bucket join") {
    val w = RangeJoin.autoBucketSeconds(intervals, "s", "e")
    // interval lengths are (i % 5) * 300 in [0, 1200]; p75 of the
    // positive ones is 900 (lengths 300/600/900/1200 uniformly)
    assert(w >= 300L && w <= 1200L, s"auto width $w")
    val auto = RangeJoin.overlapJoin(events, intervals, Seq("k"),
        "t", "s", "e", bucketSeconds = w)
      .select(col("event_id"), col("iid"))
      .as[(Long, Long)].collect().toSet
    assert(auto === naive)
  }

  test("plan is an equi-join — no nested loop, no cartesian product") {
    val plan = RangeJoin.overlapJoin(events, intervals, Seq("k"),
        "t", "s", "e", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
