package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.streaming.StreamingRangeJoin

/** foreachBatch interval enrichment: stream = batch parity against the
  * same window snapshot, window updates visible to later batches only,
  * overlap multiplicity preserved through the stream path. */
class StreamingRangeJoinSpec extends TestBase {
  import spark.implicits._

  private def windows(rows: (String, Long, Long, Long)*) =
    rows.toDF("k", "iid", "s", "e")

  test("enriched stream matches the batch overlap join on the same snapshot") {
    val stateDir = tmpDir("rj-state").resolve("win").toString
    StreamingRangeJoin.appendWindows(
      windows(("a", 10L, 100L, 200L), ("a", 11L, 150L, 250L),
        ("b", 12L, 0L, 50L)), stateDir)

    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val events = input.toDF().toDF("k", "t", "eid")

    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = StreamingRangeJoin.run(events, stateDir, Seq("k"),
      "t", "s", "e", bucketSeconds = 60L,
      b => out.synchronized {
        out ++= b.select("eid", "iid").as[(Long, Long)].collect()
      })
    try {
      input.addData(("a", 160L, 1L), ("a", 220L, 2L), ("b", 60L, 3L),
        ("c", 160L, 4L))
      q.processAllAvailable()
    } finally q.stop()

    val batch = RangeJoin.overlapJoin(
      Seq(("a", 160L, 1L), ("a", 220L, 2L), ("b", 60L, 3L), ("c", 160L, 4L))
        .toDF("k", "t", "eid"),
      spark.read.parquet(stateDir), Seq("k"), "t", "s", "e", 60L)
      .select("eid", "iid").as[(Long, Long)].collect().toSet
    assert(out.toSet === batch)
    // event 1 sits in BOTH overlapping a-windows; 2 only in the second;
    // 3 outside b's window (end-exclusive boundary is 50); 4 has no key
    assert(out.toSet === Set((1L, 10L), (1L, 11L), (2L, 11L)))
  }

  test("windows appended later enrich later batches only") {
    val stateDir = tmpDir("rj-state2").resolve("win").toString
    StreamingRangeJoin.appendWindows(windows(("a", 1L, 0L, 100L)), stateDir)

    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val events = input.toDF().toDF("k", "t", "eid")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = StreamingRangeJoin.run(events, stateDir, Seq("k"),
      "t", "s", "e", 60L,
      b => out.synchronized {
        out ++= b.select("eid", "iid").as[(Long, Long)].collect()
      })
    try {
      input.addData(("a", 50L, 1L))
      q.processAllAvailable()
      StreamingRangeJoin.appendWindows(windows(("a", 2L, 40L, 60L)), stateDir)
      input.addData(("a", 50L, 2L))
      q.processAllAvailable()
    } finally q.stop()
    // eid 1 saw only window 1; eid 2 sees both
    assert(out.toSet === Set((1L, 1L), (2L, 1L), (2L, 2L)))
  }
}
