package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.streaming.StreamingAsOf

/** foreachBatch as-of enrichment: stream = batch parity, snapshot
  * semantics across dimension updates, and replay idempotence. */
class StreamingAsOfSpec extends TestBase {
  import spark.implicits._

  private def dimRows(rows: (String, Long, Long, String)*) =
    rows.toDF("k", "rts", "rid", "rv")

  test("enriched stream matches the batch as-of join on the same snapshot") {
    val stateDir = tmpDir("asof-state").resolve("dim").toString
    StreamingAsOf.appendDim(
      dimRows(("a", 4L, 1L, "v4"), ("a", 9L, 2L, "v9"), ("b", 7L, 3L, "v7")),
      stateDir)

    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val events = input.toDF().toDF("k", "lts", "lid")

    val out = scala.collection.mutable.ArrayBuffer[(String, Long, Option[String])]()
    val q = StreamingAsOf.run(events, stateDir, Seq("k"), "lts", "rts", "rid",
      b => out.synchronized {
        out ++= b.select("k", "lid", "rv")
          .as[(String, Long, Option[String])].collect()
      })
    try {
      input.addData(("a", 10L, 100L), ("a", 5L, 101L), ("b", 3L, 102L))
      q.processAllAvailable()
    } finally q.stop()

    val batch = AsOfJoin.asOf(
      Seq(("a", 10L, 100L), ("a", 5L, 101L), ("b", 3L, 102L))
        .toDF("k", "lts", "lid"),
      AsOfJoin.latestPerKeyTs(spark.read.parquet(stateDir), Seq("k"), "rts", "rid"),
      Seq("k"), "lts", "rts")
      .select("k", "lid", "rv").as[(String, Long, Option[String])]
      .collect().toSet
    assert(out.toSet === batch)
    assert(out.toSet === Set(("a", 100L, Some("v9")), ("a", 101L, Some("v4")),
      ("b", 102L, None)))
  }

  test("later dimension updates are visible to later batches only") {
    val stateDir = tmpDir("asof-state2").resolve("dim").toString
    StreamingAsOf.appendDim(dimRows(("a", 4L, 1L, "old")), stateDir)

    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val events = input.toDF().toDF("k", "lts", "lid")
    val out = scala.collection.mutable.ArrayBuffer[(Long, Option[String])]()
    val q = StreamingAsOf.run(events, stateDir, Seq("k"), "lts", "rts", "rid",
      b => out.synchronized {
        out ++= b.select("lid", "rv").as[(Long, Option[String])].collect()
      })
    try {
      input.addData(("a", 10L, 1L))
      q.processAllAvailable()
      // dimension moves AFTER batch 1 processed; same event time later
      StreamingAsOf.appendDim(dimRows(("a", 8L, 2L, "new")), stateDir)
      input.addData(("a", 10L, 2L))
      q.processAllAvailable()
    } finally q.stop()
    assert(out.toList === List((1L, Some("old")), (2L, Some("new"))))
  }

  test("replayed dimension appends do not change enrichment (idempotent reduce)") {
    val stateDir = tmpDir("asof-state3").resolve("dim").toString
    val dup = dimRows(("a", 4L, 9L, "late"), ("a", 4L, 2L, "early"))
    StreamingAsOf.appendDim(dup, stateDir)
    StreamingAsOf.appendDim(dup, stateDir) // crash-replay double append
    val enriched = StreamingAsOf.enrichBatch(spark,
      Seq(("a", 5L, 1L)).toDF("k", "lts", "lid"), stateDir,
      Seq("k"), "lts", "rts", "rid")
      .select("lid", "rv").as[(Long, String)].collect().toList
    assert(enriched === List((1L, "late")))
  }
}
