package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming coverage beyond the incremental server: event-time
  * watermark + tumbling-window aggregation over the events stream, checked
  * against the equivalent batch aggregation. */
class StreamingWindowSpec extends TestBase {

  test("windowed aggregation with watermark over a file stream") {
    import spark.implicits._
    // file stream sources need a directory: stage the events file into one
    val stage = tmpDir("stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      stage.resolve("events.parquet"))
    val path = stage.toUri.toString
    // derive the stream schema from the file itself — the physical timestamp
    // shape has changed across test-data generations, and WarehouseSim's
    // normalization handles whichever shape arrives
    val schema = spark.read.parquet(path).schema

    val stream = graft.sim.WarehouseSim.normalizeTimestamps(
        spark.readStream.schema(schema).parquet(path))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val qName = s"win_${System.nanoTime()}"
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName(qName).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table(qName)
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    val batch = graft.sim.WarehouseSim.read(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("native session_window aggregation streams to the batch result") {
    import spark.implicits._
    val stage = tmpDir("stream-sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      stage.resolve("events.parquet"))
    val path = stage.toUri.toString
    val schema = spark.read.parquet(path).schema

    // the same merging event-time session w4_session_window certifies in
    // batch, run through Structured Streaming's stateful session operator
    val stream = graft.sim.WarehouseSim.normalizeTimestamps(
        spark.readStream.schema(schema).parquet(path))
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("sw"))
      .agg(count(lit(1)).as("n"))

    val qName = s"sess_${System.nanoTime()}"
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName(qName).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table(qName)
      .select(col("user_id"), unix_micros(col("sw.start")).as("s"),
        unix_micros(col("sw.end")).as("e"), col("n"))
      .as[(Long, Long, Long, Long)].collect().toSet

    val batch = graft.sim.WarehouseSim
      .read(spark, "/root/testdata/sf0.001", "events")
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("s"),
        unix_micros(col("sw.end")).as("e"), col("n"))
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("append-mode session_window emits only watermark-closed sessions") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("uid", "us")
      .withColumn("ts", timestamp_micros(col("us")))

    val agg = events.withWatermark("ts", "0 seconds")
      .groupBy(col("uid"), session_window(col("ts"), "1 hour").as("sw"))
      .agg(count(lit(1)).as("n"))
    val qName = s"sessapp_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(qName).start()
    def emitted() = spark.table(qName)
      .select(col("uid"), unix_micros(col("sw.start")).as("s"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
    try {
      // one session for uid 1, then an event far ahead that pushes the
      // watermark past that session's end -> the session must CLOSE and
      // emit; the new event's own session stays open (not emitted)
      input.addData((1L, 0L), (1L, 1000000L))
      q.processAllAvailable()
      assert(emitted().isEmpty, "open session must not emit in append mode")
      input.addData((2L, 100L * 3600000000L))
      q.processAllAvailable()
      // watermark only advances at batch END; one more batch finalizes
      input.addData((2L, 100L * 3600000000L + 1L))
      q.processAllAvailable()
      assert(emitted() === Set((1L, 0L, 2L)),
        s"closed session expected, got ${emitted()}")
    } finally q.stop()
  }

  test("streaming trending top-k: chained stateful aggregations " +
      "(windowed counts -> TopKAgg) emit finalized windows") {
    // Spark 4's multiple-stateful-operator support composed with the
    // custom bounded-heap aggregate: tumbling-window per-type counts
    // feed a per-window top-k, all in append mode — the continuously-
    // maintained "trending terms" report. Each chained stage finalizes
    // one watermark advance later, so closures ripple over batches.
    import spark.implicits._
    import graft.functions.TopKAgg
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val ev = input.toDF().toDF("us", "etype")
      .withColumn("ts", timestamp_micros(col("us")))
    val trending = ev.withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("etype")).count()
      .groupBy(col("w"))
      .agg(TopKAgg.topk(spark, struct(col("count"), col("etype")), 2)
        .as("top"))
    val qName = s"trend_${System.nanoTime()}"
    val q = trending.writeStream.outputMode("append")
      .format("memory").queryName(qName).start()
    try {
      input.addData((0L, "a"), (1L, "a"), (2L, "b"), (3L, "c"), (4L, "c"),
        (5L, "c"))
      q.processAllAvailable()
      // two watermark advances ripple the first window through BOTH
      // stateful operators
      input.addData((100L * 3600000000L, "z"))
      q.processAllAvailable()
      input.addData((200L * 3600000000L, "y"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(qName)
      .select(unix_micros(col("w.start")).as("s"), col("top"))
      .as[(Long, Seq[(Long, String)])].collect().toMap
    assert(got(0L) === Seq((3L, "c"), (2L, "a")),
      s"trending for window 0: ${got.get(0L)}")
    assert(got.contains(100L * 3600000000L))
  }

  test("stateful sessionization carries open sessions across micro-batches") {
    import graft.streaming._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val qName = s"sess_${System.nanoTime()}"
    val q = StatefulSessionize(input.toDS(), gapUs = 1000000L) // 1s gap
      .writeStream.outputMode("append").format("memory").queryName(qName).start()
    try {
      // batch 1: one open session for user 1 — nothing closes
      input.addData(SessionEvent(1, 0L), SessionEvent(1, 500000L))
      q.processAllAvailable()
      assert(spark.table(qName).isEmpty)

      // batch 2: event past the gap closes the first session; the state
      // (start/last/count) survived the batch boundary
      input.addData(SessionEvent(1, 5000000L))
      q.processAllAvailable()
      assert(spark.table(qName).as[ClosedSession].collect().toSeq ==
        Seq(ClosedSession(1, 0L, 500000L, 2)))

      // batch 3: a second user opens+closes within one batch
      input.addData(SessionEvent(2, 0L), SessionEvent(2, 3000000L))
      q.processAllAvailable()
      assert(spark.table(qName).as[ClosedSession].collect().toSet ==
        Set(ClosedSession(1, 0L, 500000L, 2), ClosedSession(2, 0L, 0L, 1)))

      // late event (cross-batch disorder) folds into the open session
      // without rewinding its frontier: the next on-time event must NOT
      // split the session
      input.addData(SessionEvent(1, 4800000L)) // late: < last_us 5000000
      input.addData(SessionEvent(1, 5400000L)) // within gap of 5000000
      q.processAllAvailable()
      assert(spark.table(qName).count() == 2, "late event split a session")
    } finally q.stop()
  }

  test("idle-flush timeout emits the final session and frees its state") {
    import graft.streaming._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val qName = s"flush_${System.nanoTime()}"
    // ProcessingTimeTimeout keeps the engine running no-data batches, so
    // drive by trigger + poll with a deadline (processAllAvailable never
    // settles by design here)
    val q = StatefulSessionize(input.toDS(), gapUs = 1000000L,
        idleFlushMs = Some(300L))
      .writeStream.outputMode("append").format("memory").queryName(qName)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData(SessionEvent(7, 0L), SessionEvent(7, 100000L))
      val deadline = System.currentTimeMillis() + 30000
      var rows = Seq.empty[ClosedSession]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        rows = spark.table(qName).as[ClosedSession].collect().toSeq
      }
      // the user went quiet: their open session flushed via the timeout
      assert(rows == Seq(ClosedSession(7, 0L, 100000L, 2)), s"got $rows")
    } finally q.stop()
  }
}
