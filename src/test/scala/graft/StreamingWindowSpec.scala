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
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    val stream = spark.readStream.schema(schema).parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
}
