package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.Recency
import graft.streaming.StreamingRecency

/** The streamed decay state must be BIT-IDENTICAL to the one-shot
  * [[Recency.decayedState]] of everything seen — any batch boundaries,
  * including a late out-of-order batch older than the standing
  * horizon. */
class StreamingRecencySpec extends TestBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("streamed state equals the one-shot state across uneven and " +
      "late batches") {
    val stateDir = tmpDir("recency-stream").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val half = 1000L
    val q = StreamingRecency.run(
      input.toDF().toDF("k", "us")
        .withColumn("ts", expr("timestamp_micros(us)")),
      stateDir, "ts", Seq("k"), half)
    val batches = Seq(
      Seq(("a", 0L), ("a", 1500L)),
      Seq(("b", 3999L), ("a", 3200L)),
      // LATE batch: every row older than the standing horizon —
      // decays on entry exactly as the one-shot would have decayed it
      Seq(("b", 100L), ("c", 900L)))
    try {
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = StreamingRecency.currentState(spark, stateDir).get
    val oneShot = Recency.decayedState(
      batches.flatten.toDF("k", "us")
        .withColumn("ts", expr("timestamp_micros(us)")),
      "ts", Seq("k"), half)
    assert(rows(streamed) == rows(oneShot),
      "streamed decay state must be bit-identical to the one-shot")
  }
}
