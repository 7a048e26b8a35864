package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.pipeline.CardSketch
import graft.streaming.StreamingCardinality

/** Streamed sketch state must be BIT-IDENTICAL to the one-shot sketch
  * of everything seen (both sketches merge exactly), and committed-
  * batch replay must not move it. */
class StreamingCardinalitySpec extends TestBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("streamed HLL state equals the one-shot state; estimate " +
      "matches") {
    val stateDir = tmpDir("hll-stream").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    val q = StreamingCardinality.hllRun(
      input.toDF().toDF("id"), stateDir, "id")
    try {
      Seq(1L to 3000L, 2000L to 6000L, 5500L to 9000L).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = StreamingCardinality.currentState(spark, stateDir).get
    val oneShot = CardSketch.hllState((1L to 9000L).toDF("id"), "id")
    assert(rows(streamed) == rows(oneShot),
      "streamed registers must be bit-identical to the one-shot sketch")
    val est = StreamingCardinality
      .currentHllEstimate(spark, stateDir).get
    assert(math.abs(est - 9000.0) / 9000.0 < 0.14, s"estimate $est")
  }

  test("streamed KMV state equals the one-shot state") {
    val stateDir = tmpDir("kmv-stream").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Long]
    val q = StreamingCardinality.kmvRun(
      input.toDF().toDF("id"), stateDir, "id", k = 64)
    try {
      Seq(1L to 2000L, 1500L to 5000L).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = StreamingCardinality.currentState(spark, stateDir).get
    val oneShot = CardSketch.kmvState((1L to 5000L).toDF("id"), "id",
      k = 64)
    assert(rows(streamed) == rows(oneShot))
    val est = StreamingCardinality
      .currentKmvEstimate(spark, stateDir, k = 64).get
    assert(math.abs(est - 5000.0) / 5000.0 < 0.4, s"estimate $est")
  }

  test("streamed sample sketch equals the one-shot sketch; quantiles " +
      "read off the maintained state") {
    val stateDir = tmpDir("samp-stream").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val q = StreamingCardinality.sampleRun(
      input.toDF().toDF("id", "v"), stateDir, "id", Seq("v"), k = 128)
    try {
      Seq(1L to 4000L, 3000L to 9000L).foreach { b =>
        input.addData(b.map(i => (i, (i % 977).toDouble)))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = StreamingCardinality.currentState(spark, stateDir).get
    val oneShot = CardSketch.sampleSketch(
      (1L to 9000L).map(i => (i, (i % 977).toDouble)).toDF("id", "v"),
      "id", Seq("v"), k = 128)
    assert(rows(streamed) == rows(oneShot))
    val med = CardSketch.sampleQuantiles(streamed, "v", Seq(0.5)).head._2
    assert(math.abs(med - 488.0) < 120.0, s"median $med vs ~488")
  }

  test("replaying a committed batch does not move the state") {
    val stateDir = tmpDir("hll-replay").toString
    val batch = (1L to 1000L).toDF("id")
    graft.streaming.VersionedStateFold.update(batch, stateDir, 0L,
      CardSketch.hllState(_, "id"), CardSketch.hllMerge)
    val v1 = rows(StreamingCardinality.currentState(spark, stateDir).get)
    graft.streaming.VersionedStateFold.update(batch, stateDir, 0L,
      CardSketch.hllState(_, "id"), CardSketch.hllMerge)
    val v2 = rows(StreamingCardinality.currentState(spark, stateDir).get)
    assert(v1 == v2)
  }
}
