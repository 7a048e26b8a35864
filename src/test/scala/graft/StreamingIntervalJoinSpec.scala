package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin
import graft.streaming.StreamingIntervalJoin

/**
 * Native stream-stream interval overlap join
 * ([[StreamingIntervalJoin]]): parity with the batch bucketed operator
 * on the same intervals, cross-batch matching (state buffering), and
 * the loud over-long-interval refusal that keeps the eviction band
 * sound.
 */
class StreamingIntervalJoinSpec extends TestBase {
  import spark.implicits._

  // (user, id, start-us, end-us); micros on a whole-second grid
  private val aRows = Seq(
    ("u1", 1L, 1000000L, 5000000L),
    ("u1", 2L, 9000000L, 12000000L),
    ("u2", 3L, 2000000L, 4000000L))
  private val bRows = Seq(
    ("u1", 10L, 3000000L, 7000000L),   // overlaps a1
    ("u1", 11L, 11000000L, 13000000L), // overlaps a2
    ("u1", 12L, 5500000L, 6000000L),   // gap: no match
    ("u2", 13L, 1000000L, 2500000L),   // overlaps a3
    ("u3", 14L, 1000000L, 2000000L))   // no partner key

  private def toTs(df: org.apache.spark.sql.DataFrame, s: String,
      e: String) =
    df.withColumn(s, expr(s"timestamp_micros($s)"))
      .withColumn(e, expr(s"timestamp_micros($e)"))

  test("stream-stream matches equal the batch bucketed operator") {
    implicit val sc = spark.sqlContext
    val aIn = MemoryStream[(String, Long, Long, Long)]
    val bIn = MemoryStream[(String, Long, Long, Long)]
    val joined = StreamingIntervalJoin.overlapJoin(
      toTs(aIn.toDF().toDF("user_id", "a_id", "a_ts", "a_te"),
        "a_ts", "a_te"),
      toTs(bIn.toDF().toDF("user_id", "b_id", "b_ts", "b_te"),
        "b_ts", "b_te"),
      keys = Seq("user_id"), maxLen = "1 minute")
    val q = joined.writeStream.format("memory")
      .queryName("ssij").outputMode("append").start()
    try {
      // split across micro-batches: matches must form ACROSS batches
      aIn.addData(aRows.take(2)); q.processAllAvailable()
      bIn.addData(bRows.take(3)); q.processAllAvailable()
      aIn.addData(aRows.drop(2)); bIn.addData(bRows.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ssij")
      .select("user_id", "a_id", "b_id", "overlap")
      .collect().map(_.toSeq).toSet
    val want = IntervalJoin.overlapJoin(
      aRows.toDF("user_id", "a_id", "a_s", "a_e"),
      bRows.toDF("user_id", "b_id", "b_s", "b_e"),
      keys = Seq("user_id"), bucket = 2000000L)
      .collect().map(_.toSeq).toSet
    assert(got == want, s"stream got $got\nbatch want $want")
    assert(want.size == 3)
  }

  test("an interval longer than maxLen fails the stream loudly " +
      "instead of silently missing post-eviction matches") {
    implicit val sc = spark.sqlContext
    val aIn = MemoryStream[(String, Long, Long, Long)]
    val bIn = MemoryStream[(String, Long, Long, Long)]
    val joined = StreamingIntervalJoin.overlapJoin(
      toTs(aIn.toDF().toDF("user_id", "a_id", "a_ts", "a_te"),
        "a_ts", "a_te"),
      toTs(bIn.toDF().toDF("user_id", "b_id", "b_ts", "b_te"),
        "b_ts", "b_te"),
      keys = Seq("user_id"), maxLen = "1 second")
    val q = joined.writeStream.format("memory")
      .queryName("ssij_bad").outputMode("append").start()
    val ex = intercept[Exception] {
      try {
        // 4-second interval under a 1-second band
        aIn.addData(Seq(("u1", 1L, 1000000L, 5000000L)))
        bIn.addData(Seq(("u1", 10L, 1500000L, 2000000L)))
        q.processAllAvailable()
      } finally q.stop()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(_.contains("state-eviction band")),
      s"expected the loud band refusal, got: ${chain(ex)}")
  }
}
