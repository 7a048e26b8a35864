package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SequenceMatch
import graft.streaming.{SeqEvent, StreamingSequenceMatch}

/** Streaming CEP funnel: streamed completions equal the batch matcher
  * on time-ordered arrival, including funnels whose steps span
  * micro-batches; state prunes expired anchors. */
class StreamingSequenceMatchSpec extends TestBase {
  import spark.implicits._

  private val types = Array("view", "click", "purchase", "error")

  private def fixture: Seq[SeqEvent] =
    (0 until 600).map { i =>
      val u = (i * 7919) % 7
      val us = ((i * 104729) % 4000).toLong * 1000000L
      SeqEvent(u.toLong, us, types((i * 31) % 4), i.toLong)
    }.sortBy(e => (e.ts_us, e.event_id))

  private def batchTwin(evs: Seq[SeqEvent], withinS: Long) =
    SequenceMatch.funnelMatch(
        evs.toDF().select(col("user_id"),
          timestamp_micros(col("ts_us")).as("ts"),
          col("event_type"), col("event_id")),
        Seq("view", "click", "purchase"), withinS)
      .select("user_id", "id0", "t0", "t1", "t2")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("streamed completions equal the batch matcher across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqEvent]
    val qName = s"cep_${System.nanoTime()}"
    val out = StreamingSequenceMatch(input.toDS(),
      Seq("view", "click", "purchase"), withinSeconds = 1500)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qName).start()
    try {
      // three time-ordered batches: funnels deliberately span batches
      val evs = fixture
      val (b1, rest) = evs.splitAt(evs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table(qName)
        .select(col("user_id"), col("id0"),
          col("ts")(0).as("t0"), col("ts")(1).as("t1"), col("ts")(2).as("t2"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = batchTwin(evs, 1500)
      assert(want.nonEmpty, "fixture should complete at least one funnel")
      assert(streamed === want)
    } finally q.stop()
  }

  test("expired anchors prune from state and never complete") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqEvent]
    val qName = s"cepx_${System.nanoTime()}"
    val out = StreamingSequenceMatch(input.toDS(),
      Seq("view", "click", "purchase"), withinSeconds = 10)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qName).start()
    try {
      input.addData(SeqEvent(1L, 0L, "view", 1L))
      q.processAllAvailable()
      // click + purchase arrive long after the 10 s window
      input.addData(SeqEvent(1L, 60L * 1000000L, "click", 2L),
        SeqEvent(1L, 61L * 1000000L, "purchase", 3L))
      q.processAllAvailable()
      assert(spark.table(qName).count() === 0)
    } finally q.stop()
  }

  test("rejects repeated step types loudly") {
    intercept[IllegalArgumentException] {
      StreamingSequenceMatch(spark.emptyDataset[SeqEvent],
        Seq("view", "view"), 10)
    }
  }
}
