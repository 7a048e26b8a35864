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

  private def batchTwin(evs: Seq[SeqEvent], withinS: Long,
      steps: Seq[String] = Seq("view", "click", "purchase")) =
    SequenceMatch.funnelMatch(
        evs.toDF().select(col("user_id"),
          timestamp_micros(col("ts_us")).as("ts"),
          col("event_type"), col("event_id")),
        steps, withinS)
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
      val streamed = spark.table(qName).filter(!col("late"))
        .select(col("user_id"), col("id0"),
          col("ts")(0).as("t0"), col("ts")(1).as("t1"), col("ts")(2).as("t2"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = batchTwin(evs, 1500)
      assert(want.nonEmpty, "fixture should complete at least one funnel")
      assert(streamed === want)
      assert(spark.table(qName).filter(col("late")).count() === 0,
        "a time-ordered stream must report zero late drops")
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

  test("repeated step types: streaming equals batch on the same contract") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqEvent]
    val qName = s"ceprep_${System.nanoTime()}"
    // view → view → purchase: both paths must accept repeats and agree
    val steps = Seq("view", "view", "purchase")
    val out = StreamingSequenceMatch(input.toDS(), steps,
      withinSeconds = 1500)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qName).start()
    try {
      val evs = fixture
      val (b1, b2) = evs.splitAt(evs.length / 2)
      Seq(b1, b2).foreach { b =>
        input.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table(qName).filter(!col("late"))
        .select(col("user_id"), col("id0"),
          col("ts")(0).as("t0"), col("ts")(1).as("t1"), col("ts")(2).as("t2"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = batchTwin(evs, 1500, steps)
      assert(want.nonEmpty, "fixture should complete a repeated-step funnel")
      assert(streamed === want)
    } finally q.stop()
  }

  test("randomized parity sweep: random streams, random batch splits, " +
      "repeated-step sequences") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(20260815L) // fixed seed: replayable
    for (trial <- 0 until 3) {
      val steps =
        if (trial % 2 == 0) Seq("view", "click", "purchase")
        else Seq("view", "view", "error") // repeated step type
      val evs = (0 until 400).map { i =>
        SeqEvent((rnd.nextInt(5) + 1).toLong,
          rnd.nextInt(3000).toLong * 1000000L,
          types(rnd.nextInt(types.length)), 100000L * trial + i)
      }.sortBy(e => (e.ts_us, e.event_id))
      // random number of in-order batch cuts (1-3)
      val cuts = Seq.fill(rnd.nextInt(3))(rnd.nextInt(evs.length)).sorted
      val batches = (Seq(0) ++ cuts ++ Seq(evs.length)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => evs.slice(a, b) }.toSeq
      val input = MemoryStream[SeqEvent]
      val qName = s"cepr${trial}_${System.nanoTime()}"
      val q = StreamingSequenceMatch(input.toDS(), steps, 900)
        .writeStream.outputMode("append")
        .format("memory").queryName(qName).start()
      try {
        batches.filter(_.nonEmpty).foreach { b =>
          input.addData(b.toIndexedSeq); q.processAllAvailable()
        }
        val streamed = spark.table(qName).filter(!col("late"))
          .select(col("user_id"), col("id0"),
            col("ts")(0).as("t0"), col("ts")(1).as("t1"),
            col("ts")(2).as("t2"))
          .as[(Long, Long, Long, Long, Long)].collect().toSet
        assert(streamed === batchTwin(evs, 900, steps),
          s"trial $trial (steps=$steps, batches=${batches.map(_.length)})")
      } finally q.stop()
    }
  }

  test("idle-flush timeout discards a quiet key's partials and frees state") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqEvent]
    val qName = s"cepflush_${System.nanoTime()}"
    // a huge event-time window: only the processing-time idle flush can
    // stop the anchored partial from completing
    val q = StreamingSequenceMatch(input.toDS(),
        Seq("view", "purchase"), withinSeconds = 100000L,
        idleFlushMs = Some(300L))
      .writeStream.outputMode("append").format("memory").queryName(qName)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // user 7 anchors a partial, then goes quiet past the idle flush
      input.addData(SeqEvent(7L, 0L, "view", 1L))
      val seen = System.currentTimeMillis() + 30000
      while (q.recentProgress.map(_.numInputRows).sum < 1 &&
          System.currentTimeMillis() < seen) Thread.sleep(100)
      assert(q.recentProgress.map(_.numInputRows).sum >= 1,
        "batch 1 must process before the idle wait")
      Thread.sleep(3000) // >> idleFlushMs at a 100 ms trigger
      // the purchase is within the event-time window of the flushed
      // anchor, plus user 8's complete funnel as the processed sentinel
      input.addData(
        SeqEvent(7L, 1000000L, "purchase", 2L),
        SeqEvent(8L, 0L, "view", 3L),
        SeqEvent(8L, 1000000L, "purchase", 4L))
      val deadline = System.currentTimeMillis() + 30000
      var done = Seq.empty[(Long, Long)]
      while (done.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        done = spark.table(qName).filter(!col("late"))
          .select("user_id", "id0").as[(Long, Long)].collect().toSeq
      }
      assert(done === Seq((8L, 3L)),
        s"only the post-flush funnel may complete — the flushed anchor " +
          s"must be gone: $done")
    } finally q.stop()
  }

  test("late cross-batch events are reported as drops, never mis-sequenced") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqEvent]
    val qName = s"ceplate_${System.nanoTime()}"
    val out = StreamingSequenceMatch(input.toDS(),
      Seq("view", "click", "purchase"), withinSeconds = 1500)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qName).start()
    try {
      // batch 1 advances user 1's clock to t=100s; batch 2 delivers a
      // click that happened BEFORE the purchase already processed
      input.addData(
        SeqEvent(1L, 10L * 1000000L, "view", 1L),
        SeqEvent(1L, 100L * 1000000L, "purchase", 2L))
      q.processAllAvailable()
      input.addData(SeqEvent(1L, 50L * 1000000L, "click", 3L))
      q.processAllAvailable()
      val drops = spark.table(qName).filter(col("late"))
        .select(col("user_id"), col("id0"), col("ts")(0).as("t"))
        .as[(Long, Long, Long)].collect().toSet
      assert(drops === Set((1L, 3L, 50L * 1000000L)),
        "the out-of-order click must surface as a loud drop row")
      assert(spark.table(qName).filter(!col("late")).count() === 0,
        "a dropped step must not complete a funnel")
      // completions equal the batch matcher run on exactly the events
      // that were NOT dropped — drop-and-report, never silent divergence
      input.addData(
        SeqEvent(1L, 200L * 1000000L, "view", 4L),
        SeqEvent(1L, 210L * 1000000L, "click", 5L),
        SeqEvent(1L, 220L * 1000000L, "purchase", 6L))
      q.processAllAvailable()
      val processed = Seq(
        SeqEvent(1L, 10L * 1000000L, "view", 1L),
        SeqEvent(1L, 100L * 1000000L, "purchase", 2L),
        SeqEvent(1L, 200L * 1000000L, "view", 4L),
        SeqEvent(1L, 210L * 1000000L, "click", 5L),
        SeqEvent(1L, 220L * 1000000L, "purchase", 6L))
      val streamed = spark.table(qName).filter(!col("late"))
        .select(col("user_id"), col("id0"),
          col("ts")(0).as("t0"), col("ts")(1).as("t1"), col("ts")(2).as("t2"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batchTwin(processed, 1500),
        "non-late completions must equal the batch matcher on the " +
          "undropped events")
    } finally q.stop()
  }
}
