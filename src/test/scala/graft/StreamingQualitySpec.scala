package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.QualityMonitor

/** The windowed ingest-quality monitor under real streaming semantics:
  * append-mode window emission, watermark-dropped late rows, and
  * stream/batch parity on the on-time subset. */
case class MonDoc(doc_id: Long, text: String, ingest_ts: Timestamp)

class StreamingQualitySpec extends TestBase {

  private val base = 1700000000L // epoch seconds, window-aligned math below
  private def ts(offsetS: Long) = new Timestamp((base + offsetS) * 1000L)

  // 20 distinct alphabetic tokens: passes every gate check
  private val goodText = (0 until 20).map(i => s"word${('a' + i).toChar}ish")
    .mkString(" ")

  test("windowed rollup: append emission, late drop, batch parity") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[MonDoc]
    val qName = s"qmon_${System.nanoTime()}"
    val rollup = QualityMonitor.rollup(input.toDF(),
      windowLen = "1 minute", lateness = "30 seconds")
    val q = rollup.writeStream.outputMode("append")
      .format("memory").queryName(qName).start()
    try {
      // base is 800 s past an hour boundary, so minute windows align at
      // base-800+60k; offsets below are chosen inside (base..base+60)
      // and (base+60..base+120) windows via the 800 % 60 = 20 s shift
      val w0 = Seq( // window [base-20, base+40)
        MonDoc(1, goodText, ts(0)), MonDoc(2, "x", ts(10)),
        MonDoc(3, goodText, ts(30)))
      val w1 = Seq( // window [base+40, base+100)
        MonDoc(4, goodText, ts(50)), MonDoc(5, "y", ts(90)))
      input.addData(w0 ++ w1: _*)
      q.processAllAvailable()
      // the data batch raises the watermark to 90-30=60 and the trailing
      // no-data batch emits exactly the windows past it: w0 (end base+40)
      // but NOT the still-open w1 (end base+100)
      val first = spark.table(qName)
        .select(col("w_start").cast("long"), col("n_docs"), col("n_pass"),
          col("reject_rate")).as[(Long, Long, Long, Double)].collect().toMap2
      assert(first.keySet == Set(base - 20), s"got $first")
      assert(first(base - 20) == ((3L, 2L, 0.333333)), s"got $first")

      // watermark 170-30=140 > base+100: w1 flushes
      input.addData(MonDoc(6, goodText, ts(170)))
      q.processAllAvailable()
      val emitted = spark.table(qName)
        .select(col("w_start").cast("long"), col("n_docs"), col("n_pass"),
          col("reject_rate")).as[(Long, Long, Long, Double)].collect().toMap2
      assert(emitted.keySet == Set(base - 20, base + 40), s"got $emitted")
      assert(emitted(base + 40) == ((2L, 1L, 0.5)), s"got $emitted")

      // a row 120 s behind the watermark (dropped — its window already
      // closed) plus a far-future row raising the watermark to 370,
      // which flushes doc 6's window [base+160, base+220)
      input.addData(MonDoc(7, goodText, ts(20)), MonDoc(8, goodText, ts(400)))
      q.processAllAvailable()
      val all = spark.table(qName)
        .select(col("w_start").cast("long"), col("n_docs"), col("n_pass"),
          col("reject_rate")).as[(Long, Long, Long, Double)].collect().toMap2
      assert(all.keySet == Set(base - 20, base + 40, base + 160), s"got $all")
      assert(all(base - 20) == ((3L, 2L, 0.333333)),
        s"late row resurrected a closed window: $all")
      assert(all(base + 40) == ((2L, 1L, 0.5)), s"got $all")
      assert(all(base + 160) == ((1L, 1L, 0.0)), s"got $all")

      // batch parity: the same operator over the ON-TIME rows equals the
      // streamed emission (the monitor's oracle-checked path)
      val onTime = (w0 ++ w1 :+ MonDoc(6, goodText, ts(170)))
        .toDF("doc_id", "text", "ingest_ts")
      val batch = QualityMonitor.rollup(onTime, windowLen = "1 minute")
        .select(col("w_start").cast("long"), col("n_docs"), col("n_pass"),
          col("reject_rate")).as[(Long, Long, Long, Double)].collect().toMap2
      all.foreach { case (k, v) =>
        assert(batch(k) == v, s"stream/batch diverge at $k: ${batch(k)} vs $v")
      }
    } finally q.stop()
  }

  test("entropy rollup: stream emission equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[MonDoc]
    val qName = s"emon_${System.nanoTime()}"
    val rollup = QualityMonitor.entropyRollup(input.toDF(),
      windowLen = "1 minute", lateness = "30 seconds", lowThr = 2.0)
    val q = rollup.writeStream.outputMode("append")
      .format("memory").queryName(qName).start()
    try {
      val docs = Seq(
        MonDoc(1, "spam spam spam spam spam", ts(0)),      // H = 0 -> low
        MonDoc(2, goodText, ts(10)),                       // H = log2(20)
        MonDoc(3, goodText, ts(30)))
      input.addData(docs: _*)
      input.addData(MonDoc(4, goodText, ts(170)))          // flush w0
      q.processAllAvailable()
      val got = spark.table(qName)
        .select(col("w_start").cast("long"), col("n_docs"),
          col("n_low"), col("avg_entropy"))
        .as[(Long, Long, Long, Double)].collect().toMap2
      assert(got.contains(base - 20), s"got $got")
      assert(got(base - 20)._1 == 3L && got(base - 20)._2 == 1L,
        s"the zero-entropy spam doc must be the one low row: $got")
      val batch = QualityMonitor.entropyRollup(
          (docs :+ MonDoc(4, goodText, ts(170)))
            .toDF("doc_id", "text", "ingest_ts"),
          windowLen = "1 minute", lowThr = 2.0)
        .select(col("w_start").cast("long"), col("n_docs"),
          col("n_low"), col("avg_entropy"))
        .as[(Long, Long, Long, Double)].collect().toMap2
      got.foreach { case (k, v) =>
        assert(batch(k) == v,
          s"stream/batch diverge at $k: ${batch(k)} vs $v")
      }
    } finally q.stop()
  }

  test("garbage rollup: stream emission equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[MonDoc]
    val qName = s"gmon_${System.nanoTime()}"
    val rollup = QualityMonitor.garbageRollup(input.toDF(),
      windowLen = "1 minute", lateness = "30 seconds")
    val q = rollup.writeStream.outputMode("append")
      .format("memory").queryName(qName).start()
    try {
      val docs = Seq(
        MonDoc(1, "@@@@ #### $$$$ %%%% ^^^^ &&&&", ts(0)), // symbol soup
        MonDoc(2, goodText, ts(10)),
        MonDoc(3, goodText, ts(30)))
      input.addData(docs: _*)
      input.addData(MonDoc(4, goodText, ts(170))) // flush w0
      q.processAllAvailable()
      val got = spark.table(qName)
        .select(col("w_start").cast("long"), col("n_docs"),
          col("n_garbage"), col("garbage_frac"))
        .as[(Long, Long, Long, Double)].collect().toMap2
      assert(got.contains(base - 20), s"got $got")
      assert(got(base - 20)._1 == 3L && got(base - 20)._2 == 1L,
        s"the symbol-soup doc must be the one garbage row: $got")
      val batch = QualityMonitor.garbageRollup(
          (docs :+ MonDoc(4, goodText, ts(170)))
            .toDF("doc_id", "text", "ingest_ts"),
          windowLen = "1 minute")
        .select(col("w_start").cast("long"), col("n_docs"),
          col("n_garbage"), col("garbage_frac"))
        .as[(Long, Long, Long, Double)].collect().toMap2
      got.foreach { case (k, v) =>
        assert(batch(k) == v,
          s"stream/batch diverge at $k: ${batch(k)} vs $v")
      }
    } finally q.stop()
  }

  test("reason drill-down counts verdicts per window") {
    import spark.implicits._
    val docs = Seq(
      MonDoc(1, goodText, ts(0)), MonDoc(2, "x", ts(10)),
      MonDoc(3, "aaa " * 50, ts(20))).toDF("doc_id", "text", "ingest_ts")
    val byReason = QualityMonitor.rollupByReason(docs, windowLen = "1 minute")
      .select("verdict", "n").as[(String, Long)].collect().toMap
    assert(byReason("pass") == 1L, s"got $byReason")
    assert(byReason("too_short") == 1L, s"got $byReason")
    assert(byReason("repetition") == 1L, s"got $byReason")
  }

  private implicit class Tuple4Map[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
