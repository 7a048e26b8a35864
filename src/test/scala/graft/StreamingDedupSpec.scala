package graft

import graft.streaming.{KeptDoc, StreamDoc, StreamingDedup}

/** Streaming exact dedup: first occurrence wins within and across
  * micro-batches; duplicates never re-emit; state survives batch
  * boundaries. */
class StreamingDedupSpec extends TestBase {

  test("first-seen-wins dedup across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamDoc]
    val qName = s"dedup_${System.nanoTime()}"
    val q = StreamingDedup.firstSeen(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(qName)
      .start()
    try {
      // batch 1: fp1 appears twice in one batch — min doc_id kept
      input.addData(StreamDoc(7, "fp1"), StreamDoc(3, "fp1"), StreamDoc(5, "fp2"))
      q.processAllAvailable()
      assert(spark.table(qName).as[KeptDoc].collect().toSet ==
        Set(KeptDoc("fp1", 3), KeptDoc("fp2", 5)))

      // batch 2: a cross-batch duplicate of fp1 (even with a SMALLER id)
      // emits nothing — the first batch's keeper stands; fp3 is new
      input.addData(StreamDoc(1, "fp1"), StreamDoc(9, "fp3"))
      q.processAllAvailable()
      assert(spark.table(qName).as[KeptDoc].collect().toSet ==
        Set(KeptDoc("fp1", 3), KeptDoc("fp2", 5), KeptDoc("fp3", 9)))
    } finally q.stop()
  }
}
