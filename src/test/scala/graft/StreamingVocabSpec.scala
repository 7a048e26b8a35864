package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.pipeline.CorpusReport
import graft.streaming.{StreamingVocab, VersionedStateFold}

/** Continuously-maintained vocabulary-growth curve: stream-of-batches
  * state equals the one-shot batch curve when batches arrive in
  * document order, and crash-replay of a committed batch does not
  * double-count — the streaming face of the shift+min merge
  * `report_heaps_incremental` hash-certifies. */
class StreamingVocabSpec extends TestBase {
  import spark.implicits._

  private def docs = graft.sim.WarehouseSim
    .read(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")

  test("streamed vocab curve equals the one-shot batch curve") {
    val stateDir = tmpDir("vocab-state").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")

    // prefix batches in doc order — the stream position IS the corpus
    // position, so streamed == one-shot
    val rows = docs.orderBy("doc_id").as[(Long, String)].collect()
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val q = StreamingVocab.run(stream, stateDir)
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = StreamingVocab.currentCurve(spark, stateDir)
      .get.as[(Long, Long)].collect().toSet
    val oneShot = CorpusReport.heapsCurve(docs)
      .as[(Long, Long)].collect().toSet
    assert(streamed == oneShot,
      "streamed state must render the one-shot curve bit-for-bit")
  }

  test("replaying a committed batch is a no-op") {
    val stateDir = tmpDir("vocab-replay").toString
    val half = docs.filter($"doc_id" <= 250)
    VersionedStateFold.update(half, stateDir, 0L,
      CorpusReport.vocabState(_), CorpusReport.mergeVocabState)
    val before = StreamingVocab.currentCurve(spark, stateDir)
      .get.collect().toSet
    // same batchId again: must not shift/duplicate the stream
    VersionedStateFold.update(half, stateDir, 0L,
      CorpusReport.vocabState(_), CorpusReport.mergeVocabState)
    val after = StreamingVocab.currentCurve(spark, stateDir)
      .get.collect().toSet
    assert(after == before)
  }
}
