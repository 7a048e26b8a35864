package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.CorpusReport
import graft.streaming.StreamingCard

/** Continuously-maintained data card: stream-of-batches state equals
  * the one-shot batch card on the same documents, and crash-replay of
  * a committed batch does not double-count. */
class StreamingCardSpec extends TestBase {
  import spark.implicits._

  private def corpus = graft.sim.WarehouseSim
    .read(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text", "lang", "source", "n_chars")

  private def cardMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap

  test("streamed card equals the one-shot batch card") {
    val stateDir = tmpDir("card-state").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Long)]
    val docsStream = input.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    val rows = corpus
      .as[(Long, String, String, String, Long)].collect()
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val q = StreamingCard.run(docsStream, stateDir)
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = cardMap(StreamingCard.currentCard(spark, stateDir).get)
    val oneShot = cardMap(
      CorpusReport.renderState(CorpusReport.statsState(corpus)))
    assert(streamed.keySet === oneShot.keySet)
    streamed.keys.foreach { k =>
      // additive columns bit-equal; sketch estimates within the envelope
      Seq(2, 4, 5, 6, 7).foreach(i =>
        assert(streamed(k)(i) === oneShot(k)(i), s"cell $k col $i"))
      Seq(3, 8, 9).foreach { i =>
        val a = streamed(k)(i).asInstanceOf[Long].toDouble
        val b = oneShot(k)(i).asInstanceOf[Long].toDouble
        assert(math.abs(a - b) <= math.max(2.0, 0.2 * math.abs(b)),
          s"cell $k sketch col $i: $a vs $b")
      }
    }
  }

  test("replaying a committed batch does not double-count") {
    val stateDir = tmpDir("card-replay").toString
    val batch = corpus.filter(col("doc_id") < 50)
    StreamingCard.updateState(batch, stateDir, batchId = 0L)
    val once = cardMap(StreamingCard.currentCard(spark, stateDir).get)
    // crash-replay of the SAME committed batchId: must be a no-op
    StreamingCard.updateState(batch, stateDir, batchId = 0L)
    val twice = cardMap(StreamingCard.currentCard(spark, stateDir).get)
    assert(once === twice)
    StreamingCard.updateState(
      corpus.filter(col("doc_id") >= 50 && col("doc_id") < 80),
      stateDir, batchId = 1L)
    val after = cardMap(StreamingCard.currentCard(spark, stateDir).get)
    val direct = cardMap(CorpusReport.renderState(
      CorpusReport.statsState(corpus.filter(col("doc_id") < 80))))
    assert(after.keySet === direct.keySet)
    after.keys.foreach { k =>
      Seq(2, 4, 5, 6, 7).foreach(i =>
        assert(after(k)(i) === direct(k)(i), s"cell $k col $i"))
    }
  }
}
