package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.pipeline.Semantic
import graft.streaming.{StreamingPca, VersionedStateFold}

/** Continuously-maintained PCA report: stream-of-batches state equals
  * the one-shot batch report, and crash-replay of a committed batch
  * does not double-count — the streaming face of the additivity
  * `report_pca_incremental` hash-certifies. */
class StreamingPcaSpec extends TestBase {
  import spark.implicits._

  private def embs = graft.sim.WarehouseSim
    .read(spark, "/root/testdata/sf0.001", "embeddings")
    .select("vec_id", "embedding")

  test("streamed PCA report equals the one-shot batch report") {
    val stateDir = tmpDir("pca-state").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")

    val rows = embs.as[(Long, Seq[Float])].collect()
    val (b1, rest) = rows.splitAt(rows.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)

    val q = StreamingPca.run(stream, stateDir)
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = StreamingPca.currentReport(spark, stateDir)
      .get.collect().toSet
    val oneShot = Semantic.embeddingPca(embs).collect().toSet
    assert(streamed == oneShot,
      "streamed state must render the one-shot report bit-for-bit")
  }

  test("replaying a committed batch is a no-op") {
    val stateDir = tmpDir("pca-replay").toString
    val half = embs.filter($"vec_id" % 2 === 0)
    VersionedStateFold.update(half, stateDir, 0L,
      Semantic.pcaState(_), Semantic.mergePcaState)
    val before = StreamingPca.currentReport(spark, stateDir)
      .get.collect().toSet
    // crash replay of the SAME committed batch id
    VersionedStateFold.update(half, stateDir, 0L,
      Semantic.pcaState(_), Semantic.mergePcaState)
    val after = StreamingPca.currentReport(spark, stateDir)
      .get.collect().toSet
    assert(after == before, "committed-batch replay must not double-count")
  }
}
