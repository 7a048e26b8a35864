package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.{Semantic, Similarity}
import graft.sim.WarehouseSim
import graft.streaming.{StreamingCellDrift, VersionedStateFold}

/** Continuously-maintained drift state: the streamed fold equals the
  * one-shot cellState regardless of batching, the rendered report
  * equals the batch renderDrift, and crash-replay of a committed batch
  * does not double-count. */
class StreamingCellDriftSpec extends TestBase {
  import spark.implicits._

  private def emb = WarehouseSim
    .read(spark, "/root/testdata/sf0.001", "embeddings")

  private def stateSet(df: org.apache.spark.sql.DataFrame) =
    df.select("cell", "pos", "sx", "cnt")
      .as[(Int, Int, Long, Long)].collect().toSet

  test("streamed state equals the one-shot state; report matches batch") {
    implicit val sc = spark.sqlContext
    val stateDir = tmpDir("drift-state").toString
    val ref = emb.filter(col("vec_id") % 2 === 0) // the indexed snapshot
    val live = emb.filter(col("vec_id") % 2 === 1)

    val rows = live.select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, Int, Seq[Float])]
    val q = StreamingCellDrift.run(
      input.toDF().toDF("vec_id", "label", "embedding"), stateDir)
    try {
      Seq(b1, b2).foreach { b =>
        input.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = VersionedStateFold.readState(spark, stateDir).get
    assert(stateSet(streamed) === stateSet(Semantic.cellState(live)),
      "additive state must not depend on batching")

    val refState = Semantic.cellState(ref)
    val got = StreamingCellDrift.currentDrift(spark, stateDir, refState)
      .get.select("cell", "n_a", "n_b", "l2_shift", "cos_centroid")
      .as[(Int, Long, Long, Option[Double], Option[Double])]
      .collect().toSet
    val want = Semantic.renderDrift(refState, Semantic.cellState(live))
      .select("cell", "n_a", "n_b", "l2_shift", "cos_centroid")
      .as[(Int, Long, Long, Option[Double], Option[Double])]
      .collect().toSet
    assert(got === want, "live report must equal the batch render")
  }

  test("indexed composition: the monitor guards the persisted index's own cells") {
    implicit val sc = spark.sqlContext
    val stateDir = tmpDir("drift-idx-state").toString
    val idxDir = tmpDir("drift-idx").toString
    val ref = emb.filter(col("vec_id") % 2 === 0) // the indexed snapshot
    val live = emb.filter(col("vec_id") % 2 === 1)
    Similarity.buildIvfIndex(ref, idxDir, kCells = 8, iters = 2)

    val rows = live.select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, Int, Seq[Float])]
    val q = StreamingCellDrift.runIndexed(
      input.toDF().toDF("vec_id", "label", "embedding"), stateDir, idxDir)
    try {
      Seq(b1, b2).foreach { b =>
        input.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val got = StreamingCellDrift.currentDriftIndexed(spark, stateDir, idxDir)
      .get.select("cell", "n_a", "n_b", "l2_shift", "cos_centroid")
      .as[(Int, Long, Long, Option[Double], Option[Double])]
      .collect().toSet
    // batch twin: the index's own corpus state vs the live feed assigned
    // with the same sidecar — cells are the INDEX's cells on both sides
    val want = Semantic.renderDrift(
        Similarity.indexCellState(spark, idxDir),
        Semantic.cellState(Similarity.assignWithIndex(live, idxDir),
          cellCol = "cell"))
      .select("cell", "n_a", "n_b", "l2_shift", "cos_centroid")
      .as[(Int, Long, Long, Option[Double], Option[Double])]
      .collect().toSet
    assert(got === want, "the streamed monitor must equal the batch twin")
    assert(got.map(_._1).subsetOf(
      spark.read.parquet(s"$idxDir/centroids").select("cell")
        .as[Int].collect().toSet),
      "every reported cell must be one of the index's trained cells")
  }

  test("replaying a committed batch is a no-op") {
    val stateDir = tmpDir("drift-replay").toString
    val half = emb.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "label", "embedding")
    VersionedStateFold.update(half, stateDir, 0L,
      Semantic.cellState(_), Semantic.mergeCellState)
    val once = stateSet(VersionedStateFold.readState(spark, stateDir).get)
    // the crash-replay twin: same batchId again must change nothing
    VersionedStateFold.update(half, stateDir, 0L,
      Semantic.cellState(_), Semantic.mergeCellState)
    assert(stateSet(VersionedStateFold.readState(spark, stateDir).get)
      === once, "a committed batch must never double-count")
  }
}
