package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Continuous near-dup dedup over a document stream: each micro-batch is
 * LSH-joined against the signature state accumulated from every earlier
 * batch, so a new crawl increment pays O(|batch| · bands) — the engine
 * never re-pairs the historical corpus against itself (the same property
 * as [[Dedup.minhashLshPairsIncremental]], made continuous).
 *
 * State is a parquet table of (doc_id, band1, band2, shingles): bands
 * for candidate generation, shingles for the Jaccard verify. Appending
 * one state row per document per batch keeps the loop idempotent-friendly
 * (reprocessing a batch after a crash re-finds the same pairs; dedupe
 * downstream on (doc_a, doc_b) if exactly-once pairs matter).
 *
 * Every pair is discovered exactly once under normal operation: when its
 * LATER document's batch arrives.
 */
object StreamingNearDedup {

  /** Signature+shingle state rows for a static document frame. */
  def stateRows(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup.lshBands(Dedup.minhashSignatures(docs, 8, idCol, textCol))
      .join(Dedup.shingled(docs, idCol, textCol), "doc_id")

  /**
   * Near-dup pairs of `batchState` against `fullState` (which must
   * already CONTAIN the batch's own rows, so batch-internal pairs are
   * found too). Equi-join on unpivoted bands, batch side as the small
   * probe; verified shingle-Jaccard output like [[Dedup.minhashLshPairs]].
   */
  def pairsAgainstState(batchState: DataFrame, fullState: DataFrame): DataFrame = {
    val candidates = Dedup.incrementalCandidates(
      Dedup.unpivotBands(batchState), Dedup.unpivotBands(fullState))
    Dedup.jaccardVerify(candidates,
      fullState.select(col("doc_id"), col("shingles")))
  }

  /**
   * One foreachBatch step: compute the batch's state rows, find pairs
   * against (state ∪ batch), then append the batch rows to the state
   * table. Returns the batch's verified pairs.
   */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
      minJaccard: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val batchState = stateRows(batch, idCol, textCol).persist()
    try {
      // existence via Hadoop's FileSystem so hdfs://, s3a://, and relative
      // local paths all work; a dir with no readable footers (crashed
      // first write) reads as absent rather than a permanent crash loop
      val statePath = new org.apache.hadoop.fs.Path(stateDir)
      val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prior: Option[DataFrame] =
        if (!fs.exists(statePath)) None
        else try Some(spark.read.parquet(stateDir))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      val full = prior match {
        case None => batchState
        case Some(p) =>
          p.select(batchState.columns.map(col): _*).unionAll(batchState)
      }
      val pairs = pairsAgainstState(batchState, full)
        .filter(col("jaccard") >= minJaccard)
        .localCheckpoint(true) // materialize BEFORE the state append below
      batchState.write.mode("append").parquet(stateDir)
      pairs
    } finally batchState.unpersist(blocking = false)
  }

  /**
   * Start the continuous loop: `docs` is a STREAMING frame of
   * (doc_id, text); discovered pairs append to `pairsDir`, signature
   * state accrues in `stateDir`, offsets in `checkpointDir` (crash
   * recovery replays the in-flight batch; the state append and pair
   * append are then repeated — downstream consumers dedupe on the pair
   * key, mirroring the at-least-once contract of the reference's
   * incremental loop).
   */
  def start(docs: DataFrame, stateDir: String, pairsDir: String,
      checkpointDir: String, minJaccard: Double = 0.7)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, minJaccard)
          .write.mode("append").parquet(pairsDir)
      }
      .start()
}
