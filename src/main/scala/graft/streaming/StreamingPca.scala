package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Semantic

/**
 * Continuously-maintained embedding-collapse report: each embedding
 * micro-batch reduces to its mergeable PCA sufficient-statistics state
 * ([[Semantic.pcaState]] — d²-row exact-integer raw moments) and folds
 * into the persisted state via the shared [[VersionedStateFold]]; the
 * current anisotropy report is [[Semantic.renderPca]] over that state
 * at any moment. The additive merge is the SAME fold
 * `report_pca_incremental` hash-certifies against the one-shot oracle,
 * so the streamed report equals the batch report by construction
 * (StreamingPcaSpec pins it end-to-end, with crash replay).
 *
 * Scale shape: per batch one scan of the BATCH only; the state is
 * d²-row at any corpus size; history is never re-read — live
 * embedding-health monitoring of a vector-ingest feed.
 */
object StreamingPca {

  def run(embs: DataFrame, stateDir: String,
      vecCol: String = "embedding",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    VersionedStateFold.run(embs, stateDir,
      Semantic.pcaState(_, vecCol), Semantic.mergePcaState)

  /** The maintained report right now (None before the first batch). */
  def currentReport(spark: SparkSession, stateDir: String,
      iters: Int = 8): Option[DataFrame] =
    VersionedStateFold.readState(spark, stateDir)
      .map(Semantic.renderPca(_, iters))
}
