package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{Semantic, Similarity}

/**
 * Continuously-maintained embedding-drift state: each embedding
 * micro-batch reduces to its mergeable per-cell centroid state
 * ([[Semantic.cellState]] — integer component micro-sums + counts,
 * additive) and folds into the persisted state via the shared
 * [[VersionedStateFold]] (versioned writes + atomic CURRENT pointer:
 * crash replay of a committed batch is a no-op). [[currentDrift]]
 * renders the live [[Semantic.renderDrift]] report against a REFERENCE
 * state — the standing "has this feed's embedding distribution moved
 * off the indexed snapshot?" monitor that tells an IVF deployment when
 * to retrain ([[graft.pipeline.Similarity.buildIvfIndex]]) and
 * re-embed.
 *
 * Scale shape: per batch one scan of the BATCH only; state is
 * |cells|×dim rows of longs at any corpus size; history embeddings are
 * never re-read.
 */
object StreamingCellDrift {

  def run(emb: DataFrame, stateDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    VersionedStateFold.run(emb, stateDir,
      Semantic.cellState(_), Semantic.mergeCellState, trigger)

  /** The drift report of the maintained state against `reference`
    * (a [[Semantic.cellState]] of the indexed snapshot); None before
    * the first batch. */
  def currentDrift(spark: SparkSession, stateDir: String,
      reference: DataFrame): Option[DataFrame] =
    VersionedStateFold.readState(spark, stateDir)
      .map(st => Semantic.renderDrift(reference, st))

  /** [[run]] wired to the persisted IVF index it guards: each batch is
    * assigned against the index's trained sidecar
    * ([[Similarity.assignWithIndex]] — dim-validated, cells = the
    * index's cells, not a caller-supplied label), so the maintained
    * state speaks the index's cell language and [[currentDriftIndexed]]
    * renders it directly against the index's own corpus state. This is
    * the standing "retrain yet?" monitor of the index lifecycle. */
  def runIndexed(emb: DataFrame, stateDir: String, indexDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    VersionedStateFold.run(emb, stateDir,
      b => Semantic.cellState(
        Similarity.assignWithIndex(b, indexDir, idCol, vecCol),
        vecCol = vecCol, cellCol = "cell"),
      Semantic.mergeCellState, trigger)

  /** The [[runIndexed]] report: maintained live state vs the state of
    * the index's OWN corpus ([[Similarity.indexCellState]]) — cells
    * whose live centroid moved off the indexed snapshot are where a
    * retrain ([[Similarity.buildIvfIndex]]) pays. */
  def currentDriftIndexed(spark: SparkSession, stateDir: String,
      indexDir: String): Option[DataFrame] =
    currentDrift(spark, stateDir, Similarity.indexCellState(spark, indexDir))
}
