package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Semantic

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
}
