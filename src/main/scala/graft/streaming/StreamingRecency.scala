package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Recency

/**
 * Continuously-maintained decayed-activity state: each micro-batch
 * reduces to its own [[Recency.decayedState]] (keys-sized, anchored at
 * the batch's max period) and folds into the persisted state via
 * [[VersionedStateFold]] — the batch operator IS the streaming
 * operator (the [[StreamingCardinality]] discipline). Because
 * [[Recency.merge]] advances both sides to the common period-grid
 * horizon with exact floor-shifts before adding, the streamed state is
 * BIT-IDENTICAL to the one-shot state over everything seen — any batch
 * boundaries, any replay order (StreamingRecencySpec pins the
 * equality).
 *
 * Replay safety is [[VersionedStateFold]]'s versioned-subdir +
 * atomic-CURRENT discipline; a crash-replayed batch overwrites its own
 * version instead of double-merging.
 *
 * Scale shape: per batch one scan of the BATCH, a keys-sized merge, a
 * keys-sized write; history is never re-read, and horizons only move
 * forward (late batches older than the standing horizon decay on
 * entry, exactly as the one-shot would have decayed them).
 */
object StreamingRecency {

  def run(rows: DataFrame, stateDir: String, tsCol: String,
      keyCols: Seq[String], halfLifeUs: Long,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    VersionedStateFold.run(rows, stateDir,
      Recency.decayedState(_, tsCol, keyCols, halfLifeUs),
      Recency.merge, trigger)

  /** Current state frame (None before the first committed batch). */
  def currentState(spark: SparkSession,
      stateDir: String): Option[DataFrame] =
    VersionedStateFold.readState(spark, stateDir)
}
