package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.CorpusReport

/**
 * Continuously-maintained data card: each document micro-batch reduces
 * to its mergeable stats state ([[CorpusReport.statsState]] — additive
 * columns + HLL/KLL sketches per (lang, source) cell) and merges into
 * a persisted state table; the current card is
 * [[CorpusReport.renderState]] over that state at any moment. The
 * batch operator IS the streaming operator — one certified code path
 * (the [[StreamingAsOf]] discipline), and the merge is the SAME
 * cells-sized fold `report_card_incremental` oracle-certifies.
 *
 * State update is read-merge-replace into a versioned subdir + an
 * atomically-renamed CURRENT pointer file: foreachBatch may re-run a
 * batch on crash replay, and replace-into-a-new-version keeps a
 * half-written state from ever being read (readers resolve CURRENT,
 * which only ever points at a fully-written version). Re-running the
 * SAME batch twice against the same prior version double-counts —
 * exactly-once requires idempotent sinks keyed by batchId, so the
 * version name embeds the batchId and a replayed batch OVERWRITES its
 * own version instead of stacking (StreamingCardSpec pins replay
 * convergence).
 *
 * Scale shape: per batch, one scan of the BATCH only (state is
 * cells-sized, never the corpus), a cells-sized merge aggregate, and a
 * cells-sized write. Corpus history is never re-read — the streaming
 * form of the incremental-card maintenance story.
 */
object StreamingCard {

  /** Resolve the current state version dir, if any. */
  def currentVersion(stateDir: String): Option[String] =
    VersionedStateFold.currentVersion(stateDir)

  /** Read the current state (empty-schema None when never written). */
  def readState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    VersionedStateFold.readState(spark, stateDir)

  /** Fold one batch into the state (see [[VersionedStateFold.update]]:
    * versioned write + atomic CURRENT repoint; committed-batch replay
    * is a no-op). */
  def updateState(batch: DataFrame, stateDir: String, batchId: Long): Unit =
    VersionedStateFold.update(batch, stateDir, batchId,
      CorpusReport.statsState(_), CorpusReport.mergeStatsState)

  /** The maintained card right now (None before the first batch). */
  def currentCard(spark: SparkSession, stateDir: String): Option[DataFrame] =
    readState(spark, stateDir).map(CorpusReport.renderState)

  /** Continuous maintenance over a document stream. */
  def run(docs: DataFrame, stateDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    VersionedStateFold.run(docs, stateDir,
      CorpusReport.statsState(_), CorpusReport.mergeStatsState, trigger)
}
