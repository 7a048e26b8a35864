package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  private def currentPtr(stateDir: String) =
    new java.io.File(stateDir, "CURRENT")

  /** Resolve the current state version dir, if any. */
  def currentVersion(stateDir: String): Option[String] = {
    val f = currentPtr(stateDir)
    if (f.exists()) Some(java.nio.file.Files.readString(f.toPath).trim)
    else None
  }

  /** Read the current state (empty-schema None when never written). */
  def readState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    currentVersion(stateDir).map(v =>
      spark.read.parquet(s"$stateDir/$v"))

  /** Fold one batch into the state: state' = merge(state, state(batch)),
    * written as version `v<batchId>`, then CURRENT repointed (tmp file +
    * atomic rename). A replayed batchId overwrites its own version and
    * repoints to the identical content — convergent, not additive. */
  def updateState(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = CorpusReport.statsState(batch)
    val merged = readState(spark, stateDir) match {
      case Some(_) if currentVersion(stateDir).get == s"v$batchId" =>
        // CURRENT already points at this batch's version: the batch
        // committed before the crash — replay is a no-op (merging again
        // would double-count the batch)
        return
      case Some(prev) => CorpusReport.mergeStatsState(prev, delta)
      case None => delta
    }
    merged.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$stateDir/v$batchId")
    val tmp = new java.io.File(stateDir, s".CURRENT.tmp$batchId")
    java.nio.file.Files.writeString(tmp.toPath, s"v$batchId")
    java.nio.file.Files.move(tmp.toPath, currentPtr(stateDir).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The maintained card right now (None before the first batch). */
  def currentCard(spark: SparkSession, stateDir: String): Option[DataFrame] =
    readState(spark, stateDir).map(CorpusReport.renderState)

  /** Continuous maintenance over a document stream. */
  def run(docs: DataFrame, stateDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    new java.io.File(stateDir).mkdirs()
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        updateState(batch, stateDir, batchId)
      }
      .trigger(trigger)
      .start()
  }
}
