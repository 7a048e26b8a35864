package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * The versioned-state foreachBatch fold shared by every
 * continuously-maintained mergeable report ([[StreamingCard]],
 * [[StreamingPca]]): each micro-batch reduces to its mergeable state,
 * merges into a persisted state table written as version `v<batchId>`,
 * and a CURRENT pointer file is atomically renamed onto it. Crash
 * replay of a committed batch is a no-op (CURRENT already points at
 * that batch's version), and a half-written state can never be read
 * (readers resolve CURRENT, which only ever names a fully-written
 * version).
 *
 * Scale shape: per batch, one scan of the BATCH only; the state and
 * the merge are state-sized, never corpus-sized; history is never
 * re-read.
 */
object VersionedStateFold {

  private def currentPtr(stateDir: String) =
    new java.io.File(stateDir, "CURRENT")

  /** Resolve the current state version dir, if any. */
  def currentVersion(stateDir: String): Option[String] = {
    val f = currentPtr(stateDir)
    if (f.exists()) Some(java.nio.file.Files.readString(f.toPath).trim)
    else None
  }

  /** Read the current state (None when never written). */
  def readState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    currentVersion(stateDir).map(v => spark.read.parquet(s"$stateDir/$v"))

  /** Fold one batch in: state' = merge(state, toState(batch)), written
    * as `v<batchId>`, then CURRENT repointed (tmp + atomic rename). A
    * replayed committed batchId is a no-op — convergent, not additive. */
  def update(batch: DataFrame, stateDir: String, batchId: Long,
      toState: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val spark = batch.sparkSession
    if (currentVersion(stateDir).contains(s"v$batchId")) return
    val delta = toState(batch)
    val merged = readState(spark, stateDir) match {
      case Some(prev) => merge(prev, delta)
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

  /** Continuous maintenance over a stream. */
  def run(src: DataFrame, stateDir: String,
      toState: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    new java.io.File(stateDir).mkdirs()
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        update(batch, stateDir, batchId, toState, merge)
      }
      .trigger(trigger)
      .start()
  }
}
