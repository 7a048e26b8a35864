package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CdcApply

/**
 * Continuously-maintained CDC snapshot — the reference's incremental
 * replication loop (tail the change log, keep the destination current)
 * as a streaming fold over the certified batch operator: each change
 * micro-batch merges into the persisted snapshot via
 * [[CdcApply.snapshot]] over (previous snapshot ∪ batch). Snapshot
 * rows carry their last change's (ts, tie-break, op), so the fold is
 * exactly the batch semantics applied incrementally: a newer tombstone
 * deletes, a newer upsert replaces, an out-of-order change older than
 * the key's current state LOSES — late data cannot regress the
 * snapshot (spec-pinned).
 *
 * State layout is the [[StreamingCard]] discipline: versioned subdirs
 * + an atomically-renamed CURRENT pointer; a replayed committed batch
 * is a no-op, a crash between version write and pointer flip converges
 * on replay. Cost per batch: one scan of (snapshot ∪ batch) and one
 * key shuffle — snapshot-sized, not history-sized; the change log is
 * never re-read. For key-count ≫ memory, partition the state dir by a
 * key prefix and fold per partition (the
 * [[StreamingNearDedup.runBatchPartitioned]] discipline).
 */
object StreamingCdc {

  private def currentPtr(stateDir: String) =
    new java.io.File(stateDir, "CURRENT")

  def currentVersion(stateDir: String): Option[String] = {
    val f = currentPtr(stateDir)
    if (f.exists()) Some(java.nio.file.Files.readString(f.toPath).trim)
    else None
  }

  /** The raw fold state: latest change per key, tombstones included
    * (they must persist so late pre-delete changes cannot resurrect —
    * spec-pinned). */
  def currentState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    currentVersion(stateDir).map(v => spark.read.parquet(s"$stateDir/$v"))

  /** The SERVED snapshot (tombstoned keys filtered; None before the
    * first batch). */
  def currentSnapshot(spark: SparkSession, stateDir: String, opCol: String,
      deleteOp: String): Option[DataFrame] =
    currentState(spark, stateDir)
      .map(_.filter(org.apache.spark.sql.functions.col(opCol) =!= deleteOp))

  /** Fold one change batch into the state. */
  def updateState(batch: DataFrame, stateDir: String, batchId: Long,
      keys: Seq[String], tsCol: String, tieBreak: String,
      opCol: String, deleteOp: String): Unit = {
    val spark = batch.sparkSession
    val merged = currentState(spark, stateDir) match {
      case Some(_) if currentVersion(stateDir).get == s"v$batchId" =>
        return // committed before a crash: replay is a no-op
      case Some(prev) =>
        CdcApply.latestState(prev.unionByName(batch), keys, tsCol, tieBreak,
          opCol)
      case None =>
        CdcApply.latestState(batch, keys, tsCol, tieBreak, opCol)
    }
    merged.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/v$batchId")
    val tmp = new java.io.File(stateDir, s".CURRENT.tmp$batchId")
    java.nio.file.Files.writeString(tmp.toPath, s"v$batchId")
    java.nio.file.Files.move(tmp.toPath, currentPtr(stateDir).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Continuous apply over a change stream. */
  def run(changes: DataFrame, stateDir: String, keys: Seq[String],
      tsCol: String, tieBreak: String, opCol: String, deleteOp: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    new java.io.File(stateDir).mkdirs()
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        updateState(batch, stateDir, batchId, keys, tsCol, tieBreak,
          opCol, deleteOp)
      }
      .trigger(trigger)
      .start()
  }
}
