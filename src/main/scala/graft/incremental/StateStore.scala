package graft.incremental

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.JobState

/**
 * Replication-job state table (SURVEY §2.1 S12) as an append-only parquet
 * log of (job row, status transition, seq): the Spark-native replacement
 * for the reference's MySQL `replication_jobs` table
 * (`incremental/db/PersistedJobInfoStore.java:82-150`).
 *
 * Current state = latest transition per job id — the same latest-wins
 * window (J5) the engine uses for manifests. Appends are atomic at the
 * parquet-file level, so restore-after-crash sees a prefix of transitions,
 * which is exactly the reference's recovery contract (restore PENDING/
 * RUNNING, re-run idempotent tasks — `ReplicationServer.java:383-390`).
 */
final class StateStore(spark: SparkSession, dir: String) extends Serializable {
  import spark.implicits._

  repairCompaction()

  // Restart-safe transition counter: resume from the max seq already
  // persisted so post-crash appends sort *after* pre-crash ones (a fresh
  // counter would tie with old rows and make latest-wins nondeterministic).
  private val seq = new java.util.concurrent.atomic.AtomicLong(maxPersistedSeq())

  // Monotonic change stamp for same-process readers (the status endpoint):
  // bumped on every mutation so a poller can serve cached rollups until
  // the log actually changes instead of running a Spark job per poll.
  private val versionCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  def version: Long = versionCounter.get()

  private def compactTmpPath = new Path(dir + ".compact-tmp")
  private def compactOldPath = new Path(dir + ".compact-old")

  /** Repair an interrupted compaction swap. The swap is two renames
    * (dir→old, tmp→dir), so the possible crash states are: dir present
    * (leftover tmp/old are garbage), or dir absent with a COMPLETE tmp
    * generation (adopt it), or dir absent with only old (roll back). */
  private def repairCompaction(): Unit = {
    val fs = new Path(dir).getFileSystem(new Configuration())
    if (fs.exists(new Path(dir))) {
      fs.delete(compactTmpPath, true)
      fs.delete(compactOldPath, true)
    } else if (fs.exists(compactTmpPath)) {
      fs.rename(compactTmpPath, new Path(dir))
      fs.delete(compactOldPath, true)
    } else if (fs.exists(compactOldPath)) {
      fs.rename(compactOldPath, new Path(dir))
    }
    ()
  }

  private def maxPersistedSeq(): Long =
    if (!exists) 0L
    else try {
      spark.read.parquet(dir)
        .agg(max("seq")).collect()(0) match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
    } catch {
      // A crash during the first-ever append can leave the dir holding only
      // `_temporary` (no committed parquet footers); schema inference then
      // throws and the server couldn't even construct a StateStore to
      // recover. An unreadable/empty log means no persisted transitions.
      case _: org.apache.spark.sql.AnalysisException => 0L
    }

  def append(jobs: Seq[JobState]): Unit = {
    if (jobs.isEmpty) return
    val s = seq.incrementAndGet()
    spark.createDataset(jobs).withColumn("seq", lit(s))
      .write.mode(SaveMode.Append).parquet(dir)
    versionCounter.incrementAndGet()
    ()
  }

  def appendStatus(jobs: Seq[JobState], status: String): Unit =
    append(jobs.map(_.copy(status = status)))

  private def exists: Boolean =
    new Path(dir).getFileSystem(new Configuration()).exists(new Path(dir))

  /** Latest transition per job, seq retained (the job key is the full
    * identity — one audit entry legally yields several jobs with one id). */
  private def latestTransitions(): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("id"), col("operation"), col("db"),
        col("table"), col("partitions"), col("renameToDb"), col("renameToTable"))
      .orderBy(col("seq").desc)
    spark.read.parquet(dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Latest transition per job. One audit entry legally yields several jobs
    * with the same id (the factory emits one job per output table, and one
    * per partition for drops), so the job key is the full identity
    * (id, operation, db, table, partitions, rename target) — not id alone. */
  def current(): Dataset[JobState] = {
    if (!exists) return spark.emptyDataset[JobState]
    latestTransitions().drop("seq").as[JobState]
  }

  /** Compact the append-only log to one row per job (its latest transition,
    * seq retained so restart ordering survives). The log otherwise grows
    * with every status transition forever — unbounded at warehouse scale.
    * Single-writer contract: call between batches, like the reference's
    * row-overwriting DB store. The swap is two renames so a concurrent
    * reader (the status endpoint) sees a missing dir only for the
    * milliseconds between them, never a half-deleted one; a crash mid-swap
    * is repaired at the next construction ([[repairCompaction]]). */
  def compact(): Unit = {
    if (!exists) return
    val fs = new Path(dir).getFileSystem(new Configuration())
    fs.delete(compactTmpPath, true)
    fs.delete(compactOldPath, true)
    latestTransitions().write.parquet(compactTmpPath.toString)
    fs.rename(new Path(dir), compactOldPath)
    fs.rename(compactTmpPath, new Path(dir))
    fs.delete(compactOldPath, true)
    versionCounter.incrementAndGet()
    ()
  }

  /** O2 — restore runnable jobs in id order
    * (`PersistedJobInfoStore.java:107-141`). */
  def restoreRunnable(): Seq[JobState] =
    current()
      .filter((j: JobState) =>
        j.status == graft.model.JobStatus.Pending ||
        j.status == graft.model.JobStatus.Running)
      .orderBy("id").collect().toSeq
}

/**
 * KV watermark (`last_persisted_id`) — the reference's hand-rolled
 * checkpoint (`DbKeyValueStore`, `create_tables.sql:30-35`): a one-line
 * file written via temp+rename (atomic on HDFS).
 */
final class Watermark(path: String) {
  private val p = new Path(path)
  private def fs = p.getFileSystem(new Configuration())

  def get(): Option[Long] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes()).trim.toLong)
      finally in.close()
    }

  def set(id: Long): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(id.toString.getBytes) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }
}
