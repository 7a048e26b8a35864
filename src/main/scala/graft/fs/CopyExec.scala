package graft.fs

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.FileEntry

/** Outcome of one file copy (mirrors the reference's COPIED/SKIPPED
  * counters, `batch/BatchUtils.java:39-132`). */
final case class CopyResult(relPath: String, status: String, bytes: Long)

/**
 * Distributed executor-side file copy (SURVEY §2.1 S9/S10).
 *
 * Same protocol as the reference's `BatchUtils.doCopyFileAction`:
 * skip-if-same-length, copy via a temp file, length-verify, atomic rename
 * into place, preserve mtime, 3 retries with backoff. Spark has no raw-file
 * copy operator, so this is deliberate custom `mapPartitions` code — the
 * one place imperative I/O belongs. Speculative execution must stay off for
 * copy jobs (side effects), as the reference enforces
 * (`MetastoreReplicationJob.java:251-258`).
 *
 * Scale: the input is a `Dataset[FileEntry]`; `repartition(parallelism)`
 * spreads files round-robin (replacing the reference's murmur3(size,mtime)
 * shuffle-key balancing, `Stage2DirectoryCopyMapper.java:116-125`).
 */
object CopyExec {

  val MaxRetries = 3

  /** Copy one file with the full protocol (exposed for external copy
    * pipelines like BatchReplication stage 2). */
  def copyOnePublic(fs: FileSystem, conf: Configuration,
      srcRoot: String, destRoot: String, f: FileEntry,
      verifyChecksum: Boolean = false): CopyResult =
    copyOne(fs, conf, srcRoot, destRoot, f, verifyChecksum)

  /** Content digest for checksum-level comparison. The reference compares
    * Hadoop `FileChecksum`s (`batch/BatchUtils.java:105-111`), which many
    * stores (LocalFileSystem, most object stores) don't expose — so the
    * checksum level computes an MD5 of the bytes instead, which works on
    * any store at the cost of a read. Config-gated off by default. */
  private def md5(fs: FileSystem, p: Path): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) md.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    md.digest()
  }

  private def copyOne(fs: FileSystem, conf: Configuration,
      srcRoot: String, destRoot: String, f: FileEntry,
      verifyChecksum: Boolean = false): CopyResult = {
    val src = new Path(srcRoot, f.relPath)
    val dest = new Path(destRoot, f.relPath)
    // a UUID, not the thread id: thread ids are per-JVM, so two executors
    // retrying the same file against a shared store could collide on the
    // staging name mid-write
    val tmp = new Path(destRoot,
      s".graft-tmp/${f.relPath}.${java.util.UUID.randomUUID().toString.take(8)}")
    var attempt = 0
    var last: Throwable = null
    while (attempt < MaxRetries) {
      try {
        val srcStatus = fs.getFileStatus(src)
        if (fs.exists(dest) && fs.getFileStatus(dest).getLen == srcStatus.getLen &&
            (!verifyChecksum ||
              java.util.Arrays.equals(md5(fs, src), md5(fs, dest)))) {
          return CopyResult(f.relPath, "SKIPPED", 0L)
        }
        fs.mkdirs(tmp.getParent)
        FileUtil.copy(fs, src, fs, tmp, false, true, conf)
        val copiedLen = fs.getFileStatus(tmp).getLen
        if (copiedLen != srcStatus.getLen) {
          fs.delete(tmp, false)
          throw new java.io.IOException(
            s"length mismatch after copy: $copiedLen != ${srcStatus.getLen}")
        }
        // post-copy verify: a corrupted copy is deleted and retried
        // (re-copied), matching `BatchUtils.java:105-111`
        if (verifyChecksum &&
            !java.util.Arrays.equals(md5(fs, src), md5(fs, tmp))) {
          fs.delete(tmp, false)
          throw new java.io.IOException(s"checksum mismatch after copy of $src")
        }
        fs.mkdirs(dest.getParent)
        if (fs.exists(dest)) fs.delete(dest, false)
        if (!fs.rename(tmp, dest)) {
          throw new java.io.IOException(s"rename $tmp -> $dest failed")
        }
        fs.setTimes(dest, srcStatus.getModificationTime, -1)
        return CopyResult(f.relPath, "COPIED", srcStatus.getLen)
      } catch {
        case e: Throwable =>
          last = e
          attempt += 1
          Thread.sleep(math.min(1000L << attempt, 8000L))
      }
    }
    // best-effort staging cleanup: the UUID name is unique to this call,
    // so an abandoned tmp would otherwise linger under .graft-tmp forever
    try fs.delete(tmp, false) catch { case _: Throwable => () }
    CopyResult(f.relPath, s"FAILED: ${last.getMessage}", 0L)
  }

  /** Copy every manifest file from srcRoot to destRoot, distributed. */
  def copyFiles(spark: SparkSession, manifest: Dataset[FileEntry],
      srcRoot: String, destRoot: String, parallelism: Int = 32,
      verifyChecksum: Boolean = false): Dataset[CopyResult] = {
    import spark.implicits._
    manifest.repartition(parallelism).mapPartitions { it =>
      val conf = new Configuration()
      val fs = new Path(destRoot).getFileSystem(conf)
      it.map(f => copyOne(fs, conf, srcRoot, destRoot, f, verifyChecksum))
    }
  }

  /**
   * Directory replication driver (reference `DistCpWrapper.run`,
   * `utils/common/DistCpWrapper.java:41-220`): manifest-diff first, copy
   * only missing/size-mismatched files, optionally delete dest-only files;
   * small jobs short-circuit through a driver-side loop (the "local copy"
   * path, threshold <256MB && <100 files).
   */
  def syncDir(spark: SparkSession, srcRoot: String, destRoot: String,
      deleteExtra: Boolean = true, parallelism: Int = 32,
      localCopyBytes: Long = 256L << 20, localCopyFiles: Long = 100L,
      verifyChecksum: Boolean = false): SyncStats = {
    import spark.implicits._
    val src = FsOps.listFiles(spark, srcRoot, parallelism)
    val dest = FsOps.listFiles(spark, destRoot, parallelism)
    val joined = src.as("s").joinWith(dest.as("d"),
      col("s.relPath") === col("d.relPath"), "full_outer")
    // checksum level: a same-size dest file may still be corrupt, so every
    // src file flows to the copy stage, whose skip decision compares
    // digests (copyOne) instead of the size-only manifest diff
    val toCopy = joined.flatMap {
      case (s, d) if s != null &&
        (d == null || d.size != s.size || verifyChecksum) => Some(s)
      case _ => None
    }
    val extras = joined.flatMap {
      case (s, d) if s == null => Some(d.relPath)
      case _ => None
    }

    val (nFiles, nBytes) = {
      val r = toCopy.groupBy().agg(count(lit(1)), coalesce(sum("size"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // (copied, skipped, bytesCopied, nFailed, firstFailure). Large dirs
    // aggregate results distributed and collect only a bounded failure
    // sample — per-file rows never reach the driver (100-TB rule); the
    // driver loop below the local-copy threshold is bounded by definition.
    val (copied, skipped, bytesCopied, nFailed, firstFailure) =
      if (nFiles == 0) (0L, 0L, 0L, 0L, "")
      else if (nFiles < localCopyFiles && nBytes < localCopyBytes) {
        // small dir: driver-side loop beats a distributed job (reference
        // local-copy threshold, DistCpWrapperOptions.java:41-42)
        val conf = new Configuration()
        val fs = new Path(destRoot).getFileSystem(conf)
        val rs = toCopy.collect().toSeq
          .map(f => copyOne(fs, conf, srcRoot, destRoot, f, verifyChecksum))
        (rs.count(_.status == "COPIED").toLong,
          rs.count(_.status == "SKIPPED").toLong,
          rs.filter(_.status == "COPIED").map(_.bytes).sum,
          rs.count(_.status.startsWith("FAILED")).toLong,
          rs.find(_.status.startsWith("FAILED")).map(_.status).getOrElse(""))
      } else {
        // persist so the bounded failure-sample read doesn't re-run the
        // (idempotent but expensive) copy pass
        val res = copyFiles(spark, toCopy, srcRoot, destRoot, parallelism,
          verifyChecksum).persist()
        try {
          val row = res.agg(
            count(when(col("status") === "COPIED", 1)),
            count(when(col("status") === "SKIPPED", 1)),
            coalesce(sum(when(col("status") === "COPIED", col("bytes"))), lit(0L)),
            count(when(col("status").startsWith("FAILED"), 1))).head()
          val sample =
            if (row.getLong(3) == 0) ""
            else res.filter(col("status").startsWith("FAILED"))
              .select("status").take(1).headOption.map(_.getString(0)).getOrElse("")
          (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), sample)
        } finally {
          res.unpersist()
          ()
        }
      }

    // deletes execute where the listing lives, like the copies; the driver
    // sees one count per partition
    val deleted =
      if (!deleteExtra) 0L
      else extras.repartition(parallelism).mapPartitions { it =>
        val conf = new Configuration()
        val fs = new Path(destRoot).getFileSystem(conf)
        Iterator.single(it.count(rel => fs.delete(new Path(destRoot, rel), false)).toLong)
      }.agg(coalesce(sum("value"), lit(0L))).head().getLong(0)
    // clean tmp staging dir
    val fsDest = new Path(destRoot).getFileSystem(new Configuration())
    fsDest.delete(new Path(destRoot, ".graft-tmp"), true)

    if (nFailed > 0) {
      throw new java.io.IOException(
        s"$nFailed copies failed, first: $firstFailure")
    }
    SyncStats(copied, skipped, deleted, bytesCopied)
  }

  /** J3 equality: same visible relPaths with same sizes on both roots
    * (reference `FsUtils.equalDirs`, `utils/common/FsUtils.java:270-381`). */
  def equalDirs(spark: SparkSession, srcRoot: String, destRoot: String): Boolean = {
    import spark.implicits._
    val src = FsOps.listFiles(spark, srcRoot)
    val dest = FsOps.listFiles(spark, destRoot)
    val mismatches = src.as("s").joinWith(dest.as("d"),
        col("s.relPath") === col("d.relPath"), "full_outer")
      .filter(p => p._1 == null || p._2 == null || p._1.size != p._2.size)
    mismatches.isEmpty
  }
}

final case class SyncStats(copied: Long, skipped: Long, deleted: Long, bytesCopied: Long)
