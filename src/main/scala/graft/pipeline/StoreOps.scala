package graft.pipeline

import org.apache.spark.sql.SparkSession

/**
 * Shared on-disk store machinery for the persisted text indexes
 * ([[SsjIndex]], [[LshIndex]]) — one implementation of the protocol
 * both carry: the atomic one-line sidecar (tmp-write + rename, used
 * for the admission high-water mark and the streaming epoch-id
 * records), the staged rename-aside store swap with crash recovery
 * (`<store>.next` staged → live renamed aside to `<store>.old` →
 * promote → drop aside; a complete store exists at every crash point
 * and [[recoverStores]] finishes any interruption), the mandatory
 * post-mutation listing-cache invalidation, and the deletion sidecar
 * (redo log / burn registry) layout. Factored so a protocol fix can
 * never silently miss one index twin.
 */
private[graft] object StoreOps {

  def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- atomic one-line long sidecars -------------------------------------

  def readLongSidecar(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, what: String): Long = {
    val in = fs.open(p)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    require(s.nonEmpty && s.forall(_.isDigit), s"corrupt $what at $p: '$s'")
    s.toLong
  }

  def writeLongSidecar(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, v: Long, what: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$p.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"could not publish the $what to $p")
  }

  // ---- admission high-water mark -----------------------------------------

  def hwmPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/admit.hwm")

  /** Strict read — absent mark refuses loudly with index-specific
    * `guidance` on how to restore consistency. */
  def readHwm(spark: SparkSession, dir: String, guidance: String): Long = {
    val p = hwmPath(dir)
    val fs = fsOf(spark, dir)
    require(fs.exists(p),
      s"no admission high-water mark at $p — $guidance")
    readLongSidecar(fs, p, "admission high-water sidecar")
  }

  def writeHwm(spark: SparkSession, dir: String, v: Long): Unit =
    writeLongSidecar(fsOf(spark, dir), hwmPath(dir), v,
      "admission high-water mark")

  // ---- staged rename-aside swaps -----------------------------------------

  /** Returns true when a promote (live-path mutation) happened. */
  def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, store: String): Boolean = {
    val live = new org.apache.hadoop.fs.Path(s"$dir/$store")
    val next = new org.apache.hadoop.fs.Path(s"$dir/$store.next")
    val old = new org.apache.hadoop.fs.Path(s"$dir/$store.old")
    val promoted =
      if (!fs.exists(live) && fs.exists(next)) {
        // live moved aside but the promote never ran: .next is a
        // COMPLETE replacement (staging finished before the swap
        // began) — promote
        val renamed = fs.rename(next, live)
        require(renamed || fs.exists(live),
          s"swap recovery failed: could not promote $next to $live")
        true
      } else false
    if (fs.exists(live)) {
      // crash after promote (drop the aside) or mid-staging (drop the
      // incomplete staging dir — the op that wrote it will re-stage)
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(next)) fs.delete(next, true)
    }
    promoted
  }

  /** Finish any interrupted store swap — run by every entry point. */
  def recoverStores(spark: SparkSession, dir: String,
      stores: Seq[String]): Unit = {
    val fs = fsOf(spark, dir)
    val promoted = stores.map(recoverSwap(fs, dir, _))
    if (promoted.contains(true)) refreshStores(spark, dir, stores)
  }

  def swapStore(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, store: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$dir/$store")
    val next = new org.apache.hadoop.fs.Path(s"$dir/$store.next")
    val old = new org.apache.hadoop.fs.Path(s"$dir/$store.old")
    require(fs.rename(live, old),
      s"store swap failed: could not rename $live aside to $old")
    require(fs.rename(next, live),
      s"store swap failed: could not promote $next to $live — " +
        s"$old holds the previous store; the next index call recovers")
    fs.delete(old, true)
  }

  /** Invalidate the session's file-listing cache and recache any
    * cached plans over the stores — MANDATORY after every in-place
    * store mutation (partition rewrite, rename-aside swap, state
    * prune, lifecycle restart): Spark's shared leaf-file cache has no
    * TTL, so a later `spark.read.parquet(store)` would otherwise
    * resolve against the pre-mutation listing and read deleted files
    * (FAILED_READ_FILE.FILE_NOT_EXIST — or worse, silently stale
    * data). */
  def refreshStores(spark: SparkSession, dir: String,
      stores: Seq[String]): Unit = {
    org.apache.spark.sql.graft.FileListingBridge.invalidateListings(spark)
    stores.foreach(s => spark.catalog.refreshByPath(s"$dir/$s"))
  }

  // ---- deletion sidecar (redo log / burn registry) -----------------------

  def deletedSidecar(dir: String, id: Long) =
    new org.apache.hadoop.fs.Path(s"$dir/deleted/batch=$id")

  /** Burned ids recorded as deletion sidecars. Bounded by the number
    * of deletions ever run, never by data. */
  def sidecarBurnedIds(spark: SparkSession, dir: String): Set[Long] = {
    val fs = fsOf(spark, dir)
    val del = new org.apache.hadoop.fs.Path(s"$dir/deleted")
    if (!fs.exists(del)) Set.empty[Long]
    else fs.listStatus(del).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).toSet
  }
}
