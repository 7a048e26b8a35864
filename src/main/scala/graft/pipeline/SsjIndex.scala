package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Persisted exact set-similarity-join index — the steady-state home of
 * [[Dedup.setSimilarityJoinIncremental]]. The frame-based incremental
 * join is exact but recomputes the global token-frequency order AND
 * every document's prefix from the full corpus on every batch; at
 * 100 TB those two linear scans dominate the per-batch cost and break
 * the "batch cost independent of corpus size" contract the other
 * incremental paths keep. This index persists both as on-disk state
 * (the [[Similarity.buildIvfIndex]] sidecar discipline) so an
 * admission touches only the increment plus state tables:
 *
 * {{{
 *   dir/meta          one-row parquet: (tau_milli, buckets)
 *   dir/order         FROZEN (tok, tf) table — the build-time global
 *                     token order every stored prefix was ranked under
 *   dir/freq/cum=N    RUNNING (tok, tf) table folded through batch N —
 *                     exact grouped-sum merge per admission (the
 *                     [[CardSketch.hllMerge]] shape: state ⊕ increment,
 *                     never a corpus rescan); pruned by [[gcFreqState]]
 *   dir/prefix        (doc_id, tok, len) prefix rows, partitioned by
 *                     (batch, pb = hash-bucket of tok)
 *   dir/docs          (doc_id, toks sorted-distinct, len) token sets,
 *                     partitioned by (batch, db = hash-bucket of doc_id)
 *   dir/deleted       (doc_id, toks) per burned id, partitioned by
 *                     batch — each deletion's redo log, burn registry,
 *                     and the replayed-admission victim screen
 *   dir/admit.hwm     admission high-water mark (one line; the
 *                     fresh-checkpoint-restart guard)
 * }}}
 *
 * CORRECTNESS UNDER THE FROZEN ORDER: the prefix-filter theorem needs
 * every document's prefix ranked under ONE consistent total order —
 * which order is irrelevant (rare-first only buys join selectivity,
 * never recall). Stored prefixes are therefore ranked under the
 * build-time `dir/order` table forever (tokens unseen at build rank
 * with tf = 0, rarest-first — still deterministic and still the SAME
 * rule for every batch), so old prefixes never rewrite when counts
 * drift. The RUNNING `freq/cum=N` table is maintained exactly anyway:
 * it is the drift signal ([[stats]]) and the input to a periodic
 * [[rebuildPrefixes]], which re-ranks the stored token sets under the
 * current counts WITHOUT rescanning raw text.
 *
 * PER-BATCH COST: tokenize the increment; fold the vocab-sized freq
 * state; rank the increment's own prefixes (a window over increment
 * rows only); one equi-join of increment prefixes against the stored
 * prefix table restricted to the hash-buckets the increment's prefix
 * tokens touch (partition pruning — a trickle batch reads a few
 * buckets, never the store); exact verify against the docs store
 * restricted to the candidate documents' buckets. Nothing re-reads or
 * re-tokenizes old raw text, and no full-corpus window ever runs.
 *
 * EXACTLY-ONCE BY LAYOUT ([[Similarity.extendIvfIndex]]'s contract):
 * batch writes are dynamic partition overwrites scoped to `batch=N`,
 * so a replayed admission replaces its own partitions; an explicit id
 * at or below the high-water mark is refused unless
 * `allowReplay = true`.
 *
 * STORAGE LIFECYCLE (the [[Similarity.compactIvfIndex]] discipline):
 * at streaming cadence the stores accumulate one `batch=N` partition
 * set per epoch and one vocab-sized `cum=N` table per admission.
 * [[gcFreqState]] prunes superseded freq tables; [[compact]] folds the
 * prefix/docs stores to `batch=0` (purging deletion tombstones),
 * bounds files per bucket, and restarts the admission lifecycle — all
 * swaps are staged rename-asides ([[recoverStores]] finishes any
 * interrupted swap, so a complete store exists at every crash point).
 * Maintenance ops (delete / gcFreqState / compact / rebuildPrefixes)
 * run QUIESCED — they are the index's single writer for their
 * duration, the same operating contract as IVF compaction.
 */
object SsjIndex {

  private final case class SsjMeta(tauMilli: Int, buckets: Int)

  private def writeMeta(spark: SparkSession, dir: String,
      m: SsjMeta): Unit = {
    import spark.implicits._
    Seq((m.tauMilli, m.buckets)).toDF("tau_milli", "buckets")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMeta(spark: SparkSession, dir: String): SsjMeta = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no set-join index meta at $dir/meta — SsjIndex.build first")
    val r = spark.read.parquet(p.toString).head()
    val m = SsjMeta(r.getAs[Int]("tau_milli"), r.getAs[Int]("buckets"))
    require(m.tauMilli >= 1 && m.tauMilli <= 1000 && m.buckets >= 1,
      s"corrupt set-join index meta at $dir/meta: $m")
    m
  }

  private val DeletionMarker = "_deletion"

  private def hwmPath(dir: String) = StoreOps.hwmPath(dir)

  private def fsOf(spark: SparkSession, dir: String) =
    StoreOps.fsOf(spark, dir)

  private def readHwm(spark: SparkSession, dir: String): Long =
    StoreOps.readHwm(spark, dir,
      "either SsjIndex.build never ran, or a maintenance pass " +
        "(compact/rebuildPrefixes) was interrupted mid-swap; re-run " +
        "that maintenance op to restore a consistent index")

  /** The mark, tolerating the compact/rebuild crash window where the
    * file is deliberately absent: fall back to the largest `cum=` dir
    * (the freq store is untouched inside those windows, so the largest
    * cum IS the pre-maintenance mark). Only the maintenance ops that
    * own that window use this — ordinary admissions/lookups keep the
    * strict loud-refusal read. */
  private def readHwmOrFallback(spark: SparkSession, dir: String): Long = {
    val fs = fsOf(spark, dir)
    if (fs.exists(hwmPath(dir))) readHwm(spark, dir)
    else {
      val freq = new org.apache.hadoop.fs.Path(s"$dir/freq")
      require(fs.exists(freq),
        s"no freq store at $freq — the index at $dir was never built " +
          "or a build crashed; SsjIndex.build first")
      val cums = fs.listStatus(freq).map(_.getPath.getName)
        .filter(_.startsWith("cum=")).map(_.stripPrefix("cum=").toLong)
      require(cums.nonEmpty,
        s"empty freq store at $freq — rebuild the index")
      cums.max
    }
  }

  private def writeHwm(spark: SparkSession, dir: String, v: Long): Unit =
    StoreOps.writeHwm(spark, dir, v)

  // staged-swap machinery + listing-cache invalidation — [[StoreOps]],
  // shared with [[LshIndex]]
  private val SwappableStores = Seq("order", "prefix", "docs", "freq")

  /** Finish any interrupted store swap — run by every entry point. */
  private[pipeline] def recoverStores(spark: SparkSession,
      dir: String): Unit =
    StoreOps.recoverStores(spark, dir, SwappableStores)

  private def refreshStores(spark: SparkSession, dir: String): Unit =
    StoreOps.refreshStores(spark, dir, SwappableStores)

  // ---------------------------------------------------------------------
  // deletion sidecar: dir/deleted/batch=N holds the (doc_id, toks) rows
  // the deletion that burned id N removed — written FIRST, so a crashed
  // delete replays from its own record, a replayed admission screens
  // out later takedowns, and the burn registry survives freq-state GC.
  // ---------------------------------------------------------------------

  private def deletedSidecar(dir: String, id: Long) =
    StoreOps.deletedSidecar(dir, id)

  private def isBurned(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, id: Long): Boolean =
    fs.exists(deletedSidecar(dir, id)) ||
      fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/freq/cum=$id/$DeletionMarker"))

  /** Every burned (deletion) id on record — sidecar batches plus any
    * legacy in-cum markers. Bounded by the number of deletions ever
    * run, never by data. */
  private[graft] def burnedIds(spark: SparkSession, dir: String): Set[Long] = {
    val fs = fsOf(spark, dir)
    val fromSidecar = StoreOps.sidecarBurnedIds(spark, dir)
    val freq = new org.apache.hadoop.fs.Path(s"$dir/freq")
    val fromMarkers =
      if (!fs.exists(freq)) Set.empty[Long]
      else fs.listStatus(freq).map(_.getPath.getName)
        .filter(_.startsWith("cum=")).map(_.stripPrefix("cum=").toLong)
        .filter(id => fs.exists(new org.apache.hadoop.fs.Path(
          s"$dir/freq/cum=$id/$DeletionMarker"))).toSet
    fromSidecar ++ fromMarkers
  }

  /** The admitted high-water mark (strict read) — for callers outside
    * this object that derive admission ids ([[graft.streaming.StreamingSsjAdmit]]). */
  private[graft] def admittedHwm(spark: SparkSession, dir: String): Long =
    readHwm(spark, dir)

  private def pendingDelete(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, hwm: Long): Boolean =
    isBurned(fs, dir, hwm + 1)

  /**
   * Complete the deletion that burns `hwm + 1`, from its sidecar
   * record — every step idempotent, so this is both the tail of a
   * fresh [[delete]] and the recovery for one that crashed at any
   * point after the sidecar landed: the freq fold overwrites `cum =
   * hwm+1` from `cum = hwm` (inputs unchanged by the crash), the docs
   * rewrite removes whichever victims are still present, and the mark
   * advances last.
   */
  private def finishDelete(spark: SparkSession, dir: String,
      hwm: Long): Unit = {
    val meta = readMeta(spark, dir)
    val burnId = hwm + 1
    val fs = fsOf(spark, dir)
    require(fs.exists(deletedSidecar(dir, burnId)),
      s"cannot finish the deletion burning id $burnId: no victim " +
        s"record at ${deletedSidecar(dir, burnId)} (a pre-sidecar " +
        "deletion crashed mid-flight) — re-run SsjIndex.delete with " +
        "the same ids, or rebuild the index")
    val victims = Dedup.persistInternal("ssjidx_findel_victims",
      spark.read.parquet(deletedSidecar(dir, burnId).toString)
        .select(col("doc_id"), col("toks")))
    // 1) fold the victims' counts OUT of the running state (exact
    //    grouped subtraction from cum=hwm — the admission fold's
    //    inverse; idempotent overwrite of cum=hwm+1)
    val negCounts = victims.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    spark.read.parquet(s"$dir/freq/cum=$hwm")
      .select(col("tok"), col("tf").as("__a"))
      .join(negCounts.select(col("tok"), col("tf").as("__b")),
        Seq("tok"), "left_outer")
      .select(col("tok"),
        (col("__a") - coalesce(col("__b"), lit(0L))).as("tf"))
      .filter(col("tf") > 0)
      .write.mode("overwrite").parquet(s"$dir/freq/cum=$burnId")
    // legacy marker kept alongside the sidecar (older indexes check it)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/freq/cum=$burnId/$DeletionMarker"), true).close()
    // 2) surgical docs-store rewrite: touched (batch, db) partitions
    //    only. Dynamic overwrite replaces partitions PRESENT in the
    //    written data, so a partition whose every row is a victim must
    //    be dropped explicitly — it would otherwise survive untouched.
    //    Victims already gone (a crashed predecessor got this far)
    //    simply produce no touched partitions.
    val ids = victims.select("doc_id")
    val touchedDb = ids.select(db(meta.buckets).as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val docsP = s"$dir/docs"
    val touched = Dedup.persistInternal("ssjidx_findel_rows",
      spark.read.parquet(docsP)
        .filter(col("db").isin(touchedDb: _*))
        .join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          col("batch").cast("long").as("batch"),
          col("db").cast("long").as("db")))
    val touchedPairs = touched.select("batch", "db").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (touchedPairs.nonEmpty) {
      val survivors = spark.read.parquet(docsP)
        .filter(col("db").isin(touchedDb: _*))
        .withColumn("batch", col("batch").cast("long"))
        .withColumn("db", col("db").cast("long"))
        .join(touched.select("batch", "db").distinct(), Seq("batch", "db"),
          "left_semi")
        .join(ids, Seq("doc_id"), "left_anti")
      // surviving partitions are counted BEFORE the rewrite: the plan's
      // file listing is of the pre-write store, and re-evaluating it
      // after the overwrite would read deleted files
      val kept = survivors.select("batch", "db").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      survivors
        .repartition(col("db"))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "db").parquet(docsP)
      touchedPairs.filterNot(kept).foreach { case (b, d) =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$docsP/batch=$b/db=$d"), true)
      }
    }
    refreshStores(spark, dir) // in-place docs rewrite + cum overwrite
    writeHwm(spark, dir, burnId)
  }

  /** `(doc_id, toks sorted-distinct, len)` — the family's token-set
    * shape ([[Dedup.ssjVerifySets]] consumes it as-is). */
  private def setsFrame(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        sort_array(array_distinct(TextAnalysis.tokens(col(textCol))))
          .as("toks"))
      .withColumn("len", size(col("toks")))

  /** Prefix rows of `sets` ranked under `order` (tokens absent from the
    * order table rank with tf = 0 — rarest, deterministically): keep
    * each doc's first `len − ⌈τ·len⌉ + 1` tokens by (tf, tok). The
    * window partitions by doc_id over THESE rows only — increment-sized
    * at admission, never the corpus. */
  private def prefixRows(sets: DataFrame, order: DataFrame,
      tauMilli: Int): DataFrame = {
    val toks = sets.select(col("doc_id"), col("len"),
      explode(col("toks")).as("tok"))
    val wPos = Window.partitionBy("doc_id").orderBy(col("tf"), col("tok"))
    toks.join(order, Seq("tok"), "left_outer")
      .withColumn("tf", coalesce(col("tf"), lit(0L)))
      .withColumn("pos", row_number().over(wPos))
      .filter(col("pos") <=
        col("len") - expr(s"($tauMilli * len + 999) div 1000") + 1)
      .select(col("doc_id"), col("tok"), col("len"))
  }

  private def pb(buckets: Int) =
    pmod(xxhash64(col("tok")), lit(buckets.toLong))
  private def db(buckets: Int) =
    pmod(xxhash64(col("doc_id")), lit(buckets.toLong))

  /**
   * Build the index over the initial corpus: one tokenize, one grouped
   * frequency count (written as both the frozen order and `freq/cum=0`),
   * one prefix window, two partitioned stores. `buckets` sizes the
   * token- and doc-hash partition fan-out — the partition-pruning
   * granularity for trickle admissions (64 default; raise toward 1024
   * on a large cluster so a small batch reads a small fraction of the
   * store).
   */
  def build(docs: DataFrame, dir: String, tauMilli: Int,
      buckets: Int = 64, idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    require(tauMilli >= 1 && tauMilli <= 1000,
      s"tauMilli must be in [1,1000], got $tauMilli")
    require(buckets >= 1 && buckets <= 4096,
      s"buckets must be in [1,4096], got $buckets")
    val spark = docs.sparkSession
    // a REBUILD restarts admission ids: drop the mark first so a crash
    // mid-build leaves an index that refuses admissions loudly (no hwm)
    // rather than one that silently admits over half-written stores
    locally {
      val fs = fsOf(spark, dir)
      fs.delete(hwmPath(dir), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/admit.hwm.tmp"), false)
      // stale state from a previous lifecycle must not survive into
      // this one: cum=0 below only overwrites ITS path, and the store
      // writes rely on STATIC overwrite truncation — under a session
      // whose global partitionOverwriteMode default is "dynamic" a
      // plain overwrite would leave the old lifecycle's batch=1..N
      // partitions alive, so delete the dirs outright (staging/aside
      // leftovers and the burn registry included — burned ids are an
      // admission-lifecycle concept and this starts a new lifecycle)
      (Seq("freq", "prefix", "docs", "deleted") ++
        SwappableStores.flatMap(s => Seq(s"$s.next", s"$s.old")))
        .foreach(d =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$d"), true))
      refreshStores(spark, dir) // a previous lifecycle's listings die
    }
    val sets = Dedup.persistInternal("ssjidx_build_sets",
      setsFrame(docs, idCol, textCol))
    val freq = sets.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    freq.write.mode("overwrite").parquet(s"$dir/order")
    // cum=0 == the order table; re-read so both copies share one job
    val order = spark.read.parquet(s"$dir/order")
    order.write.mode("overwrite").parquet(s"$dir/freq/cum=0")
    // repartition BY the bucket column before every partitioned write:
    // otherwise each of the shuffle-partition tasks writes into every
    // bucket dir (tasks x buckets tiny files), which was measured to
    // dominate both the write and every downstream pruned read
    prefixRows(sets, order, tauMilli)
      .withColumn("batch", lit(0L)).withColumn("pb", pb(buckets))
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("batch", "pb")
      .parquet(s"$dir/prefix")
    sets
      .withColumn("batch", lit(0L)).withColumn("db", db(buckets))
      .repartition(col("db"))
      .write.mode("overwrite").partitionBy("batch", "db")
      .parquet(s"$dir/docs")
    writeMeta(spark, dir, SsjMeta(tauMilli, buckets))
    writeHwm(spark, dir, 0L)
  }

  /** The stored prefix table outside `excludeBatch`, pruned to the
    * hash-buckets in `touchedPb` — the admission's corpus-side read
    * (factored out so the spec can pin the partition pruning). */
  private[graft] def storedPrefixes(spark: SparkSession, dir: String,
      excludeBatch: Long, touchedPb: Seq[Long]): DataFrame =
    spark.read.parquet(s"$dir/prefix")
      .filter(col("batch") =!= excludeBatch &&
        col("pb").isin(touchedPb: _*))
      .select("doc_id", "tok", "len")

  /** The stored token sets outside `excludeBatch`, pruned to the
    * doc-hash buckets in `touchedDb` — the verify-side read. */
  private[graft] def storedSets(spark: SparkSession, dir: String,
      excludeBatch: Long, touchedDb: Seq[Long]): DataFrame =
    spark.read.parquet(s"$dir/docs")
      .filter(col("batch") =!= excludeBatch &&
        col("db").isin(touchedDb: _*))
      .select("doc_id", "toks", "len")

  /**
   * Admit a batch and return the EXACT Jaccard ≥ τ pairs that touch it
   * (`(doc_a, doc_b, jaccard)`, doc_a < doc_b — the
   * [[Dedup.setSimilarityJoinIncremental]] contract, including the
   * increment's internal pairs). Old×old pairs are never probed, old
   * text is never re-read: the batch tokenizes once; the running freq
   * table folds by exact grouped sum; the increment's prefixes rank in
   * an increment-local window under the frozen order; the candidate
   * join reads only the prefix-store buckets the increment's (rare)
   * prefix tokens hash into; the verify reads only the docs-store
   * buckets of actual candidates. Both bucket lists are collected
   * driver-side — bounded by `buckets`, never by data.
   *
   * Crash/replay: state writes land before the mark advances, each
   * scoped to `batch=id` partitions (or the `cum=id` path), so a
   * retried or replayed admission overwrites its own partial state and
   * returns the same pairs. Ids at or below the mark are refused
   * without `allowReplay = true` — a fresh caller reusing ids would
   * silently overwrite earlier admissions otherwise. A REPLAYED epoch
   * additionally screens out documents a deletion took down AFTER its
   * id (the `dir/deleted` registry): without the screen, an epoch that
   * crashed post-admit and was replayed after a takedown would re-land
   * its original partitions and resurrect the victims.
   *
   * The returned pairs are MATERIALIZED (eager localCheckpoint, the
   * lineage to the store cut) before this method returns: the result
   * is a fixed value, safe to consume after later admissions mutate
   * the store — a lazy or merely-cached plan would silently pick up
   * the newer batches' rows on its corpus side when evicted/recached.
   */
  def admit(newDocs: DataFrame, dir: String, batchId: Option[Long] = None,
      allowReplay: Boolean = false, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = newDocs.sparkSession
    recoverStores(spark, dir)
    val meta = readMeta(spark, dir)
    val fs = fsOf(spark, dir)
    // a crashed deletion left its sidecar + burn state but never
    // advanced the mark: finish it first (idempotent, victim record on
    // disk) so this admission sees the post-deletion state
    val hwm = {
      val h = readHwm(spark, dir)
      if (pendingDelete(fs, dir, h)) { finishDelete(spark, dir, h); h + 1 }
      else h
    }
    val id = batchId.getOrElse(hwm + 1L)
    require(id > 0, s"batch ids above 0 are admissions; 0 is the build ($id)")
    require(allowReplay || id > hwm,
      s"SsjIndex.admit: batch id $id is not above the admission " +
        s"high-water mark $hwm. A legitimate retry/replay must pass " +
        "allowReplay = true; a new feed restarted from scratch is about " +
        "to overwrite earlier admissions — refusing.")
    // a deletion burns its id: an admission landing there — even a
    // declared replay (a live stream whose next epoch id collides) —
    // would rewrite cum=id from the PRE-deletion cum=id−1 and
    // silently resurrect the deleted documents' counts
    require(!isBurned(fs, dir, id),
      s"SsjIndex.admit: batch id $id was burned by a deletion — " +
        "admitting here would resurrect the deleted documents' " +
        "counts. Continue the feed above the mark (StreamingSsjAdmit's " +
        "auto id derivation does this; a fixed-offset stream needs a " +
        "new checkpoint with idOffset past the high-water mark), or " +
        "rebuild the index.")
    // ids must be contiguous: the fold reads cum=(id−1), so a gap
    // would die deep inside the read with a bare PATH_NOT_FOUND
    require(fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/freq/cum=${id - 1}")),
      s"SsjIndex.admit: no freq state at cum=${id - 1} — batch ids " +
        s"are contiguous (next is ${hwm + 1}); derive ids from the " +
        "admission sequence, not from event time. (A replay older " +
        "than the last two admissions may also land here after " +
        "gcFreqState pruned its input state.)")
    val sets0 = setsFrame(newDocs, idCol, textCol)
    // REPLAY SCREEN: a replayed epoch re-lands its own batch=id
    // partitions — minus any document a deletion burned AFTER this id
    // (those takedowns already folded the victims out of the freq
    // state and the docs store; re-landing them would resurrect the
    // victims while the counts keep the subtraction). Deletions at or
    // BELOW this id don't filter: a re-ingest of a previously deleted
    // document under a later id is a legitimate new admission.
    val sets = Dedup.persistInternal("ssjidx_admit_sets",
      if (allowReplay && id <= hwm &&
          fs.exists(new org.apache.hadoop.fs.Path(s"$dir/deleted"))) {
        val laterVictims = spark.read.parquet(s"$dir/deleted")
          .filter(col("batch") > id).select("doc_id")
        sets0.join(laterVictims, Seq("doc_id"), "left_anti")
      } else sets0)
    // 1) fold the running (tok, tf) state: previous cum ⊕ increment —
    //    exact by commutativity of sum, state-sized, no corpus scan.
    //    Reads cum=(id−1), never cum=id, so a replay recomputes the
    //    same output from the same input.
    val incCounts = sets.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    spark.read.parquet(s"$dir/freq/cum=${id - 1}")
      .select(col("tok"), col("tf").as("__a"))
      .join(incCounts.select(col("tok"), col("tf").as("__b")),
        Seq("tok"), "full_outer")
      .select(col("tok"),
        (coalesce(col("__a"), lit(0L)) + coalesce(col("__b"), lit(0L)))
          .as("tf"))
      .write.mode("overwrite").parquet(s"$dir/freq/cum=$id")
    // 2) increment prefixes under the FROZEN order (consistency with
    //    every stored prefix — the two-sided filter's requirement)
    val order = spark.read.parquet(s"$dir/order")
    // localCheckpoint, not persist: the admit path's reused frames
    // must carry NO lineage to the store paths — refreshStores below
    // recaches every cached plan over the stores, and a merely-cached
    // frame would be eagerly recomputed on every admission (measured
    // +40% on the dedup_setjoin_admit bench line) while a lineage-cut
    // frame costs nothing at refresh time
    val pNew = prefixRows(sets, order, meta.tauMilli)
      .localCheckpoint(true)
    // 3) land the batch (dynamic overwrite scoped to batch=id)
    pNew.withColumn("batch", lit(id)).withColumn("pb", pb(meta.buckets))
      .repartition(col("pb")) // one file per bucket dir (see build)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "pb").parquet(s"$dir/prefix")
    sets.withColumn("batch", lit(id)).withColumn("db", db(meta.buckets))
      .repartition(col("db"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "db").parquet(s"$dir/docs")
    // a REPLAY replaced this batch's existing files (and cum=id) in
    // place — the candidate/verify reads below must not resolve
    // against the pre-write listings
    refreshStores(spark, dir)
    if (id > hwm) writeHwm(spark, dir, id)
    // 4) candidates: increment prefixes × (stored ∪ increment) prefixes,
    //    stored side pruned to the buckets the increment actually touches
    val touchedPb = pNew
      .select(pb(meta.buckets).as("pb")).distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ buckets values
    // WIDTH-PINNED token exchange (the containmentPairsLsh F2 move):
    // prefix rows are tiny in bytes, so AQE's byte-based coalescing ran
    // the quadratic in-token candidate enumeration on ONE task
    // (measured r15: a ~4.4 s single-task stage inside the 9.7 s
    // dedup_setjoin_admit line). A user repartition is never coalesced;
    // the tok exchange happens for the join anyway, so the pin costs
    // nothing at scale. The store lifecycle (writes above, mark, crash
    // contracts) is untouched — this only re-widths the read-side join.
    val wParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val corpus = storedPrefixes(spark, dir, id, touchedPb)
      .unionByName(pNew)
      .repartition(wParts, col("tok"))
    val tau = meta.tauMilli
    // lineage-cut for the same reason as pNew (reads the prefix store)
    val cand =
      pNew.as("a").join(corpus.as("b"),
          col("a.tok") === col("b.tok") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          least(col("a.len"), col("b.len")) * 1000 >=
            lit(tau) * greatest(col("a.len"), col("b.len")))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct()
        .localCheckpoint(true)
    // 5) exact verify against the docs store, pruned to candidate-doc
    //    buckets (≤ buckets values, driver-bounded)
    val touchedDb = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .select(db(meta.buckets).as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val verifySets = storedSets(spark, dir, id, touchedDb)
      .unionByName(sets)
      .select(col("doc_id"), col("toks"), col("len").as("n"))
    // PIN the result: localCheckpoint materializes the pairs into
    // their own storage blocks and CUTS the lineage to the store — a
    // cached-but-lineaged frame (the previous persist-and-count form)
    // silently recomputed against the mutated store once a later
    // admission or deletion evicted or recached it. The verify's
    // candidate side is width-pinned too (each pair costs a sorted
    // intersect; checkpointed pair bytes otherwise coalesce to 1 task).
    Dedup.ssjVerifySets(cand.repartition(wParts, col("doc_a")),
      verifySets, tau).localCheckpoint(true)
  }

  /**
   * Read-only near-dup LOOKUP: exact Jaccard ≥ τ pairs between
   * `queryDocs` and the admitted corpus — nothing writes, no state
   * advances, query×query pairs are NOT reported (this is a screen —
   * "which existing documents is this candidate batch a near-dup
   * of?" — the text analogue of the contamination gate
   * [[graft.streaming.StreamingIvfAdmit.screenedSink]] runs on
   * embeddings). Query prefixes rank under the same frozen order as
   * every stored prefix, so the two-sided filter keeps the
   * no-false-negative guarantee; store reads prune to the buckets the
   * queries touch, exactly as admission does. Query ids need not be
   * disjoint from corpus ids (a re-presented admitted document simply
   * reports its J = 1 self-match).
   *
   * Output: `(q_id, doc_id, jaccard)` — query id, matched CORPUS id.
   */
  def lookup(queryDocs: DataFrame, dir: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = queryDocs.sparkSession
    recoverStores(spark, dir) // rename-only: finish interrupted swaps
    val meta = readMeta(spark, dir)
    readHwm(spark, dir) // loud refusal on a crashed mid-build index
    val sets = Dedup.persistInternal("ssjidx_lookup_sets",
      setsFrame(queryDocs, idCol, textCol))
    val order = spark.read.parquet(s"$dir/order")
    val pQ = Dedup.persistInternal("ssjidx_lookup_prefix",
      prefixRows(sets, order, meta.tauMilli))
    val touchedPb = pQ.select(pb(meta.buckets).as("pb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val stored = storedPrefixes(spark, dir, excludeBatch = -1L, touchedPb)
    val tau = meta.tauMilli
    val cand = Dedup.persistInternal("ssjidx_lookup_cand",
      pQ.as("a").join(stored.as("b"),
          col("a.tok") === col("b.tok") &&
          least(col("a.len"), col("b.len")) * 1000 >=
            lit(tau) * greatest(col("a.len"), col("b.len")))
        .select(col("a.doc_id").as("q_id"), col("b.doc_id").as("c_id"))
        .distinct())
    val touchedDb = cand
      .select(pmod(xxhash64(col("c_id")), lit(meta.buckets.toLong))
        .as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val cSets = storedSets(spark, dir, excludeBatch = -1L, touchedDb)
    // verify keeps the q and corpus sides apart (ids may collide when a
    // query IS an admitted doc — a shared sets frame would cross-wire)
    cand
      .join(sets.select(col("doc_id").as("q_id"), col("toks").as("ta"),
        col("len").as("na")), "q_id")
      .join(cSets.select(col("doc_id").as("c_id"), col("toks").as("tb"),
        col("len").as("nb")), "c_id")
      .select(col("q_id"), col("c_id"), col("na"), col("nb"),
        graft.functions.SortedIntersectCount(spark,
          col("ta"), col("tb")).as("inter"))
      .filter(col("inter") * 1000 >=
        lit(tau) * (col("na") + col("nb") - col("inter")))
      .select(col("q_id"), col("c_id").as("doc_id"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /**
   * Retract documents from the index (the takedown path): rewrite the
   * docs-store partitions the victims live in — touched `(batch, db)`
   * pairs only, never the store — and fold the victims' token counts
   * OUT of the running freq state (exact grouped subtraction, the
   * admission fold's inverse). The deletion burns the next admission
   * id for its `cum=` state so a replayed admission can never clobber
   * the subtraction, and the high-water mark advances with it.
   *
   * The victims' rows are recorded at `dir/deleted/batch=<burned id>`
   * BEFORE any state mutates — the deletion's redo log. A crash at any
   * later point is finished from that record by the next delete() or
   * admit() call (every step idempotent), so a re-run can never fold
   * the subtraction from stale state or leave the mark below the
   * burned id. The record also screens replayed admissions
   * ([[admit]]'s replay path) and keeps burned ids on the books after
   * [[gcFreqState]] prunes old freq tables.
   *
   * The docs store is AUTHORITATIVE: victims' prefix rows are left
   * behind as tombstones (a candidate against a tombstone dies in the
   * verify's inner join against the docs store, so results are correct
   * immediately); the next [[rebuildPrefixes]] or [[compact]] purges
   * them.
   *
   * Returns the number of documents actually removed.
   */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String = "doc_id"): Long = {
    recoverStores(spark, dir)
    val fs = fsOf(spark, dir)
    val hwm = {
      val h = readHwm(spark, dir)
      // a crashed predecessor: finish ITS deletion first, from its own
      // record — starting a fresh one here would fold from the stale
      // pre-deletion cum and overwrite the crashed burn's state
      if (pendingDelete(fs, dir, h)) { finishDelete(spark, dir, h); h + 1 }
      else h
    }
    val meta = readMeta(spark, dir)
    val victims = Dedup.persistInternal("ssjidx_del_ids",
      ids.select(col(idCol).as("doc_id")).distinct())
    val touchedDb = victims
      .select(db(meta.buckets).as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // partition columns read back with inferred types (an int-sized
    // batch value infers IntegerType) — cast for stable collects/joins
    val touched = Dedup.persistInternal("ssjidx_del_rows",
      spark.read.parquet(s"$dir/docs")
        .filter(col("db").isin(touchedDb: _*))
        .join(victims, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("toks")))
    val nVictims = touched.count()
    if (nVictims == 0) return 0L
    // the redo log lands FIRST: everything after is recoverable from it
    touched.withColumn("batch", lit(hwm + 1)).repartition(1)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(s"$dir/deleted")
    finishDelete(spark, dir, hwm)
    nVictims
  }

  /**
   * Prune superseded running-frequency tables: every admission writes
   * a full vocab-sized `cum=N` snapshot, and only the LATEST is ever
   * read going forward — at streaming cadence the rest are a
   * vocab-sized-table-per-epoch storage leak. Keeps `cum=hwm` (the
   * live state), `cum=hwm−1` (the fold input of a replayed
   * last-uncommitted epoch — Structured Streaming replays at most
   * one), and any pending `cum=hwm+1` deletion state; deletes
   * everything older. Burned-id bookkeeping survives in `dir/deleted`
   * (for a legacy marker-only burn, the data files are dropped but the
   * marker is kept). Runs quiesced, like every maintenance op.
   *
   * Returns the number of state tables pruned.
   */
  def gcFreqState(spark: SparkSession, dir: String): Int = {
    recoverStores(spark, dir)
    val fs = fsOf(spark, dir)
    val hwm = readHwm(spark, dir)
    val freq = new org.apache.hadoop.fs.Path(s"$dir/freq")
    require(fs.exists(freq), s"no freq store at $freq — build first")
    var pruned = 0
    fs.listStatus(freq).map(_.getPath).filter(
        _.getName.startsWith("cum=")).foreach { p =>
      val k = p.getName.stripPrefix("cum=").toLong
      if (k < hwm - 1) {
        val marker = new org.apache.hadoop.fs.Path(
          s"$p/$DeletionMarker")
        if (fs.exists(marker) && !fs.exists(deletedSidecar(dir, k))) {
          // legacy burn with no sidecar: the marker IS the only burn
          // record — drop the data files, keep the marker
          fs.listStatus(p).map(_.getPath)
            .filter(_.getName != DeletionMarker)
            .foreach(fs.delete(_, true))
        } else fs.delete(p, true)
        pruned += 1
      }
    }
    if (pruned > 0) refreshStores(spark, dir)
    pruned
  }

  /**
   * Fold the prefix and docs stores to `batch=0`, purge deletion
   * tombstones, bound files per bucket, prune the freq store to a
   * single `cum=0`, and restart the admission lifecycle — the
   * [[Similarity.compactIvfIndex]] discipline for the set-join index.
   * At streaming cadence the stores accumulate one partition set per
   * epoch; every pruned read opens all of them, and the per-batch
   * file fan-out is the exact small-files pathology the IVF
   * compaction exists to fix.
   *
   * The prefix store is REBUILT from the docs store under the live
   * order table (not merely file-folded): the docs store is
   * authoritative, so this purges every deletion tombstone, and
   * ranking all rows under whatever single order table is live makes
   * compaction self-healing — even recovering from a crashed
   * [[rebuildPrefixes]] whose order/prefix stores were mid-swap, no
   * mixed-order prefix set can survive a compact.
   *
   * Crash-safe by the staged-swap discipline: all replacements stage
   * at `<store>.next` first; the mark is deleted before the swaps (a
   * crash mid-swap leaves an index that refuses ordinary operations
   * LOUDLY until compact re-runs — never one that silently misses
   * candidates) and rewritten (as 0) last. Every swap is rename-aside,
   * so a complete store exists at every crash point and a re-run
   * completes the job. Run QUIESCED — this is the single-writer
   * maintenance window; admission ids restart above 0, so streaming
   * feeds resume from a fresh checkpoint ([[graft.streaming.StreamingSsjAdmit]]'s
   * auto id derivation lands them correctly).
   */
  def compact(spark: SparkSession, dir: String): Unit = {
    recoverStores(spark, dir)
    val fs = fsOf(spark, dir)
    val meta = readMeta(spark, dir)
    val hwm =
      if (fs.exists(hwmPath(dir))) {
        val h = readHwm(spark, dir)
        // finish a crashed deletion first — its redo log is about to
        // be voided with the rest of the burn registry
        if (pendingDelete(fs, dir, h)) { finishDelete(spark, dir, h); h + 1 }
        else h
      } else readHwmOrFallback(spark, dir) // re-run of a crashed compact
    // ---- stage all three replacements (live index keeps serving) ----
    spark.read.parquet(s"$dir/freq/cum=$hwm")
      .write.mode("overwrite").parquet(s"$dir/freq.next/cum=0")
    val stored = Dedup.persistInternal("ssjidx_compact_sets",
      spark.read.parquet(s"$dir/docs")
        .select(col("doc_id"), col("toks"), col("len")))
    val order = spark.read.parquet(s"$dir/order")
    prefixRows(stored, order, meta.tauMilli)
      .withColumn("batch", lit(0L)).withColumn("pb", pb(meta.buckets))
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("batch", "pb")
      .parquet(s"$dir/prefix.next")
    stored
      .withColumn("batch", lit(0L)).withColumn("db", db(meta.buckets))
      .repartition(col("db"))
      .write.mode("overwrite").partitionBy("batch", "db")
      .parquet(s"$dir/docs.next")
    // ---- point of no return: invalidate, swap, restart lifecycle ----
    fs.delete(hwmPath(dir), false)
    // burned ids belong to the OLD lifecycle — void the registry
    // BEFORE the mark is rewritten, so a crash between the two can
    // never leave stale burns constraining the new id sequence
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/deleted"), true)
    StoreOps.swapStore(fs, dir, "prefix")
    StoreOps.swapStore(fs, dir, "docs")
    StoreOps.swapStore(fs, dir, "freq")
    refreshStores(spark, dir)
    writeHwm(spark, dir, 0L)
  }

  /**
   * Re-rank every stored prefix under the CURRENT running counts —
   * the periodic order refresh when [[stats]] shows the frozen order
   * has drifted far from the running one (selectivity maintenance;
   * recall never depends on WHICH single order is used — but it does
   * depend on ONE order covering every prefix, see below). Reads the
   * docs store (token sets), never raw text: one explode + one window
   * over stored rows, then the order table and the prefix store swap
   * to the staged replacements. Admission ids are NOT reset — the
   * docs store is untouched and stays authoritative.
   *
   * CONSISTENCY: the prefix-filter theorem's no-false-negative
   * guarantee requires BOTH prefixes of a pair ranked under ONE total
   * order — prefixes mixed across two orders CAN be disjoint for a
   * truly similar pair and the candidate join would miss it (recall
   * loss, not just selectivity). Hence (a) rebuilds run QUIESCED — no
   * concurrent admission may rank under an order mid-swap — and
   * (b) the swap window is crash-guarded by the mark: the mark is
   * deleted before the order/prefix swaps and restored after, so a
   * kill between the two swaps leaves an index that REFUSES ordinary
   * operations loudly until rebuildPrefixes (or [[compact]], which
   * re-ranks everything under whichever order table is live) re-runs —
   * never one that silently misses pairs.
   */
  def rebuildPrefixes(spark: SparkSession, dir: String): Unit = {
    recoverStores(spark, dir)
    val fs = fsOf(spark, dir)
    val meta = readMeta(spark, dir)
    val hwm = readHwmOrFallback(spark, dir) // absent inside our own crash window
    val cum = spark.read.parquet(s"$dir/freq/cum=$hwm")
    val stored = Dedup.persistInternal("ssjidx_rebuild_sets",
      spark.read.parquet(s"$dir/docs")
        .select(col("batch").cast("long").as("batch"), col("doc_id"),
          col("toks"), col("len")))
    // ---- stage both replacements ----
    cum.write.mode("overwrite").parquet(s"$dir/order.next")
    prefixRows(stored.select("doc_id", "toks", "len"), cum, meta.tauMilli)
      .join(stored.select("doc_id", "batch"), "doc_id")
      .withColumn("pb", pb(meta.buckets))
      .select("doc_id", "tok", "len", "batch", "pb")
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("batch", "pb")
      .parquet(s"$dir/prefix.next")
    // ---- invalidate, swap, restore ----
    fs.delete(hwmPath(dir), false)
    StoreOps.swapStore(fs, dir, "order")
    StoreOps.swapStore(fs, dir, "prefix")
    refreshStores(spark, dir)
    writeHwm(spark, dir, hwm)
  }

  /** Per-batch store shape plus order drift: one row per admitted
    * batch (`batch, n_docs, n_prefix_rows`) and, on batch 0's row,
    * `drift_milli` — the fraction (in milli) of current token MASS
    * whose frozen-order tf is stale by 2× or more, the signal that a
    * [[rebuildPrefixes]] would restore prefix selectivity. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    recoverStores(spark, dir)
    val hwm = readHwm(spark, dir)
    val docs = spark.read.parquet(s"$dir/docs")
      .select(col("batch").cast("long").as("batch"))
      .groupBy("batch").agg(count(lit(1)).as("n_docs"))
    val pref = spark.read.parquet(s"$dir/prefix")
      .select(col("batch").cast("long").as("batch"))
      .groupBy("batch").agg(count(lit(1)).as("n_prefix_rows"))
    // SYMMETRIC drift: a token counts as drifted when its frozen and
    // running counts differ by 2× in EITHER direction (unseen-at-build
    // tokens have tf0 = 0 and always count; deletion-shrunk tokens
    // count too — a one-sided growth test would stay silent after a
    // mass takedown). Mass weights by the LARGER of the two counts so
    // shrunken tokens keep their build-time weight in the signal.
    val dr = spark.read.parquet(s"$dir/freq/cum=$hwm")
      .join(spark.read.parquet(s"$dir/order")
        .select(col("tok"), col("tf").as("tf0")), Seq("tok"), "full_outer")
      .select(greatest(coalesce(col("tf"), lit(0L)),
        coalesce(col("tf0"), lit(0L))).as("__w"),
        least(coalesce(col("tf"), lit(0L)),
          coalesce(col("tf0"), lit(0L))).as("__l"))
      .select(coalesce(sum(col("__w")), lit(0L)).as("__m"),
        coalesce(sum(when(col("__l") * 2 <= col("__w"), col("__w"))
          .otherwise(lit(0L))), lit(0L)).as("__s"))
      .head()
    val driftMilli =
      if (dr.getLong(0) == 0L) 0L else dr.getLong(1) * 1000L / dr.getLong(0)
    docs.join(pref, Seq("batch"), "full_outer")
      .withColumn("drift_milli",
        when(col("batch") === 0L, lit(driftMilli))
          .otherwise(lit(null).cast("long")))
      .orderBy("batch")
  }
}
