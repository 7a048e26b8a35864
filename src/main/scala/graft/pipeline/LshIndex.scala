package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted MinHash-LSH near-duplicate index — the approximate sibling
 * of [[SsjIndex]], completing the index-lifecycle trio: IVF for
 * embeddings ([[Similarity.buildIvfIndex]]), the exact prefix-filtered
 * set join for token sets ([[SsjIndex]]), and this banded-signature
 * index for shingle MinHash ([[Dedup.minhashLshPairs]]'s candidate
 * semantics as steady-state on-disk state). The frame-based
 * [[Dedup.minhashLshPairsIncremental]] is already probe-sided — old×old
 * pairs are never enumerated — but it re-tokenizes, re-shingles, and
 * re-signs the WHOLE corpus every batch to rebuild the band frame; at
 * 100 TB that linear rescan dominates the per-batch cost. This index
 * persists the band frame and the shingle sets once, so an admission
 * touches only the increment plus the store buckets it hashes into:
 *
 * {{{
 *   dir/meta          one-row parquet: (buckets)
 *   dir/bands         (doc_id, band_idx, band_hash) rows, partitioned
 *                     by (batch, bb = hash-bucket of band_hash)
 *   dir/shingles      (doc_id, shingles) sets, partitioned by
 *                     (batch, db = hash-bucket of doc_id) — the
 *                     AUTHORITATIVE store (the verify side)
 *   dir/deleted       (doc_id, shingles) per burned id — each
 *                     deletion's redo log, burn registry, and the
 *                     replayed-admission victim screen
 *   dir/admit.hwm     admission high-water mark
 * }}}
 *
 * NO GLOBAL STATE: unlike the exact set join there is no corpus-wide
 * token order to freeze and no running frequency table to fold — a
 * document's signature and bands depend on its own shingles alone
 * (min over seeded md5), so stored rows NEVER go stale as the corpus
 * drifts and the index needs no rebuild/drift machinery at all. That
 * is the structural reason LSH is the 100-TB workhorse: admission is
 * embarrassingly increment-local.
 *
 * PER-BATCH COST: shingle + sign the increment; one equi-join of the
 * increment's bands against the stored band table restricted to the
 * hash-buckets the increment's band hashes touch (partition pruning —
 * a trickle batch reads a few buckets, never the store); shingle-
 * Jaccard verify against the shingle store restricted to the candidate
 * documents' buckets. Both bucket lists collect driver-side, bounded
 * by `buckets` ≤ 4096, never by data.
 *
 * EXACTLY-ONCE BY LAYOUT ([[SsjIndex]]'s contract): batch writes are
 * dynamic partition overwrites scoped to `batch=N`; an explicit id at
 * or below the high-water mark is refused unless `allowReplay = true`;
 * a replayed epoch screens out documents a deletion took down after
 * its id. Deletions land a redo log first and burn their id; the docs
 * (shingle) store is authoritative — victims' band rows remain as
 * tombstones that die in the verify's inner join, and [[compact]]
 * purges them. Maintenance ops (delete / compact) run QUIESCED, the
 * family's single-writer operating contract.
 */
object LshIndex {

  private def hwmPath(dir: String) = StoreOps.hwmPath(dir)

  private def fsOf(spark: SparkSession, dir: String) =
    StoreOps.fsOf(spark, dir)

  private def readHwm(spark: SparkSession, dir: String): Long =
    StoreOps.readHwm(spark, dir,
      "either LshIndex.build never ran, or a compact was interrupted " +
        "mid-swap; re-run compact to restore a consistent index")

  private def writeHwm(spark: SparkSession, dir: String, v: Long): Unit =
    StoreOps.writeHwm(spark, dir, v)

  private def writeMeta(spark: SparkSession, dir: String,
      buckets: Int): Unit = {
    import spark.implicits._
    Seq(buckets).toDF("buckets")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMeta(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = fsOf(spark, dir)
    require(fs.exists(p),
      s"no LSH index meta at $dir/meta — LshIndex.build first")
    val b = spark.read.parquet(p.toString).head().getAs[Int]("buckets")
    require(b >= 1 && b <= 4096, s"corrupt LSH index meta at $dir/meta: $b")
    b
  }

  // staged-swap machinery — [[StoreOps]], shared with [[SsjIndex]]
  private val SwappableStores = Seq("bands", "shingles")

  private[pipeline] def recoverStores(spark: SparkSession,
      dir: String): Unit =
    StoreOps.recoverStores(spark, dir, SwappableStores)

  private def refreshStores(spark: SparkSession, dir: String): Unit =
    StoreOps.refreshStores(spark, dir, SwappableStores)

  private def deletedSidecar(dir: String, id: Long) =
    StoreOps.deletedSidecar(dir, id)

  private def isBurned(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, id: Long): Boolean =
    fs.exists(deletedSidecar(dir, id))

  private def pendingDelete(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, hwm: Long): Boolean =
    isBurned(fs, dir, hwm + 1)

  /** The admitted high-water mark (strict read) — for streaming id
    * derivation, the [[SsjIndex.admittedHwm]] analog. */
  private[graft] def admittedHwm(spark: SparkSession, dir: String): Long =
    readHwm(spark, dir)

  /** Every burned (deletion) id on record — the sidecar batches. */
  private[graft] def burnedIds(spark: SparkSession, dir: String): Set[Long] =
    StoreOps.sidecarBurnedIds(spark, dir)

  /** Per-document shingle sets of the index's shape: documents with no
    * shingles (fewer than `w` tokens) are OUTSIDE the index — they can
    * never band, so storing them would be dead weight; the frame-based
    * paths drop them from the signature the same way (explode of an
    * empty array yields no rows). */
  private def shingleFrame(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    // doSpread reinstated (r16): the r15 retraction blamed the spread
    // exchange, but the real cost was the empty-shingle filter below —
    // pushed under the exchange with the whole tokenize+shingle
    // expression inlined, it ran the heavy pass TWICE, the scan-side
    // copy single-task (2.1 s CPU in the admit trace). [[Dedup.
    // unpushable]] pins the filter above the spread, so the pass runs
    // once, wide.
    Dedup.shingled(docs, idCol, textCol)
      .select(col("doc_id"), Dedup.unpushable(col("shingles")).as("shingles"))
      .filter(size(col("shingles")) >= 1)

  /** k=8 MinHash signature from a (doc_id, shingles) frame — the
    * [[Dedup.minhashSignatures]] arithmetic (min of seeded md5) lifted
    * off raw text, so stored shingles re-sign without re-tokenizing. */
  private def sigFromShingles(sh: DataFrame): DataFrame = {
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    val aggs = (1 to 8).map(i =>
      min(md5(concat(lit(s"$i:"), col("s")))).as(s"mh$i"))
    ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Unpivoted band rows of a shingle frame: (doc_id, band_idx,
    * band_hash), 2 bands of 4 signature rows — [[Dedup.lshBands]]. */
  private def bandRows(sh: DataFrame): DataFrame =
    Dedup.unpivotBands(Dedup.lshBands(sigFromShingles(sh)))

  private def bb(buckets: Int) =
    pmod(xxhash64(col("band_hash")), lit(buckets.toLong))
  private def db(buckets: Int) =
    pmod(xxhash64(col("doc_id")), lit(buckets.toLong))

  /**
   * Build the index over the initial corpus: one shingle pass, one
   * signature aggregate, two partitioned stores. `buckets` sizes the
   * band- and doc-hash partition fan-out (the partition-pruning
   * granularity for trickle admissions — 64 default, raise toward 1024
   * on a large cluster).
   */
  def build(docs: DataFrame, dir: String, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(buckets >= 1 && buckets <= 4096,
      s"buckets must be in [1,4096], got $buckets")
    val spark = docs.sparkSession
    // a REBUILD restarts admission ids: drop the mark first (a crash
    // mid-build refuses loudly, never admits over half-written stores),
    // then hard-delete prior-lifecycle state — batch writes below rely
    // on static-overwrite truncation, which a session-global dynamic
    // partitionOverwriteMode default would silently skip
    locally {
      val fs = fsOf(spark, dir)
      fs.delete(hwmPath(dir), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/admit.hwm.tmp"), false)
      (Seq("deleted") ++
        SwappableStores.flatMap(s => Seq(s, s"$s.next", s"$s.old")))
        .foreach(d =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$d"), true))
      refreshStores(spark, dir) // a previous lifecycle's listings die
    }
    val sh = Dedup.persistInternal("lshidx_build_sh",
      shingleFrame(docs, idCol, textCol))
    bandRows(sh)
      .withColumn("batch", lit(0L)).withColumn("bb", bb(buckets))
      .repartition(col("bb")) // one file per bucket dir, not tasks×buckets
      .write.mode("overwrite").partitionBy("batch", "bb")
      .parquet(s"$dir/bands")
    sh
      .withColumn("batch", lit(0L)).withColumn("db", db(buckets))
      .repartition(col("db"))
      .write.mode("overwrite").partitionBy("batch", "db")
      .parquet(s"$dir/shingles")
    writeMeta(spark, dir, buckets)
    writeHwm(spark, dir, 0L)
  }

  /** The stored band table outside `excludeBatch`, pruned to the
    * hash-buckets in `touchedBb` — the admission's corpus-side read. */
  private[graft] def storedBands(spark: SparkSession, dir: String,
      excludeBatch: Long, touchedBb: Seq[Long]): DataFrame =
    spark.read.parquet(s"$dir/bands")
      .filter(col("batch") =!= excludeBatch &&
        col("bb").isin(touchedBb: _*))
      .select("doc_id", "band_idx", "band_hash")

  /** The stored shingle sets outside `excludeBatch`, pruned to the
    * doc-hash buckets in `touchedDb` — the verify-side read. */
  private[graft] def storedShingles(spark: SparkSession, dir: String,
      excludeBatch: Long, touchedDb: Seq[Long]): DataFrame =
    spark.read.parquet(s"$dir/shingles")
      .filter(col("batch") =!= excludeBatch &&
        col("db").isin(touchedDb: _*))
      .select("doc_id", "shingles")

  /**
   * Complete the deletion that burns `hwm + 1` from its sidecar
   * record — the tail of a fresh [[delete]] AND the recovery for one
   * that crashed after the sidecar landed ([[SsjIndex.delete]]'s
   * idempotent-finish discipline, minus the freq fold this index
   * doesn't have). The shingle-store rewrite removes whichever victims
   * are still present; the mark advances last.
   */
  private def finishDelete(spark: SparkSession, dir: String,
      hwm: Long): Unit = {
    val buckets = readMeta(spark, dir)
    val burnId = hwm + 1
    val fs = fsOf(spark, dir)
    require(fs.exists(deletedSidecar(dir, burnId)),
      s"cannot finish the deletion burning id $burnId: no victim " +
        s"record at ${deletedSidecar(dir, burnId)}")
    val ids = Dedup.persistInternal("lshidx_findel_ids",
      spark.read.parquet(deletedSidecar(dir, burnId).toString)
        .select("doc_id"))
    val touchedDb = ids.select(db(buckets).as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val shP = s"$dir/shingles"
    val touched = Dedup.persistInternal("lshidx_findel_rows",
      spark.read.parquet(shP)
        .filter(col("db").isin(touchedDb: _*))
        .join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          col("batch").cast("long").as("batch"),
          col("db").cast("long").as("db")))
    val touchedPairs = touched.select("batch", "db").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (touchedPairs.nonEmpty) {
      val survivors = spark.read.parquet(shP)
        .filter(col("db").isin(touchedDb: _*))
        .withColumn("batch", col("batch").cast("long"))
        .withColumn("db", col("db").cast("long"))
        .join(touched.select("batch", "db").distinct(), Seq("batch", "db"),
          "left_semi")
        .join(ids, Seq("doc_id"), "left_anti")
      // surviving partitions counted BEFORE the rewrite (the plan's
      // file listing is of the pre-write store)
      val kept = survivors.select("batch", "db").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      survivors
        .repartition(col("db"))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "db").parquet(shP)
      // a partition whose every row was a victim writes nothing under
      // dynamic overwrite — drop it explicitly
      touchedPairs.filterNot(kept).foreach { case (b, d) =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$shP/batch=$b/db=$d"), true)
      }
      refreshStores(spark, dir)
    }
    writeHwm(spark, dir, burnId)
  }

  /**
   * Admit a batch and return the band-collision near-dup pairs that
   * touch it (`(doc_a, doc_b, jaccard)`, doc_a < doc_b, shingle-
   * Jaccard verified — the [[Dedup.minhashLshPairsIncremental]]
   * contract, including the increment's internal pairs). Old×old pairs
   * are never probed and old text is never re-read: the batch shingles
   * and signs once; the candidate join reads only the band-store
   * buckets the increment's band hashes touch; the verify reads only
   * the shingle-store buckets of actual candidates.
   *
   * Crash/replay semantics are [[SsjIndex.admit]]'s: state writes land
   * scoped to `batch=id` before the mark advances; ids at or below the
   * mark need `allowReplay = true`; a replayed epoch screens out
   * documents a deletion burned after its id; a burned id is refused.
   * (No contiguity requirement — this index has no running state to
   * fold, so gaps in the id sequence are merely unusual, not corrupt.)
   *
   * The returned pairs are MATERIALIZED (eager localCheckpoint, the
   * lineage to the store cut) before this method returns — a fixed
   * value, safe to consume after later admissions mutate the store.
   */
  def admit(newDocs: DataFrame, dir: String, batchId: Option[Long] = None,
      allowReplay: Boolean = false, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = newDocs.sparkSession
    recoverStores(spark, dir)
    val buckets = readMeta(spark, dir)
    val fs = fsOf(spark, dir)
    val hwm = {
      val h = readHwm(spark, dir)
      if (pendingDelete(fs, dir, h)) { finishDelete(spark, dir, h); h + 1 }
      else h
    }
    val id = batchId.getOrElse(hwm + 1L)
    require(id > 0, s"batch ids above 0 are admissions; 0 is the build ($id)")
    require(allowReplay || id > hwm,
      s"LshIndex.admit: batch id $id is not above the admission " +
        s"high-water mark $hwm. A legitimate retry/replay must pass " +
        "allowReplay = true; a new feed restarted from scratch is about " +
        "to overwrite earlier admissions — refusing.")
    require(!isBurned(fs, dir, id),
      s"LshIndex.admit: batch id $id was burned by a deletion — " +
        "continue the feed above the high-water mark instead.")
    val sh0 = shingleFrame(newDocs, idCol, textCol)
    // replay screen: a replayed epoch drops documents a deletion took
    // down AFTER its id (re-landing them would resurrect the victims)
    val sh = Dedup.persistInternal("lshidx_admit_sh",
      if (allowReplay && id <= hwm &&
          fs.exists(new org.apache.hadoop.fs.Path(s"$dir/deleted"))) {
        val laterVictims = spark.read.parquet(s"$dir/deleted")
          .filter(col("batch") > id).select("doc_id")
        sh0.join(laterVictims, Seq("doc_id"), "left_anti")
      } else sh0)
    val bNew = Dedup.persistInternal("lshidx_admit_bands", bandRows(sh))
    // land the batch (dynamic overwrite scoped to batch=id)
    bNew.withColumn("batch", lit(id)).withColumn("bb", bb(buckets))
      .repartition(col("bb"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "bb").parquet(s"$dir/bands")
    sh.withColumn("batch", lit(id)).withColumn("db", db(buckets))
      .repartition(col("db"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "db").parquet(s"$dir/shingles")
    // a REPLAY replaced this batch's existing files in place — the
    // candidate/verify reads below (and any later caller) must not
    // resolve against the pre-write listings
    refreshStores(spark, dir)
    if (id > hwm) writeHwm(spark, dir, id)
    // candidates: increment bands × (stored ∪ increment) bands, stored
    // side pruned to the buckets the increment actually touches
    val touchedBb = bNew.select(bb(buckets).as("bb")).distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ buckets values
    // WIDTH-PINNED band exchange (the containmentPairsLsh F2 move): the
    // band rows are tiny in bytes, so AQE's byte-based coalescing ran
    // the quadratic in-bucket candidate enumeration on ONE task. A user
    // repartition is never coalesced, and the band-key exchange happens
    // for the join anyway, so pinning its width costs nothing at scale.
    val wParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val corpus = storedBands(spark, dir, id, touchedBb).unionByName(bNew)
      .repartition(wParts, col("band_idx"), col("band_hash"))
    // localCheckpoint, not persist: cand reads the band store, and
    // refreshStores (run on every admission) eagerly recaches any
    // cached plan over the stores — a lineage-cut frame costs nothing
    // at refresh time (see the SsjIndex.admit twin)
    val cand = Dedup.incrementalCandidates(bNew, corpus)
      .localCheckpoint(true)
    // verify against the shingle store, pruned to candidate-doc buckets
    val touchedDb = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .select(db(buckets).as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val verifySh = storedShingles(spark, dir, id, touchedDb)
      .unionByName(sh)
    // PIN the result: localCheckpoint materializes the pairs into
    // their own storage blocks and CUTS the lineage to the store — a
    // cached-but-lineaged frame would silently recompute against the
    // mutated store (and so change its answer) once a later admission
    // or deletion evicts or recaches it. The verify's candidate side is
    // width-pinned too: each pair costs a full shingle intersect, and
    // the checkpointed pairs are few enough bytes that the verify
    // otherwise ran single-task (r15 trace: a ~2.9 s one-task stage).
    Dedup.jaccardVerify(cand.repartition(wParts, col("doc_a")), verifySh)
      .localCheckpoint(true)
  }

  /**
   * Read-only near-dup LOOKUP: band-collision pairs between
   * `queryDocs` and the admitted corpus with verified shingle
   * Jaccard — nothing writes, no state advances, query×query pairs
   * are NOT reported (the [[SsjIndex.lookup]] screen contract).
   * Output: `(q_id, doc_id, jaccard)` — query id, matched CORPUS id.
   */
  def lookup(queryDocs: DataFrame, dir: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = queryDocs.sparkSession
    recoverStores(spark, dir)
    val buckets = readMeta(spark, dir)
    readHwm(spark, dir) // loud refusal on a crashed mid-build index
    val sh = Dedup.persistInternal("lshidx_lookup_sh",
      shingleFrame(queryDocs, idCol, textCol))
    val bQ = Dedup.persistInternal("lshidx_lookup_bands", bandRows(sh))
    val touchedBb = bQ.select(bb(buckets).as("bb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // width-pinned band + verify exchanges — the admit path's F2 move
    // (tiny band/pair bytes otherwise coalesce to one task under AQE)
    val wParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val stored = storedBands(spark, dir, excludeBatch = -1L, touchedBb)
      .repartition(wParts, col("band_idx"), col("band_hash"))
    val cand = Dedup.persistInternal("lshidx_lookup_cand",
      bQ.as("a").join(stored.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash"))
        .select(col("a.doc_id").as("q_id"), col("b.doc_id").as("c_id"))
        .distinct())
    val touchedDb = cand
      .select(pmod(xxhash64(col("c_id")), lit(buckets.toLong)).as("db"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val cSh = storedShingles(spark, dir, excludeBatch = -1L, touchedDb)
    // q and corpus sides stay apart (a re-presented admitted document
    // reports its J = 1 self-match, never cross-wires)
    cand.repartition(wParts, col("q_id"))
      .join(sh.select(col("doc_id").as("q_id"), col("shingles").as("sa")),
        "q_id")
      .join(cSh.select(col("doc_id").as("c_id"), col("shingles").as("sb")),
        "c_id")
      .select(col("q_id"), col("c_id"), size(col("sa")).as("na"),
        size(col("sb")).as("nb"),
        size(array_intersect(col("sa"), col("sb"))).as("inter"))
      .select(col("q_id"), col("c_id").as("doc_id"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /**
   * Retract documents (the takedown path): redo log first
   * (`dir/deleted/batch=<burned id>` — burn registry, crash-recovery
   * record, and replay screen), then the touched shingle-store
   * partitions rewrite and the mark advances past the burned id. The
   * shingle store is AUTHORITATIVE: victims' band rows remain as
   * tombstones that die in the verify's inner join (results correct
   * immediately); [[compact]] purges them. Returns the number of
   * documents actually removed.
   */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String = "doc_id"): Long = {
    recoverStores(spark, dir)
    val fs = fsOf(spark, dir)
    val hwm = {
      val h = readHwm(spark, dir)
      if (pendingDelete(fs, dir, h)) { finishDelete(spark, dir, h); h + 1 }
      else h
    }
    val buckets = readMeta(spark, dir)
    val victims = Dedup.persistInternal("lshidx_del_ids",
      ids.select(col(idCol).as("doc_id")).distinct())
    val touchedDb = victims.select(db(buckets).as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val touched = Dedup.persistInternal("lshidx_del_rows",
      spark.read.parquet(s"$dir/shingles")
        .filter(col("db").isin(touchedDb: _*))
        .join(victims, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("shingles")))
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
   * Fold both stores to `batch=0`, purge deletion tombstones, bound
   * files per bucket, and restart the admission lifecycle — the
   * [[SsjIndex.compact]] discipline. The band store is REBUILT from
   * the authoritative shingle store (signatures recompute from stored
   * shingles, never raw text), so every tombstone dies here. All
   * replacements stage at `<store>.next`; the mark is deleted before
   * the swaps (a mid-swap crash refuses loudly until compact re-runs)
   * and rewritten as 0 last; every swap is rename-aside with
   * [[recoverStores]] finishing interruptions. Run QUIESCED.
   */
  def compact(spark: SparkSession, dir: String): Unit = {
    recoverStores(spark, dir)
    val fs = fsOf(spark, dir)
    val buckets = readMeta(spark, dir)
    if (fs.exists(hwmPath(dir))) {
      val h = readHwm(spark, dir)
      // finish a crashed deletion first — its redo log is about to be
      // voided with the rest of the burn registry
      if (pendingDelete(fs, dir, h)) finishDelete(spark, dir, h)
    }
    // else: re-run of a compact that crashed mid-swap — no pending
    // delete can exist (delete requires the mark), just re-stage
    val stored = Dedup.persistInternal("lshidx_compact_sh",
      spark.read.parquet(s"$dir/shingles")
        .select(col("doc_id"), col("shingles")))
    bandRows(stored)
      .withColumn("batch", lit(0L)).withColumn("bb", bb(buckets))
      .repartition(col("bb"))
      .write.mode("overwrite").partitionBy("batch", "bb")
      .parquet(s"$dir/bands.next")
    stored
      .withColumn("batch", lit(0L)).withColumn("db", db(buckets))
      .repartition(col("db"))
      .write.mode("overwrite").partitionBy("batch", "db")
      .parquet(s"$dir/shingles.next")
    // point of no return: invalidate, void the burn registry, swap
    fs.delete(hwmPath(dir), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/deleted"), true)
    StoreOps.swapStore(fs, dir, "bands")
    StoreOps.swapStore(fs, dir, "shingles")
    refreshStores(spark, dir)
    writeHwm(spark, dir, 0L)
  }

  /** Per-batch store shape: one row per admitted batch —
    * `(batch, n_docs, n_band_rows)`. Band tombstones left by
    * deletions keep their rows until [[compact]]; the gap between
    * `n_band_rows` and `2 × n_docs` is therefore the tombstone
    * volume, the signal that a compact is due. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    recoverStores(spark, dir)
    readHwm(spark, dir)
    val docs = spark.read.parquet(s"$dir/shingles")
      .select(col("batch").cast("long").as("batch"))
      .groupBy("batch").agg(count(lit(1)).as("n_docs"))
    val bands = spark.read.parquet(s"$dir/bands")
      .select(col("batch").cast("long").as("batch"))
      .groupBy("batch").agg(count(lit(1)).as("n_band_rows"))
    docs.join(bands, Seq("batch"), "full_outer").orderBy("batch")
  }
}
