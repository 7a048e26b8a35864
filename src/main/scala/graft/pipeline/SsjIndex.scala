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
 *                     never a corpus rescan)
 *   dir/prefix        (doc_id, tok, len) prefix rows, partitioned by
 *                     (batch, pb = hash-bucket of tok)
 *   dir/docs          (doc_id, toks sorted-distinct, len) token sets,
 *                     partitioned by (batch, db = hash-bucket of doc_id)
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

  private def hwmPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/admit.hwm")

  private def readHwm(spark: SparkSession, dir: String): Long = {
    val p = hwmPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no admission high-water mark at $p — SsjIndex.build writes it")
    val in = fs.open(p)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    require(s.nonEmpty && s.forall(_.isDigit),
      s"corrupt admission high-water sidecar at $p: '$s'")
    s.toLong
  }

  private def writeHwm(spark: SparkSession, dir: String, v: Long): Unit = {
    val p = hwmPath(dir)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/admit.hwm.tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p),
      s"could not publish the admission high-water mark to $p")
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
      val fs = hwmPath(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(hwmPath(dir), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/admit.hwm.tmp"), false)
      // stale state from a previous lifecycle must not survive into
      // this one: cum=0 below only overwrites ITS path, and the store
      // writes rely on STATIC overwrite truncation — under a session
      // whose global partitionOverwriteMode default is "dynamic" a
      // plain overwrite would leave the old lifecycle's batch=1..N
      // partitions alive, so delete the dirs outright
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/freq"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/prefix"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/docs"), true)
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
   * silently overwrite earlier admissions otherwise.
   */
  def admit(newDocs: DataFrame, dir: String, batchId: Option[Long] = None,
      allowReplay: Boolean = false, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = newDocs.sparkSession
    val meta = readMeta(spark, dir)
    val hwm = readHwm(spark, dir)
    val id = batchId.getOrElse(hwm + 1L)
    require(id > 0, s"batch ids above 0 are admissions; 0 is the build ($id)")
    require(allowReplay || id > hwm,
      s"SsjIndex.admit: batch id $id is not above the admission " +
        s"high-water mark $hwm. A legitimate retry/replay must pass " +
        "allowReplay = true; a new feed restarted from scratch is about " +
        "to overwrite earlier admissions — refusing.")
    locally {
      val fs = hwmPath(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a deletion burns its id: an admission landing there — even a
      // declared replay (a live stream whose next epoch id collides) —
      // would rewrite cum=id from the PRE-deletion cum=id−1 and
      // silently resurrect the deleted documents' counts
      require(!fs.exists(new org.apache.hadoop.fs.Path(
          s"$dir/freq/cum=$id/$DeletionMarker")),
        s"SsjIndex.admit: batch id $id was burned by a deletion — " +
          "admitting here would resurrect the deleted documents' " +
          "counts. Continue the feed above the mark (a new stream " +
          "checkpoint with StreamingSsjAdmit's idOffset past the " +
          "high-water mark), or rebuild the index.")
      // ids must be contiguous: the fold reads cum=(id−1), so a gap
      // would die deep inside the read with a bare PATH_NOT_FOUND
      require(fs.exists(new org.apache.hadoop.fs.Path(
          s"$dir/freq/cum=${id - 1}")),
        s"SsjIndex.admit: no freq state at cum=${id - 1} — batch ids " +
          s"are contiguous (next is ${hwm + 1}); derive ids from the " +
          "admission sequence, not from event time.")
    }
    val sets = Dedup.persistInternal("ssjidx_admit_sets",
      setsFrame(newDocs, idCol, textCol))
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
    val pNew = Dedup.persistInternal("ssjidx_admit_prefix",
      prefixRows(sets, order, meta.tauMilli))
    // 3) land the batch (dynamic overwrite scoped to batch=id)
    pNew.withColumn("batch", lit(id)).withColumn("pb", pb(meta.buckets))
      .repartition(col("pb")) // one file per bucket dir (see build)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "pb").parquet(s"$dir/prefix")
    sets.withColumn("batch", lit(id)).withColumn("db", db(meta.buckets))
      .repartition(col("db"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "db").parquet(s"$dir/docs")
    if (id > hwm) writeHwm(spark, dir, id)
    // 4) candidates: increment prefixes × (stored ∪ increment) prefixes,
    //    stored side pruned to the buckets the increment actually touches
    val touchedPb = pNew
      .select(pb(meta.buckets).as("pb")).distinct()
      .collect().map(_.getLong(0)).toSeq // ≤ buckets values
    val corpus = storedPrefixes(spark, dir, id, touchedPb)
      .unionByName(pNew)
    val tau = meta.tauMilli
    val cand = Dedup.persistInternal("ssjidx_admit_cand",
      pNew.as("a").join(corpus.as("b"),
          col("a.tok") === col("b.tok") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          least(col("a.len"), col("b.len")) * 1000 >=
            lit(tau) * greatest(col("a.len"), col("b.len")))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct())
    // 5) exact verify against the docs store, pruned to candidate-doc
    //    buckets (≤ buckets values, driver-bounded)
    val touchedDb = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .select(db(meta.buckets).as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val verifySets = storedSets(spark, dir, id, touchedDb)
      .unionByName(sets)
      .select(col("doc_id"), col("toks"), col("len").as("n"))
    Dedup.ssjVerifySets(cand, verifySets, tau)
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
   * The docs store is AUTHORITATIVE: victims' prefix rows are left
   * behind as tombstones (a candidate against a tombstone dies in the
   * verify's inner join against the docs store, so results are correct
   * immediately); the next [[rebuildPrefixes]] — which rebuilds the
   * prefix store from the docs store — purges them. A crash mid-delete
   * leaves some victims gone and the freq state not yet advanced;
   * re-running the same delete converges (already-gone victims
   * subtract nothing).
   *
   * Returns the number of documents actually removed.
   */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String = "doc_id"): Long = {
    val meta = readMeta(spark, dir)
    val hwm = readHwm(spark, dir)
    val victims = Dedup.persistInternal("ssjidx_del_ids",
      ids.select(col(idCol).as("doc_id")).distinct())
    val touchedDb = victims
      .select(db(meta.buckets).as("db")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val docsP = s"$dir/docs"
    // partition columns read back with inferred types (an int-sized
    // batch value infers IntegerType) — cast for stable collects/joins
    val touched = Dedup.persistInternal("ssjidx_del_rows",
      spark.read.parquet(docsP)
        .filter(col("db").isin(touchedDb: _*))
        .join(victims, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("toks"), col("len"),
          col("batch").cast("long").as("batch"),
          col("db").cast("long").as("db")))
    val nVictims = touched.count()
    if (nVictims == 0) return 0L
    // 1) fold the victims' counts OUT of the running state, burning an
    //    admission id so no replay window can resurrect them
    val negCounts = touched.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    spark.read.parquet(s"$dir/freq/cum=$hwm")
      .select(col("tok"), col("tf").as("__a"))
      .join(negCounts.select(col("tok"), col("tf").as("__b")),
        Seq("tok"), "left_outer")
      .select(col("tok"),
        (col("__a") - coalesce(col("__b"), lit(0L))).as("tf"))
      .filter(col("tf") > 0)
      .write.mode("overwrite").parquet(s"$dir/freq/cum=${hwm + 1}")
    locally { // mark the burned id: admissions there are refused (see admit)
      val fs = hwmPath(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(
        s"$dir/freq/cum=${hwm + 1}/$DeletionMarker"), true).close()
    }
    // 2) surgical docs-store rewrite: touched (batch, db) partitions
    //    only. Dynamic overwrite replaces partitions PRESENT in the
    //    written data, so a partition whose every row is a victim must
    //    be dropped explicitly — it would otherwise survive untouched.
    val touchedPairs = touched.select("batch", "db").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val survivors = spark.read.parquet(docsP)
      .filter(col("db").isin(touchedDb: _*))
      .withColumn("batch", col("batch").cast("long"))
      .withColumn("db", col("db").cast("long"))
      .join(touched.select("batch", "db").distinct(), Seq("batch", "db"),
        "left_semi")
      .join(victims, Seq("doc_id"), "left_anti")
    // surviving partitions are counted BEFORE the rewrite: the plan's
    // file listing is of the pre-write store, and re-evaluating it
    // after the overwrite would read deleted files
    val kept = survivors.select("batch", "db").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    survivors
      .repartition(col("db"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "db").parquet(docsP)
    val fs = new org.apache.hadoop.fs.Path(docsP)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touchedPairs.filterNot(kept).foreach { case (b, d) =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$docsP/batch=$b/db=$d"), true)
    }
    writeHwm(spark, dir, hwm + 1)
    nVictims
  }

  /**
   * Re-rank every stored prefix under the CURRENT running counts —
   * the periodic order refresh when [[stats]] shows the frozen order
   * has drifted far from the running one (selectivity maintenance;
   * recall never depends on it). Reads the docs store (token sets),
   * never raw text: one explode + one window over stored rows, then
   * the prefix table and the order table rewrite in place. Admission
   * ids are NOT reset — the docs store is untouched and stays
   * authoritative.
   */
  def rebuildPrefixes(spark: SparkSession, dir: String): Unit = {
    val meta = readMeta(spark, dir)
    val hwm = readHwm(spark, dir)
    val cum = spark.read.parquet(s"$dir/freq/cum=$hwm")
    val stored = spark.read.parquet(s"$dir/docs")
      .select(col("batch"), col("doc_id"), col("toks"), col("len"))
    val pref = prefixRows(stored.select("doc_id", "toks", "len"), cum,
      meta.tauMilli)
      .join(stored.select("doc_id", "batch"), "doc_id")
    // order first, then prefixes: a crash between the two leaves
    // prefixes ranked under the OLD order with the NEW order table on
    // disk — still one consistent order per stored prefix row set after
    // the next successful pass; admissions in the window rank new docs
    // under the new order while old prefixes keep the old one, which
    // only costs selectivity on old×new candidate pairs, never recall
    // of the verify (the candidate join's guarantee needs consistency,
    // so run rebuilds quiesced, as the doc above says).
    cum.write.mode("overwrite").parquet(s"$dir/order")
    pref.withColumn("pb", pb(meta.buckets))
      .select("doc_id", "tok", "len", "batch", "pb")
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("batch", "pb")
      .parquet(s"$dir/prefix")
  }

  /** Per-batch store shape plus order drift: one row per admitted
    * batch (`batch, n_docs, n_prefix_rows`) and, on batch 0's row,
    * `drift_milli` — the fraction (in milli) of current token MASS
    * whose frozen-order tf is stale by 2× or more, the signal that a
    * [[rebuildPrefixes]] would restore prefix selectivity. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val hwm = readHwm(spark, dir)
    val docs = spark.read.parquet(s"$dir/docs")
      .groupBy("batch").agg(count(lit(1)).as("n_docs"))
    val pref = spark.read.parquet(s"$dir/prefix")
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
