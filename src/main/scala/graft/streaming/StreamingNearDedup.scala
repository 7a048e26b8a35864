package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Continuous near-dup dedup over a document stream: each micro-batch is
 * LSH-joined against the signature state accumulated from every earlier
 * batch. Pair ENUMERATION is O(|batch| · bands) probes — the historical
 * corpus is never re-paired against itself (the same property as
 * [[Dedup.minhashLshPairsIncremental]], made continuous) — but each
 * batch still SCANS the accumulated state once (read + band unpivot +
 * join build) in the simple [[runBatch]] shape, so per-batch latency
 * grows with corpus size. At a scale where that scan dominates, use
 * [[runBatchPartitioned]]: band- and doc-prefix-partitioned state
 * tables read with partition-pruning `isin` filters, so a batch touches
 * only the state partitions its own hashes fall in.
 *
 * State is a parquet table of (doc_id, band1, band2, shingles): bands
 * for candidate generation, shingles for the Jaccard verify. Appending
 * one state row per document per batch keeps the loop idempotent-friendly
 * (reprocessing a batch after a crash re-finds the same pairs; dedupe
 * downstream on (doc_a, doc_b) if exactly-once pairs matter).
 *
 * Every pair is discovered exactly once under normal operation: when its
 * LATER document's batch arrives.
 */
object StreamingNearDedup {

  /** Signature+shingle state rows for a static document frame. */
  def stateRows(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Dedup.lshBands(Dedup.minhashSignatures(docs, 8, idCol, textCol))
      .join(Dedup.shingled(docs, idCol, textCol), "doc_id")

  /**
   * Near-dup pairs of `batchState` against `fullState` (which must
   * already CONTAIN the batch's own rows, so batch-internal pairs are
   * found too). Equi-join on unpivoted bands, batch side as the small
   * probe; verified shingle-Jaccard output like [[Dedup.minhashLshPairs]].
   */
  def pairsAgainstState(batchState: DataFrame, fullState: DataFrame): DataFrame = {
    val candidates = Dedup.incrementalCandidates(
      Dedup.unpivotBands(batchState), Dedup.unpivotBands(fullState))
    Dedup.jaccardVerify(candidates,
      fullState.select(col("doc_id"), col("shingles")))
  }

  /**
   * One foreachBatch step: compute the batch's state rows, find pairs
   * against (state ∪ batch), hand them to `sink` (which MUST materialize
   * them — the pairs plan reads the state dir lazily, so it has to
   * execute before the batch's own rows are appended below), then append
   * the batch rows to the state table.
   *
   * Crash replay: a batch replayed after its state append would
   * otherwise leave duplicate state rows forever (fanning out every
   * future pair through the verify joins), so the state read dedups on
   * doc_id — one extra shuffle per batch, the price of an idempotent
   * at-least-once loop. Replayed PAIRS still re-emit; downstream dedups
   * on (doc_a, doc_b). doc_id is a stable identity: re-ingesting CHANGED
   * content under an existing id is out of contract (the state dedup
   * would keep an arbitrary version) — assign a new id.
   */
  def runBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
      minJaccard: Double, idCol: String = "doc_id", textCol: String = "text")(
      sink: DataFrame => Unit): Unit = {
    val batchState = stateRows(batch, idCol, textCol).persist()
    try {
      val full = (readIfExists(spark, stateDir) match {
        case None => batchState
        case Some(p) =>
          p.select(batchState.columns.map(col): _*).unionAll(batchState)
        // state columns are normalized by stateRows — dedup on "doc_id",
        // not idCol (which only names the INPUT's id column)
      }).dropDuplicates("doc_id" :: Nil)
      sink(pairsAgainstState(batchState, full)
        .filter(col("jaccard") >= minJaccard))
      batchState.write.mode("append").parquet(stateDir)
    } finally batchState.unpersist(blocking = false)
  }

  /** [[runBatch]] returning the materialized pairs (test/interactive
    * convenience; the localCheckpoint pins blocks until the session drops
    * the frame — the streaming loop writes straight to a sink instead). */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
      minJaccard: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    var out: DataFrame = null
    runBatch(spark, batch, stateDir, minJaccard, idCol, textCol) { pairs =>
      out = pairs.localCheckpoint(true)
    }
    out
  }

  // ---- band-partitioned state (the large-corpus path) ---------------------

  /**
   * The pruned-read variant for corpora where scanning the whole state
   * per batch dominates: state lives in TWO partitioned tables under
   * `stateRoot` —
   *
   *   bands/    (doc_id, band_idx, band_hash) partitioned by
   *             band_pfx = xxhash64(band_hash) mod nPfx
   *   shingles/ (doc_id, shingles)            partitioned by
   *             doc_pfx  = doc_id mod nPfx
   *
   * A micro-batch can only collide with state bands in the partitions
   * its OWN band hashes fall in, and only needs shingles for the docs
   * that actually became candidates — both reads carry `isin` filters
   * over the partition column, so Spark's listing prunes untouched
   * directories entirely. A small batch reads O(|batch| · bands)
   * partitions of state instead of all of it; the driver holds only the
   * ≤ nPfx partition ids. Same pair output as [[runBatch]] (spec-checked
   * against the one-shot batch LSH), with the same contracts plus two of
   * its own:
   *
   *  - `nPfx` is part of the on-disk layout: it is pinned in a marker
   *    file on first write and later calls must match (a mismatched
   *    modulus would silently prune live partitions).
   *  - The two state appends (shingles first, then bands) are not
   *    atomic. Run under an orchestrator that REPLAYS an incomplete
   *    batch (e.g. [[start]]-style checkpointed foreachBatch): a crash
   *    between the appends leaves shingles without bands — those docs
   *    are simply absent from the index until the replay, never
   *    half-joined (bands are written last so no candidate can lack its
   *    verify rows).
   *  - doc_id is a stable identity: re-ingesting CHANGED content under
   *    the same doc_id is out of contract (state dedup would mix the
   *    versions arbitrarily) — assign a new id, as [[runBatch]] also
   *    requires.
   */
  def runBatchPartitioned(spark: SparkSession, batch: DataFrame,
      stateRoot: String, minJaccard: Double, nPfx: Int = 64,
      idCol: String = "doc_id", textCol: String = "text")(
      sink: DataFrame => Unit): Unit = {
    require(nPfx > 0, "nPfx must be positive")
    checkOrPinNPfx(spark, stateRoot, nPfx)
    val bandsDir = s"$stateRoot/bands"
    val shinglesDir = s"$stateRoot/shingles"
    val batchState = stateRows(batch, idCol, textCol).persist()
    try {
      val batchBands = Dedup.unpivotBands(batchState)
        .withColumn("band_pfx", pmod(xxhash64(col("band_hash")), lit(nPfx.toLong)))
        .persist()
      try {
        val bandPfx = batchBands.select("band_pfx").distinct()
          .collect().map(_.getLong(0)).toSeq
        val stateBands = readIfExists(spark, bandsDir)
          .map(_.filter(col("band_pfx").isin(bandPfx: _*))
            .select("doc_id", "band_idx", "band_hash"))
        val allBands = (stateBands match {
          case None => batchBands.select("doc_id", "band_idx", "band_hash")
          case Some(s) => s.unionAll(
            batchBands.select("doc_id", "band_idx", "band_hash"))
        }).dropDuplicates("doc_id", "band_idx") // replay-safe
        val candidates = Dedup.incrementalCandidates(
          batchBands.select("doc_id", "band_idx", "band_hash"), allBands)
          .persist()
        try {
          val docPfx = candidates
            .select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
            .select(pmod(col("d"), lit(nPfx.toLong)).as("p")).distinct()
            .collect().map(_.getLong(0)).toSeq
          val stateShingles = readIfExists(spark, shinglesDir)
            .map(_.filter(col("doc_pfx").isin(docPfx: _*))
              .select("doc_id", "shingles"))
          val allShingles = (stateShingles match {
            case None => batchState.select("doc_id", "shingles")
            case Some(s) =>
              s.unionAll(batchState.select("doc_id", "shingles"))
          }).dropDuplicates("doc_id")
          sink(Dedup.jaccardVerify(candidates, allShingles)
            .filter(col("jaccard") >= minJaccard))
        } finally candidates.unpersist(blocking = false)
        // appends AFTER the sink materialized the pairs (lazy state reads).
        // Shingles FIRST: a crash between the writes must leave docs
        // absent from the band index, never band rows lacking verify
        // data. Repartition on the partition key so each batch adds ~one
        // file per touched partition, not one per shuffle task (a
        // 10k-batch stream would otherwise drown the pruning win in
        // file-open overhead).
        batchState.select(col("doc_id"), col("shingles"),
            pmod(col("doc_id"), lit(nPfx.toLong)).as("doc_pfx"))
          .repartition(col("doc_pfx"))
          .write.partitionBy("doc_pfx").mode("append").parquet(shinglesDir)
        batchBands.repartition(col("band_pfx"))
          .write.partitionBy("band_pfx").mode("append").parquet(bandsDir)
      } finally batchBands.unpersist(blocking = false)
    } finally batchState.unpersist(blocking = false)
  }

  /** Pin nPfx in a marker file on first use; reject a mismatch later —
    * reading partitions written mod M with filters computed mod N would
    * silently prune live state. */
  private def checkOrPinNPfx(spark: SparkSession, stateRoot: String,
      nPfx: Int): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$stateRoot/_graft_npfx")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val recorded =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim.toInt
        finally in.close()
      require(recorded == nPfx,
        s"state at $stateRoot was written with nPfx=$recorded; got $nPfx — " +
          "a mismatched modulus silently prunes live partitions")
    } else {
      val out = fs.create(marker, false)
      try out.write(nPfx.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  private def readIfExists(spark: SparkSession, dir: String): Option[DataFrame] = {
    // existence via Hadoop's FileSystem so hdfs://, s3a://, and relative
    // local paths all work; a dir with no readable footers (crashed
    // first write) reads as absent rather than a permanent crash loop
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else try Some(spark.read.parquet(dir))
    catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /**
   * Start the continuous loop: `docs` is a STREAMING frame of
   * (doc_id, text); discovered pairs append to `pairsDir`, signature
   * state accrues in `stateDir`, offsets in `checkpointDir` (crash
   * recovery replays the in-flight batch; the state append and pair
   * append are then repeated — downstream consumers dedupe on the pair
   * key, mirroring the at-least-once contract of the reference's
   * incremental loop).
   */
  def start(docs: DataFrame, stateDir: String, pairsDir: String,
      checkpointDir: String, minJaccard: Double = 0.7)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // write IS the materialization — no checkpoint blocks pinned
        // across batches (a localCheckpoint per batch would leak, see
        // SCALE.md's bench-hygiene section)
        runBatch(batch.sparkSession, batch, stateDir, minJaccard) {
          _.write.mode("append").parquet(pairsDir)
        }
      }
      .start()
}
