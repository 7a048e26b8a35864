package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus output sharding: write a training corpus partitioned by layout
 * columns (split/source/...) with a BOUNDED, deterministic file count per
 * leaf directory.
 *
 * The naive `df.write.partitionBy(...)` writes one file per (task ×
 * touched directory): 10k shuffle tasks × 60 (source, split) combos is
 * 600k files — the classic small-files explosion that kills both the
 * writing job (namenode pressure) and every downstream reader (task per
 * tiny file). Training-data loaders additionally want STABLE shard
 * membership so a resumed epoch maps shards to workers identically.
 *
 * `writeShards` fixes both with one shuffle: a deterministic shard id
 * (id-hash mod shardsPerLeaf) is added to the layout key and the frame
 * is repartitioned by (layout, shard) — every leaf directory then
 * receives at most `shardsPerLeaf` files, each file's row membership a
 * pure function of the data (not of cluster size, task scheduling, or
 * input partitioning). `sortCols` orders rows within each shard file
 * (e.g. by bin id so packed sequences are contiguous on disk).
 */
object CorpusWriter {

  /** Deterministic shard id in [0, n): stable across runs and engines. */
  def shardId(id: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(id), lit(n.toLong))

  /**
   * Deterministic epoch ordering: assign every document a (shard, pos)
   * so training consumes shards in parallel with a REPRODUCIBLE
   * within-shard order — re-runs, resumed epochs, and different cluster
   * sizes read the identical sequence, and changing `salt` draws an
   * independent permutation (epoch 2 = salt "epoch2", no data movement
   * beyond the reshuffle itself).
   *
   * Both coordinates are pure functions of (id, salt): the shard is the
   * id-hash mod `shards`, the position ranks the same hash within the
   * shard (id tie-break for colliding hashes). One shuffle on the shard
   * id; the per-shard window sort is the per-file sort every shard
   * writer does anyway. Size `shards` like output files (thousands at
   * 100 TB), so a window partition is one shard's rows, not the corpus.
   */
  def trainingOrder(df: DataFrame, shards: Int, idCol: String = "doc_id",
      salt: String = "epoch0"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    df.select(col(idCol).as("doc_id"))
      .withColumn("h", graft.pipeline.Sampling.hash32(col("doc_id"), salt))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /**
   * Curriculum epoch ordering (Bengio et al. 2009, "Curriculum
   * Learning") — [[trainingOrder]]'s shard-parallel contract with a
   * quality-major key: within every shard, documents are consumed
   * easiest/cleanest-first (CCNet NLL tier ascending — tier 1 is the
   * head), with the deterministic hash shuffle inside each tier and
   * `salt` still minting a fresh permutation per epoch. Because shard
   * membership is tier-blind (pure id hash), every shard sees the same
   * tier proportions, so shard-parallel consumption yields a globally
   * tier-major schedule without any cross-shard coordination.
   *
   * Output: (doc_id, tier, shard, pos).
   *
   * Scale shape: tier signal is the certified
   * [[TextAnalysis.nllTiers]] path (its percentile-sketch twin applies
   * when the per-corpus sort is too much); ordering is one
   * per-shard window — shards bound the sort like trainingOrder.
   */
  def curriculumOrder(docs: DataFrame, shards: Int, tiers: Int = 3,
      salt: String = "epoch0", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("tier"), col("h"), col("doc_id"))
    TextAnalysis.nllTiers(docs, tiers, idCol, textCol)
      .select(col("doc_id"), col("tier"))
      .withColumn("h", Sampling.hash32(col("doc_id"), salt))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("tier"), col("shard"), col("pos"))
  }

  /**
   * Write a frame as a BUCKETED (and optionally bucket-sorted) table:
   * rows are hash-partitioned into `numBuckets` files by `bucketCol` at
   * write time, and the layout is recorded in the catalog. Every later
   * equi-join or aggregation on that column then reads co-located
   * buckets with NO exchange — the shuffle is paid once at write, not
   * per query.
   *
   * This is the 100-TB play for the pipeline's hub key: dedup verdicts,
   * quality signals, decontamination reports, and pack assignments all
   * join back to the corpus on doc_id. Bucket both sides by doc_id and
   * each merge is a zero-shuffle zip of corresponding buckets
   * (BucketedJoinSpec pins the exchange-free plan). `sortCols` adds
   * per-bucket sort metadata, letting sort-merge joins skip the sort.
   */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCols: Seq[String] = Seq.empty,
      mode: String = "overwrite"): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val w = df.write.mode(mode).bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.drop(1): _*)
     else w).format("parquet").saveAsTable(table)
  }

  /**
   * @param numTasks explicit shuffle width for the write. File membership
   *   is `hash(layout, shard) % numTasks`, so it MUST NOT follow the
   *   session's `spark.sql.shuffle.partitions` (config- and
   *   cluster-dependent) or AQE coalescing — an explicit count keeps the
   *   file layout a pure function of the data, run to run. Size it to
   *   ~distinct leaves × shardsPerLeaf for full write parallelism.
   */
  def writeShards(df: DataFrame, outDir: String, layoutCols: Seq[String],
      idCol: String, shardsPerLeaf: Int, sortCols: Seq[String] = Seq.empty,
      mode: String = "overwrite", numTasks: Int = 512,
      format: String = "parquet"): Unit = {
    require(layoutCols.nonEmpty, "layoutCols must not be empty")
    require(shardsPerLeaf > 0, "shardsPerLeaf must be positive")
    require(numTasks > 0, "numTasks must be positive")
    val sharded = df.withColumn("_shard", shardId(col(idCol), shardsPerLeaf))
    val keyCols = (layoutCols :+ "_shard").map(col)
    // user-specified partition counts are exempt from AQE coalescing
    val sorted = sharded.repartition(numTasks, keyCols: _*)
      .sortWithinPartitions((keyCols ++ sortCols.map(col)): _*)
    sorted.drop("_shard")
      .write.partitionBy(layoutCols: _*).mode(mode)
      // "json" = JSONL shards, the lingua franca of training-data
      // interchange; same layout/shard guarantees as parquet
      .format(format).save(outDir)
  }

  /**
   * Morton (z-order) interleave of pre-quantized dimensions: bit `b` of
   * dimension `i` lands at output bit `b·n + i`, so rows close in EVERY
   * dimension get close z-values. Inputs must be non-negative and
   * `< 2^bits`; `bits · n` must fit a long. Pure column bit arithmetic
   * — codegen'd, scan-speed, no shuffle of its own.
   */
  def mortonValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "mortonValue needs at least one dimension")
    require(bits > 0 && bits * dims.size <= 63,
      s"bits*dims must be in (0, 63], got $bits*${dims.size}")
    val n = dims.size
    val terms = for { b <- 0 until bits; i <- 0 until n } yield
      shiftleft(shiftright(dims(i).cast("long"), b).bitwiseAND(lit(1L)),
        b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /**
   * Z-order layout key: linearly quantize each dimension to
   * `[0, 2^bits)` against its GLOBAL min/max (one tiny aggregate,
   * broadcast back as a 1-row bounds frame — the [[TextAnalysis
   * .nllTiersApprox]] pattern; no global sort, no rank window), then
   * Morton-interleave. Adds `q_<dim>` columns and `z_value`.
   *
   * Why this exists: a corpus laid out by ONE column skips scans only
   * on that column. Sorting by the z-value clusters rows along ALL
   * chosen dimensions at once, so parquet per-file min/max stats prune
   * scans filtered on ANY of them — the multi-dimensional data-skipping
   * play (Z-ordering as in lakehouse OPTIMIZE). The quantization is an
   * exact, engine-replayable formula (the oracle inlines the identical
   * double arithmetic), deliberately not rank-based: rank quantization
   * needs a global sort pass; linear quantization is one scan + one
   * broadcast and is monotone in the raw value, which is all pruning
   * needs.
   */
  def zorderValue(df: DataFrame, dims: Seq[String], bits: Int = 8): DataFrame = {
    require(dims.nonEmpty, "zorderValue needs at least one dimension")
    val scale = (1L << bits) - 1
    val bounds = df.agg(
      min(col(dims.head)).as(s"_mn_${dims.head}"),
      (max(col(dims.head)).as(s"_mx_${dims.head}") +:
        dims.tail.flatMap(d => Seq(min(col(d)).as(s"_mn_$d"),
          max(col(d)).as(s"_mx_$d")))): _*)
    val q = dims.foldLeft(df.crossJoin(broadcast(bounds))) { (d, dim) =>
      d.withColumn(s"q_$dim",
        when(col(s"_mx_$dim") === col(s"_mn_$dim"), lit(0L))
          .otherwise(least(floor(
            (col(dim) - col(s"_mn_$dim")).cast("double") * scale /
              (col(s"_mx_$dim") - col(s"_mn_$dim")).cast("double"))
            .cast("long"), lit(scale))))
    }
    q.withColumn("z_value", mortonValue(dims.map(d => col(s"q_$d")), bits))
      .drop(dims.flatMap(d => Seq(s"_mn_$d", s"_mx_$d")): _*)
  }

  /**
   * Write the corpus z-ordered: range-partition on `z_value` (each
   * output file owns a contiguous z-range) and sort within partitions,
   * so every file's parquet min/max on every interleaved dimension is
   * tight. `numFiles` is explicit for the same determinism reason as
   * [[writeShards]]' numTasks. One range shuffle — the write-once cost
   * that every later filtered scan amortizes.
   */
  def writeZOrdered(df: DataFrame, outDir: String, dims: Seq[String],
      idCol: String, bits: Int = 8, numFiles: Int = 64,
      mode: String = "overwrite"): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    zorderValue(df, dims, bits)
      .repartitionByRange(numFiles, col("z_value"), col(idCol))
      .sortWithinPartitions(col("z_value"), col(idCol))
      .write.mode(mode).parquet(outDir)
  }

  /**
   * Shard-balance audit for [[shardId]]'s deterministic assignment —
   * the operational check run BEFORE a training epoch: per shard, the
   * document count, total weight (bytes/tokens), and the balance
   * factor (shard weight ÷ ideal equal share). A factor near 1.0
   * everywhere means workers finish together; a hot shard (> ~1.2)
   * means the weight column, not the doc count, should drive a
   * different `shards` choice. One hash-keyed aggregate to `shards`
   * rows; the global-total window runs over those `shards` rows, not
   * the corpus.
   */
  def shardBalanceReport(df: DataFrame, shards: Int,
      idCol: String = "doc_id", weightCol: String = "n_chars"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    df.select(shardId(col(idCol), shards).as("shard"),
        col(weightCol).cast("long").as("wt"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("wt")).as("weight"))
      .withColumn("balance",
        round(col("weight").cast("double") * shards /
          sum(col("weight")).over(all), 6))
  }
}
