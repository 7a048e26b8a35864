package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
