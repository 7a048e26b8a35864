package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for training-data pipelines: assign documents to
 * fixed-token-budget bins (the pre-tokenization step that turns a corpus
 * into uniform training sequences).
 *
 * Two strategies, both deterministic (bin assignment depends only on the
 * (group, id) order, never on partitioning):
 *
 *  - [[packContiguous]]: bin = floor(exclusive-running-token-count /
 *    budget). Documents never split, bins fill contiguously and may
 *    overflow by at most one document's tokens. Pure window arithmetic —
 *    one shuffle on the group column, SQL-expressible (oracle-verified).
 *  - [[packGreedy]]: first-fit-in-order — a document that would overflow
 *    the open bin closes it and starts the next, so no bin ever exceeds
 *    the budget (unless a single document alone does). Needs a stateful
 *    scan per group: `groupByKey.flatMapSortedGroups` streams each group's
 *    sorted iterator through a running fill counter — no group is ever
 *    materialized in memory, so a giant group is fine at 100 TB.
 */
object Packing {

  /** Input row for the greedy packer. */
  final case class PackIn(grp: String, doc_id: Long, n_tokens: Long)

  /** One packed document: its bin and the bin's fill AFTER adding it. */
  final case class PackOut(
      grp: String, doc_id: Long, n_tokens: Long, bin_id: Long, bin_fill: Long)

  /**
   * Contiguous-fill packing. Output: (grp, doc_id, n_tokens, bin_id,
   * bin_offset) where bin_offset is the token offset of this document
   * within its bin's running fill.
   */
  def packContiguous(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, budget: Long): DataFrame =
    packContiguousBy(
      df.select(col(groupCol).as("grp"), col(idCol), col(tokenCol)),
      Seq("grp"), idCol, tokenCol, budget)

  /**
   * Multi-column-group contiguous-fill packing: the group columns pass
   * through unchanged (no lossy concatenation of group keys into one
   * string). Output: (groupCols..., doc_id, n_tokens, bin_id, bin_offset).
   */
  def packContiguousBy(df: DataFrame, groupCols: Seq[String], idCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(groupCols.nonEmpty, "groupCols must not be empty")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("doc_id"))
    df.select(groupCols.map(col) ++ Seq(col(idCol).as("doc_id"),
        col(tokenCol).cast("long").as("n_tokens")): _*)
      .withColumn("cum_excl",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(groupCols.map(col) ++ Seq(col("doc_id"), col("n_tokens"),
        floor(col("cum_excl") / lit(budget)).as("bin_id"),
        (col("cum_excl") - floor(col("cum_excl") / lit(budget)) * lit(budget))
          .as("bin_offset")): _*)
  }

  /**
   * Greedy first-fit-in-order packing (id order within each group).
   * Output: (grp, doc_id, n_tokens, bin_id, bin_fill). Invariants (spec-
   * checked): bin_fill ≤ budget unless a bin holds a single over-budget
   * document; bins are greedy-tight (the first document of bin k+1 did
   * not fit in bin k); bin ids are consecutive from 0 per group.
   */
  def packGreedy(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val in = df.select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("doc_id"),
        col(tokenCol).cast("long").as("n_tokens"))
      .as(Encoders.product[PackIn])
    in.groupByKey(_.grp)(Encoders.STRING)
      .flatMapSortedGroups(col("doc_id")) { (grp: String, it: Iterator[PackIn]) =>
        greedyFold(it.map(d => (d.doc_id, d.n_tokens)), budget)
          .map { case (id, tok, bin, fill) => PackOut(grp, id, tok, bin, fill) }
      }(Encoders.product[PackOut])
      .toDF()
  }

  /** The greedy first-fit core, pure and streaming: (id, tokens) in
    * arrival order → (id, tokens, bin, fill-after-add). Factored out of
    * the Spark path so its invariants are property-testable without a
    * session. */
  def greedyFold(it: Iterator[(Long, Long)], budget: Long)
      : Iterator[(Long, Long, Long, Long)] = {
    var bin = 0L
    var fill = 0L
    it.map { case (id, tok) =>
      if (fill > 0 && fill + tok > budget) { bin += 1; fill = 0L }
      fill += tok
      (id, tok, bin, fill)
    }
  }

  /** Overlapping fixed-width chunking — the other half of sequence prep:
    * documents longer than the training context are split into
    * `chunkSize`-token windows advancing by `stride` tokens (overlap =
    * chunkSize - stride keeps context across boundaries). Start
    * positions are 0, stride, …, ceil((n - chunkSize)/stride)*stride, so
    * the final window always reaches the document's end and a short
    * document yields exactly one (short) chunk. One row per chunk:
    * (doc_id, chunk_idx, n_tokens, chunk_text).
    *
    * Pure column math over a materialized token array — the explode is
    * the output itself (no intermediate shuffle), so chunking runs at
    * scan speed and partitions exactly like the input. */
  def chunk(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24,
      idCol: String = "doc_id", toksCol: String = "toks"): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val n = size(col(toksCol)).cast("long")
    val lastStart = greatest(
      floor((n - chunkSize + (stride - 1)).cast("double") / stride).cast("long"),
      lit(0L))
    docs.select(col(idCol).as("doc_id"), col(toksCol).as("toks"),
        explode(sequence(lit(0L), lastStart)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(chunkSize.toLong),
          size(col("toks")).cast("long") - col("chunk_idx") * stride)
          .as("n_tokens"),
        concat_ws(" ",
          slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"),
            lit(chunkSize))).as("chunk_text"))
  }

  /** Per-bin rollup of a packed frame: document count, token total, and
    * fill ratio against the budget. */
  def binStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("grp"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"))
      .withColumn("fill_ratio",
        round(col("bin_tokens").cast("double") / lit(budget.toDouble), 6))

  /** Power-of-two length-tier boundaries for [[lengthBuckets]]: tier t
    * holds lengths below `bounds(t)`, with the top tier open-ended.
    * Integer comparisons only — no floating log2 at tier boundaries. */
  val lengthTierBounds: Seq[Long] = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L)

  /**
   * Length-bucketed inference batching: group documents of similar
   * token length into fixed-count batches so per-batch padding (every
   * sequence padded to the batch max) is paid against near-equal
   * lengths — the dynamic-batching step every embedding/scoring pass
   * over a corpus runs. The assignment is fully deterministic: a doc
   * lands in its power-of-two length TIER (scan-speed integer
   * comparisons, [[lengthTierBounds]]), a hash SHARD within the tier,
   * and batches of `batchSize` docs in (n_tokens DESC, doc_id) order
   * within each (tier, shard).
   *
   * Output, one row per batch: (tier, shard, batch_id, n_docs,
   * max_len, sum_len, pad_tokens, pad_frac) — pad_tokens =
   * n_docs·max_len − sum_len is exactly the padding a dense collator
   * emits for that batch.
   *
   * Scale shape: tier+shard assignment is scan-speed column math; the
   * only ordered work is one window per (tier, shard), so `shards`
   * bounds every sort's input to ~corpus/(tiers·shards) rows — the
   * shard-then-window discipline of [[CorpusWriter.trainingOrder]].
   * Raising `shards` with the cluster keeps each sort executor-sized.
   */
  def lengthBuckets(df: DataFrame, batchSize: Int = 16, shards: Int = 8,
      salt: String = "lenbatch", idCol: String = "doc_id",
      tokenCol: String = "n_tokens"): DataFrame = {
    require(batchSize > 0 && shards > 0,
      "batchSize and shards must be positive")
    val len = col(tokenCol).cast("long")
    val tier = lengthTierBounds.zipWithIndex.foldRight(
      lit(lengthTierBounds.size): org.apache.spark.sql.Column) {
      case ((b, i), els) => when(len < b, lit(i)).otherwise(els)
    }
    val w = Window.partitionBy("tier", "shard")
      .orderBy(col("n_tokens").desc, col("doc_id"))
    df.select(col(idCol).as("doc_id"), len.as("n_tokens"))
      .withColumn("tier", tier.cast("int"))
      .withColumn("shard",
        (Sampling.hash32(col("doc_id"), salt) % shards).cast("int"))
      .withColumn("batch_id",
        floor((row_number().over(w) - 1) / lit(batchSize)).cast("long"))
      .groupBy("tier", "shard", "batch_id")
      .agg(count(lit(1)).as("n_docs"), max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("sum_len"))
      .select(col("tier"), col("shard"), col("batch_id"), col("n_docs"),
        col("max_len"), col("sum_len"),
        (col("n_docs") * col("max_len") - col("sum_len")).as("pad_tokens"),
        when(col("n_docs") * col("max_len") > 0,
          round((col("n_docs") * col("max_len") - col("sum_len"))
            .cast("double") /
            (col("n_docs") * col("max_len")).cast("double"), 6))
          .otherwise(lit(0.0)).as("pad_frac"))
  }
}
