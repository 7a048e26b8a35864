package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Repeated-content removal for training corpora — the two signals a
 * web-scale pipeline runs between exact dedup and near-dedup:
 *
 *  - '''Line-level dedup''': drop every occurrence of any line that
 *    repeats more than `maxOcc` times across the whole corpus
 *    (navigation bars, cookie banners, "click here to subscribe" —
 *    the MassiveText/RefinedWeb boilerplate rule).
 *  - '''Duplicated-span detection''': per document, the fraction of its
 *    w-token positional windows that occur elsewhere in the corpus —
 *    the distributable stand-in for suffix-array exact-substring dedup
 *    (Lee et al., "Deduplicating Training Data Makes Language Models
 *    Better"): a suffix array is a single-node structure; hashed
 *    sliding windows give the same "this text span is copied" signal
 *    as one explode + one count + one join, all key-partitioned.
 *
 * Scale shape (both operators): the explode emits one row per line /
 * window but projects each to a 32-hex md5 BEFORE the shuffle, so the
 * frequency aggregate and the join back move fixed-width keys, not
 * text. The frequency count is a hash aggregate with map-side combine
 * — the hot boilerplate line is exactly the key partial aggregation
 * collapses, so corpus-wide skew lands as one row per reducer, not one
 * partition per boilerplate string. At 100 TB the `freq > maxOcc` set
 * (true boilerplate) is small enough that AQE turns the join back into
 * a broadcast; nothing here requires it.
 */
object Boilerplate {

  /** (doc_id, pos, line, lh): one row per line, 1-based position kept
    * for order-preserving reassembly, md5 key projected at the scan. */
  def explodeLines(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos0", "line")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("line"), md5(col("line")).as("lh"))

  /** Line-level corpus dedup: remove every occurrence of any line whose
    * total corpus occurrence count exceeds `maxOcc`; reassemble the
    * survivors in original order. Returns one row per input document:
    * (doc_id, n_lines, n_removed, text_dedup) — a fully-boilerplate
    * document survives with an empty `text_dedup`, so downstream
    * length-based quality filters see it rather than losing the row. */
  def lineDedup(docs: DataFrame, maxOcc: Long = 2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = explodeLines(docs, idCol, textCol)
    val freq = lines.groupBy("lh").agg(count(lit(1)).as("c"))
    val kept = lines.join(freq, "lh").filter(col("c") <= maxOcc)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), "\n").as("text_dedup"))
    lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** (doc_id, i, wh): one row per w-token stride-1 window with its
    * 1-based start position and md5 key. Documents shorter than w emit
    * no rows. The md5 is projected at the scan, so every downstream
    * shuffle moves 32-hex keys, never token text. */
  def tokenWindows(docs: DataFrame, w: Int, idCol: String = "doc_id",
      toksCol: String = "toks"): DataFrame = {
    val toks = col(toksCol)
    val n = size(toks)
    docs.select(col(idCol).as("doc_id"),
        posexplode(when(n >= w,
          transform(sequence(lit(1), n - (w - 1)),
            i => md5(concat_ws(" ",
              (0 until w).map(j => element_at(toks, i + j)): _*))))
          .otherwise(array().cast("array<string>"))).as(Seq("i0", "wh")))
      .select(col("doc_id"), (col("i0") + 1).cast("long").as("i"), col("wh"))
  }

  /** Rewrite each document dropping every token position covered by a
    * window start in `starts` (doc_id, i): positions i..i+w-1 of each
    * start are removed, survivors reassemble in original order. One row
    * per input doc: (doc_id, n_tokens, n_removed, text_clean).
    *
    * Coverage cost is honest and bounded: each flagged start explodes w
    * positions (distinct-folded), so the extra shuffle volume is
    * O(flagged spans · w) — proportional to the text actually being
    * removed, not to the corpus. */
  private[pipeline] def dropCovered(docs: DataFrame, starts: DataFrame,
      w: Int, idCol: String, toksCol: String): DataFrame = {
    val covered = starts.select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (w - 1))).as("p"))
      .distinct()
    val tokRows = docs.select(col(idCol).as("doc_id"),
        posexplode(col(toksCol)).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("tok"))
    val kept = tokRows.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            x => x.getField("tok")), " ").as("text_clean"))
    docs.select(col(idCol).as("doc_id"),
        size(col(toksCol)).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** (doc_id, i): the start positions of every w-token window whose
    * exact sequence occurs ≥2 times corpus-wide (self-repeats included)
    * — THE single definition of "duplicated span start" that detection
    * ([[dupSpanIslands]]) and removal ([[removeDupSpans]]) share. The
    * frequency is a map-side-combined count over md5 keys; the join back
    * moves the same fixed-width keys. */
  private def dupStarts(docs: DataFrame, w: Int, idCol: String,
      toksCol: String): DataFrame = {
    val wins = tokenWindows(docs, w, idCol, toksCol)
    val freq = wins.groupBy("wh").agg(count(lit(1)).as("c"))
    wins.join(freq.filter(col("c") >= 2), "wh").select("doc_id", "i")
  }

  /** Exact-substring REMOVAL — the second half of Lee et al.'s dedup
    * (detection is [[dupSpanStats]]): every token covered by a
    * duplicated window ([[dupStarts]]) is cut, and the survivors
    * reassemble in order. A fully-duplicated document survives as an
    * empty `text_clean` so downstream length filters see it.
    *
    * Same scale shape as [[lineDedup]], plus the positional rewrite of
    * [[dropCovered]] — reassembly groups on doc_id, the key the corpus
    * is usually already partitioned by. */
  def removeDupSpans(docs: DataFrame, w: Int = 8, idCol: String = "doc_id",
      toksCol: String = "toks"): DataFrame =
    dropCovered(docs, dupStarts(docs, w, idCol, toksCol), w, idCol, toksCol)

  /** Per-document duplicated-span ISLANDS: maximal runs of CONSECUTIVE
    * duplicated window starts (the gaps-and-islands pattern: starts
    * sorted per doc, island key = start − rank). A run of `r`
    * consecutive dup starts witnesses one contiguous duplicated span of
    * `r + w − 1` tokens — the per-document "how long is the longest
    * copied passage" signal that [[dupSpanStats]]' flat fraction can't
    * express (a doc with one 500-token copied block and a doc with 500
    * scattered 8-token matches have the same dup_frac but very
    * different cleanup strategies).
    *
    * One row per input doc: (doc_id, n_islands, longest_span); docs with
    * no duplicated windows report (0, 0). The per-doc window sort is
    * bounded by document length — no global ordering anywhere. */
  def dupSpanIslands(docs: DataFrame, w: Int = 8, idCol: String = "doc_id",
      toksCol: String = "toks"): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    val runs = dupStarts(docs, w, idCol, toksCol)
      .withColumn("grp", col("i") - row_number().over(byDoc))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
    val perDoc = runs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_islands"),
        max(col("run") + lit((w - 1).toLong)).as("longest_span"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        coalesce(col("longest_span"), lit(0L)).as("longest_span"))
  }

  /** Per-document duplicated-span stats over w-token stride-1 windows:
    * (doc_id, n_windows, n_dup_windows, dup_frac) where a window is
    * "dup" when its exact token sequence occurs ≥2 times corpus-wide
    * (including self-repeats — a doc that repeats its own span IS
    * duplicated text). Documents shorter than w tokens report 0
    * windows and dup_frac 0. `toksCol` must be a materialized column
    * (see [[Dedup.shinglesFromTokens]] for the O(len²) inlining
    * pitfall). */
  def dupSpanStats(docs: DataFrame, w: Int = 8, idCol: String = "doc_id",
      toksCol: String = "toks"): DataFrame = {
    val windows = tokenWindows(docs, w, idCol, toksCol).select("doc_id", "wh")
    val freq = windows.groupBy("wh").agg(count(lit(1)).as("c"))
    val perDoc = windows.join(freq, "wh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        when(coalesce(col("n_windows"), lit(0L)) > 0,
          round(col("n_dup_windows").cast("double") /
            col("n_windows").cast("double"), 6))
          .otherwise(lit(0.0)).as("dup_frac"))
  }
}
