package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus reporting: the "data card" rollup a training-data release ships
 * with (per-language × per-source volumes, token counts, exact-dup
 * rates — the composition tables of Gebru et al.'s Datasheets for
 * Datasets and every LLM data report since).
 *
 * One pass over the corpus; CUBE(lang, source) computes the full matrix,
 * the two marginals, and the corpus total in a single aggregate.
 */
object CorpusReport {

  /**
   * Data-card composition rollup: for every (lang, source) cell plus
   * marginals and the grand total (CUBE), report document count, exact
   * content-distinct count (dup signal), token and char volumes, and
   * the char-length range. Cube nulls surface as 'ALL'.
   *
   * Scale shape: the CUBE expands each row into 4 grouping sets, but
   * partial aggregation collapses them map-side to (langs+1) ×
   * (sources+1) rows — the only real shuffle is the exact
   * `countDistinct(fingerprint)`, which is fingerprint-keyed (the same
   * cost class as exact dedup, paid once per card). When even that is
   * too much at 100 TB, swap `approx_count_distinct` in — the HLL
   * sketch merges per grouping set and drops the distinct shuffle; the
   * exact count here is the oracle-checkable path.
   */
  def dataCard(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
        col("n_chars"),
        TextAnalysis.fingerprint(col("text")).as("fpr"))
      .cube("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fpr")).as("n_unique"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("n_unique"), col("n_tokens"),
        col("n_chars"), col("min_chars"), col("max_chars"))

  /**
   * Data-card DELTA of a curation decision: the corpus with a boolean
   * `kept` verdict column (dedup keeper flag, quality-gate pass, a
   * sampler's keep decision — any of the pipeline's per-doc verdicts),
   * rolled up per (lang, source) CUBE cell into before/after/removed
   * volumes — the impact table every release review reads.
   *
   * Deliberately ONE flagged pass, not two [[dataCard]]s joined: the
   * kept flag rides each row, so before = count, after = conditional
   * sum in the same aggregate — half the scans, no card-level join,
   * and immune to Spark's ambiguous-self-join analysis (both "sides"
   * of a curation diff always share their lineage root).
   *
   * Scale shape: identical to [[dataCard]] minus the distinct shuffle —
   * one cube aggregate collapsing map-side to card-sized output.
   */
  def dataCardDiff(docs: DataFrame, kept: Column): DataFrame =
    docs
      .select(col("lang"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
        kept.cast("long").as("k"))
      .cube("lang", "source")
      .agg(
        count(lit(1)).as("n_docs_before"),
        sum(col("k")).as("n_docs_after"),
        sum(col("n_tok")).as("n_tokens_before"),
        sum(col("n_tok") * col("k")).as("n_tokens_after"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs_before"), col("n_docs_after"),
        (col("n_docs_before") - col("n_docs_after")).as("docs_removed"),
        col("n_tokens_before"), col("n_tokens_after"),
        (col("n_tokens_before") - col("n_tokens_after"))
          .as("tokens_removed"))
}
