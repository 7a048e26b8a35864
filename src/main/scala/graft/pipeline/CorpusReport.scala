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
   * The documented 100-TB swap of [[dataCard]], as real code: identical
   * cube rollup with `approx_count_distinct` (HLL++, rsd 5% default)
   * replacing the exact fingerprint distinct — the HLL sketch merges
   * per grouping set map-side, so the card costs ONE scan with NO
   * distinct shuffle at all. No DuckDB oracle by nature (HLL estimates
   * are engine-specific); CorpusReportSpec pins every cell within the
   * rsd envelope of the exact card and all non-estimate columns equal.
   */
  def dataCardApprox(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    docs
      .select(col("lang"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
        col("n_chars"),
        TextAnalysis.fingerprint(col("text")).as("fpr"))
      .cube("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("fpr"), rsd).as("n_unique_approx"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("n_unique_approx"), col("n_tokens"),
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

  /**
   * Corpus Zipf/Heaps health report (one row): least-squares fit of
   * ln(freq) against ln(rank) over the top `topK` token frequencies —
   * natural text follows freq ∝ rank^s with s ≈ −1 (Zipf's law), so a
   * corpus whose slope drifts far from −1 is boilerplate-heavy (flat
   * head) or over-filtered (cliff head); `zipf_r2` says how well the
   * power law holds at all. Heaps' law exponent
   * (ln vocab / ln total tokens ≈ 0.4–0.6 for natural text) rides
   * along as the vocabulary-growth signal. Together these are the
   * two-line "does this corpus still look like language?" check a
   * release gate runs after heavy dedup/filtering.
   *
   * Cross-engine determinism: ln(rank)/ln(freq) are 1e6-quantized to
   * integers per row, all five regression sums are BIGINT (exact in
   * any order), and slope/r²/heaps are assembled from those exact
   * sums by the identical double-arithmetic expression in both
   * engines, then rounded.
   *
   * Scale shape: token counts are word-count-shaped (map-side
   * combine); the top-K is a TakeOrdered (per-partition heaps, never
   * a global sort); the regression runs over topK rows. Corpus size
   * enters only through the counting scan.
   */
  def zipfReport(docs: DataFrame, topK: Int = 1000): DataFrame = {
    require(topK >= 2, s"topK must be >= 2, got $topK")
    val counts = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("n_tokens_total"),
      count(lit(1)).as("vocab"))
    // rank over the already-TakeOrdered topK frame — the unpartitioned
    // window is bounded by topK rows by construction
    val top = counts.orderBy(col("c").desc, col("tok")).limit(topK)
      .select(col("c"), row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("tok"))).cast("long").as("rank"))
    val pts = top.select(
      round(log(col("rank").cast("double")) * 1e6).cast("long").as("x"),
      round(log(col("c").cast("double")) * 1e6).cast("long").as("y"))
    val sums = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    val num = col("n").cast("double") * col("sxy") -
      col("sx").cast("double") * col("sy")
    val denX = col("n").cast("double") * col("sxx") -
      col("sx").cast("double") * col("sx")
    val denY = col("n").cast("double") * col("syy") -
      col("sy").cast("double") * col("sy")
    sums.crossJoin(totals).select(
      col("n_tokens_total"), col("vocab"), col("n").as("top_k"),
      round(num / denX, 6).as("zipf_slope"),
      round((num * num) / (denX * denY), 6).as("zipf_r2"),
      round(log(col("vocab").cast("double")) /
        log(col("n_tokens_total").cast("double")), 6).as("heaps_beta"))
  }

  // ---- incremental (mergeable) data card ----------------------------------

  /**
   * Mergeable sufficient-statistics STATE per (lang, source) cell: the
   * additive columns (counts, sums, min/max) plus a DataSketches HLL
   * sketch of the content fingerprints standing in for the
   * non-additive distinct count. `merge(statsState(A), statsState(B))`
   * renders the same card as `statsState(A ∪ B)` — bit-equal on every
   * additive column (oracle-certified by `report_card_incremental`),
   * sketch-estimate within rsd on the distinct (CorpusReportSpec).
   *
   * This is the 100-TB maintenance story for [[dataCard]]: a corpus
   * that ingests daily never re-scans history — each batch reduces to
   * its cells-sized state (kilobytes), and the release card is a
   * cells-sized merge. The same state powers corpus DIFFERENCE cards
   * (what did this month add) without touching the old data.
   */
  def statsState(docs: DataFrame, lgK: Int = 12): DataFrame =
    docs
      .select(col("lang"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"),
        col("n_chars"),
        TextAnalysis.fingerprint(col("text")).as("fpr"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        hll_sketch_agg(col("fpr"), lit(lgK)).as("fpr_sketch"),
        kll_sketch_agg_bigint(col("n_chars")).as("chars_kll"))

  /** Merge two (or, folded, any number of) stats states cell-wise:
    * sums add, min/max fold, sketches union (HLL for the distinct, KLL
    * for the length distribution). Cost: a cells-sized aggregate — the
    * corpus is never touched. */
  def mergeStatsState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("lang", "source")
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("min_chars")).as("min_chars"),
        max(col("max_chars")).as("max_chars"),
        hll_union_agg(col("fpr_sketch")).as("fpr_sketch"),
        kll_merge_agg_bigint(col("chars_kll")).as("chars_kll"))

  /** Render a state as the card: estimate distinct + length quantiles,
    * drop the binary sketches. The KLL columns make the incremental
    * card distribution-aware — median/p90 lengths maintained without
    * ever re-scanning history (exact percentile needs the raw data;
    * KLL is the mergeable form, same trade as HLL vs countDistinct). */
  /**
   * Join/shuffle skew diagnosis for a key column: per-key row counts
   * rolled into the numbers an operator-tuning decision needs — max vs
   * mean key size (the skew factor), the p99, and the salt factor that
   * would level the hottest key to the average (what a manual salting
   * pass would use; AQE's skew-join split consumes the same signal at
   * runtime). Two aggregates: one keyed count (map-side combined), one
   * keys-sized rollup — diagnosis never costs more than the groupBy it
   * diagnoses.
   */
  /**
   * Per-source length-distribution profile: exact quartiles + p90 of
   * `n_chars` and the mean, one row per source — the distribution
   * table the data card's min/max bracket can't show (is a source
   * short-snippet-heavy? bimodal after filtering?). Exact `percentile`
   * is a per-group sort-based aggregate — the certified path; at
   * 100 TB swap `percentile_approx` (mergeable sketch, no sort) or
   * read the KLL quantiles already riding [[statsState]].
   */
  def lengthProfile(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 6).as("mean_chars"),
        round(expr("percentile(n_chars, 0.25)"), 6).as("p25_chars"),
        round(expr("percentile(n_chars, 0.5)"), 6).as("p50_chars"),
        round(expr("percentile(n_chars, 0.75)"), 6).as("p75_chars"),
        round(expr("percentile(n_chars, 0.9)"), 6).as("p90_chars"))

  /**
   * Vocabulary coverage curve: for each cutoff N, what fraction of all
   * token OCCURRENCES the N most frequent token types cover — the curve
   * a tokenizer-vocabulary sizing decision reads (e.g. "32k types cover
   * 97.1% of tokens").
   *
   * Scale design: computed from the count-of-counts histogram, NOT a
   * global sort of the vocabulary. Types tied at the same frequency are
   * interchangeable for coverage, so coverage(N) is exactly: all
   * frequency classes wholly above the cutoff plus a partial slice of
   * the boundary class — Σ c·clamp(N − prev_types, 0, nt) over histogram
   * rows. The only unpartitioned window runs over the histogram, whose
   * row count is O(√total-tokens) by the standard count-of-counts bound
   * (distinct frequencies c₁>c₂>… satisfy Σcᵢ ≤ T, so at most ~√(2T)
   * of them) — bounded even at 100 TB. The cutoffs frame (|cutoffs|
   * rows) is broadcast; the cross join is constant-size, never
   * corpus-sized.
   */
  def vocabCoverage(docs: DataFrame,
      cutoffs: Seq[Long] = Seq(10L, 100L, 1000L, 10000L)): DataFrame = {
    val hist = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("nt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val withPrev = hist.withColumn("prev_types",
      coalesce(sum(col("nt")).over(w), lit(0L)))
    import docs.sparkSession.implicits._
    val cuts = cutoffs.toDF("cutoff")
    val used = least(col("nt"),
      greatest(col("cutoff") - col("prev_types"), lit(0L)))
    withPrev.crossJoin(broadcast(cuts))
      .groupBy("cutoff")
      .agg(
        sum(used).as("n_types_used"),
        sum(col("c") * used).as("covered_tokens"),
        sum(col("c") * col("nt")).as("total_tokens"))
      .select(col("cutoff"), col("n_types_used"), col("covered_tokens"),
        col("total_tokens"),
        round(col("covered_tokens").cast("double") /
          col("total_tokens").cast("double"), 6).as("coverage"))
  }

  /**
   * Exact two-sample Kolmogorov–Smirnov drift statistic between two
   * corpus slices over an integer-valued per-row statistic (token
   * count here): KS = max over values of |F_a(v) − F_b(v)|, with the
   * value attaining it. The refresh-time alarm — "did this snapshot's
   * length distribution move?" — with an exact statistic instead of a
   * binned histogram diff.
   *
   * Exactness: the max is taken over the cross-multiplied form
   * |cumA·n_b − cumB·n_a| (ties to the lowest value) with the products
   * in DOUBLE — exact below 2⁵³ and correctly-rounded above, the same
   * IEEE ops in both engines (64-bit integer products would silently
   * wrap once a slice passes ~3e9 rows); the single division happens
   * once at the end.
   *
   * Scale shape: each side collapses to (value, count) at scan speed
   * (map-side combined); the one unpartitioned cumulative window runs
   * over the DISTINCT VALUES of the statistic — token counts, a frame
   * bounded by the longest document, not the corpus.
   */
  def ksDrift(a: DataFrame, b: DataFrame,
      textCol: String = "text"): DataFrame = {
    def counted(df: DataFrame, side: String) = df
      .select(size(TextAnalysis.tokens(col(textCol))).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as(side))
    val merged = counted(a, "ca").join(counted(b, "cb"), Seq("v"), "full")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        0)
    val cum = merged
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
    val tot = cum.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cum.crossJoin(broadcast(tot))
      .select(col("v"), col("na"), col("nb"),
        abs(col("cum_a").cast("double") * col("nb").cast("double") -
          col("cum_b").cast("double") * col("na").cast("double"))
          .as("xdiff"))
      .orderBy(col("xdiff").desc, col("v")).limit(1)
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round(col("xdiff") /
          (col("na").cast("double") * col("nb").cast("double")), 6)
          .as("ks_stat"),
        col("v").as("at_value"))
  }

  def joinSkewReport(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(keyCol).agg(count(lit(1)).as("c"))
      .agg(
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_key_rows"),
        round(avg(col("c")), 6).as("avg_key_rows"),
        round(expr("percentile(c, 0.99)"), 6).as("p99_key_rows"))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        col("avg_key_rows"), col("p99_key_rows"),
        round(col("max_key_rows").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")), 6)
          .as("skew_factor"),
        ceil(col("max_key_rows").cast("double") * col("n_keys").cast("double")
          / col("n_rows").cast("double")).cast("long").as("suggested_salt"))

  def renderState(state: DataFrame): DataFrame =
    state.select(col("lang"), col("source"), col("n_docs"),
      hll_sketch_estimate(col("fpr_sketch")).as("n_unique_approx"),
      col("n_tokens"), col("n_chars"), col("min_chars"), col("max_chars"),
      kll_sketch_get_quantile_bigint(col("chars_kll"), lit(0.5))
        .as("p50_chars"),
      kll_sketch_get_quantile_bigint(col("chars_kll"), lit(0.9))
        .as("p90_chars"))

  /**
   * Per-domain crawl profile — the rollup behind domain-level curation
   * decisions (domain allow/deny lists, per-domain crawl budgets): for
   * each host of the CANONICAL url ([[Dedup.canonicalizeUrl]], so URL
   * variants of one page count as one page), the document count,
   * distinct-page count, the recrawl duplication ratio those two imply,
   * and mean document size. Input needs (`urlCol`, `n_chars`); one
   * host-keyed aggregate with map-side combine — domains are the
   * textbook skewed key (a crawler's biggest host can be 1000× the
   * median), and count-distinct of canonicals inside the aggregate
   * handles that without a second shuffle.
   */
  def domainProfile(docs: DataFrame, urlCol: String = "url"): DataFrame = {
    val canon = Dedup.canonicalizeUrl(col(urlCol))
    docs
      .select(regexp_extract(canon, "^[a-z0-9+.-]+://([^/?#]+)", 1)
          .as("domain"),
        canon.as("canonical_url"), col("n_chars"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_url")).as("n_pages"),
        round(lit(1.0) - countDistinct(col("canonical_url")).cast("double")
          / count(lit(1)).cast("double"), 6).as("dup_ratio"),
        round(avg(col("n_chars")), 6).as("mean_chars"))
  }

  /**
   * Robust per-language length-outlier report: median / MAD (median
   * absolute deviation) over per-document token counts, and how many
   * documents fall outside median ± z·MAD. The robust statistics make
   * this the screen a curation pass runs BEFORE hard length cutoffs —
   * unlike mean/stddev, a tail of giant concatenation-bug documents
   * cannot drag the fence toward itself.
   *
   * Determinism: token counts are integers, `percentile` at 0.5 is the
   * same linear-interpolation rule as DuckDB's quantile_cont, so medians
   * and MADs land on exact binary fractions (k/2) and every fence
   * comparison is exact in both engines.
   *
   * Scale shape: two grouped exact percentiles over (langs) groups plus
   * a broadcast of the per-lang bounds frame (|langs| rows). At 100 TB
   * swap `percentile` for `percentile_approx` (KLL-style sketch, one
   * pass, mergeable); the exact form here is the oracle-checkable path.
   */
  def qualityOutlierReport(docs: DataFrame, z: Double = 3.0,
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val nt = docs.select(col(langCol).as("lang"),
      size(TextAnalysis.tokens(col(textCol))).cast("double").as("nt"))
    val med = nt.groupBy("lang").agg(expr("percentile(nt, 0.5)").as("med_nt"))
    val mad = nt.join(broadcast(med), "lang")
      .select(col("lang"), abs(col("nt") - col("med_nt")).as("dev"))
      .groupBy("lang").agg(expr("percentile(dev, 0.5)").as("mad_nt"))
    val bounds = med.join(mad, "lang")
    nt.join(broadcast(bounds), "lang")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(min(col("med_nt")), 6).as("med_nt"),
        round(min(col("mad_nt")), 6).as("mad_nt"),
        sum(when(col("nt") < col("med_nt") - lit(z) * col("mad_nt"), 1L)
          .otherwise(0L)).as("n_low"),
        sum(when(col("nt") > col("med_nt") + lit(z) * col("mad_nt"), 1L)
          .otherwise(0L)).as("n_high"))
      .select(col("lang"), col("n_docs"), col("med_nt"), col("mad_nt"),
        col("n_low"), col("n_high"),
        round((col("n_low") + col("n_high")).cast("double") /
          col("n_docs").cast("double"), 6).as("outlier_frac"))
  }

  /**
   * Vocabulary-growth (Heaps'-law) curve: vocabulary size after the
   * first `c` tokens of the corpus stream (documents in `doc_id` order,
   * tokens in document order), sampled at 20 evenly spaced checkpoints
   * `c_j = ⌊j·N/20⌋`. A curve that keeps climbing near-linearly means
   * the corpus keeps contributing novel types (healthy diversity); an
   * early plateau is the signature of template/boilerplate floods.
   *
   * The corpus-stream position is exact WITHOUT a single-partition
   * window: per-document offsets come from
   * [[graft.operators.GlobalRank.withRunningTotal]] (range shuffle over
   * the doc-count-sized frame + one Long per partition on the driver),
   * token positions are offset + in-document ordinal, and the
   * first-occurrence position per type is a word-count-shaped min. The
   * checkpoint rollup broadcasts the 20-row checkpoint table against
   * the vocab-sized first-occurrence frame; partial aggregation
   * collapses it to ≤ 20 rows per task before the only small shuffle.
   */
  def heapsCurve(docs: DataFrame, checkpoints: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    renderHeaps(vocabState(docs, idCol, textCol), checkpoints)

  /**
   * Mergeable vocabulary-growth state: `(tok, first_pos, n_total)` —
   * each type's first corpus-stream position plus the stream length
   * (carried as a constant column so the state is one self-contained
   * frame, the [[statsState]] convention). [[mergeVocabState]] appends
   * stream B after stream A by shifting B's positions by A's length and
   * taking the per-type min — EXACTLY what a one-shot pass over A ++ B
   * computes, so merge-vs-one-shot is a theorem (certified by
   * `report_heaps_incremental` against the one-shot oracle). A daily
   * ingest updates the curve from yesterday's vocab-sized state without
   * re-scanning history.
   */
  def vocabState(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val counts = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_tok"))
    val offs = graft.operators.GlobalRank
      .withRunningTotal(counts, Seq(col("doc_id")), "n_tok", "cum_tok")
      .select(col("doc_id"), (col("cum_tok") - col("n_tok")).as("doc_off"))
    val total = counts.agg(coalesce(sum(col("n_tok")), lit(0L)))
      .head().getLong(0)
    toks.join(offs, "doc_id")
      .select(posexplode(col("toks")).as(Seq("i", "tok")), col("doc_off"))
      .select(col("tok"), (col("doc_off") + col("i") + 1L).as("pos"))
      .groupBy("tok").agg(min(col("pos")).as("first_pos"))
      .withColumn("n_total", lit(total))
  }

  /** Append state `b`'s stream after state `a`'s: shift, union, min. */
  def mergeVocabState(a: DataFrame, b: DataFrame): DataFrame = {
    def totalOf(s: DataFrame): Long =
      s.agg(coalesce(max(col("n_total")), lit(0L))).head().getLong(0)
    val aTot = totalOf(a)
    val bTot = totalOf(b)
    a.select(col("tok"), col("first_pos"))
      .unionAll(b.select(col("tok"), (col("first_pos") + aTot)
        .as("first_pos")))
      .groupBy("tok").agg(min(col("first_pos")).as("first_pos"))
      .withColumn("n_total", lit(aTot + bTot))
  }

  /** Checkpoint rollup of a [[vocabState]]: `(checkpoint_tokens,
    * vocab)` at `⌊j·N/checkpoints⌋`. */
  def renderHeaps(state: DataFrame, checkpoints: Int = 20): DataFrame = {
    require(checkpoints > 0, s"checkpoints must be positive: $checkpoints")
    val spark = state.sparkSession
    val total = state.agg(coalesce(max(col("n_total")), lit(0L)))
      .head().getLong(0)
    val cps = (1 to checkpoints).map(j => j.toLong * total / checkpoints)
      .filter(_ > 0).distinct
    import spark.implicits._
    val cpDf = cps.toDF("checkpoint_tokens")
    state.join(broadcast(cpDf),
        col("first_pos") <= col("checkpoint_tokens"))
      .groupBy("checkpoint_tokens")
      .agg(count(lit(1)).as("vocab"))
  }

  /**
   * Token-weighted duplication cost per source: how many documents and
   * tokens exact dedup ([[Dedup.exact]]'s fingerprint, min-id keeper)
   * would remove from each source. The document-count dup rate
   * understates the cost when duplicated documents are long — the token
   * fraction here is the number that moves a storage/compute budget.
   *
   * Scale shape: one fingerprint-keyed aggregate (the exact-dedup
   * shuffle, map-side combined) + one fingerprint-keyed join back +
   * one source-keyed rollup. No new cost class over exact dedup itself.
   */
  def dupInflation(docs: DataFrame, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
      TextAnalysis.fingerprint(col(textCol)).as("fingerprint"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tok"))
    val keepers = fp.groupBy("fingerprint")
      .agg(min(col("doc_id")).as("keep_doc_id"))
    fp.join(keepers, "fingerprint")
      .withColumn("is_dup",
        (col("doc_id") =!= col("keep_doc_id")).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_dup")).as("n_dup_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("is_dup") * col("n_tok")).as("n_dup_tokens"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        col("n_tokens"), col("n_dup_tokens"),
        round(col("n_dup_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("dup_token_frac"))
  }

  /**
   * Quality-vs-volume tradeoff curve: for each threshold on the fixed
   * 21-point grid `t_j = j/20`, how many documents and tokens survive
   * `quality_score ≥ t_j` — the table read when CHOOSING a quality
   * cutoff (every cutoff is a token-budget decision; this shows the
   * whole frontier instead of one point). Thresholds keyed by the
   * integer grid index so the output never hashes a float key.
   *
   * Scale shape: one quality scan, a 21-row broadcast expansion
   * collapsed map-side to ≤ 21 rows per task, one tiny shuffle — the
   * [[heapsCurve]] checkpoint-rollup shape.
   */
  def qualityVolumeCurve(docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val scored = TextAnalysis.withQuality(docs, textCol)
      .select(col("quality_score"),
        col("n_tokens").cast("long").as("n_tok"))
    val total = scored.agg(coalesce(sum(col("n_tok")), lit(0L)))
      .head().getLong(0)
    import spark.implicits._
    val grid = (0 to 20).map(j => (j.toLong, j.toDouble / 20))
      .toDF("thr_idx", "thr")
    scored.join(broadcast(grid), col("quality_score") >= col("thr"))
      .groupBy("thr_idx", "thr")
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_tok")).as("n_tokens_kept"))
      .withColumn("token_frac",
        round(col("n_tokens_kept").cast("double") / total.toDouble, 6))
  }

  /**
   * Per-source PII exposure profile: document counts, per-type match
   * totals (email / IPv4 / phone, the [[TextAnalysis.redactPii]]
   * patterns — one source of truth for detection AND redaction), and
   * the fraction of documents carrying any PII. The release-review
   * rollup read before deciding where redaction must run.
   *
   * Scale shape: regexp counts are per-row column math at scan speed;
   * the only shuffle is the |sources|-row rollup (map-side combined).
   */
  def piiProfile(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(col(sourceCol).as("source"),
        regexp_count(t, lit(TextAnalysis.emailRe)).cast("long").as("ne"),
        regexp_count(t, lit(TextAnalysis.ipv4Re)).cast("long").as("ni"),
        regexp_count(t, lit(TextAnalysis.phoneRe)).cast("long").as("np"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ne") + col("ni") + col("np") > 0, 1L).otherwise(0L))
          .as("n_docs_with_pii"),
        sum(col("ne")).as("n_emails"),
        sum(col("ni")).as("n_ips"),
        sum(col("np")).as("n_phones"))
      .withColumn("pii_doc_frac",
        round(col("n_docs_with_pii").cast("double") /
          col("n_docs").cast("double"), 6))
  }

  /**
   * Per-source curation scorecard — the one table a release review
   * actually reads, composing four certified components on the `source`
   * key: volumes and token-weighted exact-dup cost ([[dupInflation]]),
   * cross-source near-dup leakage ([[clusterPurity]] over the given
   * cluster labels), the garbage rate ([[TextAnalysis
   * .withGarbageScore]]), and mean quality ([[TextAnalysis
   * .withQuality]], integer micro-sum). The COMPOSITION is certified
   * (`pipe_curation_report` replays all four in one oracle), the same
   * discipline as `pipe_quality_chain`/`pipe_lexical_screen`.
   *
   * Scale shape: each component's own shape (fingerprint shuffle, pair
   * graph, two scans); the final joins are |sources|-row broadcasts.
   */
  def curationScorecard(docs: DataFrame, clusters: DataFrame,
      sourceCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val di = dupInflation(docs, sourceCol, idCol, textCol)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("dup_token_frac"))
    val cp = clusterPurity(docs, clusters, sourceCol, idCol)
      .select(col("source"), col("cross_frac"))
    val gq = TextAnalysis.withGarbageScore(
        TextAnalysis.withQuality(docs, textCol), textCol)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("is_garbage").cast("long")).as("ng"),
        sum(round(col("quality_score") * 1e6).cast("long")).as("qm"))
      .select(col("source"),
        round(col("ng").cast("double") / col("n").cast("double"), 6)
          .as("garbage_frac"),
        round(col("qm").cast("double") / (col("n").cast("double") * 1e6), 6)
          .as("avg_quality"))
    di.join(cp, "source").join(gq, "source")
  }

  /**
   * Cross-source leakage in near-dup clusters: per source, how many of
   * its documents sit in a content cluster that spans MORE THAN ONE
   * source. High leakage means per-source dedup (the cheap, common
   * setup) would silently keep cross-source copies — the report that
   * justifies paying for global dedup. `clusters` is any certified
   * `(doc_id, cluster_id)` labeling (e.g.
   * [[Dedup.connectedComponents]] over [[Dedup.simhashPairs]]);
   * unlabeled documents count as singletons of their own id.
   *
   * Scale shape: all frames after the left join are pair-graph- or
   * cluster-sized; the corpus contributes one doc-keyed join and one
   * source-keyed rollup.
   */
  def clusterPurity(docs: DataFrame, clusters: DataFrame,
      sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val mem = docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
      .join(clusters.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val span = mem.groupBy("cluster_id")
      .agg(countDistinct(col("source")).as("n_sources"))
    mem.join(span, "cluster_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_sources") > 1, 1L).otherwise(0L))
          .as("n_cross_docs"),
        countDistinct(when(col("n_sources") > 1, col("cluster_id")))
          .as("n_cross_clusters"))
      .select(col("source"), col("n_docs"), col("n_cross_docs"),
        col("n_cross_clusters"),
        round(col("n_cross_docs").cast("double") /
          col("n_docs").cast("double"), 6).as("cross_frac"))
  }

  /**
   * Exact-sum Pearson correlation matrix over numeric measure columns
   * — ONE pass, engine-reproducible: each value is scaled to an
   * integer (`round(x·10^scale)` — inputs with ≤ `scale` decimals land
   * on exact integers, so the two engines' round() disagreement at
   * 1e-6 midpoints cannot trigger) and every moment (Σx, Σx², Σxy)
   * accumulates EXACTLY in decimal(38,0) — no float summation order
   * anywhere, which is what makes a grouped float aggregate
   * nondeterministic across partitionings in the first place. The
   * closed-form correlation is evaluated in double from the exact
   * moments (identical operand doubles + op order ⇒ identical IEEE
   * results), rounded to 1e-6.
   *
   * Scale shape: one scan, one row of (2·d + d·(d+1)/2) partial-
   * aggregated moments — no shuffle beyond the single global agg.
   * Output: (var_a, var_b, corr) for each unordered pair a < b (by
   * declaration order).
   */
  def corrMatrix(df: DataFrame, cols: Seq[String],
      scale: Int = 4): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    require(scale >= 0 && scale <= 9, s"scale must be in [0,9], got $scale")
    val spark = df.sparkSession
    import spark.implicits._
    val f = math.pow(10.0, scale)
    def m(c: String) =
      round(col(c).cast("double") * lit(f)).cast("decimal(38,0)")
    val aggs =
      Seq(count(lit(1)).cast("decimal(38,0)").as("__n")) ++
        cols.map(c => sum(m(c)).as(s"__s_$c")) ++
        cols.map(c => sum(m(c) * m(c)).as(s"__q_$c")) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum(m(a) * m(b)).as(s"__p_${a}_$b")
        }.toSeq
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    def d(name: String): Double =
      r.getDecimal(r.fieldIndex(name)).doubleValue()
    val n = d("__n")
    val out = cols.combinations(2).map { case Seq(a, b) =>
      val num = n * d(s"__p_${a}_$b") - d(s"__s_$a") * d(s"__s_$b")
      val va = n * d(s"__q_$a") - d(s"__s_$a") * d(s"__s_$a")
      val vb = n * d(s"__q_$b") - d(s"__s_$b") * d(s"__s_$b")
      (a, b, BigDecimal(num / math.sqrt(va * vb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq
    out.toDF("var_a", "var_b", "corr")
  }
}
