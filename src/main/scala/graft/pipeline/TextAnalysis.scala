package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: tokenization,
 * language-ID, quality scoring, token counting, document fingerprinting.
 *
 * All pure column expressions (whole-stage-codegen friendly, no UDFs) so
 * they run at scan speed over 100 TB of documents; every function has an
 * exact DuckDB SQL mirror in [[graft.queries.PipelineQueries]].
 */
object TextAnalysis {

  /** Normalized text: lowercase, whitespace collapsed to single spaces. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normText(text), " ")

  /** Stable document fingerprint = md5 of normalized text. */
  def fingerprint(text: Column): Column = md5(normText(text))

  /**
   * Production text normalization — the cleanup pass a web corpus runs
   * BEFORE any hashing/fingerprinting so near-identical renderings
   * (curly vs straight quotes, NBSP vs space, zero-width junk) hash
   * identically. Case is PRESERVED — this cleans content, it is not a
   * dedup key ([[normText]] remains the lowercased hashing key; run
   * this first when both are wanted). Rules, each SQL-replayable:
   *
   *  - zero-width characters (ZWSP/ZWNJ/ZWJ), BOM, and soft hyphens
   *    are removed
   *  - NBSP and thin/narrow spaces become plain spaces
   *  - typographic single/double quotes become straight `'` / `"`
   *  - en/em dashes and horizontal bar become `-`; ellipsis `…`
   *    becomes `...`
   *  - remaining C0/C1 control characters become spaces
   *  - whitespace collapses to single spaces; ends trimmed
   *
   * Everything is `translate` (1:1 maps) + three `regexp_replace`
   * passes — scan-stage column math, codegen'd, no UDF. Accent folding
   * (NFD/NFKC) is deliberately out of scope: Spark SQL has no native
   * unicode normalizer and a JVM UDF would break both codegen and the
   * DuckDB replay.
   */
  def normalizeUnicode(text: Column): Column = {
    val noZw = regexp_replace(text, "[\u200B\u200C\u200D\uFEFF\u00AD]", "")
    val mapped = translate(noZw,
      "\u00A0\u2009\u202F\u2018\u2019\u201A\u201C\u201D\u201E\u2013\u2014\u2015",
      "   '''\"\"\"---")
    val dots = regexp_replace(mapped, "\u2026", "...")
    val noCtl = regexp_replace(dots, "\\p{Cc}", " ")
    regexp_replace(trim(noCtl), "\\s+", " ")
  }

  /** BPE-ish token count: alpha runs, digit runs, single punctuation. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Adjacent token bigrams (empty below 2 tokens — `sequence(1, n)` with
    * n<1 would generate a descending sequence, see
    * [[Dedup.shinglesFromTokens]]). */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Intra-document repetition signals (Gopher-style quality rule): the
    * fraction of a document's word trigrams that are repeats. Boilerplate
    * and degenerate generations repeat heavily; prose doesn't. Pure
    * column math — `toks` must be a MATERIALIZED column (see
    * [[Dedup.shinglesFromTokens]] for the O(len²) inlining pitfall). */
  def withRepetition(df: DataFrame, toksCol: String = "toks"): DataFrame = {
    val toks = col(toksCol)
    val tris = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    // project the trigram array into a named column so the three derived
    // columns share one subtree (CollapseProject may re-inline the alias,
    // but the canonically-equal subtrees then dedupe via subexpression
    // elimination — either way the array builds once per row, not 3x)
    df.withColumn("_tris", tris)
      .withColumn("n_trigrams", size(col("_tris")).cast("long"))
      .withColumn("n_distinct_trigrams",
        size(array_distinct(col("_tris"))).cast("long"))
      .withColumn("dup_frac",
        when(col("n_trigrams") > 0,
          round(lit(1.0) - col("n_distinct_trigrams").cast("double") /
            col("n_trigrams").cast("double"), 6))
          .otherwise(lit(0.0)))
      .drop("_tris")
  }

  /** PII-shaped patterns: ASCII email, dotted IPv4, US-style phone.
    * Deliberately simple regexes that mean the same thing in Java regex
    * and RE2 (the DuckDB oracle) — no lookarounds, no unicode classes. */
  /**
   * Per-document TF-IDF informativeness score: the mean smoothed IDF
   * (`ln((N+1)/(df+1))`) of the document's DISTINCT tokens, plus the
   * rarest token's IDF. High = rare/contentful vocabulary, low =
   * boilerplate — a cheap corpus-level quality signal that, unlike
   * [[withQuality]], is computed against corpus statistics rather than
   * per-row features.
   *
   * Scale shape: one distinct-(doc,token) shuffle, one token-keyed df
   * aggregate (map-side combined), one token-keyed join back, one
   * doc-keyed aggregate. No driver-side state: the corpus doc count
   * rides along as a literal from one scalar aggregate.
   */
  def tfidfScores(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val dt = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val n = dt.select(countDistinct(col("doc_id"))).head().getLong(0)
    val idf = dt.groupBy("tok").agg(count(lit(1)).as("df"))
      .select(col("tok"),
        log((lit(n.toDouble) + 1.0) / (col("df").cast("double") + 1.0))
          .as("idf"))
    dt.join(idf, "tok")
      .groupBy("doc_id")
      .agg(round(avg(col("idf")), 6).as("mean_idf"),
        round(max(col("idf")), 6).as("max_idf"),
        count(lit(1)).as("n_distinct_tok"))
  }

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Redact PII-shaped substrings with typed placeholders. Order matters
    * and is fixed (email → IP → phone) so engines agree on overlapping
    * text; pure column expressions — redaction runs at scan speed. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipv4Re, "[IP]"),
      phoneRe, "[PHONE]")

  /** Per-language marker (stopword) lists for the n-gram-free language-ID
    * heuristic. Real deployments would use char-n-gram profiles; the
    * heuristic's *shape* (score-per-language, argmax with priority
    * tie-break) is what matters here. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "et", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Occurrences of any marker among the tokens. */
  def markerCount(toks: Column, markers: Seq[String]): Column = {
    val arr = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t)))
  }

  /** Language scores + argmax prediction ('und' when all scores are 0). */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = langMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"score_$lang", markerCount(toks, markers))
    }
    val langs = langMarkers.map(_._1)
    val best = langs.map(l => col(s"score_$l")).reduce((a, b) => greatest(a, b))
    // priority order = langMarkers order (first max wins)
    val pred = langs.foldRight(lit("und"): Column) { (l, rest) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(rest)
    }
    scored.withColumn("predicted_lang", pred)
  }

  /**
   * Language-ID evaluation: the confusion matrix of [[withLangId]]'s
   * marker-argmax prediction against the corpus's labeled `lang` column,
   * with each cell's share of its labeled row (the diagonal cells' shares
   * are per-class recall). This is the report a curation pass reads
   * before trusting a language filter — systematic off-diagonal mass
   * means the filter silently drops a language.
   *
   * Scale shape: the prediction is a scan-speed column expression; the
   * matrix is one (labeled, predicted) count whose output is ≤ |langs|²
   * rows, and the row-totals join broadcasts that frame.
   */
  def langidConfusion(docs: DataFrame, langCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val conf = withLangId(
      docs.select(col(langCol).as("labeled_lang"), col(textCol)), textCol)
      .groupBy("labeled_lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
    val totals = conf.groupBy("labeled_lang")
      .agg(sum(col("n_docs")).as("n_label"))
    conf.join(broadcast(totals), "labeled_lang")
      .select(col("labeled_lang"), col("predicted_lang"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n_label").cast("double"), 6)
          .as("frac_of_label"))
  }

  /**
   * Quality features + composite score:
   * stopword ratio, alpha-char ratio, length saturation, mean token length.
   * All integer counts per row; ratios are single double divisions (bit-
   * deterministic across engines), rounded to 6 places.
   */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTokens = size(toks)
    val nChars = length(t)
    val stopArr = array(TextAnalysis.langMarkers.head._2.map(lit): _*)
    val nStop = size(filter(toks, x => array_contains(stopArr, x)))
    val nAlpha = regexp_count(lower(t), lit("[a-z]"))
    val sumTokLen = aggregate(transform(toks, x => length(x)), lit(0),
      (acc, x) => acc + x)
    df.withColumn("n_chars", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("n_stop", nStop)
      .withColumn("mean_token_len",
        round(sumTokLen.cast("double") / nTokens.cast("double"), 6))
      .withColumn("stopword_ratio",
        round(nStop.cast("double") / nTokens.cast("double"), 6))
      .withColumn("alpha_ratio",
        round(nAlpha.cast("double") / nChars.cast("double"), 6))
      .withColumn("quality_score", round(
        lit(0.4) * (nStop.cast("double") / nTokens.cast("double")) +
        lit(0.3) * least(lit(1.0), nTokens.cast("double") / lit(100.0)) +
        lit(0.3) * (nAlpha.cast("double") / nChars.cast("double")), 6))
  }

  /**
   * Unigram language-model scoring — the CCNet-style perplexity proxy:
   * train token frequencies on the corpus itself, then score each
   * document by its mean negative log-likelihood. Low NLL = the doc is
   * made of the corpus's most common tokens (boilerplate, lists); high
   * NLL = rare vocabulary. Used exactly like CCNet's KenLM buckets:
   * quantile-split the scores into head/middle/tail quality tiers.
   *
   * Cross-engine determinism: each token's NLL is computed once from
   * exact integer (count, total) inputs and quantized to an integer
   * micro-nat (`round(-ln(c/N) * 1e6)`), so the per-document SUM is
   * exact integer arithmetic in any execution order — no float drift
   * for partial aggregation to amplify. The reported mean divides two
   * exact integers at the end (one IEEE op, bit-identical everywhere).
   *
   * Scale shape: one token-keyed count with map-side combine (the
   * vocabulary aggregate — skew-proof for the same reason word-count
   * is), one token-keyed join back (vocab ≪ corpus: AQE broadcasts it
   * when it fits), one doc-keyed sum. The corpus token total rides
   * along as a literal from one scalar aggregate.
   */
  def unigramNll(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val counts = tok.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c"))).head().getLong(0)
    val nll = counts.select(col("tok"),
      round(-log(col("c").cast("double") / lit(total.toDouble)) * 1e6)
        .cast("long").as("nll_micro"))
    tok.join(nll, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("nll_micro")).as("nll_micro_sum"))
      .select(col("doc_id"), col("n_tok"), col("nll_micro_sum"),
        round(col("nll_micro_sum").cast("double") /
          (col("n_tok").cast("double") * 1e6), 6).as("mean_nll"))
  }

  /**
   * First-iteration BPE pair statistics: corpus-wide frequency of
   * adjacent character pairs inside tokens. The argmax of this table IS
   * byte-pair-encoding's first merge; the top-K table is the signal a
   * tokenizer-induction pass iterates on (full BPE repeats merge→recount
   * — each iteration is exactly this aggregate over re-segmented
   * symbols). Deterministic output: (rank, pair, cnt) ranked by count
   * desc, pair asc.
   *
   * Scale shape: pairs project at the scan (2-char substrings — no
   * intermediate array), the count is word-count-shaped (map-side
   * combine collapses hot pairs like "th" per task), and the ranking
   * window runs over the AGGREGATED pair table, whose size is bounded by
   * the character-set squared, not the corpus.
   */
  def bpePairStats(docs: DataFrame, topK: Int = 50,
      textCol: String = "text"): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val tok = docs.select(explode(tokens(col(textCol))).as("tok"))
    val pairs = tok.select(explode(
        when(length(col("tok")) >= 2,
          transform(sequence(lit(1), length(col("tok")) - 1),
            i => col("tok").substr(i, lit(2))))
          .otherwise(array().cast("array<string>"))).as("pair"))
    val counts = pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("pair"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("rank", "pair", "cnt")
  }

  /**
   * BPE tokenizer induction — the iterated-merge loop [[bpePairStats]] is
   * one step of. Classic algorithm (Sennrich et al. 2016, "Neural Machine
   * Translation of Rare Words with Subword Units"): segment every word
   * into symbols, count adjacent symbol pairs weighted by word frequency,
   * merge the most frequent pair corpus-wide, repeat `nMerges` times.
   *
   * Scale shape: everything iterates over the word-TYPE table (one row
   * per distinct word + its count — bounded by vocabulary, not corpus
   * size), so each step is a word-count-shaped aggregate plus a top-1
   * `TakeOrdered`; the driver loop holds only the merge list, exactly
   * like [[Semantic.kmeansAssign]] holds centroids. Lineage is truncated
   * per step (localCheckpoint on the bounded table).
   *
   * Segmentations travel as bracket-delimited strings (`low` →
   * `<l><o><w>`): a merge is then ONE literal string replace
   * (`<l><o>` → `<lo>`), whose left-to-right non-overlapping semantics
   * equal greedy BPE application — and replay identically in DuckDB's
   * `replace`, making the whole learned merge list hash-verifiable.
   * Words are restricted to `[a-z0-9]+` so the bracket markers cannot
   * collide with symbol text (tokenizer induction over alphanumeric word
   * types — punctuation-bearing types carry no subword signal anyway).
   * Ties break on the bracketed pair string in BOTH engines.
   *
   * Returns the merge list: (step, pair, merged, cnt) — nMerges rows.
   * Fails loudly if the corpus runs out of pairs before `nMerges`.
   */
  def bpeLearn(docs: DataFrame, nMerges: Int = 10,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeCore(docs, nMerges, textCol)._1
      .toDF("step", "pair", "merged", "cnt")
  }

  /** The learn loop; returns (merge list, word-type table with final
    * bracket segmentations) so [[bpeEncode]] can apply the vocabulary
    * without re-learning. */
  private def bpeCore(docs: DataFrame, nMerges: Int, textCol: String)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    var words = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("seg", regexp_replace(col("w"), "(.)", "<$1>"))
      .transform(Lineage.cut)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to nMerges) {
      val syms = split(expr("substring(seg, 2, length(seg) - 2)"), "><")
      val top = words.select(col("cnt"), explode(
          when(size(syms) >= 2, transform(sequence(lit(1), size(syms) - 1),
            i => concat(lit("<"), element_at(syms, i), lit("><"),
              element_at(syms, i + 1), lit(">"))))
            .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("pcnt"))
        .orderBy(col("pcnt").desc, col("pair"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"corpus exhausted at merge $step of $nMerges — lower nMerges")
      val pat = top(0).getString(0)
      val pcnt = top(0).getLong(1)
      val merged = "<" + pat.substring(1, pat.length - 1).replace("><", "") + ">"
      merges += ((step.toLong, pat, merged, pcnt))
      words = words.withColumn("seg",
          regexp_replace(col("seg"),
            lit(java.util.regex.Pattern.quote(pat)), lit(merged)))
        .transform(Lineage.cut)
    }
    (merges.result(), words)
  }

  /**
   * Apply a [[bpeLearn]]-induced vocabulary back to the corpus: learn
   * `nMerges` merges, then segment every alphanumeric token instance
   * with the final merge table and report per-document subword stats —
   * (doc_id, n_words, n_subwords, mean_subwords). The tokenizer-
   * compression readout: mean_subwords falls as merges absorb frequent
   * character sequences, and per-doc outliers flag vocabulary-hostile
   * text (codes, ids, non-target languages).
   *
   * Scale shape: segmentation cost is ONE equi-join of corpus token
   * instances against the word-TYPE table (AQE broadcasts it when the
   * vocabulary is small; shuffles both sides when web-scale typo/id
   * vocabularies are not) plus a per-doc aggregate — the learn loop's
   * bounded-table iterations are unchanged. Non-alphanumeric tokens
   * carry no subword signal and are excluded on both engines.
   */
  def bpeEncode(docs: DataFrame, nMerges: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (_, words) = bpeCore(docs, nMerges, textCol)
    val sub = words.select(col("w"),
      size(split(expr("substring(seg, 2, length(seg) - 2)"), "><")).as("nsub"))
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok").rlike("^[a-z0-9]+$"))
      .join(sub, col("tok") === col("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("nsub").cast("long").as("n_subwords"),
        round(sum("nsub").cast("double") / count(lit(1)), 6)
          .as("mean_subwords"))
  }

  /**
   * CCNet-style quality tiers: rank documents by their unigram-LM mean
   * NLL ([[unigramNll]]) and split into `tiers` equal buckets — tier 1
   * ("head") is the most-predictable text, the last tier ("tail") the
   * most out-of-model. CCNet keeps head+middle for training and routes
   * tail to heavier filtering; the tier column is that routing key.
   *
   * Exact `ntile` over (mean_nll, doc_id) — deterministic and
   * bit-reproducible against the oracle, but a single global sort
   * partition: the PARITY path. At 100 TB use the sketch twin —
   * `percentile_approx(mean_nll, ...)` boundaries (mergeable, one
   * aggregate) with a scan-side bucket compare — and accept ε-boundary
   * wobble; same trade t_token_quantiles documents for its sketch
   * cross-check.
   */
  def nllTiers(docs: DataFrame, tiers: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(tiers > 0, s"tiers must be positive, got $tiers")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_nll"), col("doc_id"))
    unigramNll(docs, idCol, textCol)
      .select(col("doc_id"), col("mean_nll"))
      .withColumn("tier", ntile(tiers).over(w).cast("long"))
  }

  /**
   * The 100-TB twin of [[nllTiers]], as a first-class API rather than a
   * doc-only recipe: tier boundaries from one mergeable
   * `percentile_approx` aggregate (no global sort anywhere), then a
   * scan-side bucket compare against the broadcast 1-row boundary frame.
   * Differs from the exact ntile only by sketch ε at the boundaries and
   * by assigning equal `mean_nll` ties to one tier instead of splitting
   * them for equal counts — CrossCheckSpec holds the two ≥95% row-wise
   * agreement. Same output schema as [[nllTiers]].
   */
  def nllTiersApprox(docs: DataFrame, tiers: Int = 3, accuracy: Int = 10000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(tiers > 0, s"tiers must be positive, got $tiers")
    val scored = unigramNll(docs, idCol, textCol)
      .select(col("doc_id"), col("mean_nll"))
    if (tiers == 1) return scored.withColumn("tier", lit(1L))
    val probs = array((1 until tiers).map(i => lit(i.toDouble / tiers)): _*)
    val bounds = scored.agg(
      percentile_approx(col("mean_nll"), probs, lit(accuracy)).as("bs"))
    scored.crossJoin(broadcast(bounds))
      .withColumn("tier",
        (lit(1) + size(filter(col("bs"), b => col("mean_nll") > b)))
          .cast("long"))
      .drop("bs")
  }

  /**
   * Composite quality gate — the C4/Gopher-style rule bundle as one
   * scan-side verdict: length bounds, mean-token-length bounds (too low
   * = symbol soup, too high = base64/URL blobs), alphabetic-character
   * floor, and trigram-repetition ceiling. Rules evaluate in a FIXED
   * order and the FIRST failure is reported, so corpus health dashboards
   * can group rejected volume by reason and threshold changes are
   * attributable rule by rule.
   *
   * One row per doc: (doc_id, n_tokens, quality_score, dup_frac,
   * fail_reason, pass) — `fail_reason` null iff `pass`. Everything is a
   * pure column expression over one projection (the signals reuse
   * [[withQuality]] / [[withRepetition]]): the gate runs at scan speed,
   * no shuffle anywhere.
   *
   * The verdict is wrapped in a nondeterministic identity barrier:
   * without it, `gate.filter(col("pass"))` — the operator's primary use
   * — triggers predicate pushdown, which SUBSTITUTES the whole rule
   * CASE into a pre-projection filter; every rule's reference to the
   * tokenize/trigram pipeline then re-evaluates it per row (measured
   * ~70× on sf0.1: 0.4 s → 26 s). The barrier pins the verdict to its
   * projection so filters evaluate the computed column. Cost: filters
   * on gate OUTPUT no longer push into the document scan — the gate is
   * a terminal verdict frame, filter it, don't re-plan through it.
   */
  def qualityGate(df: DataFrame,
      minTokens: Long = 16, maxTokens: Long = 100000,
      minMeanTokLen: Double = 2.0, maxMeanTokLen: Double = 12.0,
      minAlpha: Double = 0.4, maxDupFrac: Double = 0.2,
      idCol: String = "doc_id", textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame = {
    val q = withRepetition(
      withQuality(df, textCol).withColumn("toks", tokens(col(textCol))))
    val reason =
      when(col("n_tokens") < minTokens, "too_short")
        .when(col("n_tokens") > maxTokens, "too_long")
        .when(col("mean_token_len") < minMeanTokLen ||
          col("mean_token_len") > maxMeanTokLen, "token_len")
        .when(col("alpha_ratio") < minAlpha, "non_alpha")
        .when(col("dup_frac") > maxDupFrac, "repetition")
    // carryCols pass through untouched (e.g. an event-time column for
    // streaming rollups — projection preserves its watermark metadata)
    q.select(Seq(col(idCol).as("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("quality_score"), col("dup_frac"),
        qualityGateBarrier(reason).as("fail_reason")) ++
        carryCols.map(col): _*)
      .withColumn("pass", col("fail_reason").isNull)
  }

  /** Identity on strings, declared nondeterministic purely as an
    * optimizer barrier (see [[qualityGate]]). */
  private val qualityGateBarrier =
    udf((s: String) => s).asNondeterministic()

  /**
   * The intended composition pattern for multi-branch [[qualityGate]]
   * consumers: materialize the verdict frame ONCE, then let every
   * downstream branch read the stored verdicts. The gate's barrier
   * (deliberately) stops filter/projection pushdown, so a pipeline that
   * consumes the gate from k branches (e.g. span-removal's window-count
   * + rewrite passes) re-runs the whole signal computation k times —
   * [[Lineage.cut]] cuts that to 1 by writing the frame to executor
   * block storage (or the reliable `spark.graft.checkpointDir` when
   * set) and truncating lineage. The frame is narrow (6 columns
   * per doc, no text), so the stored size is a rounding error next to
   * the corpus; blocks free with the frame's RDD via the context
   * cleaner, so no session-lifetime cache is held by the library —
   * lifetime is the caller's reference, which is the contract that kept
   * Dedup's internal-cache registry bounded.
   */
  def materializeGate(gate: DataFrame): DataFrame = Lineage.cut(gate)

  /**
   * Interpolated bigram-LM scoring — one order up from [[unigramNll]]:
   * each adjacent token pair (w1, w2) is scored by
   * `-ln(λ·c(w1w2)/c(w1) + (1-λ)·c(w2)/N)` and a document reports the
   * sum/mean over its n-1 bigram positions. Interpolation with the
   * unigram (λ < 1) is the classic fix for unseen-bigram zero
   * probability — and since every bigram in the corpus-trained model
   * was observed at least once, the probability is always positive even
   * at λ=1; λ<1 additionally smooths rare continuations.
   *
   * Same cross-engine float story as [[unigramNll]]: the interpolated
   * probability is computed ONCE per distinct bigram type from exact
   * integer counts in a fixed IEEE op order, quantized to integer
   * micro-nats, and per-document sums are exact integer math in any
   * partial-aggregation order.
   *
   * Scale shape: bigram counts and the join back are word-count-shaped
   * (map-side combine collapses hot pairs); the two unigram-count joins
   * attach c(w1) and c(w2) to bigram TYPES (≪ occurrences); the corpus
   * token total rides along as a literal from one scalar aggregate.
   */
  def bigramNll(docs: DataFrame, lambda: Double = 0.9,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, s"lambda must be in (0,1], got $lambda")
    val tokd = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
    val big = tokd.select(col("doc_id"),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni = tokd.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cu"))
    val total = uni.agg(coalesce(sum(col("cu")), lit(0L))).head().getLong(0)
    val bc = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val nll = bc
      .join(uni.select(col("tok").as("w1"), col("cu").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("cu").as("c2")), "w2")
      .select(col("w1"), col("w2"),
        round(-log(
          lit(lambda) * col("cb").cast("double") / col("c1").cast("double") +
            lit(1.0 - lambda) * col("c2").cast("double") /
              lit(total.toDouble)) * 1e6)
          .cast("long").as("nll_micro"))
    val perDoc = big.join(nll, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll_micro")).as("nll_micro_sum"))
    // one row per INPUT doc — a sub-2-token doc has no bigrams and
    // reports (0, 0, 0.0) instead of silently vanishing
    tokd.select(col("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro_sum"), lit(0L)).as("nll_micro_sum"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          round(col("nll_micro_sum").cast("double") /
            (col("n_bigrams").cast("double") * 1e6), 6))
          .otherwise(lit(0.0)).as("mean_nll"))
  }

  /**
   * Stupid Backoff trigram scoring (Brants et al. 2007, "Large Language
   * Models in Machine Translation") — the scoring rule designed for
   * distributed count-based LMs at exactly this scale: raw counts, no
   * discounting, a fixed penalty `alpha` per backoff level, relative
   * scores rather than normalized probabilities.
   *
   * Count tables come from `train` — typically a deterministic hash
   * sample ([[Sampling.deterministicSample]]), the same
   * sample-then-score recipe as the LR classifier: at 100 TB the count
   * tables are built from a slice whose cost the operator controls,
   * then the full corpus is scored in one scan. Scoring a corpus with
   * its OWN counts never backs off (every trigram has c3 ≥ 1), so the
   * train/score split is also what makes the lower orders meaningful.
   *
   *   S(w3|w1 w2) = c3/c2(w1 w2)            if c3 > 0
   *               = α · c2(w2 w3)/c1(w2)    elif c2(w2 w3) > 0
   *               = α² · c1(w3)/N           elif c1(w3) > 0
   *               = α² · 1/N                else (OOV floor — keeps the
   *                                         score finite and the NLL sum
   *                                         defined for any input)
   *
   * Cross-engine determinism: like [[unigramNll]]/[[bigramNll]], each
   * trigram TYPE's NLL is quantized once to an integer micro-nat, so
   * per-document sums are exact integer arithmetic in any execution
   * order. All sides of every division are exact integers cast to
   * double; α and α² are interpolated into the oracle from the same
   * Scala doubles the plan uses.
   *
   * Scale shape: three word-count-shaped aggregates over the train
   * slice (map-side combine collapses hot n-grams); scoring joins
   * trigram TYPES (≪ occurrences) of the scored corpus left-outer to
   * the count tables, then one type-keyed join back to occurrences and
   * one doc-keyed sum. N rides along as a literal from one scalar
   * aggregate. One row per input doc; sub-3-token docs report zeros.
   */
  def trigramBackoffNll(docs: DataFrame, train: DataFrame,
      alpha: Double = 0.4, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")

    def ngramStructs(toks: Column, n: Int): Column = {
      def gram(i: Column) = struct(
        (1 to n).map(j => element_at(toks, i + (j - 1)).as(s"w$j")): _*)
      val tpe = (1 to n).map(j => s"w$j:string").mkString("array<struct<", ",", ">>")
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i => gram(i)))
        .otherwise(array().cast(tpe))
    }

    val tokd = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
    val tri = tokd.select(col("doc_id"),
        explode(ngramStructs(col("toks"), 3)).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))

    val ttok = train.select(tokens(col(textCol)).as("toks"))
    val c1 = ttok.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val n = c1.agg(coalesce(sum(col("c1")), lit(0L))).head().getLong(0)
    require(n > 0, "trigramBackoffNll: train slice has no tokens")
    val c2 = ttok.select(explode(ngramStructs(col("toks"), 2)).as("g"))
      .groupBy(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val c3 = ttok.select(explode(ngramStructs(col("toks"), 3)).as("g"))
      .groupBy(col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
      .agg(count(lit(1)).as("c3"))

    // NLL per scored-corpus trigram TYPE (c3 > 0 implies c2ctx > 0, and
    // c2bo > 0 implies c1w2 > 0 — the backoff chain never divides by null)
    val s =
      when(col("c3").isNotNull,
        col("c3").cast("double") / col("c2ctx").cast("double"))
      .when(col("c2bo").isNotNull,
        lit(alpha) * col("c2bo").cast("double") / col("c1w2").cast("double"))
      .when(col("c1w3").isNotNull,
        lit(alpha * alpha) * col("c1w3").cast("double") / lit(n.toDouble))
      .otherwise(lit(alpha * alpha) / lit(n.toDouble))
    val typed = tri.select("w1", "w2", "w3").distinct()
      .join(c3, Seq("w1", "w2", "w3"), "left_outer")
      .join(c2.select(col("w1"), col("w2"), col("c2").as("c2ctx")),
        Seq("w1", "w2"), "left_outer")
      .join(c2.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c2").as("c2bo")), Seq("w2", "w3"), "left_outer")
      .join(c1.select(col("tok").as("w2"), col("c1").as("c1w2")),
        Seq("w2"), "left_outer")
      .join(c1.select(col("tok").as("w3"), col("c1").as("c1w3")),
        Seq("w3"), "left_outer")
      .select(col("w1"), col("w2"), col("w3"),
        round(-log(s) * 1e6).cast("long").as("nll_micro"))

    val perDoc = tri.join(typed, Seq("w1", "w2", "w3"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("nll_micro")).as("nll_micro_sum"))
    tokd.select(col("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("nll_micro_sum"), lit(0L)).as("nll_micro_sum"),
        when(coalesce(col("n_trigrams"), lit(0L)) > 0,
          round(col("nll_micro_sum").cast("double") /
            (col("n_trigrams").cast("double") * 1e6), 6))
          .otherwise(lit(0.0)).as("mean_nll"))
  }

  /**
   * N-gram novelty scoring — the memorization/novelty signal of
   * Merrill et al. 2024 ("Evaluating n-gram novelty of language
   * models") applied at the data layer: the fraction of a document's
   * distinct word n-grams that do NOT occur in a reference corpus
   * (an earlier snapshot, a curated set, or a held-out slice). High
   * novelty flags genuinely new material worth keeping; near-zero
   * novelty flags paraphrase-grade duplication that exact and MinHash
   * dedup both miss when the copied material is embedded in fresh
   * boilerplate.
   *
   * Output: (doc_id, n_ngrams, n_novel, novelty) — one row per corpus
   * doc; docs with no n-grams (fewer than n tokens) report (0, 0, 0.0).
   *
   * Scale shape: the reference side collapses to a distinct n-gram
   * TYPE table (pre-aggregable and reusable across runs, like the
   * incremental-dedup fingerprint table); the membership probe is one
   * n-gram-keyed left-anti join with map-side-combined distincts on
   * both sides. When the exact TYPE table is too big to join, the
   * [[graft.functions]] Bloom probe is the drop-in scale twin (the
   * [[Decontamination]] pattern) at the cost of a bounded
   * novelty UNDER-estimate (Bloom false positives read as "seen").
   */
  def noveltyScores(corpus: DataFrame, reference: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 0, s"n-gram size must be positive, got $n")
    val docTri = corpus.select(col(idCol).as("doc_id"),
        Dedup.shinglesFromTokens(tokens(col(textCol)), n).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
    val refTri = reference
      .select(Dedup.shinglesFromTokens(tokens(col(textCol)), n).as("gs"))
      .select(explode(col("gs")).as("g")).distinct()
    val counts = docTri.join(refTri, Seq("g"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    corpus.select(col(idCol).as("doc_id"),
        size(Dedup.shinglesFromTokens(tokens(col(textCol)), n))
          .cast("long").as("n_ngrams"))
      .join(counts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_ngrams") > 0,
          round(coalesce(col("n_novel"), lit(0L)).cast("double") /
            col("n_ngrams").cast("double"), 6))
          .otherwise(lit(0.0)).as("novelty"))
  }

  /**
   * Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
   * SIGMOD 2003 — the MOSS algorithm). Hash every character k-gram of
   * the normalized text, slide a window of `w` consecutive k-gram
   * hashes, and keep the minimum hash of each full window. Guarantee:
   * any substring match of length >= w + k - 1 characters between two
   * documents shares at least one selected fingerprint, while only
   * ~2/(w+1) of the k-gram hashes are kept — local, position-robust
   * document fingerprints (unlike [[fingerprint]], which a 1-char edit
   * invalidates wholesale).
   *
   * Returns the distinct `(doc_id, fp)` selections — the robust-
   * winnowing fingerprint SET (repeated window minima and ties
   * collapse; positions are not retained). Hashes are the first 16 md5
   * hex digits so the DuckDB oracle replays the selection exactly.
   *
   * Scale shape: the k-gram explode is scan-shaped (one row per corpus
   * char), the window min is per-document (bounded by doc length, never
   * a global sort), and the distinct collapses map-side before the one
   * fingerprint shuffle. Documents shorter than k + w - 1 normalized
   * chars yield no full window and thus no fingerprints — callers treat
   * those as exact-dedup-only.
   */
  def winnowFingerprints(docs: DataFrame, k: Int = 8, w: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"k-gram size must be positive, got $k")
    require(w > 0, s"window size must be positive, got $w")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    // spread before the k-gram explode + per-gram md5 (the operator's
    // whole cost; single-row-group corpora would run it on one core —
    // Dedup.spread is a no-op on inputs already at session width)
    // Dedup.unpushable pins the n_kg filter ABOVE the spread exchange —
    // pushed below, it re-inlines the whole normText chain into the
    // scan-side predicate and runs it twice (once single-task)
    Dedup.spread(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        Dedup.unpushable(normText(col(textCol))).as("s"))
      .select(col("doc_id"), col("s"),
        (length(col("s")) - (k - 1)).as("n_kg"))
      .filter(col("n_kg") >= w)
      .select(col("doc_id"), col("n_kg"), col("s"),
        explode(sequence(lit(1), col("n_kg"))).as("pos"))
      .select(col("doc_id"), col("n_kg"), col("pos"),
        substring(md5(col("s").substr(col("pos"), lit(k))), 1, 16).as("h"))
      .withColumn("fp", min(col("h")).over(win))
      .filter(col("pos") <= col("n_kg") - (w - 1))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /**
   * Per-partition CCNet quality tiers — [[nllTiers]] with a separate
   * unigram LM *and* separate tier boundaries per `partCol` value
   * (CCNet trains one LM per language and buckets head/middle/tail
   * within each language, not across the corpus; Wenzek et al. 2020).
   * Output: (doc_id, part, mean_nll, tier).
   *
   * Scale shape: token counts per (part, token) are word-count-shaped
   * (map-side combine); per-partition totals are a #parts-row
   * aggregate; the score join stays (part, token)-keyed; the ntile
   * sorts within each partition value — per-language sorts, never one
   * global one. [[nllTiersApprox]]'s percentile-sketch boundary trick
   * applies per part unchanged when even that sort is too much.
   */
  def nllTiersBy(docs: DataFrame, partCol: String = "lang", tiers: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(tiers > 0, s"tiers must be positive, got $tiers")
    val tok = docs.select(col(idCol).as("doc_id"), col(partCol).as("part"),
      explode(tokens(col(textCol))).as("tok"))
    val counts = tok.groupBy("part", "tok").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("part").agg(sum(col("c")).as("t"))
    val nll = counts.join(totals, "part").select(col("part"), col("tok"),
      round(-log(col("c").cast("double") / col("t").cast("double")) * 1e6)
        .cast("long").as("nll_micro"))
    val scored = tok.join(nll, Seq("part", "tok"))
      .groupBy("doc_id")
      .agg(min(col("part")).as("part"), count(lit(1)).as("n_tok"),
        sum(col("nll_micro")).as("nll_micro_sum"))
      .select(col("doc_id"), col("part"),
        round(col("nll_micro_sum").cast("double") /
          (col("n_tok").cast("double") * 1e6), 6).as("mean_nll"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy(col("mean_nll"), col("doc_id"))
    scored.withColumn("tier", ntile(tiers).over(w).cast("long"))
  }

  /** Gopher repetition thresholds (Rae et al. 2021, table A1): a doc
    * fails if any fraction exceeds its limit. Top n-gram limits for
    * n=2,3,4; duplicate n-gram limits for n=5..10. */
  val gopherTopLimits: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val gopherDupLimits: Map[Int, Double] =
    (5 to 10).map(n => n -> (0.15 - (n - 5) * 0.01)).toMap
  val gopherLineLimit = 0.30 // duplicate line fraction
  val gopherLineCharLimit = 0.20 // duplicate line character fraction

  /**
   * The full Gopher repetition-rule bundle (Rae et al. 2021, "Scaling
   * Language Models: Methods, Analysis & Insights from Training
   * Gopher", table A1) — every repetition signal is WITHIN-document:
   *
   *  - `dup_line_frac`: fraction of the document's lines that are
   *    repeats of an earlier line (occurrences beyond the first /
   *    total lines); `dup_line_char_frac` is the same in line-char
   *    units. Pure array math on the split text — no shuffle.
   *  - `top_{2,3,4}gram_char_frac`: characters covered by ALL
   *    occurrences of the doc's single most frequent n-gram, over
   *    total token chars. Ties break by (count, gram chars, md5) so
   *    every engine picks the same winner.
   *  - `dup_{5..10}gram_char_frac`: characters of token POSITIONS
   *    covered by any n-gram that occurs ≥2 times in the doc —
   *    positions are distinct-folded first, so overlapping duplicate
   *    windows never double-count (the "careful not to double count"
   *    clause of the paper).
   *  - `gopher_pass`: true iff every fraction is within its published
   *    limit ([[gopherTopLimits]]/[[gopherDupLimits]]/line limits).
   *
   * Character conventions (documented, mirrored in the oracle): n-gram
   * fractions count token characters only (separators excluded, so
   * coverage sums are position-additive); line fractions count line
   * characters. Each numerator/denominator pair shares its unit.
   *
   * Scale shape: the line rules are scan-speed column math. All nine
   * n-gram sizes ride ONE flattened explode of the token array (one
   * scan, rows ≈ 9·tokens), keys are md5-projected before the
   * (doc_id, n, gram)-keyed count — fixed-width shuffle, map-side
   * combined, and every downstream join/agg stays doc-keyed. The
   * coverage explode is bounded by duplicated-gram volume · n, i.e.
   * proportional to the repetition actually present, not the corpus.
   */
  def gopherRepetition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", toksCol: String = "toks"): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val toks = col(toksCol)
    val ls = split(col(textCol), "\n")
    val charsOf = (a: Column) =>
      aggregate(a, lit(0L), (acc, x) => acc + length(x).cast("long"))

    val base = docs.select(col(idCol).as("doc_id"), col(textCol), toks)

    // per-doc totals + the shuffle-free line rules
    val docStats = base.select(
      col("doc_id"),
      charsOf(toks).as("tok_chars"),
      size(ls).cast("long").as("n_lines"),
      (size(ls) - size(array_distinct(ls))).cast("long").as("n_dup_lines"),
      charsOf(ls).as("line_chars"),
      (charsOf(ls) - charsOf(array_distinct(ls))).as("dup_line_chars"))

    // one flattened explode carries every n: (doc_id, n, i, gh, glen)
    val nsArr = array((topNs ++ dupNs).map(n => lit(n)): _*)
    val gramStructs = flatten(transform(nsArr, n =>
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => struct(n.as("n"), i.as("i"),
            array_join(slice(toks, i, n), " ").as("g"))))
        .otherwise(array().cast("array<struct<n:int,i:int,g:string>>"))))
    val gramRows = base
      .select(col("doc_id"), explode(gramStructs).as("gs"))
      .select(col("doc_id"), col("gs.n").as("n"), col("gs.i").as("i"),
        md5(col("gs.g")).as("gh"),
        (length(col("gs.g")) - (col("gs.n") - 1)).cast("long").as("glen"))
    val gc = gramRows.groupBy("doc_id", "n", "gh")
      .agg(count(lit(1)).as("c"), first(col("glen")).as("glen"))

    // top n-gram (n=2..4): all occurrences of the per-doc argmax gram
    val topWide = gc.filter(col("n").isin(topNs.map(Int.box): _*))
      .groupBy("doc_id", "n")
      .agg(max(struct(col("c"), col("glen"), col("gh"))).as("m"))
      .select(col("doc_id"), col("n"),
        (col("m.c") * col("m.glen")).as("top_chars"))
      .groupBy("doc_id")
      .agg(max(when(col("n") === 2, col("top_chars"))).as("top2"),
        max(when(col("n") === 3, col("top_chars"))).as("top3"),
        max(when(col("n") === 4, col("top_chars"))).as("top4"))

    // duplicate n-gram coverage (n=5..10): distinct covered positions
    val tokRows = base
      .select(col("doc_id"), posexplode(toks).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("int").as("p"),
        length(col("tok")).cast("long").as("tl"))
    val covAggs = dupNs.map(n =>
      sum(when(col("n") === n, col("tl"))).as(s"cov$n"))
    val covWide = gramRows
      .join(gc.filter(col("c") >= 2 && col("n").isin(dupNs.map(Int.box): _*))
        .select("doc_id", "n", "gh"), Seq("doc_id", "n", "gh"))
      .select(col("doc_id"), col("n"),
        explode(sequence(col("i"), col("i") + col("n") - 1)).as("p"))
      .distinct()
      .join(tokRows, Seq("doc_id", "p"))
      .groupBy("doc_id")
      .agg(covAggs.head, covAggs.tail: _*)

    assembleGopherFracs(docStats
      .join(topWide, Seq("doc_id"), "left_outer")
      .join(covWide, Seq("doc_id"), "left_outer"))
  }

  /** Shared final assembly of the Gopher bundle from the raw per-doc
    * counters (doc_id, tok_chars, n_lines, n_dup_lines, line_chars,
    * dup_line_chars, top2..top4, cov5..cov10 — nulls = zero): fraction
    * columns + the pass verdict, identical for the exploded and the
    * inline execution shapes. */
  private def assembleGopherFracs(raw: DataFrame): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    def frac(num: Column, den: Column): Column =
      when(den > 0, round(coalesce(num, lit(0L)).cast("double") /
        den.cast("double"), 6)).otherwise(lit(0.0))
    val wide = raw.select(Seq(
      col("doc_id"),
      frac(col("n_dup_lines"), col("n_lines")).as("dup_line_frac"),
      frac(col("dup_line_chars"), col("line_chars"))
        .as("dup_line_char_frac")) ++
      topNs.map(n => frac(col(s"top$n"), col("tok_chars"))
        .as(s"top_${n}gram_char_frac")) ++
      dupNs.map(n => frac(col(s"cov$n"), col("tok_chars"))
        .as(s"dup_${n}gram_char_frac")): _*)
    wide.withColumn("gopher_pass",
      (Seq(col("dup_line_frac") <= gopherLineLimit,
        col("dup_line_char_frac") <= gopherLineCharLimit) ++
        topNs.map(n =>
          col(s"top_${n}gram_char_frac") <= gopherTopLimits(n)) ++
        dupNs.map(n =>
          col(s"dup_${n}gram_char_frac") <= gopherDupLimits(n)))
        .reduce(_ && _))
  }

  /**
   * Deterministic hashed bag-of-words document vectors (feature
   * hashing, Weinberger et al. 2009): token → bucket by the engine's
   * salted 32-bit hash, bucket counts as components, L2-normalized and
   * 1e-6-quantized. A model-free dense representation that turns the
   * DOCUMENT corpus into ANN-searchable vectors — the lexical
   * dense-retrieval baseline, and the glue that lets every certified
   * similarity path (IVF, multi-probe, PQ, JL, SemDeDup) run on text
   * when no learned embeddings exist yet. Collisions are the standard
   * feature-hashing trade: bounded dimensionality for a small additive
   * noise floor.
   *
   * Scale shape: one token explode → (doc, bucket) count (map-side
   * combined, ≤ dim rows per doc) → one doc-keyed densify. No driver
   * state, no vocabulary table — the point of hashing.
   */
  /**
   * Global label (categorical) encoding: each distinct value of
   * `labelCol` gets a dense 0-based code in lexicographic order —
   * feature prep's exact sibling to [[hashedVectors]] (exact codes
   * when the vocabulary is bounded; hashing when it is not). The
   * codebook is a distinct aggregate + ONE unpartitioned row_number
   * window bounded by label cardinality (the [[CorpusReport
   * .zipfReport]] bounded-window discipline), broadcast back for the
   * encode join — corpus rows are scanned once, never sorted.
   * Lexicographic assignment makes codes reproducible across runs and
   * engines, unlike first-seen order.
   */
  /**
   * Blocklist phrase screening (the C4 "bad words" curation rule, with
   * the phrase list as data): per-document hit count over a
   * word-boundary-anchored alternation of the phrases, plus the
   * blocked verdict. ONE compiled regex evaluated per row inside
   * whole-stage codegen — scan speed, no explode, no join; the phrase
   * list compiles into the plan, so at 100 TB the cost is the corpus
   * scan the gate shares with every other per-doc rule. Phrases are
   * matched case-insensitively (text lowered; supply lowercase
   * phrases) and must be regex-literal (no metacharacters) — enforced
   * loudly, since a quoting bug here silently blocks nothing.
   */
  def blocklistStats(docs: DataFrame, phrases: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrases.nonEmpty, "blocklist must not be empty")
    val bad = phrases.filter(_.exists(c => !c.isLetterOrDigit && c != ' '))
    require(bad.isEmpty, s"phrases must be word characters/spaces only: $bad")
    val pattern = phrases.mkString("\\b(", "|", ")\\b")
    docs.select(col(idCol).as("doc_id"),
      size(regexp_extract_all(lower(col(textCol)), lit(pattern), lit(1)))
        .cast("long").as("n_hits"))
      .withColumn("blocked", col("n_hits") > 0)
  }

  /**
   * [[blocklistStats]]' scale twin: the same count (bit-equal,
   * MultiMatchSpec) from ONE Aho–Corasick pass per row
   * ([[graft.functions.MultiMatch]]) instead of the regex alternation
   * — flat in phrase-list size where the backtracking alternation
   * grows with it. Use this form for curation-scale lists (thousands
   * of phrases); the regex form stays the oracle-replayable
   * certification path. Phrases must be lowercase, word-charactered,
   * and prefix-free (enforced loudly).
   */
  def blocklistStatsAc(docs: DataFrame, phrases: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.MultiMatch.matchCount(docs.sparkSession,
        lower(col(textCol)), phrases).as("n_hits"))
      .withColumn("blocked", col("n_hits") > 0)

  def labelEncode(df: DataFrame, labelCol: String,
      codeCol: String = ""): DataFrame = {
    val out = if (codeCol.nonEmpty) codeCol else s"${labelCol}_code"
    val codebook = df.select(col(labelCol)).distinct()
      .withColumn(out,
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col(labelCol))) - 1).cast("long"))
    df.join(broadcast(codebook), labelCol)
  }

  def hashedVectors(docs: DataFrame, dim: Int = 16,
      salt: String = "feathash", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    // spread before the tokenize+explode (single-row-group corpora run
    // it on one core; no-op at scale)
    val buckets = Dedup.spread(docs, col(idCol))
      .select(col(idCol).as("vec_id"), explode(tokens(col(textCol))).as("tok"))
      .select(col("vec_id"),
        (Sampling.hash32Str(col("tok"), salt) % dim).cast("int").as("b"))
      .groupBy("vec_id", "b").agg(count(lit(1)).as("c"))
    val raw = buckets.groupBy("vec_id")
      .agg(map_from_arrays(collect_list(col("b")), collect_list(col("c")))
        .as("m"))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(try_element_at(col("m"), i), lit(0L))
            .cast("double")).as("raw"))
    raw.select(col("vec_id"),
      sqrt(aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x))
        .as("nrm"), col("raw"))
      .select(col("vec_id"),
        transform(col("raw"), x => round(x / col("nrm"), 6))
          .as("embedding"))
  }

  /**
   * Exact heavy bigrams (`count >= minCount`) with a Count-Min-sketch
   * map-side pre-prune: pass 1 builds one ~100 KB CMS over
   * `xxhash64(bigram)` keys (a scan + an associative sketch merge — no
   * key shuffle at all); pass 2 re-explodes and filters each gram
   * instance through the broadcast sketch BEFORE the count shuffle,
   * then counts the survivors exactly and applies the true
   * `HAVING count >= minCount`.
   *
   * Exactness is by the CMS one-sided bound ([[graft.functions.CmsProbe]]):
   * estimates never undercount, so `estimate < minCount` proves the
   * gram can't pass the HAVING — nothing the exact path would keep is
   * ever pruned, and the final counts are computed from real rows, not
   * the sketch. CmsProbeSpec pins equality against the unpruned exact
   * aggregation, and that the CMS filter sits under the Exchange.
   *
   * The 100-TB shape: a plain `GROUP BY gram HAVING` shuffles the
   * ENTIRE gram vocabulary — for web-corpus bigrams that is the same
   * order as the corpus itself, and map-side partial aggregation
   * barely helps because most gram types are singletons (nothing to
   * combine within a partition). The CMS filter deletes the singleton
   * tail before it reaches the wire: the shuffle carries only
   * instances of estimated-heavy grams (≤ totalInstances·eps false
   * positives plus the true heavy mass). Two corpus scans buy a
   * vocabulary-independent shuffle.
   */
  /**
   * BM25 top-k retrieval (Robertson & Spärck Jones; the Okapi/Lucene
   * formula) for a literal term set — the lexical-retrieval primitive a
   * curation pipeline uses to pull topical slices out of a corpus
   * ("find the k documents most about X") without any embedding model.
   *
   * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·|d|/avgdl)),
   * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
   *
   * Cross-engine determinism (the NLL-tier discipline): every per-(doc,
   * term) contribution is computed in ONE fixed IEEE op order and
   * quantized to integer micro-units; per-document scores are exact
   * long sums in any partial-aggregation order, and ties break on
   * doc_id.
   *
   * Scale shape: the token explode filters to the query terms AT SCAN
   * (a handful of matches per doc survive), tf is a word-count-shaped
   * aggregate on (doc, term), df is a ≤|terms|-row rollup joined back
   * by broadcast, and the global N/avgdl ride as literals from one
   * scalar aggregate. Top-k plans as TakeOrderedAndProject — per
   * partition heaps, no global sort; the rank window runs over the k
   * selected rows only.
   */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val tokd = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val stats = tokd.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl")).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    val tf = tokd
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val mic = round(
      log((lit(n.toDouble) - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)) *
        (col("tf").cast("double") * lit(1.0 + k1)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))) *
        lit(1e6)).cast("long")
    val scored = tf.join(broadcast(dfr), "tok")
      .select(col("doc_id"), mic.as("mic"))
      .groupBy("doc_id").agg(sum(col("mic")).as("score_micro"))
    val top = scored.orderBy(col("score_micro").desc, col("doc_id")).limit(k)
    // rank over the ALREADY-SELECTED k rows (dsirSelect discipline)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_micro").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  /**
   * Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the
   * standard hybrid-retrieval combiner: given N top-k rankings of the
   * same id space (lexical [[bm25TopK]], a vector top-k from the
   * [[Similarity]] family, a quality ordering, …), score every id by
   * `Σ_r 1/(rrfK + rank_r(id))` — an id absent from a ranking
   * contributes 0 — and return the fused top-k. Rank-based fusion
   * needs NO score calibration between systems (BM25 micro-units and
   * cosines never meet), which is why RRF is the default hybrid
   * combiner in every production search stack.
   *
   * Determinism: the rankings meet in a full-outer join chain in
   * DECLARATION order and the score is ONE fixed-op-order expression
   * over the coalesced ranks, rounded to 1e-9 — no aggregate, no
   * engine-ordered float sum; ties break on id. The DuckDB oracle
   * replays the identical expression.
   *
   * Scale shape: inputs are top-k frames (≤ k rows each) by
   * construction, so the fusion is k-row × k-row work regardless of
   * corpus size — the corpus cost lives in the rankings, which each
   * bring their own scale story.
   */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60,
      idCol: String = "doc_id", rankCol: String = "rank"): DataFrame = {
    require(rankings.size >= 2,
      s"fusion needs at least two rankings, got ${rankings.size}")
    require(k > 0 && rrfK >= 0, s"need k > 0, rrfK >= 0; got $k, $rrfK")
    val prepared = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol).as("id"),
        col(rankCol).cast("long").as(s"__r$i"))
    }
    val joined = prepared.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = round(rankings.indices.map(i =>
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col(s"__r$i").cast("double")),
          lit(0.0)))
      .reduce(_ + _), 9)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_score").desc, col("id"))
    joined.withColumn("rrf_score", score)
      .orderBy(col("rrf_score").desc, col("id")).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("id").as(idCol), col("rrf_score"), col("rank"))
  }

  def heavyGramsCms(docs: DataFrame, minCount: Long, eps: Double = 1e-3,
      confidence: Double = 0.999, seed: Int = 42,
      textCol: String = "text"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val spark = docs.sparkSession
    val grams = docs
      .select(tokens(col(textCol)).as("toks"))
      .select(explode(bigrams(col("toks"))).as("gram"))
    val sketchBytes = grams
      .select(xxhash64(col("gram")).as("h"))
      .agg(expr(s"count_min_sketch(h, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)").as("cms"))
      .head().getAs[Array[Byte]](0) // bounded: depth*width*8 bytes
    val cms = graft.functions.CmsProbe.deserialize(sketchBytes)
    grams
      .filter(graft.functions.CmsProbe.estimate(spark, cms,
        xxhash64(col("gram"))) >= minCount)
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /**
   * [[gopherRepetition]] with ZERO shuffles — every counter computed
   * within the row by higher-order array functions, so the full bundle
   * is a pure projection: streaming-append-legal (the per-document
   * gate a [[graft.streaming.QualityMonitor]]-style ingest check can
   * run), and immune to the exploded shape's 9·tokens shuffle volume.
   * The trade is honest and measured with all shapes fully forced
   * (BASELINE.md): interpreted HOF aggregates cost ~1.8 ms per
   * ~200-token document vs the exploded shape's ~2.8 ms — and the
   * native-Expression sibling [[gopherRepetitionNative]] does the same
   * work in ~0.18 ms (one codegen'd JVM pass), so prefer IT for both
   * bulk scoring and streaming gates. This HOF twin remains the
   * pure-Spark-functions formulation (no custom expression required —
   * useful where deploying expression jars is not an option), and the
   * exploded shape remains the tool for adversarial inputs (see the
   * cost note below). All three return bit-identical rows
   * (CrossCheckSpec pins the three-way equality).
   *
   * Bit-equal to [[gopherRepetition]] (CrossCheckSpec pins equality on
   * the corpus): per n, the most-frequent-gram tie-break replays the
   * same (count, gram chars, md5) struct order over sorted-run
   * boundaries, and duplicate coverage replays the same
   * latest-flagged-start sweep the positional distinct-fold computes.
   *
   * Cost note: building the duplicate-start flags is
   * O(tokens · |duplicated grams|) per document (array_contains per
   * start against the doc's dup-gram list) — linear for real
   * documents, quadratic only for a pathological doc where every
   * n-gram repeats exactly twice; the exploded variant has no such
   * corner and is the right tool for adversarial inputs.
   *
   * PUSHDOWN HAZARD — do not `.filter` directly on the verdict
   * columns of this frame. Predicate pushdown substitutes the alias
   * chain into the filter condition, and inside the fold lambdas that
   * substitution turns O(1) materialized-array accesses
   * (`element_at(_gN, p)`) into a full re-derivation of the gram
   * arrays — and the tokenization regex — PER TOKEN POSITION
   * (observed: ~160 ms/doc vs ~2 ms/doc, an ~80× cliff). Filter via
   * [[materializeGate]] (the localCheckpoint fences the plan), or
   * join the verdict back on doc_id; aggregates over the verdict
   * columns are safe (each column evaluates once per row).
   */
  /**
   * The native-Expression shape of the Gopher bundle — same pure
   * projection as [[gopherRepetitionInline]] with all 14 counters
   * computed by ONE whole-stage-codegen'd pass per row
   * ([[graft.functions.GopherStats]]): the throughput tier for bulk
   * scoring AND streaming gates (zero shuffle, append-legal, none of
   * the inline twin's interpreted-HOF CPU or its filter-pushdown
   * hazard — the struct is opaque to alias substitution, so filtering
   * its fields re-evaluates one compiled call, not a per-position
   * re-derivation). Bit-identical to both siblings; CrossCheckSpec
   * pins the three-way equality, corpus + adversarial fixtures.
   */
  def gopherRepetitionNative(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", toksCol: String = "toks"): DataFrame = {
    val g = graft.functions.GopherStats.stats(docs.sparkSession,
      col(toksCol), col(textCol))
    val raw = docs
      .select(col(idCol).as("doc_id"), g.as("_g"))
      .select(col("doc_id") +:
        graft.functions.GopherStats.fieldNames
          .map(f => col(s"_g.$f").as(f)): _*)
    assembleGopherFracs(raw)
  }

  def gopherRepetitionInline(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", toksCol: String = "toks"): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val toks = col(toksCol)
    val ls = split(col(textCol), "\n")
    val charsOf = (a: Column) =>
      aggregate(a, lit(0L), (acc, x) => acc + length(x).cast("long"))

    def gramsOf(n: Int): Column =
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))

    // sorted-run sweep: per distinct gram, its run length; carry the
    // best (c, glen, gh) struct and the duplicated-gram list. The run
    // closes when the next element differs (and once more in finish).
    val emptyS = array().cast("array<string>")
    def runZero: Column = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("bc"), lit(0L).as("bg"), lit("").as("bh"),
      emptyS.as("dups"))
    def closeRun(acc: Column, n: Int): Column = {
      // fold the closing run (acc.prev × acc.run) into best/dups
      val pg = (length(acc.getField("prev")) - (n - 1)).cast("long")
      val ph = md5(acc.getField("prev"))
      val better = acc.getField("run") > acc.getField("bc") ||
        (acc.getField("run") === acc.getField("bc") &&
          (pg > acc.getField("bg") ||
            (pg === acc.getField("bg") && ph > acc.getField("bh"))))
      val hasRun = acc.getField("run") > 0
      struct(
        when(hasRun && better, acc.getField("run"))
          .otherwise(acc.getField("bc")).as("bc"),
        when(hasRun && better, pg).otherwise(acc.getField("bg")).as("bg"),
        when(hasRun && better, ph).otherwise(acc.getField("bh")).as("bh"),
        when(hasRun && acc.getField("run") >= 2,
          concat(acc.getField("dups"), array(acc.getField("prev"))))
          .otherwise(acc.getField("dups")).as("dups"))
    }
    /** (top_chars, dups) of one n's sorted gram array. */
    def runStats(n: Int, sorted: Column): Column =
      aggregate(sorted, runZero,
        (acc, g) => {
          val same = g === acc.getField("prev")
          val closed = closeRun(acc, n)
          struct(g.as("prev"),
            when(same, acc.getField("run") + 1L).otherwise(lit(1L))
              .as("run"),
            when(same, acc.getField("bc")).otherwise(closed.getField("bc"))
              .as("bc"),
            when(same, acc.getField("bg")).otherwise(closed.getField("bg"))
              .as("bg"),
            when(same, acc.getField("bh")).otherwise(closed.getField("bh"))
              .as("bh"),
            when(same, acc.getField("dups"))
              .otherwise(closed.getField("dups")).as("dups"))
        },
        acc => {
          val closed = closeRun(acc, n)
          struct((closed.getField("bc") * closed.getField("bg"))
            .as("top_chars"), closed.getField("dups").as("dups"))
        })

    // duplicate coverage: latest-flagged-start sweep over positions —
    // covered(p) ⇔ some dup-gram start in [p−n+1, p]; chars add once.
    def covSweep(n: Int, grams: Column, dups: Column): Column = {
      val nStarts = size(toks) - (n - 1)
      aggregate(sequence(lit(1), size(toks)),
        struct(lit(0).as("last"), lit(0L).as("sum")),
        (acc, p) => {
          // when-guard (not a bare AND): ANSI element_at throws past the
          // array end, and only CaseWhen guarantees conditional evaluation
          val isStart = when(p <= nStarts,
            array_contains(dups, element_at(grams, p)))
            .otherwise(lit(false))
          val newLast = when(isStart, p).otherwise(acc.getField("last"))
          val covered = newLast > 0 && newLast >= p - (n - 1)
          struct(newLast.as("last"),
            (acc.getField("sum") + when(covered,
              length(element_at(toks, p)).cast("long")).otherwise(0L))
              .as("sum"))
        },
        _.getField("sum"))
    }

    val base = docs.select(col(idCol).as("doc_id"), col(textCol), toks)
    // materialize gram arrays + run stats per n so subtrees are shared
    val withGrams = (topNs ++ dupNs).foldLeft(base) { (d, n) =>
      d.withColumn(s"_g$n", gramsOf(n))
        .withColumn(s"_rs$n", runStats(n, array_sort(col(s"_g$n"))))
    }
    val raw = withGrams.select(Seq(
      col("doc_id"),
      charsOf(toks).as("tok_chars"),
      size(ls).cast("long").as("n_lines"),
      (size(ls) - size(array_distinct(ls))).cast("long").as("n_dup_lines"),
      charsOf(ls).as("line_chars"),
      (charsOf(ls) - charsOf(array_distinct(ls))).as("dup_line_chars")) ++
      topNs.map(n =>
        col(s"_rs$n").getField("top_chars").as(s"top$n")) ++
      dupNs.map(n =>
        covSweep(n, col(s"_g$n"), col(s"_rs$n").getField("dups"))
          .as(s"cov$n")): _*)
    assembleGopherFracs(raw)
  }

  // ---- lexical diversity: per-document token entropy ----------------------

  /**
   * Per-document token-distribution statistics: token count, type count,
   * type-token ratio, and the Shannon entropy (bits) of the within-doc
   * token distribution. Low entropy at a given length means repetitive,
   * templated, or spam-like text — a standard corpus-quality signal that
   * complements the Gopher repetition fractions ([[gopherRepetition]]),
   * which measure *contiguous* repeats while entropy measures global
   * distributional collapse.
   *
   * Numeric discipline (same as [[unigramNll]]): each type's c·log2(c)
   * term is quantized to integer micro-units, and integer terms sum
   * identically in ANY order:
   * H = log2(n) − (Σ round(c·log2(c)·1e6)) / (n·1e6).
   *
   * Scale shape: a PURE SCAN — zero shuffles. The per-doc type counts
   * are run lengths of the sorted token array (the [[gopherRepetition]]
   * runStats trick), folded in one pass per row; a (doc, token)
   * explode-and-aggregate would shuffle the entire token stream at
   * 100 TB just to compute a per-document statistic. The order
   * independence of the integer terms is exactly why the groupBy-typed
   * DuckDB oracle still hash-matches this run-length form.
   */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", carryCols: Seq[String] = Nil): DataFrame = {
    def term(c: Column): Column =
      round(c.cast("double") * log2(c.cast("double")) * 1e6).cast("long")
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("s"), lit(0L).as("types"))
    def folded(sorted: Column): Column = aggregate(sorted, zero,
      (acc, t) => {
        val same = t === acc.getField("prev")
        val keep = same || acc.getField("run") === 0L
        struct(t.as("prev"),
          when(same, acc.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          when(keep, acc.getField("s"))
            .otherwise(acc.getField("s") + term(acc.getField("run")))
            .as("s"),
          when(keep, acc.getField("types"))
            .otherwise(acc.getField("types") + 1L).as("types"))
      },
      acc => struct(
        (acc.getField("s") + when(acc.getField("run") > 0L,
          term(acc.getField("run"))).otherwise(lit(0L))).as("s"),
        (acc.getField("types") + when(acc.getField("run") > 0L, 1L)
          .otherwise(0L)).as("types")))
    val carried = carryCols.map(col)
    docs
      // project tokens BEFORE the fold — inlining would re-tokenize per
      // element (see the t_top_ngrams note)
      .select(col(idCol).as("doc_id") +: tokens(col(textCol)).as("tk") +:
        carried: _*)
      .select(col("doc_id") +: size(col("tk")).cast("long").as("n_tok") +:
        folded(array_sort(col("tk"))).as("f") +: carried: _*)
      .select(col("doc_id") +: col("n_tok") +:
        col("f.types").as("n_types") +:
        round(col("f.types").cast("double") / col("n_tok").cast("double"), 6)
          .as("ttr") +:
        round(log2(col("n_tok").cast("double")) -
          col("f.s").cast("double") / (col("n_tok").cast("double") * 1e6), 6)
          .as("entropy") +: carried: _*)
  }

  /**
   * Per-source distributional distinctiveness: KL(source ‖ corpus) in
   * bits over unigram distributions — Σ_t p_s(t)·log2(p_s(t)/q(t)),
   * summed over the tokens the source actually uses (p=0 terms vanish
   * and q(t)>0 because the corpus contains the source). High KL =
   * domain-specific vocabulary (code, legalese); near-zero KL = generic
   * text — the distribution-level signal a mixing/reweighting decision
   * (DoReMi, DSIR) reads at the SOURCE granularity instead of per-doc.
   *
   * Every term is computed from four integer counts and micro-quantized
   * before the per-source sum, so the result is order-independent:
   * term(t) = round(c_st·log2((c_st·N)/(N_s·C_t))·1e6).
   *
   * Scale shape: one (source, token) count, one token-total count
   * derived FROM it (vocab-sized input, not a second corpus scan), one
   * token-keyed join, one |sources|-row rollup.
   */
  def sourceKl(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    // ONE text scan: the (source, token) table is persisted and reused
    // by the totals, the per-source sums, and the main join (the
    // pmiCollocations discipline). Registered through persistInternal
    // so a repeat call REPLACES the cache entry instead of accumulating
    // CacheManager entries in a long-lived session.
    val st = Dedup.persistInternal("text_source_kl_st",
      docs.select(col(srcCol).as("source"),
          explode(tokens(col(textCol))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c")))
    val tot = st.groupBy("tok").agg(sum(col("c")).as("ct"))
    val n = st.agg(sum(col("c"))).head().getLong(0).toDouble
    val perSrc = st.groupBy("source").agg(sum(col("c")).as("ns"))
    st.join(tot, "tok")
      .join(broadcast(perSrc), "source")
      .select(col("source"), col("ns"),
        round(col("c").cast("double") *
          log2(col("c").cast("double") * n /
            (col("ns").cast("double") * col("ct").cast("double"))) * 1e6)
          .cast("long").as("kl_micro"))
      .groupBy("source")
      // the per-SOURCE micro-sum can exceed 2^63 on a multi-TB source
      // (~3e12 tokens at ~3 bits); decimal(38,0) keeps it an exact
      // integer sum at any scale (DuckDB's HUGEINT sum is its mirror)
      .agg(min(col("ns")).as("n_tokens"), count(lit(1)).as("vocab_s"),
        sum(col("kl_micro").cast("decimal(38,0)")).as("s_micro"))
      .select(col("source"), col("n_tokens"), col("vocab_s"),
        round(col("s_micro").cast("double") /
          (col("n_tokens").cast("double") * 1e6), 6).as("kl_bits"))
  }

  /**
   * Token burstiness (Church & Gale 1995): the variance-to-mean ratio
   * of a token's per-document counts, over the documents that contain
   * it. Content words are bursty (VMR ≫ 1 — they pile up in the few
   * docs about their topic); function words are Poisson-ish (VMR ≈ 1);
   * the extreme tail is boilerplate/template tokens that repeat
   * mechanically inside documents. Output = the top-k burstiest tokens
   * at df ≥ minDf — the screen that finds template contamination exact
   * dedup misses because the surrounding text varies.
   *
   * Exactness: VMR = (df·Σc² − (Σc)²) / (df·Σc) involves no float SUM
   * anywhere — the moments are integer aggregates; the per-row products
   * are taken in DOUBLE (exact below 2⁵³, correctly-rounded above, the
   * same IEEE ops in both engines — a 64-bit integer product would
   * silently wrap on any stopword once Σc passes ~3e9) and divided
   * once; the micro-quantized quotient orders the top-k.
   *
   * Scale shape: (doc, token) count → token-keyed moment aggregate
   * (both map-side combined), then the bucketed top-k — no global sort.
   */
  def burstiness(docs: DataFrame, minDf: Long = 10, k: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val per = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("tok").agg(count(lit(1)).as("df"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("sc2"))
      .filter(col("df") >= minDf)
      .withColumn("vmr_micro",
        round((col("df").cast("double") * col("sc2").cast("double") -
            col("sc").cast("double") * col("sc").cast("double"))
          / (col("df").cast("double") * col("sc").cast("double")) * 1e6)
          .cast("long"))
    graft.operators.BucketedTopK.rank(per, Nil,
        Seq(col("vmr_micro").desc, col("tok")), col("tok"), k)
      .select(col("rank"), col("tok"), col("df"), col("sc").as("total_c"),
        round(col("vmr_micro").cast("double") / 1e6, 6).as("vmr"))
  }

  // ---- collocation mining: PMI -------------------------------------------

  /**
   * Corpus-level collocation mining: the top-k adjacent token pairs by
   * pointwise mutual information,
   * PMI = log2(p(xy) / (p(x)·p(y))), with p(xy) over bigram positions and
   * p(x) over token positions, restricted to pairs seen ≥ minCount times
   * (the classic guard against low-count PMI blowup). The output is the
   * multi-word-expression lexicon a tokenizer/phrase-normalization pass
   * consumes.
   *
   * Scale shape: two counting aggregates (bigram, unigram); the minCount
   * filter shrinks the bigram side BEFORE the two word-key equi-joins; the
   * final top-k is hierarchical (top-k per hash bucket, then one window
   * over ≤ 64·k survivors) so no partition ever sorts the whole
   * collocation table. PMI is computed per row from integer counts and a
   * 2-value totals frame — no cross-row float arithmetic anywhere, and the
   * rank order is on the integer micro-PMI.
   */
  def pmiCollocations(docs: DataFrame, minCount: Int = 5, k: Int = 50,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
    // ONE text scan builds the unigram table; it is persisted because it
    // is read three more times (the n1 total + both word-side joins) and
    // is vocab-sized, far below the corpus. persistInternal replaces the
    // entry on repeat calls — no unbounded CacheManager growth.
    val uni = Dedup.persistInternal("text_pmi_uni",
      toks.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cw")))
    val n1 = uni.agg(sum(col("cw"))).head().getLong(0).toDouble
    // the tokenizer never yields an empty array for non-null text
    // (split("") = [""]), so Σ max(len−1, 0) = Σ len − #non-null-docs —
    // a count-only job, not another text scan. NULL-text rows contribute
    // zero tokens (explode drops them) and must not enter the count, or
    // n2 would undercount and diverge from the oracle's len() sum.
    val n2 = n1 - docs.filter(col(textCol).isNotNull).count().toDouble
    val bi = toks.select(explode(bigrams(col("toks"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)
      .withColumn("wl", split(col("bigram"), " ").getItem(0))
      .withColumn("wr", split(col("bigram"), " ").getItem(1))
    val joined = bi
      .join(uni.withColumnRenamed("w", "wl").withColumnRenamed("cw", "c_left"),
        "wl")
      .join(uni.withColumnRenamed("w", "wr").withColumnRenamed("cw", "c_right"),
        "wr")
      .withColumn("pmi_micro",
        // association order mirrors the oracle exactly:
        // ((cxy·n1)·n1) / ((n2·c_left)·c_right)
        round(log2(col("cxy").cast("double") * n1 * n1 /
          (lit(n2) * col("c_left").cast("double") *
            col("c_right").cast("double")))
          * 1e6).cast("long"))
    graft.operators.BucketedTopK.rank(joined, Nil,
        Seq(col("pmi_micro").desc, col("bigram")), col("bigram"), k)
      .select(col("rank"), col("bigram"),
        col("cxy"), col("c_left"), col("c_right"),
        round(col("pmi_micro").cast("double") / 1e6, 6).as("pmi"))
  }

  /**
   * RAKE keyword extraction (Rose et al. 2010): candidate phrases are
   * maximal stopword-free token runs (capped at 3 words); each word
   * scores `degree/frequency` over the candidate multiset (degree =
   * summed lengths of phrases containing it — co-occurrence weight);
   * a phrase scores the sum of its words' scores. The corpus-level
   * top-k is the keyword lexicon a curation pass reads for topical
   * drift. Stopwords are the en marker list ([[langMarkers]]) — the
   * repo-wide stand-in vocabulary.
   *
   * Scale shape: segmentation is a PER-DOCUMENT running sum (window
   * keyed by doc_id — bounded by document length, millions of
   * independent keys); phrase and word aggregates are word-count-
   * shaped; the final ranking is [[graft.operators.BucketedTopK]] —
   * no whole-lexicon sort. Word scores quantize to integer micros
   * before the phrase sum, so ranking is integer-exact cross-engine.
   */
  def rakeKeywords(docs: DataFrame, k: Int = 40,
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val stopArr = array(langMarkers.head._2.map(lit): _*)
    val tok = docs.select(col("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("is_stop", array_contains(stopArr, col("tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val phrases = tok
      .withColumn("seg", sum(col("is_stop").cast("int")).over(w))
      .filter(!col("is_stop"))
      .groupBy("doc_id", "seg")
      .agg(array_sort(collect_list(struct(col("pos"), col("tok"))))
        .as("pt"))
      .select(transform(col("pt"), p => p.getField("tok")).as("ws"))
      .filter(size(col("ws")) <= 3)
      .select(array_join(col("ws"), " ").as("phrase"), col("ws"))
    val stats = phrases
      .select(explode(col("ws")).as("w"), size(col("ws")).as("plen"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("w"),
        round(col("deg").cast("double") * 1e6 / col("freq").cast("double"))
          .cast("long").as("wscore_micro"))
    val scored = phrases.groupBy("phrase").agg(count(lit(1)).as("n_occ"))
      .select(col("phrase"), col("n_occ"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(stats, "w")
      .groupBy("phrase", "n_occ")
      .agg(sum(col("wscore_micro")).as("score_micro"))
    graft.operators.BucketedTopK.rank(scored, Nil,
        Seq(col("score_micro").desc, col("phrase")), col("phrase"), k)
      .select(col("rank"), col("phrase"), col("n_occ"),
        round(col("score_micro").cast("double") / 1e6, 6).as("rake_score"))
  }

  /**
   * OCR/mojibake garbage screen — the character-class heuristics every
   * web/scan pipeline runs before the statistical filters (they catch
   * what an LM score can't: binary-as-text, encoding wrecks, OCR noise):
   *
   *  - `longtok_frac`: tokens longer than 20 chars (URLs-as-prose,
   *    un-segmented OCR runs);
   *  - `consrun_frac`: tokens containing ≥ 5 consecutive ASCII
   *    consonants (mojibake / keyboard mash — legitimate English has
   *    almost none);
   *  - `sym_frac`: characters that are not `[a-z0-9]`, whitespace
   *    (lowered) — high means markup bleed or binary contamination;
   *  - `is_garbage`: any of the three past its trip point
   *    (`sym > 0.2 ∨ consrun > 0.1 ∨ longtok > 0.05`).
   *
   * Pure per-row column expressions (integer counts → single rounded
   * divisions, the [[withQuality]] float discipline): evaluates at scan
   * speed inside whole-stage codegen, no shuffle, filter-pushdown
   * friendly when used as a gate.
   */
  def withGarbageScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val nLong = size(filter(toks, x => length(x) > 20))
    val nCons = size(filter(toks,
      x => x.rlike("[bcdfghjklmnpqrstvwxyz]{5,}")))
    val nSym = length(regexp_replace(lower(t), "[a-z0-9\\s]", ""))
    val nChars = length(t)
    val longF = round(nLong.cast("double") / nTok.cast("double"), 6)
    val consF = round(nCons.cast("double") / nTok.cast("double"), 6)
    val symF = round(nSym.cast("double") / nChars.cast("double"), 6)
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("longtok_frac", longF)
      .withColumn("consrun_frac", consF)
      .withColumn("sym_frac", symF)
      .withColumn("is_garbage",
        symF > 0.2 || consF > 0.1 || longF > 0.05)
  }
}
