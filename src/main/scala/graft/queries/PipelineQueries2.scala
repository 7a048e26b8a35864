package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Packing, Sampling, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-4 training-data pipeline operators as oracle-checked queries:
 * deterministic sampling / split assignment / weighted corpus mixing /
 * stratified sampling, sequence packing into token budgets, PII-shaped
 * redaction, corpus statistics, heavy-hitter n-grams, and incremental
 * (new-vs-corpus) MinHash dedup.
 *
 * Shares the md5-hashing convention of [[PipelineQueries]] so every
 * decision (sample membership, split label, bin id, redacted text) is
 * hash-verified against DuckDB, not just row-counted.
 */
object PipelineQueries2 {

  import PipelineQueries.{minhashSig, tokDocs, withC}

  /** DuckDB: integer value of the first 8 hex digits of the md5 hex
    * string produced by SQL expression `md5Expr` — THE single twin of
    * [[Sampling.hash32Str]]'s hex-prefix expansion. */
  private[queries] def duckHex32(md5Expr: String): String = {
    val terms = (0 until 8).map { i =>
      val mult = 1L << (4 * (7 - i))
      s"(strpos('0123456789abcdef', substr($md5Expr, ${i + 1}, 1)) - 1) * $mult"
    }
    "CAST(" + terms.mkString("\n      + ") + " AS BIGINT)"
  }

  /** DuckDB twin of [[Sampling.hash32]] over the documents table. */
  private[queries] def duckHash32(salt: String): String =
    duckHex32(s"md5('$salt:' || CAST(doc_id AS VARCHAR))")

  // thresholds computed ONCE here and inlined into both engines, so the
  // Spark plan and the oracle can never disagree on a rounding boundary
  private val sampRate = 0.25
  private val sampThresh = Sampling.rateThreshold(sampRate)
  private val splitFractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val splitBounds = splitFractions.map(_._2).scanLeft(0.0)(_ + _)
    .tail.map(Sampling.rateThreshold)
  private val mixWeights = Map("src0" -> 0.05, "src1" -> 0.5, "src2" -> 0.9)
  private val mixDefault = 0.25
  private val stratN = 10
  private val packBudget = 512L
  private val unimaxBudget = 30000L  // ~110% of sf0.01 corpus tokens
  private val unimaxEpochs = 2L

  /** tok_docs plus lang (the shared CTE drops it). */
  private val tokDocsLang =
    """docs_tl AS (
      |  SELECT doc_id, text, lang, source,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |  FROM documents)""".stripMargin

  private val packCte = tokDocs + ",\n" +
    s"""tl AS (
       |  SELECT source AS grp, doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
       |  FROM tok_docs),
       |pc AS (
       |  SELECT grp, doc_id, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY grp ORDER BY doc_id) - n_tokens
       |      AS cum_excl
       |  FROM tl)""".stripMargin

  /** Synthetic PII injected deterministically from doc_id — identical
    * string construction on both engines, so redaction is exercised on
    * every row even though the corpus itself is clean. */
  // single line: this gets interpolated into stripMargin'd oracle SQL,
  // where a line-leading `||` would lose its first pipe to the OUTER strip
  private[queries] val duckInjected = Seq(
    "text", "' contact user'", "CAST(doc_id AS VARCHAR)",
    "'@example.com or 555-'", "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')",
    "'-'", "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')",
    "' ip 10.'", "CAST(doc_id % 256 AS VARCHAR)", "'.0.1'"
  ).mkString(" || ")

  private[queries] def sparkInjected = concat(col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@example.com or 555-"),
    lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
    lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
    lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0.1"))

  private val duckRedacted =
    s"""regexp_replace(regexp_replace(regexp_replace(t,
       |    '${TextAnalysis.emailRe}', '[EMAIL]', 'g'),
       |    '${TextAnalysis.ipv4Re}', '[IP]', 'g'),
       |    '${TextAnalysis.phoneRe}', '[PHONE]', 'g')""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- deterministic sampling / mixing ----------------------------------

    QueryDef("samp_deterministic",
      s"""SELECT doc_id, h32 FROM (
         |  SELECT doc_id, ${duckHash32("samp")} AS h32 FROM documents)
         |WHERE h32 < $sampThresh""".stripMargin) {
      (s, dir) =>
        Sampling.deterministicSample(
            W.read(s, dir, "documents"), "doc_id", sampRate, "samp")
          .select(col("doc_id"),
            Sampling.hash32(col("doc_id"), "samp").as("h32"))
    },

    QueryDef("samp_split",
      s"""SELECT doc_id,
         |  CASE WHEN ${duckHash32("split")} < ${splitBounds(0)} THEN 'train'
         |       WHEN ${duckHash32("split")} < ${splitBounds(1)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin) {
      (s, dir) =>
        W.read(s, dir, "documents").select(col("doc_id"),
          Sampling.assignSplit(col("doc_id"), splitFractions, "split")
            .as("split"))
    },

    QueryDef("samp_weighted_mix", {
      val cases = mixWeights.toSeq.sortBy(_._1).map { case (src, rate) =>
        s"WHEN source = '$src' THEN ${Sampling.rateThreshold(rate)}"
      }.mkString("\n       ")
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source, ${duckHash32("mix")} AS h32 FROM documents)
         |WHERE h32 < (CASE $cases
         |  ELSE ${Sampling.rateThreshold(mixDefault)} END)""".stripMargin
    }) {
      (s, dir) =>
        Sampling.weightedMix(W.read(s, dir, "documents"), "source",
            mixWeights, mixDefault, "doc_id", "mix")
          .select("doc_id", "source")
    },

    QueryDef("samp_stratified",
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${duckHash32("strat")}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= $stratN""".stripMargin) {
      (s, dir) =>
        Sampling.stratifiedSample(W.read(s, dir, "documents"), "source",
            stratN, "doc_id", "strat")
          .select("doc_id", "source")
    },

    // ---- sequence packing -------------------------------------------------

    QueryDef("pack_contiguous",
      withC(packCte)(
        s"""SELECT grp, doc_id, n_tokens,
           |  CAST(cum_excl // $packBudget AS BIGINT) AS bin_id,
           |  CAST(cum_excl - (cum_excl // $packBudget) * $packBudget AS BIGINT)
           |    AS bin_offset
           |FROM pc""".stripMargin)) {
      (s, dir) =>
        Packing.packContiguous(
          W.read(s, dir, "documents").select(col("source"), col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok")),
          "source", "doc_id", "n_tok", packBudget)
    },

    QueryDef("pack_bin_stats",
      withC(packCte)(
        s"""SELECT grp, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           |  round(CAST(sum(n_tokens) AS DOUBLE) / $packBudget.0, 6)
           |    AS fill_ratio
           |FROM (SELECT grp, n_tokens,
           |        CAST(cum_excl // $packBudget AS BIGINT) AS bin_id FROM pc)
           |GROUP BY 1, 2""".stripMargin)) {
      (s, dir) =>
        Packing.binStats(
          Packing.packContiguous(
            W.read(s, dir, "documents").select(col("source"), col("doc_id"),
              size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok")),
            "source", "doc_id", "n_tok", packBudget),
          packBudget)
    },

    // Greedy first-fit packing: the stateful per-group fold has no window-
    // function equivalent (bin resets depend on the running decision), but
    // it IS deterministic in (grp, doc_id) order, so the oracle replays it
    // row-by-row with a recursive CTE carrying the (bin_id, bin_fill) state
    // — the same fold `Packing.greedyFold` streams. PackingSpec additionally
    // property-checks the greedy invariants.
    QueryDef("pack_greedy",
      s"""WITH RECURSIVE $tokDocs,
         |tl AS (
         |  SELECT source AS grp, doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
         |  FROM tok_docs),
         |ordered AS (
         |  SELECT grp, doc_id, n_tokens,
         |    row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
         |  FROM tl),
         |fold AS (
         |  SELECT grp, doc_id, n_tokens, rn,
         |    CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
         |  FROM ordered WHERE rn = 1
         |  UNION ALL
         |  SELECT o.grp, o.doc_id, o.n_tokens, o.rn,
         |    CASE WHEN f.bin_fill > 0 AND f.bin_fill + o.n_tokens > $packBudget
         |         THEN f.bin_id + 1 ELSE f.bin_id END AS bin_id,
         |    CASE WHEN f.bin_fill > 0 AND f.bin_fill + o.n_tokens > $packBudget
         |         THEN o.n_tokens ELSE f.bin_fill + o.n_tokens END AS bin_fill
         |  FROM fold f JOIN ordered o ON o.grp = f.grp AND o.rn = f.rn + 1)
         |SELECT grp, doc_id, n_tokens, bin_id, bin_fill FROM fold""".stripMargin) {
      (s, dir) =>
        Packing.packGreedy(
          W.read(s, dir, "documents").select(col("source"), col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok")),
          "source", "doc_id", "n_tok", packBudget)
    },

    // UniMax budget allocation (Chung et al. 2023): water-filling over
    // sources ascending by size — each takes min(cap, budgetLeft div
    // sourcesLeft), leftovers cascade to larger sources. The all-BIGINT
    // fold replays exactly in a recursive CTE (the pack_greedy
    // discipline).
    QueryDef("samp_unimax",
      s"""WITH RECURSIVE $tokDocs,
         |st AS (
         |  SELECT source AS src, CAST(sum(len(toks)) AS BIGINT) AS n_tokens
         |  FROM tok_docs GROUP BY 1),
         |ranked AS (
         |  SELECT src, n_tokens,
         |    row_number() OVER (ORDER BY n_tokens, src) AS rn,
         |    count(*) OVER () AS s
         |  FROM st),
         |fold AS (
         |  SELECT src, n_tokens, rn, s,
         |    least(n_tokens * $unimaxEpochs,
         |      CAST($unimaxBudget AS BIGINT) // s) AS alloc,
         |    CAST($unimaxBudget AS BIGINT)
         |      - least(n_tokens * $unimaxEpochs,
         |          CAST($unimaxBudget AS BIGINT) // s) AS left_after
         |  FROM ranked WHERE rn = 1
         |  UNION ALL
         |  SELECT r.src, r.n_tokens, r.rn, r.s,
         |    least(r.n_tokens * $unimaxEpochs,
         |      f.left_after // (r.s - f.rn)) AS alloc,
         |    f.left_after - least(r.n_tokens * $unimaxEpochs,
         |      f.left_after // (r.s - f.rn))
         |  FROM fold f JOIN ranked r ON r.rn = f.rn + 1)
         |SELECT src AS source, n_tokens, CAST(alloc AS BIGINT) AS alloc_tokens,
         |  round(CAST(alloc AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS epochs
         |FROM fold""".stripMargin) {
      (s, dir) =>
        Sampling.unimaxAllocation(W.read(s, dir, "documents"),
          unimaxBudget, unimaxEpochs)
    },

    // ---- redaction --------------------------------------------------------

    QueryDef("redact_pii",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.emailRe}')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.ipv4Re}')) AS BIGINT)
         |    AS n_ips,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.phoneRe}')) AS BIGINT)
         |    AS n_phones,
         |  md5($duckRedacted) AS redacted_md5
         |FROM (SELECT doc_id, $duckInjected AS t FROM documents)""".stripMargin) {
      (s, dir) =>
        W.read(s, dir, "documents")
          .select(col("doc_id"), sparkInjected.as("t"))
          .select(col("doc_id"),
            regexp_count(col("t"), lit(TextAnalysis.emailRe)).cast("long")
              .as("n_emails"),
            regexp_count(col("t"), lit(TextAnalysis.ipv4Re)).cast("long")
              .as("n_ips"),
            regexp_count(col("t"), lit(TextAnalysis.phoneRe)).cast("long")
              .as("n_phones"),
            md5(TextAnalysis.redactPii(col("t"))).as("redacted_md5"))
    },

    // ---- corpus statistics ------------------------------------------------

    QueryDef("t_corpus_stats",
      withC(tokDocsLang)(
        """SELECT source, lang,
          |  CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
          |  CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
          |    AS BIGINT) AS n_uniq_fp,
          |  CAST(sum(CASE WHEN len(toks) >= 50 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_long,
          |  round(CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
          |    AS mean_tokens
          |FROM docs_tl GROUP BY 1, 2""".stripMargin)) {
      (s, dir) => {
        val toks = TextAnalysis.tokens(col("text"))
        W.read(s, dir, "documents")
          .select(col("source"), col("lang"),
            size(toks).cast("long").as("nt"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("n_tokens"),
            countDistinct(col("fp")).as("n_uniq_fp"),
            sum(when(col("nt") >= 50, 1L).otherwise(0L)).as("n_long"),
            round(sum(col("nt")).cast("double") /
              count(lit(1)).cast("double"), 6).as("mean_tokens"))
      }
    },

    QueryDef("t_top_ngrams",
      withC(tokDocs)(
        """SELECT source, bigram, n, CAST(rk AS INT) AS rank FROM (
          |  SELECT source, bigram, n,
          |    row_number() OVER (PARTITION BY source ORDER BY n DESC, bigram)
          |      AS rk
          |  FROM (
          |    SELECT source, bigram, CAST(count(*) AS BIGINT) AS n
          |    FROM (
          |      SELECT source, unnest(list_transform(
          |        generate_series(1, greatest(len(toks) - 1, 0)),
          |        i -> toks[i] || ' ' || toks[i+1])) AS bigram
          |      FROM tok_docs)
          |    GROUP BY 1, 2))
          |WHERE rk <= 10""".stripMargin)) {
      (s, dir) => {
        // hierarchical top-k (BucketedTopK): a single per-source window
        // would sort the whole (mostly unique) bigram vocabulary in
        // #sources partitions — the classic top-k skew.
        val counts = W.read(s, dir, "documents")
          // tokens MUST be projected before the bigram lambda — inlining
          // the tokenizer would re-split the text inside every element_at
          // call, O(len²) per document (see Dedup.shinglesFromTokens)
          .select(col("source"), TextAnalysis.tokens(col("text")).as("toks"))
          .select(col("source"),
            explode(TextAnalysis.bigrams(col("toks"))).as("bigram"))
          .groupBy("source", "bigram").agg(count(lit(1)).as("n"))
        graft.operators.BucketedTopK.rank(counts, Seq(col("source")),
            Seq(col("n").desc, col("bigram")), col("bigram"), 10)
          .select(col("source"), col("bigram"), col("n"), col("rank"))
      }
    },

    // Exact per-source token-count quantiles (interpolated, the same
    // linear rule as DuckDB's quantile_cont). The percentile_approx
    // sketch twin is cross-checked against this in CrossCheckSpec.
    QueryDef("t_token_quantiles",
      withC(tokDocs)(
        """SELECT source,
          |  round(quantile_cont(nt, 0.25), 6) AS p25,
          |  round(quantile_cont(nt, 0.50), 6) AS p50,
          |  round(quantile_cont(nt, 0.75), 6) AS p75,
          |  round(quantile_cont(nt, 0.95), 6) AS p95
          |FROM (SELECT source, CAST(len(toks) AS DOUBLE) AS nt FROM tok_docs)
          |GROUP BY source""".stripMargin)) {
      (s, dir) =>
        W.read(s, dir, "documents")
          .select(col("source"),
            size(TextAnalysis.tokens(col("text"))).cast("double").as("nt"))
          .groupBy("source")
          .agg(round(expr("percentile(nt, 0.25)"), 6).as("p25"),
            round(expr("percentile(nt, 0.50)"), 6).as("p50"),
            round(expr("percentile(nt, 0.75)"), 6).as("p75"),
            round(expr("percentile(nt, 0.95)"), 6).as("p95"))
    },

    // ---- end-to-end corpus build ------------------------------------------

    // The full composition: quality gate → exact-dedup keep-one → weighted
    // mix → split label → contiguous packing, hash-verified as ONE chain.
    QueryDef("pipe_end_to_end", {
      val stop = "['the','a','of','and','is']"
      val mixCases = mixWeights.toSeq.sortBy(_._1).map { case (src, rate) =>
        s"WHEN source = '$src' THEN ${Sampling.rateThreshold(rate)}"
      }.mkString("\n       ")
      withC(tokDocs + ",\n" +
        s"""gated AS (
           |  SELECT doc_id, source, text, CAST(len(toks) AS BIGINT) AS n_tokens
           |  FROM tok_docs
           |  WHERE round(0.4 * (CAST(len(list_filter(toks, x -> list_contains($stop, x))) AS DOUBLE)
           |        / CAST(len(toks) AS DOUBLE))
           |    + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
           |    + 0.3 * (CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE)
           |        / CAST(length(text) AS DOUBLE)), 6) >= 0.5),
           |kept AS (
           |  SELECT doc_id, source, n_tokens FROM (
           |    SELECT doc_id, source, n_tokens, row_number() OVER (
           |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
           |      ORDER BY doc_id) AS rn
           |    FROM gated) WHERE rn = 1),
           |mixed AS (
           |  SELECT doc_id, source, n_tokens FROM kept
           |  WHERE ${duckHash32("mix")} < (CASE $mixCases
           |    ELSE ${Sampling.rateThreshold(mixDefault)} END)),
           |lab AS (
           |  SELECT doc_id, source, n_tokens,
           |    CASE WHEN ${duckHash32("split")} < ${splitBounds(0)} THEN 'train'
           |         WHEN ${duckHash32("split")} < ${splitBounds(1)} THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM mixed),
           |pcc AS (
           |  SELECT doc_id, source, split, n_tokens,
           |    sum(n_tokens) OVER (PARTITION BY source, split ORDER BY doc_id)
           |      - n_tokens AS cum_excl
           |  FROM lab)""".stripMargin)(
        s"""SELECT doc_id, source, split, n_tokens,
           |  CAST(cum_excl // $packBudget AS BIGINT) AS bin_id
           |FROM pcc""".stripMargin)
    }) {
      (s, dir) =>
        graft.pipeline.TrainingPipeline.buildCorpus(
          W.read(s, dir, "documents"),
          graft.pipeline.TrainingPipeline.Config(
            minQuality = 0.5, mixWeights = mixWeights,
            defaultRate = mixDefault, splitFractions, packBudget))
    },

    // Intra-doc repetition (Gopher-style quality rule): fraction of word
    // trigrams that are repeats.
    QueryDef("t_repetition",
      withC(tokDocs)(
        """SELECT doc_id,
          |  CAST(len(tris) AS BIGINT) AS n_trigrams,
          |  CAST(len(list_distinct(tris)) AS BIGINT) AS n_distinct_trigrams,
          |  CASE WHEN len(tris) > 0
          |    THEN round(1.0 - CAST(len(list_distinct(tris)) AS DOUBLE)
          |      / CAST(len(tris) AS DOUBLE), 6)
          |    ELSE 0.0 END AS dup_frac
          |FROM (
          |  SELECT doc_id, list_transform(
          |    generate_series(1, greatest(len(toks) - 2, 0)),
          |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tris
          |  FROM tok_docs)""".stripMargin)) {
      (s, dir) =>
        TextAnalysis.withRepetition(
          W.read(s, dir, "documents")
            .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")))
          .select("doc_id", "n_trigrams", "n_distinct_trigrams", "dup_frac")
    },

    // Materialize packed bins into training sequences: texts of a bin
    // concatenated in id order with a separator (md5 so the oracle
    // compares the full sequence without shipping giant strings).
    QueryDef("pack_materialize",
      withC(packCte)(
        s"""SELECT grp, bin_id, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           |  md5(string_agg(text, ' <doc> ' ORDER BY doc_id)) AS seq_md5
           |FROM (
           |  SELECT p.grp, p.doc_id, p.n_tokens,
           |    CAST(p.cum_excl // $packBudget AS BIGINT) AS bin_id, d.text
           |  FROM pc p JOIN documents d ON p.doc_id = d.doc_id)
           |GROUP BY 1, 2""".stripMargin)) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        val packed = Packing.packContiguous(
          docs.select(col("source"), col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok")),
          "source", "doc_id", "n_tok", packBudget)
        packed.join(docs.select("doc_id", "text"), "doc_id")
          .groupBy("grp", "bin_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("bin_tokens"),
            // collect_list order is nondeterministic — sort the structs,
            // then join, so the sequence is id-ordered on any cluster
            md5(array_join(transform(
              array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text")), " <doc> ")).as("seq_md5"))
      }
    },

    // ---- decontamination --------------------------------------------------

    // Benchmark = every 17th doc; corpus = the rest. Overlap = ≥3 shared
    // rare shingles (corpus document-frequency ≤ 100) — the inverted-
    // index join with the df-prune that bounds boilerplate fan-out.
    QueryDef("decon_overlap", PipelineQueries2.deconOracleSql) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        graft.pipeline.Decontamination.overlaps(
          docs.filter(col("doc_id") % 17 =!= 0),
          docs.filter(col("doc_id") % 17 === 0),
          minShared = 3, maxDf = Some(100))
      }
    },

    // "new" increment = doc_id % 10 < 2 (a stable 20% of the corpus at any
    // SF); pairs must touch the increment — old×old pairs never appear.
    QueryDef("dedup_minhash_incremental",
      withC(minhashSig + ",\n" +
        """bands AS (
          |  SELECT doc_id, 1 AS band_idx,
          |    md5(mh1 || mh2 || mh3 || mh4) AS band_hash FROM sig
          |  UNION ALL
          |  SELECT doc_id, 2 AS band_idx,
          |    md5(mh5 || mh6 || mh7 || mh8) AS band_hash FROM sig),
          |cand AS (
          |  SELECT DISTINCT least(n.doc_id, a.doc_id) AS doc_a,
          |    greatest(n.doc_id, a.doc_id) AS doc_b
          |  FROM (SELECT * FROM bands WHERE doc_id % 10 < 2) n
          |  JOIN bands a ON n.band_idx = a.band_idx
          |    AND n.band_hash = a.band_hash AND n.doc_id <> a.doc_id)""".stripMargin)(
        """SELECT c.doc_a, c.doc_b,
          |  round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          |    / CAST(len(sa.shingles) + len(sb.shingles)
          |      - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE), 6)
          |    AS jaccard
          |FROM cand c
          |JOIN shingled sa ON c.doc_a = sa.doc_id
          |JOIN shingled sb ON c.doc_b = sb.doc_id""".stripMargin)) {
      (s, dir) =>
        Dedup.minhashLshPairsIncremental(
          W.read(s, dir, "documents"), id => id % 10 < 2)
    }
  )

  /** decon_overlap's oracle — shared with the Bloom-prefiltered scale
    * path in [[PipelineQueries3]], which is result-identical. `lazy` so
    * `defs` (declared above) can reference it during object init. */
  private[queries] lazy val deconOracleSql: String =
      withC(PipelineQueries.shingled + ",\n" +
        """corp AS (
          |  SELECT doc_id, unnest(shingles) AS s FROM shingled
          |  WHERE doc_id % 17 <> 0),
          |rare AS (
          |  SELECT s FROM (SELECT s, count(*) AS df FROM corp GROUP BY s)
          |  WHERE df <= 100),
          |corpr AS (SELECT c.doc_id, c.s FROM corp c JOIN rare r ON c.s = r.s),
          |bench AS (
          |  SELECT doc_id AS bench_id, len(shingles) AS n_bench,
          |    unnest(shingles) AS s
          |  FROM shingled WHERE doc_id % 17 = 0)""".stripMargin)(
        """SELECT c.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared,
          |  round(CAST(count(*) AS DOUBLE) / CAST(b.n_bench AS DOUBLE), 6)
          |    AS bench_frac
          |FROM corpr c JOIN bench b ON c.s = b.s
          |GROUP BY c.doc_id, b.bench_id, b.n_bench
          |HAVING count(*) >= 3""".stripMargin)
}
