package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Boilerplate, CorpusWriter, Decontamination, Dedup, Packing, Sampling, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-5 batch 2: content-rewriting and importance-scoring operators as
 * oracle-checked queries — exact-substring REMOVAL (the rewrite half of
 * Lee et al.'s dedup; detection is `dedup_spans`), span-level
 * decontamination masking (cut the leaked span, keep the document),
 * interpolated bigram-LM scoring (one order up from `t_unigram_nll`),
 * and DSIR hashed-n-gram importance weights (Xie et al.).
 *
 * Every oracle replays the FULL pipeline — window hashing, coverage,
 * reassembly, smoothing, micro-nat quantization — so the hash-match
 * covers the rewrite/score values themselves, not just row counts.
 * Float parity discipline: interpolation weights and smoothing totals
 * are interpolated into the SQL from the same Scala doubles the Spark
 * plan uses (e.g. `1.0 - 0.9` prints as 0.09999999999999998, which
 * DuckDB parses back to the identical IEEE double).
 */
object PipelineQueries5 {

  import PipelineQueries.{tokDocs, withC}

  private val remW = 8       // removal window (tokens)
  private val maskW = 3      // decon mask window (tokens)
  private val maskMaxDf = 100
  private val lambda = 0.9   // bigram interpolation weight
  private val lmAlpha = 0.4  // Stupid Backoff per-level penalty
  private val lmRate = 0.5   // trigram-LM train slice
  private val lmSalt = "lm"
  private val lmThresh = Sampling.rateThreshold(lmRate)
  private val dsirBuckets = 8192
  private val dsirTopN = 100
  private val contThreshold = 0.8
  private val contLshK = 16
  private val contLshCap = 256

  /** Full containment-LSH replay on the md5 parity hash family: sorted
    * distinct tokens → k signature mins → every power-of-two band
    * granularity → 256-cap per bucket → tier-selected band join → exact
    * containment verify. Constants (granularity thresholds) are computed
    * by the SAME Scala expressions the Spark plan inlines. */
  private def contLshCtes: String = contLshCtes(None)

  private def contLshCtes(newPred: Option[String]): String = {
    val k = contLshK
    val gs = Seq(1, 2, 4, 8, 16)
    def thr(g: Int): Double = math.pow(g.toDouble / k, 1.0 / g)
    val gCase = gs.reverse.init.map(g =>
      s"WHEN jlb >= CAST(${thr(g)} AS DOUBLE) THEN $g")
      .mkString("CASE ", " ", " ELSE 1 END")
    // Real-family replay: the signature mins are Spark's XXH64 over the
    // distinct tokens (seed j = signature row), the per-granularity band
    // hashes are the xxhash64(slice(sig, ...)) long folds — both through
    // the bit-exact SQL chains in XxhSql, so the oracle certifies the
    // SCALE-path hash family, not a parity twin.
    val ub = XxhSql.toUnsigned("mh")
    val piv = (0 until k).map(j =>
      s"max(CASE WHEN seed = $j THEN $ub END) AS m$j").mkString(",\n    ")
    // one fold chain per granularity; letter prefixes so generated CTE
    // names (prefix + step index) can never collide across chains
    def pfx(g: Int) = s"cb${('a' + gs.indexOf(g)).toChar}"
    val folds = gs.map { g =>
      val bandRows = (0 until k / g).map { b =>
        val vs = (0 until g).map(i => s"m${b * g + i} AS v${i + 1}")
          .mkString(", ")
        s"SELECT doc_id, $b AS band_idx, $vs FROM cl_piv"
      }.mkString("\n  UNION ALL ")
      s"${pfx(g)}_in AS MATERIALIZED (\n  $bandRows),\n" +
        XxhSql.longFoldChain(pfx(g), s"${pfx(g)}_in",
          Seq("doc_id", "band_idx"), g)
    }.mkString(",\n")
    val bandUnion = gs.map(g =>
      s"SELECT doc_id, $g AS g, band_idx, band_hash FROM ${pfx(g)}f")
      .mkString("\n  UNION ALL ")
    s"""cl_td AS MATERIALIZED (
       |  SELECT doc_id, list_sort(list_distinct(toks)) AS toksd
       |  FROM tok_docs WHERE len(list_distinct(toks)) > 0),
       |inp AS MATERIALIZED (
       |  SELECT s, CAST(seed AS HUGEINT) AS seed
       |  FROM (SELECT DISTINCT unnest(toksd) AS s FROM cl_td),
       |       (SELECT unnest(generate_series(0, ${k - 1})) AS seed)),
       |${XxhSql.strHashChain("cx")},
       |cl_sigrows AS MATERIALIZED (
       |  SELECT d.doc_id, x.seed, min(${XxhSql.toSigned("x.hf")}) AS mh
       |  FROM (SELECT doc_id, unnest(toksd) AS s FROM cl_td) d
       |  JOIN cxf x ON d.s = x.s
       |  GROUP BY d.doc_id, x.seed),
       |cl_piv AS MATERIALIZED (
       |  SELECT doc_id,
       |    $piv
       |  FROM cl_sigrows GROUP BY doc_id),
       |$folds,
       |cl_bands AS MATERIALIZED (
       |  SELECT u.doc_id, t.tier, u.g, u.band_idx, u.band_hash
       |  FROM ($bandUnion) u
       |  JOIN (SELECT doc_id, CAST(floor(log2(len(toksd))) AS INT) AS tier
       |        FROM cl_td) t USING (doc_id)),
       |cl_capped AS (
       |  SELECT doc_id, tier, g, band_idx, band_hash FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY g, band_idx, band_hash ORDER BY doc_id) AS rn
       |    FROM cl_bands) WHERE rn <= $contLshCap),
       |cl_cand AS (
       |  SELECT DISTINCT doc_a, doc_b FROM (
       |    SELECT ${newPred.fold(
                "a.doc_id AS doc_a, b.doc_id AS doc_b")(_ =>
                "least(a.doc_id, b.doc_id) AS doc_a, " +
                  "greatest(a.doc_id, b.doc_id) AS doc_b")}, a.g AS g,
       |      CAST($contThreshold AS DOUBLE)
       |        * power(2.0, least(a.tier, b.tier))
       |        / (power(2.0, least(a.tier, b.tier))
       |           + power(2.0, greatest(a.tier, b.tier))) AS jlb
       |    FROM ${newPred.fold("cl_capped")(p =>
                s"(SELECT * FROM cl_capped WHERE $p)")} a
       |    JOIN cl_capped b
       |      ON a.g = b.g AND a.band_idx = b.band_idx
       |     AND a.band_hash = b.band_hash AND ${newPred.fold(
                "a.doc_id < b.doc_id")(_ => "a.doc_id <> b.doc_id")})
       |  WHERE g = $gCase)""".stripMargin
  }
  private val orderShards = 8
  private val bpeMerges = 10

  /** Unrolled DuckDB replay of [[TextAnalysis.bpeLearn]]: w0 is the
    * word-type table with bracket segmentations; each step i chains
    * pair-count (p_i) → argmax (m_i) → merge-by-replace (w_i). */
  private def bpeCtes(n: Int): String = {
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    // step references its predecessor three times (pair count + two
    // argmax scalar subqueries) — inlined, the base scan duplicates 3^n
    // times and the query dies on file handles before it runs
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
        |    regexp_replace(w, '(.)', '<\1>', 'g') AS seg
        |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |        FROM documents)
        |  WHERE regexp_matches(w, '^[a-z0-9]+$')
        |  GROUP BY w)""".stripMargin
    val steps = (1 to n).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS pcnt FROM (
         |    SELECT cnt, '<' || syms[i] || '><' || syms[i + 1] || '>' AS pair
         |    FROM (SELECT cnt, str_split(seg[2:-2], '><') AS syms FROM w${i - 1}),
         |      LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i))
         |  GROUP BY pair),
         |m$i AS MATERIALIZED (SELECT $i AS step, pair,
         |  '<' || replace(pair[2:-2], '><', '') || '>' AS merged, pcnt
         |  FROM p$i ORDER BY pcnt DESC, pair LIMIT 1),
         |w$i AS MATERIALIZED (SELECT w, cnt,
         |  replace(seg, (SELECT pair FROM m$i), (SELECT merged FROM m$i)) AS seg
         |  FROM w${i - 1})""".stripMargin
    }.mkString(",\n")
    s"$w0,\n$steps"
  }

  private def bpeLearnSql(n: Int): String = {
    val union = (1 to n).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")
    s"""WITH ${bpeCtes(n)}
       |SELECT CAST(step AS BIGINT) AS step, pair, merged,
       |  CAST(pcnt AS BIGINT) AS cnt
       |FROM ($union)""".stripMargin
  }

  /** Encode replay: corpus token instances joined to the final merged
    * word-type table w_n; subword count = symbols in the segmentation. */
  private def bpeEncodeSql(n: Int): String =
    s"""WITH $tokDocs,
       |${bpeCtes(n)},
       |enc AS (
       |  SELECT t.doc_id, len(str_split(w.seg[2:-2], '><')) AS nsub
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tok_docs) t
       |  JOIN w$n w ON t.tok = w.w)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(nsub) AS BIGINT) AS n_subwords,
       |  round(CAST(sum(nsub) AS DOUBLE) / count(*), 6) AS mean_subwords
       |FROM enc GROUP BY doc_id""".stripMargin
  /** Shared gate-oracle CTE chain (tok_docs → sig → gated): the DuckDB
    * mirror of [[TextAnalysis.qualityGate]]'s signal computation and
    * verdict. Also reused by PipelineQueries6's windowed monitor. */
  private[queries] lazy val gateCtes: String = tokDocs + ",\n" +
    s"""sig AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    round(0.4 * (CAST(len(list_filter(toks, x ->
       |          list_contains(${PipelineQueries.stop}, x))) AS DOUBLE)
       |        / CAST(len(toks) AS DOUBLE))
       |      + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
       |      + 0.3 * (CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE)
       |        / CAST(length(text) AS DOUBLE)), 6) AS quality_score,
       |    round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
       |      / CAST(len(toks) AS DOUBLE), 6) AS mean_token_len,
       |    round(CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE)
       |      / CAST(length(text) AS DOUBLE), 6) AS alpha_ratio,
       |    CASE WHEN len(tris) > 0
       |      THEN round(1.0 - CAST(len(list_distinct(tris)) AS DOUBLE)
       |        / CAST(len(tris) AS DOUBLE), 6)
       |      ELSE 0.0 END AS dup_frac
       |  FROM (
       |    SELECT doc_id, text, toks, list_transform(
       |      generate_series(1, greatest(len(toks) - 2, 0)),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tris
       |    FROM tok_docs)),
       |gated AS (
       |  SELECT doc_id, n_tokens, quality_score, dup_frac,
       |    CASE WHEN n_tokens < $gateMinTokens THEN 'too_short'
       |         WHEN n_tokens > $gateMaxTokens THEN 'too_long'
       |         WHEN mean_token_len < $gateMinTokLen
       |           OR mean_token_len > $gateMaxTokLen THEN 'token_len'
       |         WHEN alpha_ratio < $gateMinAlpha THEN 'non_alpha'
       |         WHEN dup_frac > $gateMaxDupFrac THEN 'repetition'
       |         ELSE NULL END AS fail_reason
       |  FROM sig)""".stripMargin

  private val gateMinTokens = 16L
  private val gateMaxTokens = 100000L
  private val gateMinTokLen = 2.0
  private val gateMaxTokLen = 12.0
  private val gateMinAlpha = 0.4
  private val gateMaxDupFrac = 0.2
  private val bpeTopK = 50
  private val chainChunk = 32
  private val chainStride = 24

  import PipelineQueries2.duckHex32

  /** DuckDB CTEs shared by the two span-rewrite oracles: windows with
    * start positions, coverage, token rows, reassembly. `src` is a CTE
    * name with (doc_id, toks); `hitsSql` must define `hits(doc_id, i)`. */
  private def duckRewrite(src: String, w: Int, hitsSql: String): String =
    s"""$hitsSql,
       |covered AS (
       |  SELECT DISTINCT doc_id, p FROM (
       |    SELECT doc_id, unnest(generate_series(i, i + ${w - 1})) AS p
       |    FROM hits)),
       |tokr AS (
       |  SELECT doc_id, p, toks[p] AS tok FROM (
       |    SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS p
       |    FROM $src)),
       |kept AS (
       |  SELECT t.doc_id, count(*) AS n_kept,
       |    string_agg(t.tok, ' ' ORDER BY t.p) AS text_clean
       |  FROM tokr t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
       |  WHERE c.p IS NULL GROUP BY t.doc_id),
       |nt AS (SELECT doc_id, len(toks) AS n_tokens FROM $src)""".stripMargin

  private val rewriteSelect =
    """SELECT n.doc_id, CAST(n.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n.n_tokens - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
      |  coalesce(k.text_clean, '') AS text_clean
      |FROM nt n LEFT JOIN kept k USING (doc_id)""".stripMargin

  /** DuckDB CTEs `wins`/`freq` + `hits`: duplicated w-window starts over
    * CTE `src(doc_id, toks)` — the oracle twin of Boilerplate.dupStarts. */
  private def duckDupStarts(src: String, w: Int): String =
    s"""wins AS (
       |  SELECT doc_id, i,
       |    md5(array_to_string(list_slice(toks, i, i + ${w - 1}), ' '))
       |      AS wh
       |  FROM (SELECT doc_id, toks,
       |      unnest(generate_series(1, len(toks) - ${w - 1})) AS i
       |    FROM $src)),
       |freq AS (SELECT wh, count(*) AS c FROM wins GROUP BY 1),
       |hits AS (
       |  SELECT doc_id, i FROM wins JOIN freq USING (wh)
       |  WHERE c >= 2)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- exact-substring removal ------------------------------------------

    QueryDef("dedup_span_removal", withC(tokDocs + ",\n" +
      duckRewrite("tok_docs", remW, duckDupStarts("tok_docs", remW)))(
      rewriteSelect)) {
      (s, dir) =>
        val docs = W.read(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        Boilerplate.removeDupSpans(docs, w = remW)
    },

    // ---- span-level decontamination masking -------------------------------

    QueryDef("decon_mask", withC(tokDocs + ",\n" +
      s"""ctok AS (SELECT doc_id, toks FROM tok_docs WHERE doc_id % 17 <> 0),
         |btok AS (SELECT doc_id, toks FROM tok_docs WHERE doc_id % 17 = 0),
         |cw AS (
         |  SELECT doc_id, i,
         |    md5(array_to_string(list_slice(toks, i, i + ${maskW - 1}), ' '))
         |      AS wh
         |  FROM (SELECT doc_id, toks,
         |      unnest(generate_series(1, len(toks) - ${maskW - 1})) AS i
         |    FROM ctok)),
         |bw AS (
         |  SELECT DISTINCT
         |    md5(array_to_string(list_slice(toks, i, i + ${maskW - 1}), ' '))
         |      AS wh
         |  FROM (SELECT doc_id, toks,
         |      unnest(generate_series(1, len(toks) - ${maskW - 1})) AS i
         |    FROM btok)),
         |rare AS (
         |  SELECT wh FROM (
         |    SELECT wh, count(DISTINCT doc_id) AS df FROM cw GROUP BY 1)
         |  WHERE df <= $maskMaxDf),
         |""".stripMargin +
      duckRewrite("ctok", maskW,
        """hits AS (
          |  SELECT doc_id, i FROM cw JOIN rare USING (wh)
          |  JOIN bw USING (wh))""".stripMargin))(rewriteSelect)) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        Decontamination.maskSpans(
          docs.filter(col("doc_id") % 17 =!= 0),
          docs.filter(col("doc_id") % 17 === 0),
          w = maskW, maxDf = Some(maskMaxDf))
      }
    },

    // ---- interpolated bigram-LM scoring -----------------------------------

    QueryDef("t_bigram_nll", withC(tokDocs + ",\n" +
      s"""bg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |  FROM (SELECT doc_id, toks,
         |      unnest(generate_series(1, len(toks) - 1)) AS i
         |    FROM tok_docs)),
         |uni AS (
         |  SELECT tok, count(*) AS cu
         |  FROM (SELECT unnest(toks) AS tok FROM tok_docs) GROUP BY 1),
         |tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS n FROM uni),
         |bc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
         |nll AS (
         |  SELECT bc.w1, bc.w2,
         |    CAST(round(-ln(
         |      $lambda * CAST(cb AS DOUBLE) / CAST(u1.cu AS DOUBLE)
         |      + ${1.0 - lambda} * CAST(u2.cu AS DOUBLE) / (SELECT n FROM tot))
         |      * 1e6) AS BIGINT) AS nll_micro
         |  FROM bc JOIN uni u1 ON bc.w1 = u1.tok
         |  JOIN uni u2 ON bc.w2 = u2.tok),
         |perdoc AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    CAST(sum(nll_micro) AS BIGINT) AS s
         |  FROM bg JOIN nll USING (w1, w2) GROUP BY doc_id)""".stripMargin)(
      """SELECT d.doc_id, coalesce(p.n_bigrams, 0) AS n_bigrams,
        |  coalesce(p.s, 0) AS nll_micro_sum,
        |  CASE WHEN coalesce(p.n_bigrams, 0) > 0
        |    THEN round(CAST(p.s AS DOUBLE) / (p.n_bigrams * 1e6), 6)
        |    ELSE 0.0 END AS mean_nll
        |FROM documents d LEFT JOIN perdoc p USING (doc_id)""".stripMargin)) {
      (s, dir) => TextAnalysis.bigramNll(W.read(s, dir, "documents"), lambda)
    },

    // Stupid Backoff trigram LM (Brants et al. 2007): counts from the
    // deterministic 50% hash slice, scoring over the full corpus — the
    // held-out split is what makes the backoff chain fire (self-trained
    // counts always have c3 >= 1). The oracle replays sampling, all three
    // count tables, the backoff CASE, and the micro-nat quantization;
    // alpha and alpha^2 are interpolated from the same Scala doubles the
    // Spark plan uses.
    QueryDef("t_trigram_backoff", withC(tokDocs + ",\n" +
      s"""train_toks AS (
         |  SELECT toks FROM tok_docs
         |  WHERE ${PipelineQueries2.duckHash32(lmSalt)} < $lmThresh),
         |tg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
         |  FROM (SELECT doc_id, toks,
         |      unnest(generate_series(1, len(toks) - 2)) AS i
         |    FROM tok_docs)),
         |c1 AS (
         |  SELECT tok, count(*) AS c1
         |  FROM (SELECT unnest(toks) AS tok FROM train_toks) GROUP BY 1),
         |tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM c1),
         |c2 AS (
         |  SELECT w1, w2, count(*) AS c2 FROM (
         |    SELECT toks[i] AS w1, toks[i + 1] AS w2
         |    FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
         |      FROM train_toks)) GROUP BY 1, 2),
         |c3 AS (
         |  SELECT w1, w2, w3, count(*) AS c3 FROM (
         |    SELECT toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
         |    FROM (SELECT toks, unnest(generate_series(1, len(toks) - 2)) AS i
         |      FROM train_toks)) GROUP BY 1, 2, 3),
         |types AS (SELECT DISTINCT w1, w2, w3 FROM tg),
         |nll AS (
         |  SELECT t.w1, t.w2, t.w3, CAST(round(-ln(CASE
         |      WHEN c3.c3 IS NOT NULL
         |        THEN CAST(c3.c3 AS DOUBLE) / CAST(ctx.c2 AS DOUBLE)
         |      WHEN bo.c2 IS NOT NULL
         |        THEN $lmAlpha * CAST(bo.c2 AS DOUBLE) / CAST(u2.c1 AS DOUBLE)
         |      WHEN u3.c1 IS NOT NULL
         |        THEN ${lmAlpha * lmAlpha} * CAST(u3.c1 AS DOUBLE)
         |          / (SELECT n FROM tot)
         |      ELSE ${lmAlpha * lmAlpha} / (SELECT n FROM tot)
         |    END) * 1e6) AS BIGINT) AS nll_micro
         |  FROM types t
         |  LEFT JOIN c3 ON t.w1 = c3.w1 AND t.w2 = c3.w2 AND t.w3 = c3.w3
         |  LEFT JOIN c2 ctx ON t.w1 = ctx.w1 AND t.w2 = ctx.w2
         |  LEFT JOIN c2 bo ON t.w2 = bo.w1 AND t.w3 = bo.w2
         |  LEFT JOIN c1 u2 ON t.w2 = u2.tok
         |  LEFT JOIN c1 u3 ON t.w3 = u3.tok),
         |perdoc AS (
         |  SELECT doc_id, count(*) AS n_trigrams,
         |    CAST(sum(nll_micro) AS BIGINT) AS s
         |  FROM tg JOIN nll USING (w1, w2, w3) GROUP BY doc_id)""".stripMargin)(
      """SELECT d.doc_id, coalesce(p.n_trigrams, 0) AS n_trigrams,
        |  coalesce(p.s, 0) AS nll_micro_sum,
        |  CASE WHEN coalesce(p.n_trigrams, 0) > 0
        |    THEN round(CAST(p.s AS DOUBLE) / (p.n_trigrams * 1e6), 6)
        |    ELSE 0.0 END AS mean_nll
        |FROM documents d LEFT JOIN perdoc p USING (doc_id)""".stripMargin)) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        TextAnalysis.trigramBackoffNll(docs,
          Sampling.deterministicSample(docs, "doc_id", lmRate, lmSalt),
          lmAlpha)
      }
    },

    // ---- DSIR importance weights ------------------------------------------

    QueryDef("samp_dsir", withC(tokDocs + ",\n" +
      s"""feats AS (
         |  SELECT doc_id, unnest(list_concat(toks,
         |    list_transform(generate_series(1, len(toks) - 1),
         |      i -> toks[i] || ' ' || toks[i + 1]))) AS f
         |  FROM tok_docs),
         |bkt AS (
         |  SELECT doc_id, ${duckHex32("h")} % $dsirBuckets AS b
         |  FROM (SELECT doc_id, md5('dsir:' || f) AS h FROM feats)),
         |tbkt AS (
         |  SELECT b FROM bkt JOIN documents d USING (doc_id)
         |  WHERE d.lang = 'en'),
         |crt AS (SELECT b, count(*) AS cr FROM bkt GROUP BY 1),
         |ctt AS (SELECT b, count(*) AS ct FROM tbkt GROUP BY 1),
         |totr AS (SELECT CAST(sum(cr) AS BIGINT) AS v FROM crt),
         |tott AS (SELECT coalesce(CAST(sum(ct) AS BIGINT), 0) AS v FROM ctt),
         |ratio AS (
         |  SELECT crt.b,
         |    CAST(round(ln(
         |      (CAST(coalesce(ct, 0) + 1 AS DOUBLE) /
         |        CAST((SELECT v FROM tott) + $dsirBuckets AS DOUBLE))
         |      / (CAST(cr + 1 AS DOUBLE) /
         |        CAST((SELECT v FROM totr) + $dsirBuckets AS DOUBLE)))
         |      * 1e6) AS BIGINT) AS lw_micro
         |  FROM crt LEFT JOIN ctt USING (b)),
         |perdoc AS (
         |  SELECT doc_id, count(*) AS n_feat,
         |    CAST(sum(lw_micro) AS BIGINT) AS s
         |  FROM bkt JOIN ratio USING (b) GROUP BY 1)""".stripMargin)(
      """SELECT d.doc_id, coalesce(p.n_feat, 0) AS n_feat,
        |  coalesce(p.s, 0) AS logw_micro_sum,
        |  CASE WHEN coalesce(p.n_feat, 0) > 0
        |    THEN round(CAST(p.s AS DOUBLE) / (p.n_feat * 1e6), 6)
        |    ELSE 0.0 END AS avg_logw
        |FROM documents d LEFT JOIN perdoc p USING (doc_id)""".stripMargin)) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        Sampling.dsirWeights(docs, docs.filter(col("lang") === "en"),
          buckets = dsirBuckets)
      }
    },

    // ---- DSIR selection (top-n resampling) --------------------------------

    QueryDef("samp_dsir_select", withC(tokDocs + ",\n" +
      s"""feats AS (
         |  SELECT doc_id, unnest(list_concat(toks,
         |    list_transform(generate_series(1, len(toks) - 1),
         |      i -> toks[i] || ' ' || toks[i + 1]))) AS f
         |  FROM tok_docs),
         |bkt AS (
         |  SELECT doc_id, ${duckHex32("h")} % $dsirBuckets AS b
         |  FROM (SELECT doc_id, md5('dsir:' || f) AS h FROM feats)),
         |tbkt AS (
         |  SELECT b FROM bkt JOIN documents d USING (doc_id)
         |  WHERE d.lang = 'en'),
         |crt AS (SELECT b, count(*) AS cr FROM bkt GROUP BY 1),
         |ctt AS (SELECT b, count(*) AS ct FROM tbkt GROUP BY 1),
         |totr AS (SELECT CAST(sum(cr) AS BIGINT) AS v FROM crt),
         |tott AS (SELECT coalesce(CAST(sum(ct) AS BIGINT), 0) AS v FROM ctt),
         |ratio AS (
         |  SELECT crt.b,
         |    CAST(round(ln(
         |      (CAST(coalesce(ct, 0) + 1 AS DOUBLE) /
         |        CAST((SELECT v FROM tott) + $dsirBuckets AS DOUBLE))
         |      / (CAST(cr + 1 AS DOUBLE) /
         |        CAST((SELECT v FROM totr) + $dsirBuckets AS DOUBLE)))
         |      * 1e6) AS BIGINT) AS lw_micro
         |  FROM crt LEFT JOIN ctt USING (b)),
         |perdoc AS (
         |  SELECT doc_id, count(*) AS n_feat,
         |    CAST(sum(lw_micro) AS BIGINT) AS s
         |  FROM bkt JOIN ratio USING (b) GROUP BY 1),
         |wts AS (
         |  SELECT d.doc_id,
         |    CASE WHEN coalesce(p.n_feat, 0) > 0
         |      THEN round(CAST(p.s AS DOUBLE) / (p.n_feat * 1e6), 6)
         |      ELSE 0.0 END AS avg_logw
         |  FROM documents d LEFT JOIN perdoc p USING (doc_id))""".stripMargin)(
      s"""SELECT doc_id, avg_logw,
         |  CAST(row_number() OVER (ORDER BY avg_logw DESC, doc_id) AS BIGINT)
         |    AS rank
         |FROM wts ORDER BY avg_logw DESC, doc_id LIMIT $dsirTopN""".stripMargin)) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        Sampling.dsirSelect(docs, docs.filter(col("lang") === "en"),
          n = dsirTopN, buckets = dsirBuckets)
      }
    },

    // ---- duplicated-span islands ------------------------------------------

    QueryDef("dedup_span_islands", withC(tokDocs + ",\n" +
      s"""wins AS (
         |  SELECT doc_id, i,
         |    md5(array_to_string(list_slice(toks, i, i + ${remW - 1}), ' '))
         |      AS wh
         |  FROM (SELECT doc_id, toks,
         |      unnest(generate_series(1, len(toks) - ${remW - 1})) AS i
         |    FROM tok_docs)),
         |freq AS (SELECT wh, count(*) AS c FROM wins GROUP BY 1),
         |dup AS (
         |  SELECT doc_id, i FROM wins JOIN freq USING (wh) WHERE c >= 2),
         |isl AS (
         |  SELECT doc_id,
         |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
         |  FROM dup),
         |runs AS (SELECT doc_id, grp, count(*) AS run FROM isl GROUP BY 1, 2),
         |per AS (
         |  SELECT doc_id, count(*) AS n_islands,
         |    CAST(max(run + ${remW - 1}) AS BIGINT) AS longest_span
         |  FROM runs GROUP BY 1)""".stripMargin)(
      """SELECT d.doc_id, coalesce(p.n_islands, 0) AS n_islands,
        |  coalesce(p.longest_span, 0) AS longest_span
        |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin)) {
      (s, dir) =>
        val docs = W.read(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        Boilerplate.dupSpanIslands(docs, w = remW)
    },

    // ---- containment near-dup pairs ---------------------------------------

    QueryDef("dedup_containment", withC(tokDocs)(
      s"""SELECT doc_a, doc_b, cont_a, cont_b FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    round(CAST(len(list_intersect(list_distinct(a.toks),
         |        list_distinct(b.toks))) AS DOUBLE)
         |      / CAST(len(list_distinct(a.toks)) AS DOUBLE), 6) AS cont_a,
         |    round(CAST(len(list_intersect(list_distinct(a.toks),
         |        list_distinct(b.toks))) AS DOUBLE)
         |      / CAST(len(list_distinct(b.toks)) AS DOUBLE), 6) AS cont_b
         |  FROM tok_docs a JOIN tok_docs b
         |    ON a.source = b.source AND a.doc_id < b.doc_id)
         |WHERE greatest(cont_a, cont_b) >= $contThreshold""".stripMargin)) {
      (s, dir) =>
        Dedup.containmentPairs(W.read(s, dir, "documents"), "source",
          contThreshold)
    },

    // block-key-free containment via size-adaptive (LSH Ensemble-style)
    // banding, oracle-replayed end-to-end on the REAL xxhash64 hash
    // family: signature mins and band folds go through the bit-exact SQL
    // XXH64 (XxhSql), and the tier-resolution granularity selection, the
    // 256-cap, and the exact verify are all recomputed in DuckDB — the
    // hash-match certifies the scale path itself. The md5 parity variant
    // (`parityHash = true`) remains for engines without xxhash64; the
    // recall floor stays pinned on the planted fixture in CrossCheckSpec.
    QueryDef("dedup_containment_lsh", withC(tokDocs + ",\n" + contLshCtes)(
      s"""SELECT doc_a, doc_b, cont_a, cont_b FROM (
         |  SELECT c.doc_a, c.doc_b,
         |    round(CAST(len(list_intersect(ta.toksd, tb.toksd)) AS DOUBLE)
         |      / CAST(len(ta.toksd) AS DOUBLE), 6) AS cont_a,
         |    round(CAST(len(list_intersect(ta.toksd, tb.toksd)) AS DOUBLE)
         |      / CAST(len(tb.toksd) AS DOUBLE), 6) AS cont_b
         |  FROM cl_cand c JOIN cl_td ta ON ta.doc_id = c.doc_a
         |                 JOIN cl_td tb ON tb.doc_id = c.doc_b)
         |WHERE greatest(cont_a, cont_b) >= $contThreshold""".stripMargin)) {
      (s, dir) =>
        Dedup.containmentPairsLsh(W.read(s, dir, "documents"), contThreshold)
    },

    // Incremental admission twin: probe side = doc_id % 4 = 0 (the
    // "new" increment), band index = the full corpus — the oracle
    // replays the same restricted candidate join, so the hash-match
    // certifies that corpus×corpus pairs are EXCLUDED by construction,
    // not post-filtered.
    QueryDef("dedup_containment_incremental", withC(tokDocs + ",\n" +
      contLshCtes(Some("doc_id % 4 = 0")))(
      s"""SELECT doc_a, doc_b, cont_a, cont_b FROM (
         |  SELECT c.doc_a, c.doc_b,
         |    round(CAST(len(list_intersect(ta.toksd, tb.toksd)) AS DOUBLE)
         |      / CAST(len(ta.toksd) AS DOUBLE), 6) AS cont_a,
         |    round(CAST(len(list_intersect(ta.toksd, tb.toksd)) AS DOUBLE)
         |      / CAST(len(tb.toksd) AS DOUBLE), 6) AS cont_b
         |  FROM cl_cand c JOIN cl_td ta ON ta.doc_id = c.doc_a
         |                 JOIN cl_td tb ON tb.doc_id = c.doc_b)
         |WHERE greatest(cont_a, cont_b) >= $contThreshold""".stripMargin)) {
      (s, dir) =>
        Dedup.containmentPairsLshIncremental(W.read(s, dir, "documents"),
          id => id % 4 === 0, contThreshold)
    },

    // ---- CCNet quality tiers ----------------------------------------------

    QueryDef("t_nll_tiers", withC(tokDocs + ",\n" +
      """tok AS (SELECT doc_id, unnest(toks) AS tok FROM tok_docs),
        |counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
        |nll AS (
        |  SELECT tok,
        |    CAST(round(-ln(CAST(c AS DOUBLE) /
        |      (SELECT CAST(sum(c) AS DOUBLE) FROM counts)) * 1e6) AS BIGINT)
        |      AS nll_micro
        |  FROM counts),
        |scored AS (
        |  SELECT doc_id,
        |    round(CAST(sum(nll_micro) AS DOUBLE) / (count(*) * 1e6), 6)
        |      AS mean_nll
        |  FROM tok JOIN nll USING (tok) GROUP BY doc_id)""".stripMargin)(
      """SELECT doc_id, mean_nll,
        |  CAST(ntile(3) OVER (ORDER BY mean_nll, doc_id) AS BIGINT) AS tier
        |FROM scored""".stripMargin)) {
      (s, dir) => TextAnalysis.nllTiers(W.read(s, dir, "documents"))
    },

    // ---- quality -> span-removal -> chunk chain ---------------------------

    // Integration proof for the round-5 stages: gate the corpus on the
    // composite quality rules, cut duplicated spans from the survivors
    // (window frequency computed over survivors — the corpus actually
    // being trained on), and chunk the cleaned text to context windows.
    // The oracle replays the whole chain, so the hash-match certifies
    // stage COMPOSITION, not just each stage alone.
    QueryDef("pipe_quality_chain", withC(tokDocs + ",\n" +
      s"""sig AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
         |      / CAST(len(toks) AS DOUBLE), 6) AS mean_token_len,
         |    round(CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE)
         |      / CAST(length(text) AS DOUBLE), 6) AS alpha_ratio,
         |    CASE WHEN len(tris) > 0
         |      THEN round(1.0 - CAST(len(list_distinct(tris)) AS DOUBLE)
         |        / CAST(len(tris) AS DOUBLE), 6)
         |      ELSE 0.0 END AS dup_frac
         |  FROM (
         |    SELECT doc_id, text, toks, list_transform(
         |      generate_series(1, greatest(len(toks) - 2, 0)),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tris
         |    FROM tok_docs)),
         |srv AS (
         |  SELECT doc_id FROM sig
         |  WHERE NOT (n_tokens < $gateMinTokens OR n_tokens > $gateMaxTokens
         |    OR mean_token_len < $gateMinTokLen OR mean_token_len > $gateMaxTokLen
         |    OR alpha_ratio < $gateMinAlpha OR dup_frac > $gateMaxDupFrac)),
         |stok AS (
         |  SELECT doc_id, toks FROM tok_docs JOIN srv USING (doc_id)),
         |""".stripMargin +
      duckRewrite("stok", remW, duckDupStarts("stok", remW)) + ",\n" +
      s"""clean AS (
         |  SELECT n.doc_id, coalesce(k.text_clean, '') AS text_clean
         |  FROM nt n LEFT JOIN kept k USING (doc_id)),
         |ctoks AS (
         |  SELECT doc_id,
         |    regexp_split_to_array(lower(trim(text_clean)), '\\s+') AS toks
         |  FROM clean),
         |cx AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(0, greatest(
         |      CAST(floor((len(toks) - $chainChunk + ${chainStride - 1})
         |        / $chainStride.0) AS BIGINT), 0))) AS chunk_idx
         |  FROM ctoks)""".stripMargin)(
      s"""SELECT doc_id, chunk_idx,
         |  least($chainChunk, len(toks) - chunk_idx * $chainStride) AS n_tokens,
         |  array_to_string(list_slice(toks,
         |    chunk_idx * $chainStride + 1,
         |    chunk_idx * $chainStride + $chainChunk), ' ') AS chunk_text
         |FROM cx""".stripMargin)) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        // materialize the verdict frame: the chain's downstream passes
        // (span windows + rewrite) consume the survivors multiple times,
        // and without this each pass re-runs the gate's signal pipeline
        val srv = docs.join(
          TextAnalysis.materializeGate(TextAnalysis.qualityGate(docs,
            minTokens = gateMinTokens, maxTokens = gateMaxTokens,
            minMeanTokLen = gateMinTokLen, maxMeanTokLen = gateMaxTokLen,
            minAlpha = gateMinAlpha, maxDupFrac = gateMaxDupFrac))
            .filter(col("pass")).select("doc_id"),
          "doc_id")
        val toked = srv.select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("toks"))
        val clean = Boilerplate.removeDupSpans(toked, w = remW)
          .select(col("doc_id"),
            TextAnalysis.tokens(col("text_clean")).as("toks"))
        Packing.chunk(clean, chunkSize = chainChunk, stride = chainStride)
      }
    },

    // ---- BPE pair statistics ----------------------------------------------

    QueryDef("t_bpe_pairs", withC(tokDocs + ",\n" +
      s"""pr AS (
         |  SELECT substring(tok, i, 2) AS pair
         |  FROM (SELECT unnest(toks) AS tok FROM tok_docs),
         |    LATERAL (SELECT unnest(generate_series(1, length(tok) - 1)) AS i)),
         |pc AS (SELECT pair, count(*) AS cnt FROM pr GROUP BY 1)""".stripMargin)(
      s"""SELECT rank, pair, cnt FROM (
         |  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT)
         |    AS rank, pair, cnt
         |  FROM pc)
         |WHERE rank <= $bpeTopK""".stripMargin)) {
      (s, dir) =>
        TextAnalysis.bpePairStats(W.read(s, dir, "documents"), topK = bpeTopK)
    },

    // ---- BPE learn: iterated merges ---------------------------------------

    // The oracle replays the full merge loop, unrolled: each step is a
    // pair-count aggregate over the word-type table + LIMIT-1 argmax +
    // a literal string replace of the winning pair — the same
    // bracket-delimited segmentation encoding the Spark side uses, so
    // the learned merge list hash-matches end-to-end.
    QueryDef("t_bpe_learn", bpeLearnSql(bpeMerges)) {
      (s, dir) =>
        TextAnalysis.bpeLearn(W.read(s, dir, "documents"), nMerges = bpeMerges)
    },

    // apply the learned vocabulary: per-doc subword stats under the
    // n-merge tokenizer — the compression readout that makes the learn
    // loop's output consumable
    QueryDef("t_bpe_encode", bpeEncodeSql(bpeMerges)) {
      (s, dir) =>
        TextAnalysis.bpeEncode(W.read(s, dir, "documents"), nMerges = bpeMerges)
    },

    // ---- composite quality gate -------------------------------------------

    QueryDef("t_quality_gate", withC(gateCtes)(
      """SELECT doc_id, n_tokens, quality_score, dup_frac, fail_reason,
        |  (fail_reason IS NULL) AS pass
        |FROM gated""".stripMargin)) {
      (s, dir) =>
        TextAnalysis.qualityGate(W.read(s, dir, "documents"),
          minTokens = gateMinTokens, maxTokens = gateMaxTokens,
          minMeanTokLen = gateMinTokLen, maxMeanTokLen = gateMaxTokLen,
          minAlpha = gateMinAlpha, maxDupFrac = gateMaxDupFrac)
    },

    // ---- deterministic epoch order ----------------------------------------

    QueryDef("pack_order",
      s"""SELECT doc_id, shard, pos FROM (
         |  SELECT doc_id, h % $orderShards AS shard,
         |    CAST(row_number() OVER (PARTITION BY h % $orderShards
         |      ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
         |  FROM (SELECT doc_id, ${PipelineQueries2.duckHash32("epoch0")} AS h
         |    FROM documents))""".stripMargin) {
      (s, dir) =>
        CorpusWriter.trainingOrder(W.read(s, dir, "documents"), orderShards,
          salt = "epoch0")
    })
}
