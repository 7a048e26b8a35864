package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusReport, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-10 continuation batch — the lexical-statistics, selection, and
 * embedding-geometry surface:
 *
 *  - lexical stats: `t_token_entropy` (+ the windowed
 *    `st_entropy_monitor`), `t_pmi_collocations`, `t_burstiness`,
 *    `t_source_kl`, `t_langid_confusion`, `report_vocab_coverage`;
 *  - robust screens: `report_quality_outliers` (median/MAD fences),
 *    `report_length_drift` (exact two-sample KS), `samp_info_gain`
 *    (context-gain selection), and the composed `pipe_lexical_screen`;
 *  - embedding geometry: `report_embedding_pca` / `report_embedding_abtt`
 *    (recursive-CTE power-iteration replay) and
 *    `report_pca_incremental` (merge-vs-one-shot additivity).
 *
 * All follow the repo's float discipline: cross-row float sums are
 * quantized to integer micro-units first (or taken as exact-integer /
 * same-IEEE-op DOUBLE forms); medians interpolate integers; per-row
 * doubles derive from integer counts — so Spark and DuckDB agree
 * bit-for-bit, and shared CTE fragments (tokCte/entTail/igTail/pcaCtes)
 * keep each numeric path single-sourced across its queries.
 */
object PipelineQueries11 {

  import PipelineQueries.{tokDocs, withC}

  private val pmiMinCount = 5
  private val pmiK = 50

  /** DuckDB replay of [[TextAnalysis.withLangId]], generated from the
    * same `langMarkers` table the Spark side reads — one source of
    * truth for markers AND the argmax priority order. */
  private val langidCte: String = {
    def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    val scores = TextAnalysis.langMarkers.map { case (l, ws) =>
      s"CAST(len(list_filter(toks, x -> list_contains(${sqlList(ws)}, x))) AS BIGINT) AS score_$l"
    }.mkString(",\n      ")
    val best = TextAnalysis.langMarkers.map { case (l, _) => s"score_$l" }
      .mkString("greatest(", ", ", ")")
    val arms = TextAnalysis.langMarkers.map { case (l, _) =>
      s"WHEN score_$l = best AND best > 0 THEN '$l'"
    }.mkString("\n        ")
    s"""lid AS (
       |  SELECT labeled_lang,
       |    CASE $arms
       |      ELSE 'und' END AS predicted_lang
       |  FROM (
       |    SELECT labeled_lang, $best AS best,
       |      ${TextAnalysis.langMarkers.map { case (l, _) => s"score_$l" }
            .mkString(", ")}
       |    FROM (
       |      SELECT d.lang AS labeled_lang,
       |      $scores
       |      FROM tok_docs t JOIN documents d USING (doc_id))))""".stripMargin
  }

  private val coverageCutoffs = Seq(10L, 100L, 1000L, 10000L)

  private val pcaIters = 8

  private val igLambda = 0.9   // bigram interpolation weight (= t_bigram_nll)
  // nats of context gain to keep a doc — calibrated so the synthetic
  // corpus (whose text is near-contextless by construction) actually
  // splits; real prose sits far above this
  private val igThr = 0.02

  private val entEpoch = 1700000000L   // = st_quality_monitor's epoch
  private val entSpreadS = 7200L
  private val entLowThr = 2.0

  private val burstMinDf = 10L
  private val burstK = 50

  /** DuckDB replay of [[graft.pipeline.Semantic.embeddingPca]]'s core:
    * same micro-quantized mean/Gram accumulation, same fixed-round power
    * iteration on the 1e-9 grid, same sign convention — the whole
    * numeric path is recomputed, not just the result shape. Shared by
    * the PCA report and the ABTT projection oracle. */
  private val pcaCtes: String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |nd AS (SELECT (SELECT len(v) FROM e LIMIT 1) AS d,
       |              (SELECT count(*) FROM e) AS n),
       |ii AS (SELECT unnest(generate_series(1, (SELECT d FROM nd))) AS i),
       |mu0 AS (
       |  SELECT i, CAST(sum(CAST(round(v[i] * 1e6) AS BIGINT)) AS DOUBLE)
       |    AS s
       |  FROM e, ii GROUP BY i),
       |mu AS (SELECT list(round(s /
       |    ((SELECT n FROM nd) * 1e6), 6) ORDER BY i) AS m FROM mu0),
       |g0 AS (
       |  SELECT i.i AS i, j.j AS j,
       |    CAST(sum(CAST(round(e.v[i.i] * e.v[j.j] * 1e6) AS BIGINT))
       |      AS DOUBLE) AS s
       |  FROM e, ii i, (SELECT i AS j FROM ii) j
       |  GROUP BY 1, 2),
       |gm AS (SELECT list(gv ORDER BY i) AS g FROM (
       |  SELECT g0.i, list(round(s / ((SELECT n FROM nd) * 1e6) -
       |      mu.m[g0.i] * mu.m[g0.j], 6) ORDER BY g0.j) AS gv
       |  FROM g0, mu GROUP BY g0.i)),
       |it AS (
       |  SELECT 0 AS t,
       |    list_transform(generate_series(1, d),
       |      x -> round(1.0 / sqrt(CAST(d AS DOUBLE)), 9)) AS vv
       |  FROM nd
       |  UNION ALL
       |  SELECT t + 1,
       |    CASE WHEN nrm > 0
       |      THEN list_transform(w, x -> round(x / nrm, 9)) ELSE vv END
       |  FROM (
       |    SELECT t, vv, w,
       |      sqrt(list_sum(list_transform(w, x -> x * x))) AS nrm
       |    FROM (
       |      SELECT t, vv,
       |        list_transform(generate_series(1, len(vv)), i ->
       |          list_sum(list_transform(generate_series(1, len(vv)),
       |            j -> g[i][j] * vv[j]))) AS w
       |      FROM it, gm))
       |  WHERE t < $pcaIters),
       |vf0 AS (SELECT vv FROM it WHERE t = $pcaIters),
       |piv AS (SELECT i FROM ii, vf0 ORDER BY abs(vv[i]) DESC, i LIMIT 1),
       |vf AS (SELECT CASE WHEN vv[(SELECT i FROM piv)] < 0
       |         THEN list_transform(vv, x -> -x) ELSE vv END AS vv
       |       FROM vf0),
       |fin AS (
       |  SELECT vv,
       |    list_transform(generate_series(1, len(vv)), i ->
       |      list_sum(list_transform(generate_series(1, len(vv)),
       |        j -> g[i][j] * vv[j]))) AS w,
       |    round(list_sum(list_transform(generate_series(1, len(g)),
       |      i -> g[i][i])), 6) AS trace_g
       |  FROM vf, gm),
       |sums AS (
       |  SELECT vv,
       |    round(list_sum(list_transform(generate_series(1, len(vv)),
       |      i -> vv[i] * w[i])), 6) AS lambda1,
       |    trace_g
       |  FROM fin)""".stripMargin

  private val pcaOracle: String =
    s"""WITH RECURSIVE
       |$pcaCtes
       |SELECT CAST(ii.i AS INT) AS dim_idx,
       |  mu.m[ii.i] AS mean_c,
       |  round(vv[ii.i], 6) AS pc1_loading,
       |  lambda1, trace_g,
       |  CASE WHEN trace_g > 0 THEN round(lambda1 / trace_g, 6)
       |    ELSE 0.0 END AS explained_frac
       |FROM sums, mu, ii""".stripMargin

  /** ABTT oracle: the same PCA core, then a per-vector projection
    * replay — centered vector, 1e-6-rounded PC1 coordinate, residual
    * norm with the ROUNDED coordinate subtracted (mirroring the Spark
    * column expressions exactly). */
  private val abttOracle: String =
    s"""WITH RECURSIVE
       |$pcaCtes,
       |cvx AS (
       |  SELECT vec_id,
       |    list_transform(generate_series(1, len(v)), i -> v[i] - m[i])
       |      AS cv
       |  FROM e, mu),
       |pc AS (
       |  SELECT vec_id, cv,
       |    round(list_sum(list_transform(generate_series(1, len(cv)),
       |      i -> cv[i] * vv[i])), 6) AS pc1_coord
       |  FROM cvx, vf)
       |SELECT vec_id, pc1_coord,
       |  round(sqrt(list_sum(list_transform(cv, x -> x * x))), 6)
       |    AS norm_before,
       |  round(sqrt(list_sum(list_transform(generate_series(1, len(cv)),
       |    i -> (cv[i] - pc1_coord * vv[i]) *
       |         (cv[i] - pc1_coord * vv[i])))), 6) AS norm_after
       |FROM pc, vf""".stripMargin

  private val tokCte: String =
    "tok AS (SELECT doc_id, unnest(toks) AS tok FROM tok_docs)"

  /** doc_id → (n_tok, n_types, s_micro): the per-doc entropy sufficient
    * statistics — shared by t_token_entropy, st_entropy_monitor, and
    * the composed lexical screen. */
  private val entTail: String =
    """tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
      |hd AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
      |    CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(CAST(round(c * log2(CAST(c AS DOUBLE)) * 1e6)
      |      AS BIGINT)) AS BIGINT) AS s_micro
      |  FROM tc GROUP BY 1)""".stripMargin

  /** doc_id → rounded mean unigram/bigram NLLs (CTE `m`) — the
    * info-gain sufficient statistics, shared by samp_info_gain and the
    * composed lexical screen. */
  private val igTail: String =
    s"""ucnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
       |unll AS (
       |  SELECT tok, CAST(round(-ln(CAST(c AS DOUBLE) /
       |    (SELECT CAST(sum(c) AS DOUBLE) FROM ucnt)) * 1e6) AS BIGINT)
       |    AS nll_micro
       |  FROM ucnt),
       |pu AS (
       |  SELECT doc_id, count(*) AS n_tok,
       |    CAST(sum(nll_micro) AS BIGINT) AS su
       |  FROM tok JOIN unll USING (tok) GROUP BY doc_id),
       |bg AS (
       |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
       |  FROM (SELECT doc_id, toks,
       |      unnest(generate_series(1, len(toks) - 1)) AS i
       |    FROM tok_docs)),
       |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM ucnt),
       |bc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
       |bnll AS (
       |  SELECT bc.w1, bc.w2,
       |    CAST(round(-ln(
       |      $igLambda * CAST(cb AS DOUBLE) / CAST(u1.c AS DOUBLE)
       |      + ${1.0 - igLambda} * CAST(u2.c AS DOUBLE) /
       |        (SELECT n FROM tot)) * 1e6) AS BIGINT) AS nll_micro
       |  FROM bc JOIN ucnt u1 ON bc.w1 = u1.tok
       |  JOIN ucnt u2 ON bc.w2 = u2.tok),
       |pb AS (
       |  SELECT doc_id, count(*) AS n_bigrams,
       |    CAST(sum(nll_micro) AS BIGINT) AS sb
       |  FROM bg JOIN bnll USING (w1, w2) GROUP BY doc_id),
       |m AS (
       |  SELECT u.doc_id, u.n_tok, coalesce(b.n_bigrams, 0)
       |      AS n_bigrams,
       |    round(CAST(u.su AS DOUBLE) / (u.n_tok * 1e6), 6)
       |      AS mean_unll,
       |    CASE WHEN coalesce(b.n_bigrams, 0) > 0
       |      THEN round(CAST(b.sb AS DOUBLE) / (b.n_bigrams * 1e6), 6)
       |      ELSE 0.0 END AS mean_bnll
       |  FROM pu u LEFT JOIN pb b USING (doc_id))""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    QueryDef("t_token_entropy",
      withC(tokDocs + ",\n" + tokCte + ",\n" + entTail)(
        """SELECT doc_id, n_tok, n_types,
          |  round(CAST(n_types AS DOUBLE) / CAST(n_tok AS DOUBLE), 6) AS ttr,
          |  round(log2(CAST(n_tok AS DOUBLE)) -
          |    CAST(s_micro AS DOUBLE) / (CAST(n_tok AS DOUBLE) * 1e6), 6)
          |    AS entropy
          |FROM hd""".stripMargin)) {
      (s, dir) => TextAnalysis.tokenEntropy(W.read(s, dir, "documents"))
    },

    QueryDef("t_pmi_collocations",
      withC(tokDocs + ",\n" +
        s"""tot AS (
           |  SELECT CAST(sum(len(toks)) AS DOUBLE) AS n1,
           |    CAST(sum(greatest(len(toks) - 1, 0)) AS DOUBLE) AS n2
           |  FROM tok_docs),
           |uni AS (
           |  SELECT tok, CAST(count(*) AS BIGINT) AS cw
           |  FROM (SELECT unnest(toks) AS tok FROM tok_docs) GROUP BY 1),
           |bic AS (
           |  SELECT bigram, CAST(count(*) AS BIGINT) AS cxy FROM (
           |    SELECT unnest(list_transform(
           |      generate_series(1, greatest(len(toks) - 1, 0)),
           |      i -> toks[i] || ' ' || toks[i+1])) AS bigram
           |    FROM tok_docs)
           |  GROUP BY 1 HAVING count(*) >= $pmiMinCount),
           |j AS (
           |  SELECT b.bigram, b.cxy, ul.cw AS c_left, ur.cw AS c_right
           |  FROM bic b
           |  JOIN uni ul ON ul.tok = string_split(b.bigram, ' ')[1]
           |  JOIN uni ur ON ur.tok = string_split(b.bigram, ' ')[2]),
           |p AS (
           |  SELECT bigram, cxy, c_left, c_right,
           |    CAST(round(log2(cxy * n1 * n1 /
           |      (n2 * c_left * c_right)) * 1e6) AS BIGINT) AS pmi_micro
           |  FROM j, tot)""".stripMargin)(
        s"""SELECT CAST(rk AS INT) AS rank, bigram, cxy, c_left, c_right,
           |  round(CAST(pmi_micro AS DOUBLE) / 1e6, 6) AS pmi
           |FROM (SELECT *,
           |    row_number() OVER (ORDER BY pmi_micro DESC, bigram) AS rk
           |  FROM p)
           |WHERE rk <= $pmiK""".stripMargin)) {
      (s, dir) => TextAnalysis.pmiCollocations(W.read(s, dir, "documents"),
        minCount = pmiMinCount, k = pmiK)
    },

    QueryDef("t_langid_confusion",
      withC(tokDocs + ",\n" + langidCte + ",\n" +
        """conf AS (
          |  SELECT labeled_lang, predicted_lang,
          |    CAST(count(*) AS BIGINT) AS n_docs
          |  FROM lid GROUP BY 1, 2)""".stripMargin)(
        """SELECT c.labeled_lang, c.predicted_lang, c.n_docs,
          |  round(CAST(c.n_docs AS DOUBLE) / CAST(t.n_label AS DOUBLE), 6)
          |    AS frac_of_label
          |FROM conf c JOIN (
          |  SELECT labeled_lang, CAST(sum(n_docs) AS BIGINT) AS n_label
          |  FROM conf GROUP BY 1) t USING (labeled_lang)""".stripMargin)) {
      (s, dir) => TextAnalysis.langidConfusion(W.read(s, dir, "documents"))
    },

    QueryDef("report_vocab_coverage",
      withC(tokDocs + ",\n" +
        s"""cnt AS (
           |  SELECT tok, count(*) AS c
           |  FROM (SELECT unnest(toks) AS tok FROM tok_docs) GROUP BY 1),
           |hist AS (SELECT c, CAST(count(*) AS BIGINT) AS nt
           |         FROM cnt GROUP BY 1),
           |hp AS (
           |  SELECT c, nt, CAST(coalesce(sum(nt) OVER (ORDER BY c DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    AS BIGINT) AS prev_types
           |  FROM hist),
           |cuts AS (SELECT unnest([${coverageCutoffs.mkString(", ")}])
           |  AS cutoff)""".stripMargin)(
        """SELECT CAST(cutoff AS BIGINT) AS cutoff,
          |  CAST(sum(least(nt, greatest(cutoff - prev_types, 0)))
          |    AS BIGINT) AS n_types_used,
          |  CAST(sum(c * least(nt, greatest(cutoff - prev_types, 0)))
          |    AS BIGINT) AS covered_tokens,
          |  CAST(sum(c * nt) AS BIGINT) AS total_tokens,
          |  round(CAST(sum(c * least(nt, greatest(cutoff - prev_types, 0)))
          |      AS DOUBLE) / CAST(sum(c * nt) AS DOUBLE), 6) AS coverage
          |FROM hp, cuts GROUP BY 1""".stripMargin)) {
      (s, dir) => CorpusReport.vocabCoverage(W.read(s, dir, "documents"),
        cutoffs = coverageCutoffs)
    },

    QueryDef("report_embedding_pca", pcaOracle) {
      (s, dir) =>
        graft.pipeline.Semantic.embeddingPca(W.read(s, dir, "embeddings"),
          iters = pcaIters)
    },

    QueryDef("report_embedding_abtt", abttOracle) {
      (s, dir) =>
        graft.pipeline.Semantic.abttProject(W.read(s, dir, "embeddings"),
          iters = pcaIters)
    },

    // merge-vs-one-shot certification (the report_card_incremental
    // theorem applied to covariance): the Spark side renders from two
    // MERGED slice states; the oracle is the one-shot replay — the
    // hash match certifies the state's additivity end-to-end
    QueryDef("report_pca_incremental", pcaOracle) {
      (s, dir) => {
        val emb = W.read(s, dir, "embeddings")
        graft.pipeline.Semantic.renderPca(
          graft.pipeline.Semantic.mergePcaState(
            graft.pipeline.Semantic.pcaState(
              emb.filter(col("vec_id") % 3 =!= 0)),
            graft.pipeline.Semantic.pcaState(
              emb.filter(col("vec_id") % 3 === 0))),
          iters = pcaIters)
      }
    },

    QueryDef("samp_info_gain",
      withC(tokDocs + ",\n" + tokCte + ",\n" + igTail)(
        s"""SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           |  CAST(n_bigrams AS BIGINT) AS n_bigrams,
           |  mean_unll, mean_bnll,
           |  CASE WHEN n_bigrams > 0
           |    THEN round(mean_unll - mean_bnll, 6) ELSE 0.0 END
           |    AS info_gain,
           |  (n_bigrams > 0 AND CASE WHEN n_bigrams > 0
           |    THEN round(mean_unll - mean_bnll, 6) ELSE 0.0 END
           |    >= $igThr) AS selected
           |FROM m""".stripMargin)) {
      (s, dir) => graft.pipeline.Sampling.infoGainSelect(
        W.read(s, dir, "documents"), lambda = igLambda, thr = igThr)
    },

    // slice convention (id % 3) matches report_card_incremental's
    // old/delta split, so the two reports read as one refresh story
    QueryDef("report_length_drift",
      withC(tokDocs + ",\n" +
        """nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS v
          |       FROM tok_docs),
          |ga AS (SELECT v, CAST(count(*) AS BIGINT) AS ca FROM nt
          |       WHERE doc_id % 3 <> 0 GROUP BY 1),
          |gb AS (SELECT v, CAST(count(*) AS BIGINT) AS cb FROM nt
          |       WHERE doc_id % 3 = 0 GROUP BY 1),
          |m AS (
          |  SELECT v, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
          |  FROM ga FULL JOIN gb USING (v)),
          |c AS (
          |  SELECT v,
          |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
          |      AND CURRENT ROW) AS cum_a,
          |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
          |      AND CURRENT ROW) AS cum_b
          |  FROM m),
          |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          |        CAST(sum(cb) AS BIGINT) AS nb FROM m)""".stripMargin)(
        """SELECT na AS n_a, nb AS n_b,
          |  round(CAST(xdiff AS DOUBLE) /
          |    (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS ks_stat,
          |  v AS at_value
          |FROM (
          |  SELECT v, na, nb,
          |    abs(CAST(cum_a AS DOUBLE) * CAST(nb AS DOUBLE) -
          |        CAST(cum_b AS DOUBLE) * CAST(na AS DOUBLE)) AS xdiff,
          |    row_number() OVER (ORDER BY
          |      abs(CAST(cum_a AS DOUBLE) * CAST(nb AS DOUBLE) -
          |          CAST(cum_b AS DOUBLE) * CAST(na AS DOUBLE)) DESC, v)
          |      AS rk
          |  FROM c, t)
          |WHERE rk = 1""".stripMargin)) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        CorpusReport.ksDrift(docs.filter(col("doc_id") % 3 =!= 0),
          docs.filter(col("doc_id") % 3 === 0))
      }
    },

    QueryDef("t_burstiness",
      withC(tokDocs + ",\n" +
        s"""tc AS (
           |  SELECT doc_id, tok, count(*) AS c
           |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tok_docs)
           |  GROUP BY 1, 2),
           |per AS (
           |  SELECT tok, CAST(count(*) AS BIGINT) AS df,
           |    CAST(sum(c) AS BIGINT) AS sc,
           |    CAST(sum(c * c) AS BIGINT) AS sc2
           |  FROM tc GROUP BY 1 HAVING count(*) >= $burstMinDf),
           |vm AS (
           |  SELECT tok, df, sc,
           |    CAST(round((CAST(df AS DOUBLE) * CAST(sc2 AS DOUBLE) -
           |        CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) /
           |      (CAST(df AS DOUBLE) * CAST(sc AS DOUBLE)) * 1e6)
           |      AS BIGINT) AS vmr_micro
           |  FROM per)""".stripMargin)(
        s"""SELECT CAST(rk AS INT) AS rank, tok, df, sc AS total_c,
           |  round(CAST(vmr_micro AS DOUBLE) / 1e6, 6) AS vmr
           |FROM (SELECT *,
           |    row_number() OVER (ORDER BY vmr_micro DESC, tok) AS rk
           |  FROM vm)
           |WHERE rk <= $burstK""".stripMargin)) {
      (s, dir) => TextAnalysis.burstiness(W.read(s, dir, "documents"),
        minDf = burstMinDf, k = burstK)
    },

    // the composed funnel: all three stages replayed over the same
    // corpus, hash-certifying the COMPOSITION (pipe_quality_chain's
    // discipline); floors = entLowThr / igThr so the three single-stage
    // queries and the funnel tell one story
    QueryDef("pipe_lexical_screen",
      withC(tokDocs + ",\n" + tokCte + ",\n" + entTail + ",\n" + igTail +
        ",\n" +
        s"""dn AS (
           |  SELECT d.lang, h.doc_id, CAST(h.n_tok AS DOUBLE) AS nt,
           |    round(log2(CAST(h.n_tok AS DOUBLE)) -
           |      CAST(h.s_micro AS DOUBLE) / (CAST(h.n_tok AS DOUBLE)
           |      * 1e6), 6) AS entropy
           |  FROM hd h JOIN documents d USING (doc_id)),
           |med AS (SELECT lang, quantile_cont(nt, 0.5) AS med_nt
           |        FROM dn GROUP BY 1),
           |mad AS (SELECT d.lang, quantile_cont(abs(d.nt - m2.med_nt),
           |          0.5) AS mad_nt
           |        FROM dn d JOIN med m2 USING (lang) GROUP BY 1),
           |b AS (SELECT m2.lang, m2.med_nt, a.mad_nt
           |      FROM med m2 JOIN mad a USING (lang)),
           |fl AS (
           |  SELECT d.lang,
           |    CASE WHEN d.nt < b.med_nt - 3.0 * b.mad_nt
           |           OR d.nt > b.med_nt + 3.0 * b.mad_nt
           |      THEN 1 ELSE 0 END AS f_len,
           |    CASE WHEN d.entropy < $entLowThr THEN 1 ELSE 0 END
           |      AS f_ent,
           |    CASE WHEN (CASE WHEN m.n_bigrams > 0
           |        THEN round(m.mean_unll - m.mean_bnll, 6)
           |        ELSE 0.0 END) < $igThr THEN 1 ELSE 0 END AS f_gain
           |  FROM dn d JOIN b USING (lang) JOIN m USING (doc_id))""".stripMargin)(
        """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(f_len) AS BIGINT) AS n_len_outlier,
          |  CAST(sum(f_ent) AS BIGINT) AS n_low_entropy,
          |  CAST(sum(f_gain) AS BIGINT) AS n_low_gain,
          |  CAST(sum(CASE WHEN f_len + f_ent + f_gain = 0 THEN 1
          |    ELSE 0 END) AS BIGINT) AS n_kept,
          |  round(CAST(sum(CASE WHEN f_len + f_ent + f_gain = 0 THEN 1
          |    ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
          |    AS kept_frac
          |FROM fl GROUP BY 1""".stripMargin)) {
      (s, dir) => graft.pipeline.Sampling.lexicalScreen(
        W.read(s, dir, "documents"), z = 3.0, entropyFloor = entLowThr,
        gainFloor = igThr)
    },

    QueryDef("t_source_kl",
      withC(tokDocs + ",\n" +
        """st AS (
          |  SELECT source, tok, count(*) AS c
          |  FROM (SELECT source, unnest(toks) AS tok FROM tok_docs)
          |  GROUP BY 1, 2),
          |tot AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct
          |        FROM st GROUP BY 1),
          |nn AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM st),
          |ps AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
          |       FROM st GROUP BY 1),
          |kt AS (
          |  SELECT st.source, ps.ns,
          |    CAST(round(CAST(c AS DOUBLE) *
          |      log2(CAST(c AS DOUBLE) * n /
          |        (CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE))) * 1e6)
          |      AS BIGINT) AS kl_micro
          |  FROM st JOIN tot USING (tok) JOIN ps USING (source), nn)""".stripMargin)(
        """SELECT source, CAST(min(ns) AS BIGINT) AS n_tokens,
          |  CAST(count(*) AS BIGINT) AS vocab_s,
          |  round(CAST(sum(kl_micro) AS DOUBLE) /
          |    (CAST(min(ns) AS DOUBLE) * 1e6), 6) AS kl_bits
          |FROM kt GROUP BY 1""".stripMargin)) {
      (s, dir) => TextAnalysis.sourceKl(W.read(s, dir, "documents"))
    },

    // batch twin of the streaming entropy monitor (StreamingQualitySpec
    // covers watermark/parity); epoch window keys and the synthesized
    // ingest_ts follow the st_quality_monitor convention
    QueryDef("st_entropy_monitor",
      withC(tokDocs + ",\n" + tokCte + ",\n" + entTail + ",\n" +
        s"""w AS (
           |  SELECT 3600 * (($entEpoch + (doc_id * 37) % $entSpreadS)
           |      // 3600) AS w_start_epoch,
           |    round(log2(CAST(n_tok AS DOUBLE)) -
           |      CAST(s_micro AS DOUBLE) / (CAST(n_tok AS DOUBLE) * 1e6), 6)
           |      AS entropy
           |  FROM hd)""".stripMargin)(
        s"""SELECT w_start_epoch,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  round(CAST(sum(CAST(round(entropy * 1e6) AS BIGINT))
           |    AS DOUBLE) / (count(*) * 1e6), 6) AS avg_entropy,
           |  CAST(sum(CASE WHEN entropy < $entLowThr THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_low,
           |  round(CAST(sum(CASE WHEN entropy < $entLowThr THEN 1 ELSE 0
           |    END) AS DOUBLE) / count(*), 6) AS low_frac
           |FROM w GROUP BY 1""".stripMargin)) {
      (s, dir) =>
        graft.streaming.QualityMonitor.entropyRollup(
            W.read(s, dir, "documents").withColumn("ingest_ts",
              timestamp_seconds(
                lit(entEpoch) + (col("doc_id") * 37) % entSpreadS)),
            lowThr = entLowThr)
          .select(unix_timestamp(col("w_start")).as("w_start_epoch"),
            col("n_docs"), col("avg_entropy"), col("n_low"),
            col("low_frac"))
    },

    QueryDef("report_quality_outliers",
      """WITH dn AS (
        |  SELECT lang,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
        |      AS DOUBLE) AS nt
        |  FROM documents),
        |med AS (SELECT lang, quantile_cont(nt, 0.5) AS med_nt
        |        FROM dn GROUP BY 1),
        |mad AS (SELECT d.lang, quantile_cont(abs(d.nt - m.med_nt), 0.5)
        |          AS mad_nt
        |        FROM dn d JOIN med m USING (lang) GROUP BY 1),
        |b AS (SELECT m.lang, m.med_nt, a.mad_nt
        |      FROM med m JOIN mad a USING (lang))
        |SELECT d.lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  round(min(b.med_nt), 6) AS med_nt,
        |  round(min(b.mad_nt), 6) AS mad_nt,
        |  CAST(sum(CASE WHEN d.nt < b.med_nt - 3.0 * b.mad_nt
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN d.nt > b.med_nt + 3.0 * b.mad_nt
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  round(CAST(sum(CASE WHEN d.nt < b.med_nt - 3.0 * b.mad_nt
        |      OR d.nt > b.med_nt + 3.0 * b.mad_nt THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS outlier_frac
        |FROM dn d JOIN b USING (lang) GROUP BY 1""".stripMargin) {
      (s, dir) =>
        CorpusReport.qualityOutlierReport(W.read(s, dir, "documents"), z = 3.0)
    })
}
