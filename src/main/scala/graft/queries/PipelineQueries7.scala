package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusReport, CorpusWriter, Dedup, Sampling, Semantic, Similarity, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-8 batch: winnowing fingerprints (Schleimer et al. 2003 — the
 * MOSS local-fingerprinting algorithm) and per-language CCNet quality
 * tiers (Wenzek et al. 2020). Every oracle replays the full selection —
 * k-gram hashing, window minima, df caps, per-language LM training —
 * so the hash-match certifies the algorithm, not a summary of it.
 */
object PipelineQueries7 {

  private val winK = 8 // k-gram chars
  private val winW = 4 // window of consecutive k-gram hashes
  private val winMinShared = 3
  private val winMaxDf = 20

  private val rpDim = 16 // JL sketch width (testdata embeddings are dim 64)
  private val rpCandMult = 8
  private val simK = 5

  private val tuneRate = 0.5
  private val tuneThresh = Sampling.rateThreshold(tuneRate)
  private val tuneJac = 0.7
  private val tuneSalt = "lshtune"

  private val drEta = 5.0
  private val drSmooth = 0.1
  private val drLambda = 0.9 // bigram interpolation weight (t_bigram_nll's)

  private val novSalt = "novelref"
  private val novRate = 0.5
  private val novThresh = Sampling.rateThreshold(novRate)

  private val farK = 6
  /** Sequential-fold squared L2 over the 64 dims (index order —
    * bit-identical to the Spark zip_with fold). */
  private def fSqd(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, 64),
       |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin

  private val curShards = 8
  private val curSalt = "epoch0"

  private val qwMinRate = 0.05
  private val qwSalt = "qsamp"

  /** Sequential-fold cosine with precomputed norms (the duckCosine
    * discipline — bit-identical to Spark's fold + norm columns). */
  private def dCos(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a.v)), i -> $a.v[i] * $b.v[i]))
       | / ($a.nrm * $b.nrm)""".stripMargin

  /** JL sketch CTEs: the SAME ±1 Rademacher literals the Spark plan
    * compiles ([[Similarity.rpSign]]), per-vector rDim rounded sums,
    * over the zero-norm-guarded embedding set `ren`. */
  private val rpCtes =
    PipelineQueries.embDouble + ",\n" +
    "ren AS (SELECT vec_id, label, v, nrm FROM e WHERE nrm > 0),\n" +
    "rpl AS (SELECT * FROM (VALUES\n  " +
    (0 until rpDim).map(j =>
      s"($j,[${(0 until 64).map(d => Similarity.rpSign(j, d)).mkString(",")}])")
      .mkString(",\n  ") + ") v(j, plane)),\n" +
    s"""rsk0 AS MATERIALIZED (
       |  SELECT en.vec_id, p.j,
       |    round(list_sum(list_transform(generate_series(1, 64),
       |      i -> en.v[i] * p.plane[i])), 6) AS rv
       |  FROM ren en, rpl p),
       |rsk AS (SELECT vec_id, list(rv ORDER BY j) AS r
       |        FROM rsk0 GROUP BY vec_id),
       |rcand AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        round(list_sum(list_transform(generate_series(1, $rpDim),
       |          j -> qr.r[j] * cr.r[j])) / (q.nrm * c.nrm), 6) DESC,
       |        c.vec_id) AS crk
       |    FROM (SELECT * FROM ren WHERE vec_id < 8) q
       |    JOIN ren c ON c.label = q.label AND c.vec_id <> q.vec_id
       |    JOIN rsk qr ON qr.vec_id = q.vec_id
       |    JOIN rsk cr ON cr.vec_id = c.vec_id)
       |  WHERE crk <= ${rpCandMult * simK})""".stripMargin

  /** Exact-rescore SELECT over a candidate CTE with (q_id, c_id). */
  private def rescoreSql(candCte: String, src: String): String =
    s"""SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT $candCte.q_id, $candCte.c_id,
       |    round(${dCos("q", "c")}, 6) AS cos_sim,
       |    row_number() OVER (PARTITION BY $candCte.q_id
       |      ORDER BY round(${dCos("q", "c")}, 6) DESC, $candCte.c_id)
       |      AS rank
       |  FROM $candCte JOIN $src q ON q.vec_id = $candCte.q_id
       |            JOIN $src c ON c.vec_id = $candCte.c_id)
       |WHERE rank <= $simK""".stripMargin

  /** Winnowing selection CTEs: normalized text -> k-gram hashes ->
    * per-window minima -> distinct per-doc fingerprint set. Mirrors
    * [[TextAnalysis.winnowFingerprints]] hash-for-hash (16 md5 hex
    * digits, full windows only). */
  private val winnowCtes =
    s"""wn AS (
       |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
       |  FROM documents),
       |wkg0 AS (
       |  SELECT doc_id, length(s) - ${winK - 1} AS n_kg, s
       |  FROM wn WHERE length(s) - ${winK - 1} >= $winW),
       |wkg AS (
       |  SELECT doc_id, n_kg, unnest(generate_series(1, n_kg)) AS pos, s
       |  FROM wkg0),
       |wh AS (
       |  SELECT doc_id, n_kg, pos,
       |    substr(md5(substr(s, pos, $winK)), 1, 16) AS h
       |  FROM wkg),
       |wsel AS (
       |  SELECT doc_id, pos, n_kg,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${winW - 1} FOLLOWING) AS fp
       |  FROM wh),
       |wfps AS (
       |  SELECT DISTINCT doc_id, fp FROM wsel
       |  WHERE pos <= n_kg - ${winW - 1})""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- winnowing fingerprints (MOSS) ------------------------------------

    // Local, position-robust document fingerprints: any shared substring
    // of >= w + k - 1 chars is guaranteed to share a selected
    // fingerprint, at ~2/(w+1) storage density of the full k-gram set.
    // Output is a per-doc digest of the ORDERED fingerprint set (md5 of
    // the sorted concatenation) — one row per doc in the artifact while
    // the hash-match still certifies every selected fingerprint.
    QueryDef("t_winnow", PipelineQueries.withC(winnowCtes)(
      """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
        |  md5(string_agg(fp, '' ORDER BY fp)) AS fp_digest
        |FROM wfps GROUP BY doc_id""".stripMargin)) { (s, dir) =>
      TextAnalysis.winnowFingerprints(W.read(s, dir, "documents"), winK, winW)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"),
          md5(concat_ws("", sort_array(collect_list(col("fp")))))
            .as("fp_digest"))
    },

    // Copied-passage pairs over the winnowed index: df-capped inverted
    // index (boilerplate fingerprints carry no provenance signal),
    // containment against the honest uncapped per-doc set size.
    QueryDef("dedup_winnow_overlap", PipelineQueries.withC(winnowCtes + ",\n" +
      s"""wsizes AS (SELECT doc_id, count(*) AS n_fp FROM wfps GROUP BY doc_id),
         |wkept AS (
         |  SELECT doc_id, fp FROM (
         |    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
         |    FROM wfps)
         |  WHERE df <= $winMaxDf),
         |wpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
         |  FROM wkept a JOIN wkept b
         |    ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= $winMinShared)""".stripMargin)(
      s"""SELECT doc_a, doc_b, shared,
         |  round(CAST(shared AS DOUBLE) /
         |    CAST(least(sa.n_fp, sb.n_fp) AS DOUBLE), 6) AS containment
         |FROM wpairs
         |JOIN wsizes sa ON sa.doc_id = doc_a
         |JOIN wsizes sb ON sb.doc_id = doc_b""".stripMargin)) { (s, dir) =>
      Dedup.winnowOverlapPairs(W.read(s, dir, "documents"),
        winK, winW, winMinShared, winMaxDf)
    },

    // ---- per-language CCNet tiers -----------------------------------------

    // CCNet buckets head/middle/tail per LANGUAGE (one LM per language,
    // tier boundaries within it) — a Danish doc must not be graded
    // against an English LM. The oracle trains every per-language
    // unigram LM and replays every per-language ntile.
    QueryDef("t_nll_tiers_by_lang", PipelineQueries.withC(
      """ltd AS (
        |  SELECT doc_id, lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |ltok AS (SELECT doc_id, lang, unnest(toks) AS tok FROM ltd),
        |lcounts AS (SELECT lang, tok, count(*) AS c FROM ltok GROUP BY 1, 2),
        |ltot AS (SELECT lang, sum(c) AS t FROM lcounts GROUP BY 1),
        |lnll AS (
        |  SELECT lang, tok,
        |    CAST(round(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1e6)
        |      AS BIGINT) AS nll_micro
        |  FROM lcounts JOIN ltot USING (lang)),
        |lscored AS (
        |  SELECT doc_id, min(lang) AS lang,
        |    round(CAST(sum(nll_micro) AS DOUBLE) / (count(*) * 1e6), 6)
        |      AS mean_nll
        |  FROM ltok JOIN lnll USING (lang, tok) GROUP BY doc_id)""".stripMargin)(
      """SELECT doc_id, lang AS part, mean_nll,
        |  CAST(ntile(3) OVER (PARTITION BY lang ORDER BY mean_nll, doc_id)
        |    AS BIGINT) AS tier
        |FROM lscored""".stripMargin)) { (s, dir) =>
      TextAnalysis.nllTiersBy(W.read(s, dir, "documents"), "lang", 3)
    },

    // ---- corpus data card -------------------------------------------------

    // The release-time composition table (Datasheets for Datasets):
    // CUBE over (lang, source) -> full matrix + marginals + total in
    // one aggregate, with exact content-distinct counts as the
    // dup-rate signal.
    QueryDef("report_data_card", PipelineQueries.withC(
      """dc AS (
        |  SELECT lang, source,
        |    len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok,
        |    n_chars,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fpr
        |  FROM documents)""".stripMargin)(
      """SELECT coalesce(lang, 'ALL') AS lang,
        |  coalesce(source, 'ALL') AS source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT fpr) AS BIGINT) AS n_unique,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM dc GROUP BY CUBE (lang, source)""".stripMargin)) { (s, dir) =>
      CorpusReport.dataCard(W.read(s, dir, "documents"))
    },

    // ---- JL random-projection ANN -----------------------------------------

    // Compressed-candidate ANN #3 (after SQ8 and PQ): in-cell pre-rank
    // on 16-dim Rademacher sketches, exact rescore of candMult*k
    // survivors. The oracle inlines the SAME ±1 projection literals and
    // replays sketching, pre-rank, and rescore end-to-end.
    QueryDef("sim_topk_rp", PipelineQueries.withC(rpCtes)(
      rescoreSql("rcand", "ren"))) { (s, dir) =>
      val e = W.read(s, dir, "embeddings")
      Similarity.rpTopK(e.filter(col("vec_id") < 8), e, simK,
          rpDim, rpCandMult)
        .select("q_id", "c_id", "cos_sim", "rank")
    },

    // ---- ANN recall report ------------------------------------------------

    // The index-evaluation harness: per (method, query), overlap of the
    // approximate top-k with the exact top-k. Every branch — the exact
    // baseline, IVF, multi-probe IVF (centroids + probe selection), and
    // the JL sketch path — is replayed in the oracle, so the hash-match
    // certifies the measured recall numbers, not just the plumbing.
    QueryDef("sim_recall_report", PipelineQueries.withC(rpCtes + s""",
      |xk AS (
      |  SELECT q_id, c_id FROM (
      |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY round(${dCos("q", "c")}, 6) DESC, c.vec_id) AS rank
      |    FROM (SELECT * FROM e WHERE vec_id < 8) q
      |    JOIN e c ON q.vec_id <> c.vec_id)
      |  WHERE rank <= $simK),
      |xn AS (SELECT q_id, count(*) AS n_exact FROM xk GROUP BY 1),
      |ik AS (
      |  SELECT q_id, c_id FROM (
      |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY round(${dCos("q", "c")}, 6) DESC, c.vec_id) AS rank
      |    FROM (SELECT * FROM e WHERE vec_id < 8) q
      |    JOIN e c ON q.label = c.label AND q.vec_id <> c.vec_id)
      |  WHERE rank <= $simK),
      |cents AS MATERIALIZED (
      |  SELECT label AS cell, list(mv ORDER BY pos) AS cv FROM (
      |    SELECT label, p.pos, round(avg(v[p.pos]), 6) AS mv
      |    FROM ren, (SELECT unnest(generate_series(1, 64)) AS pos) p
      |    GROUP BY label, p.pos) GROUP BY label),
      |probes AS (
      |  SELECT q_id, cell FROM (
      |    SELECT q.vec_id AS q_id, c.cell,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        round(list_sum(list_transform(generate_series(1, 64),
      |          i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))), 6),
      |        c.cell) AS prk
      |    FROM (SELECT * FROM ren WHERE vec_id < 8) q, cents c)
      |  WHERE prk <= 2),
      |pk AS (
      |  SELECT q_id, c_id FROM (
      |    SELECT p.q_id, c.vec_id AS c_id,
      |      round(${dCos("q", "c")}, 6) AS cos_sim,
      |      row_number() OVER (PARTITION BY p.q_id
      |        ORDER BY round(${dCos("q", "c")}, 6) DESC, c.vec_id) AS rank
      |    FROM probes p JOIN ren c ON c.label = p.cell
      |    JOIN ren q ON q.vec_id = p.q_id
      |    WHERE p.q_id <> c.vec_id)
      |  WHERE rank <= $simK),
      |rk AS (
      |  SELECT q_id, c_id FROM (
      |    SELECT rcand.q_id, rcand.c_id,
      |      row_number() OVER (PARTITION BY rcand.q_id
      |        ORDER BY round(${dCos("q", "c")}, 6) DESC, rcand.c_id)
      |        AS rank
      |    FROM rcand JOIN ren q ON q.vec_id = rcand.q_id
      |               JOIN ren c ON c.vec_id = rcand.c_id)
      |  WHERE rank <= $simK),
      |ih AS (SELECT q_id, count(*) AS hits FROM ik
      |       JOIN xk USING (q_id, c_id) GROUP BY 1),
      |ph AS (SELECT q_id, count(*) AS hits FROM pk
      |       JOIN xk USING (q_id, c_id) GROUP BY 1),
      |rh AS (SELECT q_id, count(*) AS hits FROM rk
      |       JOIN xk USING (q_id, c_id) GROUP BY 1),
      |u AS (
      |  SELECT 'ivf' AS method, xn.q_id, xn.n_exact,
      |    coalesce(ih.hits, 0) AS hits FROM xn LEFT JOIN ih USING (q_id)
      |  UNION ALL
      |  SELECT 'ivf_probe2', xn.q_id, xn.n_exact, coalesce(ph.hits, 0)
      |  FROM xn LEFT JOIN ph USING (q_id)
      |  UNION ALL
      |  SELECT 'rp', xn.q_id, xn.n_exact, coalesce(rh.hits, 0)
      |  FROM xn LEFT JOIN rh USING (q_id))""".stripMargin)(
      """SELECT method, q_id, CAST(n_exact AS BIGINT) AS n_exact,
        |  CAST(hits AS BIGINT) AS hits,
        |  round(CAST(hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) AS recall
        |FROM u""".stripMargin)) { (s, dir) =>
      val e = W.read(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8)
      Similarity.recallReport(
        Similarity.bruteForceTopK(q, e, simK),
        Seq(
          "ivf" -> Similarity.ivfTopK(q, e, simK),
          "ivf_probe2" -> Similarity.ivfTopKMultiProbe(q, e, simK, nprobe = 2),
          "rp" -> Similarity.rpTopK(q, e, simK, rpDim, rpCandMult)))
    },

    // ---- LSH tuning report ------------------------------------------------

    // Precision/recall of the production MinHash band join against
    // exhaustive exact Jaccard on a hash-stable half sample — the
    // banding-config measurement (P[cand] = 1-(1-j^4)^2 predicted,
    // this reports observed). The oracle replays sampling, the
    // inverted-index ground truth, the md5 signature/band family, and
    // both ratio computations.
    QueryDef("dedup_lsh_tuning", PipelineQueries.withC(
      s"""tund AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE ${PipelineQueries2.duckHash32(tuneSalt)} < $tuneThresh),
         |tuntok AS (
         |  SELECT doc_id,
         |    regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
         |  FROM tund),
         |tunsh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, greatest(len(toks) - 2, 0)),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         |    AS shingles
         |  FROM tuntok),
         |tuninv AS (SELECT doc_id, unnest(shingles) AS s FROM tunsh),
         |tuncand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM tuninv a JOIN tuninv b
         |    ON a.s = b.s AND a.doc_id < b.doc_id),
         |tunjac AS (
         |  SELECT c.doc_a, c.doc_b,
         |    round(CAST(len(list_intersect(sa.shingles, sb.shingles))
         |        AS DOUBLE) /
         |      CAST(len(sa.shingles) + len(sb.shingles)
         |        - len(list_intersect(sa.shingles, sb.shingles))
         |        AS DOUBLE), 6) AS jaccard
         |  FROM tuncand c
         |  JOIN tunsh sa ON sa.doc_id = c.doc_a
         |  JOIN tunsh sb ON sb.doc_id = c.doc_b),
         |tunsig AS (
         |  SELECT doc_id,
         |    min(md5('1:' || s)) AS mh1, min(md5('2:' || s)) AS mh2,
         |    min(md5('3:' || s)) AS mh3, min(md5('4:' || s)) AS mh4,
         |    min(md5('5:' || s)) AS mh5, min(md5('6:' || s)) AS mh6,
         |    min(md5('7:' || s)) AS mh7, min(md5('8:' || s)) AS mh8
         |  FROM tuninv GROUP BY doc_id),
         |tunbu AS (
         |  SELECT doc_id, 0 AS band_idx,
         |    md5(mh1 || mh2 || mh3 || mh4) AS bh FROM tunsig
         |  UNION ALL
         |  SELECT doc_id, 1, md5(mh5 || mh6 || mh7 || mh8) FROM tunsig),
         |tunlsh AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM tunbu a JOIN tunbu b
         |    ON a.band_idx = b.band_idx AND a.bh = b.bh
         |    AND a.doc_id < b.doc_id),
         |tunm AS (
         |  SELECT
         |    (SELECT count(*) FROM tund) AS n_docs,
         |    (SELECT count(*) FROM tunjac WHERE jaccard >= $tuneJac)
         |      AS n_true,
         |    (SELECT count(*) FROM tunlsh) AS n_cand,
         |    (SELECT count(*) FROM tunlsh JOIN tunjac USING (doc_a, doc_b)
         |     WHERE jaccard >= $tuneJac) AS tp)""".stripMargin)(
      s"""SELECT CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_true AS BIGINT) AS n_true,
         |  CAST(n_cand AS BIGINT) AS n_cand, CAST(tp AS BIGINT) AS tp,
         |  CASE WHEN n_cand > 0
         |    THEN round(CAST(tp AS DOUBLE) / CAST(n_cand AS DOUBLE), 6)
         |    ELSE 0.0 END AS prec,
         |  CASE WHEN n_true > 0
         |    THEN round(CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
         |    ELSE 0.0 END AS recall
         |FROM tunm""".stripMargin)) { (s, dir) =>
      Dedup.lshTuningReport(W.read(s, dir, "documents"),
        tuneRate, tuneJac, tuneSalt)
    },

    // ---- DoReMi-style domain reweighting ----------------------------------

    // Exponential tilting of baseline token shares by per-domain excess
    // loss (weak unigram proxy vs strong interpolated-bigram
    // reference), smoothed with the uniform mixture — the Group-DRO
    // update of DoReMi (Xie et al. 2023) telescoped over fixed loss
    // tables. The oracle trains BOTH LMs, rolls them up per source,
    // and replays every quantized ratio including the exp tilt.
    QueryDef("samp_domain_reweight", PipelineQueries.withC(
      PipelineQueries.tokDocs + ",\n" +
      s"""drtok AS (SELECT doc_id, unnest(toks) AS tok FROM tok_docs),
         |drcnt AS (SELECT tok, count(*) AS c FROM drtok GROUP BY 1),
         |drnll AS (
         |  SELECT tok, CAST(round(-ln(CAST(c AS DOUBLE) /
         |    (SELECT CAST(sum(c) AS DOUBLE) FROM drcnt)) * 1e6) AS BIGINT)
         |    AS nll_micro
         |  FROM drcnt),
         |druni AS (
         |  SELECT doc_id, count(*) AS n_tok, sum(nll_micro) AS uni_sum
         |  FROM drtok JOIN drnll USING (tok) GROUP BY 1),
         |drbg AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |  FROM (SELECT doc_id, toks,
         |      unnest(generate_series(1, len(toks) - 1)) AS i
         |    FROM tok_docs)),
         |drbc AS (SELECT w1, w2, count(*) AS cb FROM drbg GROUP BY 1, 2),
         |drbnll AS (
         |  SELECT drbc.w1, drbc.w2,
         |    CAST(round(-ln(
         |      $drLambda * CAST(cb AS DOUBLE) / CAST(u1.c AS DOUBLE)
         |      + ${1.0 - drLambda} * CAST(u2.c AS DOUBLE) /
         |        (SELECT CAST(sum(c) AS DOUBLE) FROM drcnt))
         |      * 1e6) AS BIGINT) AS nll_micro
         |  FROM drbc JOIN drcnt u1 ON drbc.w1 = u1.tok
         |  JOIN drcnt u2 ON drbc.w2 = u2.tok),
         |drbi AS (
         |  SELECT doc_id, count(*) AS n_bi, sum(nll_micro) AS bi_sum
         |  FROM drbg JOIN drbnll USING (w1, w2) GROUP BY 1),
         |drper AS (
         |  SELECT d.source, sum(u.n_tok) AS n_tokens,
         |    sum(u.uni_sum) AS uni_micro,
         |    sum(coalesce(b.n_bi, 0)) AS n_bi,
         |    sum(coalesce(b.bi_sum, 0)) AS bi_micro
         |  FROM documents d
         |  JOIN druni u USING (doc_id)
         |  LEFT JOIN drbi b USING (doc_id)
         |  GROUP BY d.source),
         |drm AS (
         |  SELECT source, n_tokens,
         |    round(CAST(uni_micro AS DOUBLE) /
         |      (CAST(n_tokens AS DOUBLE) * 1e6), 6) AS uni_nll,
         |    CASE WHEN n_bi > 0
         |      THEN round(CAST(bi_micro AS DOUBLE) /
         |        (CAST(n_bi AS DOUBLE) * 1e6), 6)
         |      ELSE 0.0 END AS bi_nll
         |  FROM drper),
         |drx AS (
         |  SELECT source, n_tokens, uni_nll, bi_nll,
         |    round(greatest(uni_nll - bi_nll, 0.0), 6) AS excess,
         |    round(CAST(n_tokens AS DOUBLE) /
         |      sum(CAST(n_tokens AS DOUBLE)) OVER (), 6) AS share
         |  FROM drm),
         |drt AS (
         |  SELECT *, round(share * exp($drEta * excess), 6) AS tilt
         |  FROM drx)""".stripMargin)(
      s"""SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, share,
         |  uni_nll, bi_nll, excess,
         |  round(${1.0 - drSmooth} * tilt / sum(tilt) OVER ()
         |    + $drSmooth / count(*) OVER (), 6) AS weight
         |FROM drt""".stripMargin)) { (s, dir) =>
      Sampling.domainReweight(W.read(s, dir, "documents"),
        drEta, drSmooth, drLambda)
    },

    // ---- n-gram novelty ---------------------------------------------------

    // Fraction of each doc's distinct word trigrams unseen in the
    // reference slice (the 50% hash sample — the held-out discipline of
    // t_trigram_backoff). Near-zero novelty flags paraphrase-grade
    // duplication that whole-doc dedup misses.
    QueryDef("t_novelty", PipelineQueries.withC(
      PipelineQueries.shingled + ",\n" +
      s"""nvref AS (
         |  SELECT DISTINCT unnest(shingles) AS g FROM shingled
         |  WHERE ${PipelineQueries2.duckHash32(novSalt)} < $novThresh),
         |nvdoc AS (SELECT doc_id, unnest(shingles) AS g FROM shingled),
         |nvnew AS (
         |  SELECT doc_id, count(*) AS n_novel FROM nvdoc
         |  WHERE NOT EXISTS (SELECT 1 FROM nvref r WHERE r.g = nvdoc.g)
         |  GROUP BY 1),
         |nvsz AS (
         |  SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_ngrams
         |  FROM shingled)""".stripMargin)(
      """SELECT s.doc_id, s.n_ngrams,
        |  CAST(coalesce(n.n_novel, 0) AS BIGINT) AS n_novel,
        |  CASE WHEN s.n_ngrams > 0
        |    THEN round(CAST(coalesce(n.n_novel, 0) AS DOUBLE) /
        |      CAST(s.n_ngrams AS DOUBLE), 6)
        |    ELSE 0.0 END AS novelty
        |FROM nvsz s LEFT JOIN nvnew n USING (doc_id)""".stripMargin)) {
      (s, dir) =>
        val docs = W.read(s, dir, "documents")
        TextAnalysis.noveltyScores(docs,
          Sampling.deterministicSample(docs, "doc_id", novRate, novSalt))
    },

    // ---- farthest-point k-center seeding ----------------------------------

    // Gonzalez-traversal seeds (deterministic k-means++ replacement) +
    // the literal-centroid assignment scan. The oracle replays every
    // seed selection (argmax of rounded min distance, lowest-id ties)
    // and the assignment fold.
    QueryDef("sem_kmeans_far", PipelineQueries.withC(
      PipelineQueries.embDouble + ",\n" +
      "fe AS (SELECT vec_id, v FROM e),\n" +
      "fs1 AS (SELECT vec_id, v FROM fe ORDER BY vec_id LIMIT 1),\n" +
      s"""fd1 AS MATERIALIZED (
         |  SELECT f.vec_id, f.v, ${fSqd("f.v", "s.v")} AS d
         |  FROM fe f, fs1 s)""".stripMargin + ",\n" +
      (2 to farK).map { i =>
        s"""fs$i AS (SELECT vec_id, v FROM fd${i - 1}
           |  ORDER BY round(d, 6) DESC, vec_id LIMIT 1)""".stripMargin +
        (if (i < farK) s""",
           |fd$i AS MATERIALIZED (
           |  SELECT f.vec_id, f.v,
           |    least(f.d, ${fSqd("f.v", "s.v")}) AS d
           |  FROM fd${i - 1} f, fs$i s)""".stripMargin
         else "")
      }.mkString(",\n") + ",\n" +
      s"""fseeds AS (${(1 to farK).map(i =>
            s"SELECT ${i - 1} AS cid, v FROM fs$i")
            .mkString("\n  UNION ALL ")})""")(
      s"""SELECT vec_id, cluster_id, sq_dist FROM (
         |  SELECT f.vec_id, s.cid AS cluster_id,
         |    round(${fSqd("f.v", "s.v")}, 6) AS sq_dist,
         |    row_number() OVER (PARTITION BY f.vec_id
         |      ORDER BY ${fSqd("f.v", "s.v")}, s.cid) AS rk
         |  FROM fe f, fseeds s)
         |WHERE rk = 1""".stripMargin)) { (s, dir) =>
      Semantic.farthestAssign(W.read(s, dir, "embeddings"), farK)
    },

    // ---- quality-weighted sampling ----------------------------------------

    // Soft quality filter: keep probability = the composite quality
    // score quantized to 2 decimals, floored at minRate — FineWeb's
    // "sample by quality" middle ground between a hard gate and
    // uniform sampling. The oracle replays the score, the rate
    // quantization, and the 101-threshold hash decision.
    QueryDef("samp_quality_weighted", PipelineQueries.withC(
      PipelineQueries.tokDocs + ",\n" +
      s"""qws AS (
         |  SELECT doc_id,
         |    round(0.4 * (CAST(len(list_filter(toks,
         |          x -> list_contains(${PipelineQueries.stop}, x))) AS DOUBLE)
         |        / CAST(len(toks) AS DOUBLE))
         |      + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
         |      + 0.3 * (CAST(len(regexp_extract_all(lower(text), '[a-z]'))
         |          AS DOUBLE) / CAST(length(text) AS DOUBLE)), 6)
         |      AS quality_score
         |  FROM tok_docs),
         |qwr AS (
         |  SELECT doc_id, quality_score,
         |    greatest(round(quality_score, 2), $qwMinRate) AS rate
         |  FROM qws)""".stripMargin)(
      s"""SELECT doc_id, quality_score, rate FROM qwr
         |WHERE ${PipelineQueries2.duckHash32(qwSalt)} <
         |  CAST(round(rate * 4294967296.0) AS BIGINT)""".stripMargin)) {
      (s, dir) =>
        Sampling.qualityWeightedSample(W.read(s, dir, "documents"),
          qwMinRate, qwSalt)
    },

    // ---- data-card delta --------------------------------------------------

    // The curation impact table: one flagged CUBE pass rolling the
    // composite quality-gate verdict into before/after/removed volumes
    // per (lang, source) cell. The verdict rides each row via the
    // gate's carryCols (single lineage — no corpus self-join), and the
    // oracle replays the full gate rule bundle plus the cube.
    QueryDef("report_card_diff", PipelineQueries.withC(
      PipelineQueries5.gateCtes + ",\n" +
      """cdd AS (
        |  SELECT d.lang, d.source,
        |    len(regexp_split_to_array(lower(trim(d.text)), '\s+')) AS n_tok,
        |    CASE WHEN g.fail_reason IS NULL THEN 1 ELSE 0 END AS k
        |  FROM gated g JOIN documents d USING (doc_id))""".stripMargin)(
      """SELECT coalesce(lang, 'ALL') AS lang,
        |  coalesce(source, 'ALL') AS source,
        |  CAST(count(*) AS BIGINT) AS n_docs_before,
        |  CAST(sum(k) AS BIGINT) AS n_docs_after,
        |  CAST(count(*) - sum(k) AS BIGINT) AS docs_removed,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens_before,
        |  CAST(sum(n_tok * k) AS BIGINT) AS n_tokens_after,
        |  CAST(sum(n_tok) - sum(n_tok * k) AS BIGINT) AS tokens_removed
        |FROM cdd GROUP BY CUBE (lang, source)""".stripMargin)) {
      (s, dir) =>
        val flagged = TextAnalysis.qualityGate(W.read(s, dir, "documents"),
          carryCols = Seq("lang", "source", "text"))
        CorpusReport.dataCardDiff(flagged, col("pass"))
    },

    // ---- curriculum epoch ordering ----------------------------------------

    // trainingOrder's shard-parallel contract with a quality-major key:
    // easiest (tier-1) docs first within every shard; shard membership
    // stays tier-blind so shard-parallel consumption is globally
    // tier-major. Oracle replays the LM, the ntile, and the window.
    QueryDef("pack_curriculum", PipelineQueries.withC(
      PipelineQueries.tokDocs + ",\n" +
      s"""cutok AS (SELECT doc_id, unnest(toks) AS tok FROM tok_docs),
         |cucnt AS (SELECT tok, count(*) AS c FROM cutok GROUP BY 1),
         |cunll AS (
         |  SELECT tok, CAST(round(-ln(CAST(c AS DOUBLE) /
         |    (SELECT CAST(sum(c) AS DOUBLE) FROM cucnt)) * 1e6) AS BIGINT)
         |    AS nll_micro
         |  FROM cucnt),
         |cuscored AS (
         |  SELECT doc_id,
         |    round(CAST(sum(nll_micro) AS DOUBLE) / (count(*) * 1e6), 6)
         |      AS mean_nll
         |  FROM cutok JOIN cunll USING (tok) GROUP BY doc_id),
         |cur AS (
         |  SELECT doc_id,
         |    CAST(ntile(3) OVER (ORDER BY mean_nll, doc_id) AS BIGINT)
         |      AS tier
         |  FROM cuscored),
         |curh AS (
         |  SELECT doc_id, tier,
         |    ${PipelineQueries2.duckHash32(curSalt)} AS h
         |  FROM cur JOIN documents USING (doc_id))""".stripMargin)(
      s"""SELECT doc_id, tier, CAST(shard AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY tier, h, doc_id) - 1 AS BIGINT) AS pos
         |FROM (SELECT doc_id, tier, h, h % $curShards AS shard FROM curh)""".stripMargin)) {
      (s, dir) =>
        CorpusWriter.curriculumOrder(W.read(s, dir, "documents"),
          curShards, 3, curSalt)
    })
}
