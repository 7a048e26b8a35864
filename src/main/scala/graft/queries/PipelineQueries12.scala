package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusReport, Dedup, Sampling, Semantic, TextAnalysis}
import graft.sim.{WarehouseSim => W}

/**
 * Round-10 third-session batch — global-order primitives and the
 * reports that need them, plus cluster/dup diagnostics:
 *
 *  - `samp_rrf_fusion`: reciprocal-rank fusion of the quality score and
 *    the unigram-NLL fluency signal, with exact global ranks from
 *    [[graft.operators.GlobalRank]] (range shuffle — never a
 *    single-partition window);
 *  - `report_heaps_curve`: vocabulary-growth checkpoints over the exact
 *    corpus-stream token position (GlobalRank's running-total form);
 *  - `report_dup_inflation`: token-weighted exact-dup cost per source;
 *  - `report_cluster_purity`: cross-source leakage of near-dup clusters
 *    over the certified CC labels;
 *  - `t_ocr_garbage`: character-class garbage screen (scan-only);
 *  - `sem_silhouette`: centroid silhouette per k-means cluster —
 *    one corpus scan against the k×dim centroid literals.
 *
 * Float discipline as everywhere: ranks/positions/counts are exact
 * integers; RRF terms and silhouettes quantize to integer nano/micro
 * units before any cross-row sum; displayed ratios are single rounded
 * divisions of exact integers.
 */
object PipelineQueries12 {

  import PipelineQueries.{tokDocs, withC, stop, ccCtes}

  private val rrfK0 = 60
  private val rrfN = 100

  /** Quality-score CTE (the certified `t_quality_score` formula). */
  private val qualityCte =
    s"""q AS (
       |  SELECT doc_id,
       |    round(0.4 * (CAST(len(list_filter(toks, x -> list_contains($stop, x))) AS DOUBLE)
       |          / CAST(len(toks) AS DOUBLE))
       |      + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
       |      + 0.3 * (CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE)
       |          / CAST(length(text) AS DOUBLE)), 6) AS quality_score
       |  FROM tok_docs)""".stripMargin

  /** Mean-NLL CTEs (the certified `t_unigram_nll` computation). */
  private val nllCtes =
    """tokq AS (SELECT doc_id, unnest(toks) AS tok FROM tok_docs),
      |cnts AS (SELECT tok, count(*) AS c FROM tokq GROUP BY 1),
      |nllt AS (
      |  SELECT tok,
      |    CAST(round(-ln(CAST(c AS DOUBLE) /
      |      (SELECT CAST(sum(c) AS DOUBLE) FROM cnts)) * 1e6) AS BIGINT)
      |      AS nll_micro
      |  FROM cnts),
      |dn AS (
      |  SELECT doc_id,
      |    round(CAST(sum(nll_micro) AS DOUBLE) / (count(*) * 1e6), 6)
      |      AS mean_nll
      |  FROM tokq JOIN nllt USING (tok) GROUP BY doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef("samp_rrf_fusion",
      withC(tokDocs + ",\n" + qualityCte + ",\n" + nllCtes + ",\n" +
        s"""rq AS (
           |  SELECT doc_id, row_number() OVER (
           |    ORDER BY quality_score DESC, doc_id) AS r_quality FROM q),
           |rn AS (
           |  SELECT doc_id, row_number() OVER (
           |    ORDER BY mean_nll ASC, doc_id) AS r_nll FROM dn),
           |f AS (
           |  SELECT doc_id, r_quality, r_nll,
           |    CAST(round(1e9 / ($rrfK0 + r_quality))
           |      + round(1e9 / ($rrfK0 + r_nll)) AS BIGINT) AS rrf_nano
           |  FROM rq JOIN rn USING (doc_id))""".stripMargin)(
        s"""SELECT doc_id, r_quality, r_nll, rrf_nano,
           |  round(CAST(rrf_nano AS DOUBLE) / 1e9, 6) AS rrf
           |FROM f ORDER BY rrf_nano DESC, doc_id LIMIT $rrfN""".stripMargin)) {
      (s, dir) =>
        Sampling.rrfFusionSelect(W.read(s, dir, "documents"), n = rrfN,
          k0 = rrfK0)
    },

    QueryDef("report_heaps_curve",
      withC(tokDocs + ",\n" +
        """tp AS (
          |  SELECT doc_id, toks,
          |    sum(len(toks)) OVER (ORDER BY doc_id) - len(toks) AS doc_off
          |  FROM tok_docs),
          |pos AS (
          |  SELECT toks[i] AS tok, doc_off + i AS pos
          |  FROM (SELECT doc_id, toks, doc_off,
          |          unnest(generate_series(1, len(toks))) AS i FROM tp)),
          |fo AS (SELECT tok, min(pos) AS first_pos FROM pos GROUP BY 1),
          |tot AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS n FROM tok_docs),
          |cks AS (
          |  SELECT DISTINCT (j * n) // 20 AS checkpoint_tokens
          |  FROM (SELECT unnest(generate_series(1, 20)) AS j), tot
          |  WHERE (j * n) // 20 > 0)""".stripMargin)(
        """SELECT c.checkpoint_tokens,
          |  CAST(count(*) AS BIGINT) AS vocab
          |FROM fo f JOIN cks c ON f.first_pos <= c.checkpoint_tokens
          |GROUP BY 1""".stripMargin)) {
      (s, dir) => CorpusReport.heapsCurve(W.read(s, dir, "documents"))
    },

    QueryDef("report_dup_inflation",
      """WITH fp AS (
        |  SELECT doc_id, source,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      AS fingerprint,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |k AS (SELECT fingerprint, min(doc_id) AS keep FROM fp GROUP BY 1)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id <> keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN doc_id <> keep THEN n_tok ELSE 0 END) AS BIGINT)
        |    AS n_dup_tokens,
        |  round(CAST(sum(CASE WHEN doc_id <> keep THEN n_tok ELSE 0 END)
        |      AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE), 6) AS dup_token_frac
        |FROM fp JOIN k USING (fingerprint) GROUP BY 1""".stripMargin) {
      (s, dir) => CorpusReport.dupInflation(W.read(s, dir, "documents"))
    },

    QueryDef("report_cluster_purity",
      "WITH RECURSIVE " + ccCtes + ",\n" +
        """clus AS (
          |  SELECT id AS doc_id, least(id, min(other)) AS cluster_id
          |  FROM reach GROUP BY id),
          |mem AS (
          |  SELECT d.doc_id, d.source,
          |    coalesce(c.cluster_id, d.doc_id) AS cluster_id
          |  FROM documents d LEFT JOIN clus c USING (doc_id)),
          |span AS (
          |  SELECT cluster_id, count(DISTINCT source) AS n_sources
          |  FROM mem GROUP BY 1)
          |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_cross_docs,
          |  CAST(count(DISTINCT CASE WHEN n_sources > 1 THEN cluster_id END)
          |    AS BIGINT) AS n_cross_clusters,
          |  round(CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)
          |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS cross_frac
          |FROM mem JOIN span USING (cluster_id)
          |GROUP BY 1""".stripMargin) { (s, dir) =>
      val docs = W.read(s, dir, "documents")
      CorpusReport.clusterPurity(docs,
        Dedup.connectedComponents(Dedup.simhashPairs(docs)))
    },

    QueryDef("t_ocr_garbage",
      withC(tokDocs)(
        """SELECT doc_id,
          |  CAST(len(toks) AS BIGINT) AS n_tokens,
          |  round(CAST(len(list_filter(toks, x -> length(x) > 20)) AS DOUBLE)
          |    / CAST(len(toks) AS DOUBLE), 6) AS longtok_frac,
          |  round(CAST(len(list_filter(toks, x ->
          |      regexp_matches(x, '[bcdfghjklmnpqrstvwxyz]{5,}'))) AS DOUBLE)
          |    / CAST(len(toks) AS DOUBLE), 6) AS consrun_frac,
          |  round(CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '',
          |      'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE), 6)
          |    AS sym_frac,
          |  (round(CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '',
          |      'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE), 6) > 0.2
          |   OR round(CAST(len(list_filter(toks, x ->
          |        regexp_matches(x, '[bcdfghjklmnpqrstvwxyz]{5,}')))
          |      AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) > 0.1
          |   OR round(CAST(len(list_filter(toks, x -> length(x) > 20))
          |      AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) > 0.05)
          |    AS is_garbage
          |FROM tok_docs""".stripMargin)) {
      (s, dir) =>
        TextAnalysis.withGarbageScore(W.read(s, dir, "documents"))
          .select("doc_id", "n_tokens", "longtok_frac", "consrun_frac",
            "sym_frac", "is_garbage")
    },

    QueryDef("sem_silhouette",
      s"""WITH ${PipelineQueries3.kmeansCtes},
         |bs AS (
         |  SELECT af.vec_id,
         |    min(round(${PipelineQueries3.duckSqDist("e", "c")}, 6)) AS b_sq
         |  FROM af JOIN e USING (vec_id) CROSS JOIN c2 c
         |  WHERE c.cid <> af.cid
         |  GROUP BY af.vec_id),
         |sv AS (
         |  SELECT af.cid AS cluster_id,
         |    CAST(round(CASE
         |      WHEN greatest(sqrt(round(af.d, 6)), sqrt(b_sq)) = 0 THEN 0.0
         |      ELSE (sqrt(b_sq) - sqrt(round(af.d, 6)))
         |        / greatest(sqrt(round(af.d, 6)), sqrt(b_sq)) END * 1e6)
         |      AS BIGINT) AS s_micro
         |  FROM af JOIN bs USING (vec_id))
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
         |  round(CAST(sum(s_micro) AS DOUBLE) / (count(*) * 1e6), 6)
         |    AS avg_silhouette,
         |  CAST(sum(CASE WHEN s_micro < 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_negative
         |FROM sv GROUP BY 1""".stripMargin) {
      (s, dir) =>
        Semantic.silhouetteReport(W.read(s, dir, "embeddings"),
          PipelineQueries3.kmK, iters = 2)
    })
}
