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
  private val gateP = 0.2
  private val gmEpoch = 1700000000L // = st_quality_monitor's epoch
  private val gmSpreadS = 7200L

  // garbage-screen fragments (shared by t_ocr_garbage + st_garbage_monitor
  // so the monitor certifies against the same per-doc flags)
  private val symFracSql =
    """round(CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE), 6)"""
  private val consFracSql =
    """round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[bcdfghjklmnpqrstvwxyz]{5,}'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6)"""
  private val longFracSql =
    """round(CAST(len(list_filter(toks, x -> length(x) > 20)) AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6)"""
  private val isGarbageSql =
    s"($symFracSql > 0.2 OR $consFracSql > 0.1 OR $longFracSql > 0.05)"

  /** The certified `t_quality_score` formula, as an expression over
    * `tok_docs` columns (shared by the gate, fusion, and scorecard
    * oracles). */
  private val qualityScoreSql =
    s"""round(0.4 * (CAST(len(list_filter(toks, x -> list_contains($stop, x))) AS DOUBLE)
       |          / CAST(len(toks) AS DOUBLE))
       |      + 0.3 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
       |      + 0.3 * (CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE)
       |          / CAST(length(text) AS DOUBLE)), 6)""".stripMargin

  private val qualityCte =
    s"""q AS (
       |  SELECT doc_id, $qualityScoreSql AS quality_score
       |  FROM tok_docs)""".stripMargin

  /** One-shot vocabulary-growth replay — the oracle for BOTH the
    * one-shot query and the merged-state query (merge-vs-one-shot). */
  private val heapsOracleSql: String =
    PipelineQueries.withC(PipelineQueries.tokDocs + ",\n" +
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
        |GROUP BY 1""".stripMargin)

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

    QueryDef("report_heaps_curve", heapsOracleSql) {
      (s, dir) => CorpusReport.heapsCurve(W.read(s, dir, "documents"))
    },

    // merge-vs-one-shot certification of the mergeable vocab-growth
    // state: the Spark side splits the corpus at max(doc_id)/2, builds
    // two states, merges (shift + per-type min), and renders — the
    // oracle is the ONE-SHOT replay, so a hash match IS the
    // mergeability theorem (the report_pca_incremental discipline).
    QueryDef("report_heaps_incremental", heapsOracleSql) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        val p = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
        CorpusReport.renderHeaps(
          CorpusReport.mergeVocabState(
            CorpusReport.vocabState(docs.filter(col("doc_id") <= p)),
            CorpusReport.vocabState(docs.filter(col("doc_id") > p))))
      }
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
      // standing cluster state (the graph family's shared artifact):
      // the line measures the purity report, not re-mining + re-CC
      CorpusReport.clusterPurity(docs, Standing.ccLabels(s, dir))
    },

    QueryDef("t_ocr_garbage",
      withC(tokDocs)(
        s"""SELECT doc_id,
           |  CAST(len(toks) AS BIGINT) AS n_tokens,
           |  $longFracSql AS longtok_frac,
           |  $consFracSql AS consrun_frac,
           |  $symFracSql AS sym_frac,
           |  $isGarbageSql AS is_garbage
           |FROM tok_docs""".stripMargin)) {
      (s, dir) =>
        TextAnalysis.withGarbageScore(W.read(s, dir, "documents"))
          .select("doc_id", "n_tokens", "longtok_frac", "consrun_frac",
            "sym_frac", "is_garbage")
    },

    QueryDef("report_quality_volume",
      withC(tokDocs + ",\n" +
        s"""qs AS (
           |  SELECT doc_id, $qualityScoreSql AS quality_score,
           |    CAST(len(toks) AS BIGINT) AS n_tok
           |  FROM tok_docs),
           |tt AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total FROM qs),
           |gr AS (
           |  SELECT j AS thr_idx, CAST(j AS DOUBLE) / 20 AS thr
           |  FROM (SELECT unnest(generate_series(0, 20)) AS j))""".stripMargin)(
        """SELECT thr_idx, thr,
          |  CAST(count(*) AS BIGINT) AS n_docs_kept,
          |  CAST(sum(n_tok) AS BIGINT) AS n_tokens_kept,
          |  round(CAST(sum(n_tok) AS DOUBLE) / CAST(min(total) AS DOUBLE), 6)
          |    AS token_frac
          |FROM qs JOIN gr ON quality_score >= thr, tt
          |GROUP BY 1, 2""".stripMargin)) {
      (s, dir) =>
        CorpusReport.qualityVolumeCurve(W.read(s, dir, "documents"))
    },

    // CEP-style ordered-sequence funnel: view → click → purchase per
    // user, each step the EARLIEST strictly-later event, whole sequence
    // within 24 h (sized to this event stream's density — 1 h matches
    // nothing at sf≤0.01). The oracle computes each step as a grouped
    // min over a strict range join — the declarative twin of the
    // forward as-of sweeps (per-step pruning equals the final filter
    // because the match is a running min).
    QueryDef("j14_sequence_funnel",
      """WITH v AS (SELECT user_id, event_id AS id0, epoch_us(ts) AS t0
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS tc
        |      FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS tp
        |      FROM events WHERE event_type = 'purchase'),
        |s1 AS (
        |  SELECT v.user_id, v.id0, v.t0, min(c.tc) AS t1
        |  FROM v JOIN c ON c.user_id = v.user_id AND c.tc > v.t0
        |  GROUP BY 1, 2, 3),
        |s2 AS (
        |  SELECT s1.user_id, s1.id0, s1.t0, s1.t1, min(p.tp) AS t2
        |  FROM s1 JOIN p ON p.user_id = s1.user_id AND p.tp > s1.t1
        |  GROUP BY 1, 2, 3, 4)
        |SELECT user_id, id0, t0, t1, t2 FROM s2
        |WHERE t2 - t0 <= 86400000000""".stripMargin) {
      (s, dir) =>
        graft.operators.SequenceMatch.funnelMatch(
          W.read(s, dir, "events"),
          Seq("view", "click", "purchase"), withinSeconds = 86400L)
    },

    // first-order Markov transition matrix between consecutive events
    // per user (total order (ts, event_id) makes lead() deterministic
    // in both engines); probabilities normalize per from-row over the
    // |types|²-sized aggregate.
    QueryDef("report_event_transitions",
      """WITH sq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |tc AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM sq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6)
        |    AS prob
        |FROM tc""".stripMargin) {
      (s, dir) => {
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        val wFrom = org.apache.spark.sql.expressions.Window
          .partitionBy("from_type")
        W.read(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"))
          .withColumn("to_type", lead(col("from_type"), 1).over(wOrd))
          .filter(col("to_type").isNotNull)
          .groupBy("from_type", "to_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("prob", round(col("n").cast("double") /
            sum(col("n")).over(wFrom).cast("double"), 6))
      }
    },

    // same-user inter-event gap profile: exact integer micro gaps, mean
    // from integer sums, interpolated percentiles divided THEN rounded
    // (the t_token_quantiles float discipline). One-row output.
    QueryDef("report_interarrival",
      """WITH g AS (
        |  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_gaps,
        |  round(CAST(sum(gap) AS DOUBLE) / (count(*) * 1e6), 6)
        |    AS mean_gap_s,
        |  round(quantile_cont(gap, 0.5) / 1e6, 6) AS p50_gap_s,
        |  round(quantile_cont(gap, 0.9) / 1e6, 6) AS p90_gap_s
        |FROM g WHERE gap IS NOT NULL""".stripMargin) {
      (s, dir) => {
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        W.read(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(wOrd))
          .filter(col("gap").isNotNull)
          .agg(count(lit(1)).as("n_gaps"),
            round(sum(col("gap")).cast("double") /
              (count(lit(1)) * 1e6), 6).as("mean_gap_s"),
            round(expr("percentile(gap, 0.5)") / 1e6, 6).as("p50_gap_s"),
            round(expr("percentile(gap, 0.9)") / 1e6, 6).as("p90_gap_s"))
      }
    },

    // weekly cohort retention: users bucketed by their first signup
    // week; each cell is the fraction of the cohort active (any event)
    // at week offset j. All exact-integer bucket math; the matrix is
    // (cohort weeks × offsets)-sized.
    QueryDef("report_retention",
      """WITH ch AS (
        |  SELECT user_id,
        |    min(epoch_us(ts) // 604800000000) AS cw
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |act AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS wk
        |  FROM events),
        |cs AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_cohort
        |       FROM ch GROUP BY 1)
        |SELECT ch.cw AS cohort_week, CAST(act.wk - ch.cw AS BIGINT)
        |    AS week_offset,
        |  CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_active,
        |  CAST(min(cs.n_cohort) AS BIGINT) AS n_cohort,
        |  round(CAST(count(DISTINCT act.user_id) AS DOUBLE)
        |    / CAST(min(cs.n_cohort) AS DOUBLE), 6) AS retention
        |FROM act JOIN ch USING (user_id) JOIN cs ON cs.cw = ch.cw
        |WHERE act.wk >= ch.cw
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) => {
        val base = W.read(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr(graft.pipeline.Recency.floorDivSql("unix_micros(ts)", 604800000000L)).as("wk"))
        val cohort = base.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("wk")).as("cw"))
        val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("n_cohort"))
        base.select("user_id", "wk").distinct()
          .join(cohort, "user_id")
          .filter(col("wk") >= col("cw"))
          .join(sizes, "cw")
          .groupBy(col("cw").as("cohort_week"),
            (col("wk") - col("cw")).as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"),
            min(col("n_cohort")).as("n_cohort"))
          .withColumn("retention",
            round(col("n_active").cast("double") /
              col("n_cohort").cast("double"), 6))
      }
    },

    // DAU / trailing-7-day WAU stickiness. WAU avoids a range join: each
    // (day, user) row explodes to the 7 anchor days it supports, then an
    // equi-join against the observed-days grid — distinct-user counts
    // stay exact, and the expansion is a constant 7×.
    QueryDef("report_dau_wau",
      """WITH du AS (
        |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT d FROM du),
        |dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du
        |        GROUP BY 1),
        |wau AS (
        |  SELECT a.d, CAST(count(DISTINCT x.user_id) AS BIGINT) AS wau
        |  FROM (SELECT du.user_id, du.d + off AS d
        |        FROM du, (SELECT unnest(generate_series(0, 6)) AS off)) x
        |  JOIN days a ON a.d = x.d
        |  GROUP BY 1)
        |SELECT CAST(dau.d * 86400 AS BIGINT) AS day_epoch, dau.dau,
        |  wau.wau,
        |  round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
        |    AS stickiness
        |FROM dau JOIN wau USING (d)""".stripMargin) {
      (s, dir) => {
        val du = W.read(s, dir, "events")
          .select(expr(graft.pipeline.Recency.floorDivSql("unix_micros(ts)", 86400000000L)).as("d"),
            col("user_id"))
          .distinct()
        val days = du.select("d").distinct()
        val dau = du.groupBy("d").agg(count(lit(1)).as("dau"))
        val wau = du
          .select(col("user_id"),
            explode(sequence(lit(0L), lit(6L))).as("off"), col("d"))
          .select(col("user_id"), (col("d") + col("off")).as("d"))
          .join(days, "d")
          .groupBy("d").agg(countDistinct(col("user_id")).as("wau"))
        dau.join(wau, "d")
          .select((col("d") * 86400).as("day_epoch"), col("dau"),
            col("wau"),
            round(col("dau").cast("double") / col("wau").cast("double"), 6)
              .as("stickiness"))
      }
    },

    // funnel conversion rates: view→click and view→click→purchase
    // completion fractions inside 24 h, plus the exact median
    // time-to-convert (identical linear interpolation both engines —
    // the t_token_quantiles discipline). Composes the certified
    // SequenceMatch sweeps; one-row output.
    QueryDef("report_funnel_rates",
      """WITH v AS (SELECT user_id, event_id AS id0, epoch_us(ts) AS t0
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS tc
        |      FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS tp
        |      FROM events WHERE event_type = 'purchase'),
        |s1 AS (
        |  SELECT v.user_id, v.id0, v.t0, min(c.tc) AS t1
        |  FROM v JOIN c ON c.user_id = v.user_id AND c.tc > v.t0
        |  GROUP BY 1, 2, 3),
        |s1w AS (SELECT * FROM s1 WHERE t1 - t0 <= 86400000000),
        |s2 AS (
        |  SELECT s1w.id0, s1w.t0, min(p.tp) AS t2
        |  FROM s1w JOIN p ON p.user_id = s1w.user_id AND p.tp > s1w.t1
        |  GROUP BY 1, 2),
        |s2w AS (SELECT * FROM s2 WHERE t2 - t0 <= 86400000000)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_views,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s1w) AS n_view_click,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s2w) AS n_full_funnel,
        |  round((SELECT CAST(count(*) AS DOUBLE) FROM s1w)
        |    / (SELECT count(*) FROM v), 6) AS click_rate,
        |  round((SELECT CAST(count(*) AS DOUBLE) FROM s2w)
        |    / (SELECT count(*) FROM v), 6) AS funnel_rate,
        |  (SELECT round(quantile_cont(t2 - t0, 0.5), 6) FROM s2w)
        |    AS p50_convert_us""".stripMargin) {
      (s, dir) => {
        val ev = W.read(s, dir, "events")
        // all three counts stay IN the frame (1-row aggregates cross-
        // joined — broadcast of single rows, one job), no driver-side
        // count() rerunning the scan just to embed a literal
        val views = ev.filter(col("event_type") === "view")
          .agg(count(lit(1)).as("n_views"))
        val vc = graft.operators.SequenceMatch.funnelMatch(ev,
          Seq("view", "click"), withinSeconds = 86400L)
        val full = graft.operators.SequenceMatch.funnelMatch(ev,
          Seq("view", "click", "purchase"), withinSeconds = 86400L)
        views
          .crossJoin(vc.agg(count(lit(1)).as("n_view_click")))
          .crossJoin(full.agg(count(lit(1)).as("n_full_funnel"),
            // round, never CAST: DuckDB's double→BIGINT cast rounds
            // while Spark's truncates — a .5 median would diverge
            expr("round(percentile(t2 - t0, 0.5), 6)")
              .as("p50_convert_us")))
          .select(col("n_views"), col("n_view_click"), col("n_full_funnel"),
            round(col("n_view_click").cast("double") /
              col("n_views").cast("double"), 6).as("click_rate"),
            round(col("n_full_funnel").cast("double") /
              col("n_views").cast("double"), 6).as("funnel_rate"),
            col("p50_convert_us"))
      }
    },

    // dedup-policy tuning curve: verified near-dup pairs and distinct
    // linked docs at every hamming threshold 0..3 — the table read
    // before choosing how aggressive simhash dedup should be (the
    // simhash sibling of dedup_lsh_tuning). Reuses the certified pair
    // CTE with hamming retained; the 4-row grid is the checkpoint-
    // rollup shape.
    QueryDef("report_dedup_curve",
      "WITH " + PipelineQueries.simhash32Cte + ",\n" +
        """pr AS (
          |  SELECT doc_a, doc_b, hamming FROM (
          |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |      CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          |    FROM (SELECT doc_id, simhash, b AS band_idx,
          |            (simhash >> (b * 8)) & 255 AS band_val
          |          FROM sim32, (SELECT unnest(generate_series(0, 3)) AS b)) a
          |    JOIN (SELECT doc_id, simhash, b AS band_idx,
          |            (simhash >> (b * 8)) & 255 AS band_val
          |          FROM sim32, (SELECT unnest(generate_series(0, 3)) AS b)) b
          |      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          |         AND a.doc_id < b.doc_id)
          |  WHERE hamming <= 3),
          |gr AS (SELECT unnest(generate_series(0, 3)) AS thr),
          |pj AS (SELECT gr.thr, pr.doc_a, pr.doc_b
          |       FROM pr JOIN gr ON pr.hamming <= gr.thr),
          |np AS (SELECT thr, CAST(count(*) AS BIGINT) AS n_pairs
          |       FROM pj GROUP BY 1),
          |nd AS (SELECT thr, CAST(count(DISTINCT d) AS BIGINT)
          |         AS n_docs_linked
          |       FROM (SELECT thr, doc_a AS d FROM pj
          |             UNION ALL SELECT thr, doc_b FROM pj)
          |       GROUP BY 1)
          |SELECT thr, n_pairs, n_docs_linked
          |FROM np JOIN nd USING (thr)""".stripMargin) { (s, dir) =>
      val pairs = Dedup.simhashPairs(W.read(s, dir, "documents"))
      val grid = {
        import s.implicits._
        (0L to 3L).toDF("thr")
      }
      val pj = pairs.join(broadcast(grid), col("hamming") <= col("thr"))
      val np = pj.groupBy("thr").agg(count(lit(1)).as("n_pairs"))
      val nd = pj.select(col("thr"),
          explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .groupBy("thr").agg(countDistinct(col("d")).as("n_docs_linked"))
      np.join(nd, "thr").select("thr", "n_pairs", "n_docs_linked")
    },

    // RAKE keyword extraction: the oracle replays segmentation (per-doc
    // running stopword count), phrase capping, degree/frequency word
    // scores (integer micros), phrase sums, and the ranking.
    QueryDef("t_keywords_rake",
      withC(tokDocs + ",\n" +
        s"""tpk AS (
           |  SELECT doc_id, i, toks[i] AS tok,
           |    list_contains($stop, toks[i]) AS is_stop
           |  FROM (SELECT doc_id, toks,
           |          unnest(generate_series(1, len(toks))) AS i
           |        FROM tok_docs)),
           |sgk AS (
           |  SELECT doc_id, i, tok, is_stop,
           |    sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
           |      OVER (PARTITION BY doc_id ORDER BY i) AS seg
           |  FROM tpk),
           |phk AS (
           |  SELECT array_to_string(list(tok ORDER BY i), ' ') AS phrase,
           |    CAST(count(*) AS BIGINT) AS plen
           |  FROM sgk WHERE NOT is_stop
           |  GROUP BY doc_id, seg HAVING count(*) <= 3),
           |wsk AS (
           |  SELECT w,
           |    CAST(round(CAST(sum(plen) AS DOUBLE) * 1e6 / count(*))
           |      AS BIGINT) AS wscore_micro
           |  FROM (SELECT unnest(string_split(phrase, ' ')) AS w, plen
           |        FROM phk)
           |  GROUP BY 1),
           |dpk AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ
           |        FROM phk GROUP BY 1),
           |sck AS (
           |  SELECT phrase, n_occ,
           |    CAST(sum(wscore_micro) AS BIGINT) AS score_micro
           |  FROM (SELECT phrase, n_occ,
           |          unnest(string_split(phrase, ' ')) AS w FROM dpk)
           |  JOIN wsk USING (w)
           |  GROUP BY 1, 2)""".stripMargin)(
        """SELECT CAST(row_number() OVER (
          |    ORDER BY score_micro DESC, phrase) AS INT) AS rank,
          |  phrase, n_occ,
          |  round(CAST(score_micro AS DOUBLE) / 1e6, 6) AS rake_score
          |FROM sck ORDER BY score_micro DESC, phrase LIMIT 40""".stripMargin)) {
      (s, dir) =>
        TextAnalysis.rakeKeywords(W.read(s, dir, "documents"), k = 40)
    },

    // last-touch attribution: each purchase attributed to the LATEST
    // view at-or-before it by the same user, within 24 h — the certified
    // backward as-of join plus a window filter (the marketing twin of
    // j8's DDL-state lookup). Views reduce to one row per (user, ts)
    // first (max-id tie-break) so "latest" is well-defined.
    QueryDef("j15_attribution",
      """WITH pch AS (
        |  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us,
        |    round(value, 6) AS p_value
        |  FROM events WHERE event_type = 'purchase'),
        |vw AS (
        |  SELECT user_id, epoch_us(ts) AS v_us, max(event_id) AS v_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT pch.p_id, pch.user_id, pch.p_us, vw.v_id, vw.v_us,
        |  pch.p_value
        |FROM pch ASOF JOIN vw
        |  ON pch.user_id = vw.user_id AND pch.p_us >= vw.v_us
        |WHERE pch.p_us - vw.v_us <= 86400000000""".stripMargin) {
      (s, dir) => {
        val ev = W.read(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"),
            col("us").as("p_us"), round(col("value"), 6).as("p_value"))
        val views = graft.operators.AsOfJoin.latestPerKeyTs(
          ev.filter(col("event_type") === "view")
            .select(col("user_id"), col("us").as("v_us"),
              col("event_id").as("v_id")),
          Seq("user_id"), "v_us", "v_id")
        graft.operators.AsOfJoin.asOf(purchases, views,
            Seq("user_id"), "p_us", "v_us")
          .filter(col("v_us").isNotNull &&
            col("p_us") - col("v_us") <= 86400000000L)
          .select(col("p_id"), col("user_id"), col("p_us"),
            col("v_id"), col("v_us"), col("p_value"))
      }
    },

    // hourly event-rate anomaly: per type, each hour's count z-scored
    // against the previous 24 observed hours. The z is computed from
    // INTEGER window sums only — z = (24·x − Σ)/√(24·Σx² − Σ²) — one
    // identical IEEE expression in both engines; the window runs over
    // the (types × hours)-sized aggregate, never the event stream.
    QueryDef("report_event_anomaly",
      """WITH hc AS (
        |  SELECT event_type,
        |    3600 * (epoch_us(ts) // 3600000000) AS hr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |wz AS (
        |  SELECT event_type, hr, n,
        |    sum(n) OVER tw AS s, sum(n * n) OVER tw AS sq,
        |    count(*) OVER tw AS m
        |  FROM hc
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hr, n,
        |  round(CAST(s AS DOUBLE) / 24, 6) AS mean24,
        |  CASE WHEN 24 * sq - s * s <= 0 THEN 0.0
        |    ELSE round((24 * n - s) / sqrt(CAST(24 * sq - s * s
        |      AS DOUBLE)), 6) END AS z,
        |  (24 * sq - s * s > 0 AND
        |   abs((24 * n - s) / sqrt(CAST(24 * sq - s * s AS DOUBLE))) > 3.0)
        |    AS is_anomaly
        |FROM wz WHERE m = 24""".stripMargin) {
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
        val hc = W.read(s, dir, "events")
          .groupBy(col("event_type"),
            // integer `div`, not `/`: Spark's `/` on longs is DOUBLE
            // division, whose rounding can bump a just-below-integer
            // quotient across the truncation boundary
            expr("3600 * (" + graft.pipeline.Recency.floorDivSql("unix_micros(ts)", 3600000000L) + ")").as("hr"))
          .agg(count(lit(1)).as("n"))
        val rawZ = (lit(24) * col("n") - col("s")).cast("double") /
          sqrt((lit(24) * col("sq") - col("s") * col("s")).cast("double"))
        hc.withColumn("s", sum(col("n")).over(w))
          .withColumn("sq", sum(col("n") * col("n")).over(w))
          .withColumn("m", count(lit(1)).over(w))
          .filter(col("m") === 24)
          .select(col("event_type"), col("hr"), col("n"),
            round(col("s").cast("double") / 24, 6).as("mean24"),
            when(lit(24) * col("sq") - col("s") * col("s") <= 0, 0.0)
              .otherwise(round(rawZ, 6)).as("z"),
            (lit(24) * col("sq") - col("s") * col("s") > 0 &&
              abs(rawZ) > 3.0).as("is_anomaly"))
      }
    },

    // hopping (sliding-tumbling) window: 1 h length, 15 min slide —
    // every event lands in exactly 4 windows. Per-row values quantize
    // to integer micros before the sum, so the overlapping aggregates
    // are exact in any accumulation order (the w-family discipline).
    QueryDef("w5_hopping_window",
      """SELECT w_start_epoch,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS DOUBLE)
        |    / 1e6, 6) AS sum_value
        |FROM (
        |  SELECT 900 * ((epoch_us(ts) // 900000000) - k) AS w_start_epoch,
        |    value
        |  FROM events, (SELECT unnest(generate_series(0, 3)) AS k))
        |GROUP BY 1""".stripMargin) {
      (s, dir) =>
        W.read(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"),
            sum(round(col("value") * 1e6).cast("long")).as("vm"))
          .select(unix_timestamp(col("w.start")).as("w_start_epoch"),
            col("n_events"),
            round(col("vm").cast("double") / 1e6, 6).as("sum_value"))
    },

    // per-source curation scorecard: dup inflation ⋈ cluster leakage ⋈
    // garbage rate ⋈ mean quality — the oracle replays all four
    // certified components and the join, so the COMPOSITION hash-matches
    // (the pipe_quality_chain discipline).
    QueryDef("pipe_curation_report",
      "WITH RECURSIVE " + ccCtes + ",\n" +
        s"""clus AS (
           |  SELECT id AS doc_id, least(id, min(other)) AS cluster_id
           |  FROM reach GROUP BY id),
           |memq AS (
           |  SELECT d.doc_id, d.source,
           |    coalesce(c.cluster_id, d.doc_id) AS cluster_id
           |  FROM documents d LEFT JOIN clus c USING (doc_id)),
           |spanq AS (
           |  SELECT cluster_id, count(DISTINCT source) AS n_sources
           |  FROM memq GROUP BY 1),
           |cpq AS (
           |  SELECT source,
           |    round(CAST(sum(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)
           |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS cross_frac
           |  FROM memq JOIN spanq USING (cluster_id) GROUP BY 1),
           |fpq AS (
           |  SELECT doc_id, source,
           |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
           |      AS fingerprint,
           |    CAST(len(toks) AS BIGINT) AS n_tok
           |  FROM tok_docs),
           |kq AS (SELECT fingerprint, min(doc_id) AS keep
           |       FROM fpq GROUP BY 1),
           |diq AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           |    round(CAST(sum(CASE WHEN doc_id <> keep THEN n_tok ELSE 0 END)
           |      AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE), 6)
           |      AS dup_token_frac
           |  FROM fpq JOIN kq USING (fingerprint) GROUP BY 1),
           |gqq AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(CASE WHEN $isGarbageSql THEN 1 ELSE 0 END)
           |      AS BIGINT) AS ng,
           |    CAST(sum(CAST(round($qualityScoreSql * 1e6) AS BIGINT))
           |      AS BIGINT) AS qm
           |  FROM tok_docs GROUP BY 1)
           |SELECT diq.source, diq.n_docs, diq.n_tokens, diq.dup_token_frac,
           |  cpq.cross_frac,
           |  round(CAST(gqq.ng AS DOUBLE) / CAST(gqq.n AS DOUBLE), 6)
           |    AS garbage_frac,
           |  round(CAST(gqq.qm AS DOUBLE) / (CAST(gqq.n AS DOUBLE) * 1e6), 6)
           |    AS avg_quality
           |FROM diq JOIN cpq USING (source) JOIN gqq USING (source)""".stripMargin) {
      (s, dir) => {
        val docs = W.read(s, dir, "documents")
        // standing cluster state: the scorecard composes four reports
        // over the labeling — production reads persisted labels
        CorpusReport.curationScorecard(docs, Standing.ccLabels(s, dir))
      }
    },

    QueryDef("samp_percentile_gate",
      withC(tokDocs + ",\n" + qualityCte + ",\n" +
        """rq AS (
          |  SELECT doc_id, quality_score, row_number() OVER (
          |    ORDER BY quality_score DESC, doc_id) AS q_rank FROM q),
          |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q)""".stripMargin)(
        s"""SELECT doc_id, quality_score, q_rank,
           |  round(CAST(q_rank AS DOUBLE) / CAST(n AS DOUBLE), 6)
           |    AS pct_rank
           |FROM rq, nn
           |WHERE q_rank <= CAST(ceil($gateP * n) AS BIGINT)""".stripMargin)) {
      (s, dir) =>
        Sampling.percentileGate(W.read(s, dir, "documents"), p = gateP)
    },

    QueryDef("report_pii_profile", {
      val email = TextAnalysis.emailRe
      val ip = TextAnalysis.ipv4Re
      val phone = TextAnalysis.phoneRe
      s"""WITH pi AS (
         |  SELECT source,
         |    CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS ne,
         |    CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS ni,
         |    CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS np
         |  FROM (SELECT source, ${PipelineQueries2.duckInjected} AS t
         |        FROM documents))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_with_pii,
         |  CAST(sum(ne) AS BIGINT) AS n_emails,
         |  CAST(sum(ni) AS BIGINT) AS n_ips,
         |  CAST(sum(np) AS BIGINT) AS n_phones,
         |  round(CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END)
         |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS pii_doc_frac
         |FROM pi GROUP BY 1""".stripMargin
    }) { (s, dir) =>
      CorpusReport.piiProfile(
        W.read(s, dir, "documents")
          .select(col("source"), PipelineQueries2.sparkInjected.as("t")),
        textCol = "t")
    },

    // the monitor certifies against the SAME per-doc flags as
    // t_ocr_garbage (shared SQL fragments above); epoch-window keys and
    // the synthesized ingest_ts follow the st_quality_monitor convention
    QueryDef("st_garbage_monitor",
      withC(tokDocs + ",\n" +
        s"""gd AS (
           |  SELECT 3600 * (($gmEpoch + (doc_id * 37) % $gmSpreadS)
           |      // 3600) AS w_start_epoch,
           |    $symFracSql AS sym_frac,
           |    $isGarbageSql AS is_garbage
           |  FROM tok_docs)""".stripMargin)(
        """SELECT w_start_epoch,
          |  CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(CASE WHEN is_garbage THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_garbage,
          |  round(CAST(sum(CASE WHEN is_garbage THEN 1 ELSE 0 END)
          |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS garbage_frac,
          |  round(CAST(sum(CAST(round(sym_frac * 1e6) AS BIGINT)) AS DOUBLE)
          |    / (count(*) * 1e6), 6) AS avg_sym_frac
          |FROM gd GROUP BY 1""".stripMargin)) {
      (s, dir) =>
        graft.streaming.QualityMonitor.garbageRollup(
            W.read(s, dir, "documents").withColumn("ingest_ts",
              timestamp_seconds(
                lit(gmEpoch) + (col("doc_id") * 37) % gmSpreadS)))
          .select(unix_timestamp(col("w_start")).as("w_start_epoch"),
            col("n_docs"), col("n_garbage"), col("garbage_frac"),
            col("avg_sym_frac"))
    },

    // pHash-style media near-dup: the oracle rebuilds the byte-shingle
    // SimHash (hex 4-byte grams, stride 1) with the shared 32-bit vote
    // replay, then the same pigeonhole band join + hamming verify as
    // text SimHash — certifying the multimodal signature end-to-end.
    QueryDef("mm_phash_dedup",
      s"""WITH mg AS (
         |  SELECT DISTINCT doc_id, md5(substr(hx, i * 2 + 1, 8)) AS h
         |  FROM (
         |    SELECT doc_id, hx, unnest(generate_series(0, nb - 4)) AS i
         |    FROM (SELECT doc_id, hex(encode(text)) AS hx,
         |            CAST(octet_length(encode(text)) AS BIGINT) AS nb
         |          FROM documents))),
         |ph AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b)
         |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
         |  FROM (
         |    SELECT doc_id, b,
         |      sum(CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
         |    FROM (
         |      SELECT doc_id,
         |        ${PipelineQueries.simhash32V} AS v,
         |        unnest(generate_series(0, 31)) AS b
         |      FROM mg)
         |    GROUP BY 1, 2)
         |  GROUP BY 1)
         |SELECT doc_a, doc_b, hamming FROM (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |  FROM (SELECT doc_id, simhash, b AS band_idx,
         |          (simhash >> (b * 8)) & 255 AS band_val
         |        FROM ph, (SELECT unnest(generate_series(0, 3)) AS b)) a
         |  JOIN (SELECT doc_id, simhash, b AS band_idx,
         |          (simhash >> (b * 8)) & 255 AS band_val
         |        FROM ph, (SELECT unnest(generate_series(0, 3)) AS b)) b
         |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         |       AND a.doc_id < b.doc_id)
         |WHERE hamming <= 3""".stripMargin) {
      (s, dir) =>
        graft.pipeline.Multimodal.phashPairs(
          graft.pipeline.Multimodal.withMediaColumn(
            W.read(s, dir, "documents")))
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
