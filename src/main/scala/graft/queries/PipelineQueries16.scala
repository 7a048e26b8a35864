package graft.queries

import graft.pipeline.{CardSketch, Dedup}
import graft.sim.{WarehouseSim => W}

/**
 * Round-14 queries: the keyed sliding-sample-quantile twin — both
 * sketch families (HLL and sample-quantile) now expose the
 * per-segment trailing-window shape.
 */
object PipelineQueries16 {

  val defs: Seq[QueryDef] = Seq(

    // Per-event-type rolling 7-day value percentiles (p50/p90) from
    // per-(type, day) bottom-128 hash samples — the keyed twin of
    // card_sample_sliding, completing the per-segment trailing-window
    // shape for the quantile sketch family (card_hll_sliding_by_type
    // is the HLL half). Raw events scan once into keyed daily states;
    // every (type, trailing week) answers from a banded state fold
    // (replication windowLen× over ≤ k·keys STATE rows) + integer
    // positional extraction; the present-day spine is GLOBAL so every
    // type reports over the same window set. The oracle replays
    // sketch, keyed fold, and extraction.
    QueryDef("card_sample_sliding_by_type",
      s"""WITH hin AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
         |    event_id, value, CAST(event_id AS HUGEINT) AS v1
         |  FROM events),
         |${XxhSql.longFoldChain("sq", "hin",
            Seq("event_type", "d", "event_id", "value"), 1)},
         |st AS MATERIALIZED (
         |  SELECT event_type, d, band_hash AS h, event_id AS id, value
         |  FROM (
         |    SELECT event_type, d, band_hash, event_id, value,
         |      row_number() OVER (PARTITION BY event_type, d
         |        ORDER BY band_hash, event_id) AS rk
         |    FROM sqf) WHERE rk <= 128),
         |days AS (SELECT DISTINCT d FROM st),
         |con AS MATERIALIZED (
         |  SELECT s.event_type, s.d + x AS td, s.h, s.id, s.value
         |  FROM st s, (SELECT unnest(generate_series(0, 6)) AS x)),
         |sel AS MATERIALIZED (
         |  SELECT event_type, td, h, id, value FROM (
         |    SELECT c.event_type, c.td, c.h, c.id, c.value,
         |      row_number() OVER (PARTITION BY c.event_type, c.td
         |        ORDER BY c.h, c.id) AS rk
         |    FROM con c JOIN days dd ON dd.d = c.td)
         |  WHERE rk <= 128),
         |q AS (
         |  SELECT event_type, td, value,
         |    row_number() OVER (PARTITION BY event_type, td
         |      ORDER BY value, id) AS rk,
         |    count(*) OVER (PARTITION BY event_type, td) AS n
         |  FROM sel)
         |SELECT event_type, td AS d, CAST(p_milli AS BIGINT) AS p_milli,
         |  value
         |FROM q, (SELECT unnest([500, 900]) AS p_milli)
         |WHERE rk = (p_milli * (n - 1)) // 1000 + 1""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.functions._
        val ev = W.read(s, dir, "events")
          .select(col("event_type"),
            expr(graft.pipeline.Recency.floorDivSql("unix_micros(ts)", 86400000000L)).as("d"),
            col("event_id"), col("value"))
        CardSketch.sampleWindowQuantiles(
          CardSketch.sampleSlidingMerge(
            CardSketch.sampleSketchByGroup(ev, "event_id", Seq("value"),
              Seq("event_type", "d"), k = 128),
            "d", windowLen = 7, k = 128, keyCols = Seq("event_type")),
          "d", "value", Seq(500, 900), keyCols = Seq("event_type"))
    },

    // Read-only near-dup LOOKUP against the standing set-join index:
    // "which admitted documents is this candidate batch a near-dup
    // of?" — the text analogue of the embedding contamination screen.
    // Nothing writes, query×query pairs are not reported; the oracle
    // is the incremental replay with the CORPUS-SIDE frequency order
    // (lookup ranks query prefixes under the index's frozen order,
    // which the old split built) and the candidate join pinned to
    // cross pairs, oriented query-first.
    QueryDef("dedup_setjoin_lookup",
      PipelineQueries.withC(
        """tok_all AS (
          |  SELECT doc_id, regexp_split_to_array(lower(trim(text)),
          |    '\s+') AS toks
          |  FROM documents),
          |tok_docs AS (
          |  SELECT doc_id, toks FROM (
          |    SELECT doc_id, toks, row_number() OVER (
          |      PARTITION BY md5(array_to_string(
          |        list_sort(list_distinct(toks)), ' '))
          |      ORDER BY doc_id) AS crk
          |    FROM tok_all)
          |  WHERE crk = 1),
          |t AS (
          |  SELECT doc_id, unnest(list_distinct(toks)) AS tok
          |  FROM tok_docs),
          |fo AS (SELECT tok, count(*) AS tf FROM t
          |       WHERE doc_id % 10 >= 2 GROUP BY tok),
          |r AS (
          |  SELECT t.doc_id, t.tok,
          |    row_number() OVER (PARTITION BY t.doc_id
          |      ORDER BY coalesce(fo.tf, 0), t.tok) AS pos,
          |    count(*) OVER (PARTITION BY t.doc_id) AS len
          |  FROM t LEFT JOIN fo USING (tok)),
          |p AS MATERIALIZED (
          |  SELECT doc_id, tok, len FROM r
          |  WHERE pos <= len - (700 * len + 999) // 1000 + 1),
          |cand AS MATERIALIZED (
          |  SELECT DISTINCT a.doc_id AS q_id, b.doc_id AS c_id
          |  FROM (SELECT * FROM p WHERE doc_id % 10 < 2) a
          |  JOIN p b ON a.tok = b.tok
          |    AND b.doc_id % 10 >= 2
          |    AND least(a.len, b.len) * 1000
          |        >= 700 * greatest(a.len, b.len)),
          |v AS (
          |  SELECT c.q_id, c.c_id,
          |    len(list_intersect(list_distinct(ta.toks),
          |      list_distinct(tb.toks))) AS inter,
          |    len(list_distinct(ta.toks)) AS na,
          |    len(list_distinct(tb.toks)) AS nb
          |  FROM cand c
          |  JOIN tok_docs ta ON ta.doc_id = c.q_id
          |  JOIN tok_docs tb ON tb.doc_id = c.c_id)""".stripMargin)(
        """SELECT q_id, c_id AS doc_id,
          |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 6)
          |    AS jaccard
          |FROM v WHERE inter * 1000 >= 700 * (na + nb - inter)"""
          .stripMargin)) { (s, dir) =>
      val idx = Standing.ssjOldIndex(s, dir, PipelineQueries15.ssjCanon, "lookup")
      graft.pipeline.SsjIndex.lookup(
        PipelineQueries15.ssjCanon(W.read(s, dir, "documents"))
          .filter(org.apache.spark.sql.functions.col("doc_id") % 10 < 2),
        idx)
    },

    // Incremental connected components: the near-dup CLUSTER STATE
    // folded forward — old pairs' labeling + the batch's new pairs
    // through the condensed meta-graph (sized by the batch and the
    // clusters it touches, never the corpus). The min-id algebra makes
    // the updated state BIT-IDENTICAL to a full recompute over
    // old ∪ new pairs, so the line shares dedup_clusters' recursive
    // transitive-closure oracle — the hash match certifies the
    // condensation argument end to end.
    QueryDef("dedup_clusters_incremental", PipelineQueries.ccOracleSql) {
      (s, dir) =>
        import org.apache.spark.sql.functions.col
        // the old labeling is session-standing STATE (built once, read
        // as parquet): the measured cost is the FOLD — label lookup,
        // meta CC over the condensed batch graph, broadcast remap
        Dedup.connectedComponentsIncremental(
          Standing.ccOldLabels(s, dir),
          Standing.simhashPairs(s, dir).filter(
            col("doc_a") % 10 < 2 || col("doc_b") % 10 < 2))
    })
}
