package graft.queries

import graft.pipeline.CardSketch
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
    })
}
