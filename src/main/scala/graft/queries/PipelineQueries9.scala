package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg
import graft.fs.CompactionPlanner
import graft.operators.{RangeJoin, Scd2}
import graft.pipeline.{CorpusReport, CorpusWriter, TextAnalysis}
import graft.sim.{OracleCtes => C, WarehouseSim => W}

/**
 * Round-8 third batch: the bucketized interval join (`j9`), the SCD2
 * validity-interval build (`j10`), the bounded top-k-per-group native
 * aggregate (`t_topk_native`), and the z-order layout key
 * (`pack_zorder`). Each oracle replays the full computation — DuckDB's
 * native IEJoin answers the range join, a window replay answers the
 * heap aggregate, and the morton interleave is generated from the SAME
 * (bit, dim) enumeration the Spark column expression uses.
 */
object PipelineQueries9 {

  /** Interval width for the j9 incident windows. */
  private val winMinutes = 30
  /** Bucket width for the range-join candidate generator: half the
    * interval length, so each window explodes to ≤ 3 buckets. */
  private val rjBucketSeconds = winMinutes * 60L / 2
  private val topK = 3
  private val zBits = 8
  private val compactTarget = 64000000L
  private val aggStratN = 7
  private val aggSalt = "stratAgg"
  private val tokenBudget = 20000L
  private val binK = 5
  private val binCandMult = 8
  private val budgetBuckets = 256
  private val blockPhrases =
    Seq("table scan", "slow join", "batch batch", "dup")
  /** The identical regex both engines compile (RE2 ∩ java.util.regex
    * semantics for \b + literal alternation). */
  private val blockPattern = blockPhrases.mkString("\\b(", "|", ")\\b")

  /** DuckDB twin of [[CorpusWriter.mortonValue]]: generated from the
    * identical (bit, dim) enumeration so the two engines interleave
    * bit-for-bit the same way. */
  private def mortonSql(cols: Seq[String], bits: Int): String =
    (for { b <- 0 until bits; i <- cols.indices }
      yield s"(((${cols(i)} >> $b) & 1) << ${b * cols.size + i})")
      .mkString(" | ")

  /** DuckDB twin of [[CorpusWriter.zorderValue]]'s linear quantization
    * (same association order: (v-mn) → double, ×scale, ÷(mx-mn)). */
  private def quantSql(v: String, mn: String, mx: String, scale: Long): String =
    s"""CAST(CASE WHEN $mx = $mn THEN 0
       | ELSE least(CAST(floor(CAST($v - $mn AS DOUBLE) * $scale /
       |   CAST($mx - $mn AS DOUBLE)) AS BIGINT), $scale) END AS BIGINT)"""
      .stripMargin.replace("\n", "")

  val defs: Seq[QueryDef] = Seq(

    // J9 — interval (range-overlap) join: every event inside a 30-minute
    // "incident window" opened by each value>200 event of the same type.
    // DuckDB plans the range predicate natively (IEJoin); Spark reduces
    // it to an equi-join on (event_type, time bucket) + exact re-filter
    // (operators/RangeJoin.scala) — no BroadcastNestedLoopJoin anywhere.
    QueryDef("j9_range_join",
      s"""WITH incidents AS (
         |  SELECT event_type, event_id AS incident_id,
         |    ts AS s_ts, ts + INTERVAL $winMinutes MINUTE AS e_ts
         |  FROM events WHERE value > 200)
         |SELECT e.event_type, i.incident_id, count(*) AS n_events,
         |  round(sum(e.value), 6) AS sum_value,
         |  min(epoch_us(e.ts)) AS first_us, max(epoch_us(e.ts)) AS last_us
         |FROM events e JOIN incidents i
         |  ON e.event_type = i.event_type
         | AND e.ts >= i.s_ts AND e.ts < i.e_ts
         |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = W.read(s, dir, "events")
      val incidents = ev.filter(col("value") > 200)
        .select(col("event_type"), col("event_id").as("incident_id"),
          col("ts").as("s_ts"),
          (col("ts") + expr(s"INTERVAL $winMinutes MINUTES")).as("e_ts"))
      RangeJoin.overlapJoin(
          ev.select("event_id", "ts", "event_type", "value"), incidents,
          Seq("event_type"), "ts", "s_ts", "e_ts",
          bucketSeconds = rjBucketSeconds)
        .groupBy("event_type", "incident_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 6).as("sum_value"),
          min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"))
    },

    // J10 — SCD2 history: the events change-log per user folded into
    // validity intervals [effective_from, effective_to). One max-struct
    // dedup + one lead() window (operators/Scd2.scala); the oracle
    // replays both (row_number-desc dedup = max-struct with the unique
    // tie-break leading).
    QueryDef("j10_scd2_history",
      """WITH uniq AS (
        |  SELECT user_id, ts, event_id, event_type AS state, value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) = 1)
        |SELECT user_id, epoch_us(ts) AS from_us,
        |  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS to_us,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL AS is_current,
        |  event_id, state, round(value, 6) AS value
        |FROM uniq""".stripMargin) { (s, dir) =>
      val changes = W.read(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("state"), round(col("value"), 6).as("value"))
      Scd2.buildHistory(changes, Seq("user_id"), "ts", "event_id")
        .select(col("user_id"),
          unix_micros(col("effective_from")).as("from_us"),
          unix_micros(col("effective_to")).as("to_us"),
          col("is_current"), col("event_id"), col("state"), col("value"))
    },

    // Top-k per group as a bounded-heap NATIVE aggregate (functions/
    // TopKAgg): map-side partials carry ≤k rows per group into the
    // exchange — no full per-group sort, no row_number window. The
    // oracle IS that window formulation, so the hash-match certifies
    // the heap + merge path against the textbook semantics.
    QueryDef("t_topk_native",
      s"""SELECT lang,
         |  CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY n_chars DESC, doc_id DESC) AS BIGINT) AS rnk,
         |  n_chars, doc_id
         |FROM documents
         |QUALIFY rnk <= $topK""".stripMargin) { (s, dir) =>
      W.read(s, dir, "documents")
        .groupBy("lang")
        .agg(TopKAgg.topk(s, struct(col("n_chars"), col("doc_id")), topK)
          .as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.n_chars").as("n_chars"), col("col.doc_id").as("doc_id"))
    },

    // Z-order layout key: linear quantization of (n_chars, n_lines)
    // against broadcast global bounds, then the morton interleave. The
    // oracle's interleave SQL is GENERATED from the same (bit, dim)
    // loop as the Spark column expression — bit-for-bit parity.
    QueryDef("pack_zorder", {
      val scale = (1L << zBits) - 1
      s"""WITH d AS (
         |  SELECT doc_id, n_chars,
         |    CAST(length(text) - length(replace(text, chr(10), '')) + 1
         |      AS BIGINT) AS n_lines
         |  FROM documents),
         |b AS (
         |  SELECT min(n_chars) AS mn1, max(n_chars) AS mx1,
         |         min(n_lines) AS mn2, max(n_lines) AS mx2 FROM d),
         |q AS (
         |  SELECT doc_id, n_chars, n_lines,
         |    ${quantSql("n_chars", "mn1", "mx1", scale)} AS q_n_chars,
         |    ${quantSql("n_lines", "mn2", "mx2", scale)} AS q_n_lines
         |  FROM d, b)
         |SELECT doc_id, n_chars, n_lines, q_n_chars, q_n_lines,
         |  ${mortonSql(Seq("q_n_chars", "q_n_lines"), zBits)} AS z_value
         |FROM q""".stripMargin
    }) { (s, dir) =>
      val d = W.read(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "\n", "")) + 1)
            .cast("long").as("n_lines"))
      CorpusWriter.zorderValue(d, Seq("n_chars", "n_lines"), zBits)
    },

    // O6 — small-files compaction plan: contiguous-fill binning of the
    // source manifest at a 64 MB target (fs/CompactionPlanner). The
    // oracle replays the running-sum window + integer division exactly.
    QueryDef("o6_compaction_plan",
      C.withCtes(C.srcFiles)(
        s"""SELECT dir, bin, count(*) AS n_files,
           |  CAST(sum(size) AS BIGINT) AS bytes,
           |  min(rel_path) AS first_file, max(rel_path) AS last_file
           |FROM (
           |  SELECT dir, rel_path, size,
           |    CAST(coalesce(sum(size) OVER (PARTITION BY dir
           |      ORDER BY rel_path
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      // $compactTarget AS BIGINT) AS bin
           |  FROM src_files)
           |GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
      CompactionPlanner.planSummary(W.srcFiles(s, dir), compactTarget)
    },

    // Incremental data card: the corpus split into an "old" slice and a
    // "delta" batch, each reduced to its mergeable stats STATE, states
    // merged, card rendered. The oracle is the single-pass groupBy over
    // the full corpus — the hash-match IS the mergeability theorem
    // (merge(state(A), state(B)) = state(A ∪ B)) for every additive
    // column; the HLL distinct column rides the same state and is
    // envelope-pinned in CorpusReportSpec (sketches are engine-specific).
    QueryDef("report_card_incremental",
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))
        |    AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val docs = W.read(s, dir, "documents")
      val old = docs.filter(col("doc_id") % 3 =!= 0)
      val delta = docs.filter(col("doc_id") % 3 === 0)
      CorpusReport.renderState(CorpusReport.mergeStatsState(
          CorpusReport.statsState(old), CorpusReport.statsState(delta)))
        // sketch-derived columns (distinct estimate, KLL quantiles) are
        // engine-specific — spec-certified, not oracle-compared
        .select("lang", "source", "n_docs", "n_tokens", "n_chars",
          "min_chars", "max_chars")
    },

    // Exact source Venn matrix: |A|, |B|, |A∩B|, |A\B|, |B\A| over
    // distinct content fingerprints for every ordered source pair —
    // the overlap table a mixture designer reads. The theta-sketch
    // twin (Dedup.sourceVennSketch) is envelope-pinned in
    // CorpusReportSpec; this exact path is the certification.
    QueryDef("dedup_source_venn",
      """WITH fs AS (
        |  SELECT DISTINCT
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fpr,
        |    source AS src
        |  FROM documents),
        |t AS (SELECT src, count(*) AS n FROM fs GROUP BY 1),
        |c AS (
        |  SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_common
        |  FROM fs a JOIN fs b ON a.fpr = b.fpr AND a.src < b.src
        |  GROUP BY 1, 2)
        |SELECT ta.src AS src_a, tb.src AS src_b, ta.n AS n_a, tb.n AS n_b,
        |  coalesce(c.n_common, 0) AS n_common,
        |  ta.n - coalesce(c.n_common, 0) AS n_only_a,
        |  tb.n - coalesce(c.n_common, 0) AS n_only_b
        |FROM t ta JOIN t tb ON ta.src < tb.src
        |LEFT JOIN c ON c.src_a = ta.src AND c.src_b = tb.src""".stripMargin) {
      (s, dir) => graft.pipeline.Dedup.sourceVenn(W.read(s, dir, "documents"))
    },

    // §2.5 window family, time-RANGE frame: trailing-hour activity per
    // user (count + value sum over RANGE 1h PRECEDING). Rows-frames
    // (w1) order peers arbitrarily within ties; a RANGE frame is the
    // event-time-correct sliding window — peers at the same timestamp
    // see the same frame in both engines.
    QueryDef("w3_trailing_hour",
      """SELECT user_id, event_id,
        |  CAST(count(*) OVER tw AS BIGINT) AS n_1h,
        |  round(sum(value) OVER tw, 6) AS sum_1h
        |FROM (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events)
        |WINDOW tw AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)""".stripMargin) {
      (s, dir) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-3599999999L, 0L)
        W.read(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("value"),
            unix_micros(col("ts")).as("us"))
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_1h"),
            round(sum("value").over(w), 6).as("sum_1h"))
    },

    // §2.5, session windows via Spark's native session_window (the
    // merging event-time session Structured Streaming uses, run in
    // batch mode): per (user, session) bounds + volumes. The oracle
    // replays the gap-merge with the islands construction (a new
    // session starts when the gap from the previous event EXCEEDS 1h —
    // an event exactly at the previous session's end merges into it,
    // pinned by the CrossCheckSpec boundary fixture; end = last event
    // + gap). w2 certifies the lag-based count; this certifies the
    // native operator's full window bounds.
    QueryDef("w4_session_window",
      """WITH x AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x)
        |SELECT user_id, min(us) AS start_us, max(us) + 3600000000 AS end_us,
        |  count(*) AS n_events, round(sum(value), 6) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      W.read(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "1 hour").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 6).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events"), col("sum_value"))
    },

    // Skew-proof stratified sample: the SAME selection rule as
    // samp_stratified (n smallest id-hashes per stratum) computed with
    // the bounded-heap TopKAgg instead of a row_number window — each
    // map task carries <=n candidates per stratum into the shuffle, so
    // a skewed stratum never becomes one giant window partition. Same
    // oracle formulation; SamplingSpec pins window==heap bit-equality.
    QueryDef("samp_stratified_agg",
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${PipelineQueries2.duckHash32(aggSalt)}, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= $aggStratN""".stripMargin) { (s, dir) =>
      graft.pipeline.Sampling.stratifiedSampleAgg(
          W.read(s, dir, "documents"), "source", aggStratN, "doc_id", aggSalt)
        .select("doc_id", "source")
    },

    // Global label encoding: dense lexicographic codes via a
    // cardinality-bounded codebook + broadcast join-back (the exact
    // sibling of feature hashing). Oracle: dense_rank - 1 over the
    // label ordering — identical assignment, no codebook join needed
    // at DuckDB's scale.
    QueryDef("t_label_encode",
      """SELECT doc_id, source,
        |  CAST(dense_rank() OVER (ORDER BY source) - 1 AS BIGINT)
        |    AS source_code
        |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.labelEncode(W.read(s, dir, "documents"), "source")
        .select("doc_id", "source", "source_code")
    },

    // Join/shuffle skew diagnosis over the events' user key: max/mean
    // skew factor, p99 key size, and the salt factor a manual
    // skew-leveling pass would use (AQE consumes the same signal at
    // runtime). Oracle replays both aggregates and the derived-column
    // arithmetic exactly.
    QueryDef("report_join_skew",
      """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
        |SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |  count(*) AS n_keys, max(c) AS max_key_rows,
        |  round(avg(c), 6) AS avg_key_rows,
        |  round(quantile_cont(c, 0.99), 6) AS p99_key_rows,
        |  round(CAST(max(c) AS DOUBLE) /
        |    (CAST(sum(c) AS DOUBLE) / count(*)), 6) AS skew_factor,
        |  CAST(ceil(CAST(max(c) AS DOUBLE) * count(*) /
        |    CAST(sum(c) AS DOUBLE)) AS BIGINT) AS suggested_salt
        |FROM c""".stripMargin) { (s, dir) =>
      CorpusReport.joinSkewReport(W.read(s, dir, "events"), "user_id")
    },

    // Blocklist phrase screening (C4 bad-words rule as data): one
    // compiled word-boundary alternation per row, codegen'd — the
    // oracle runs the IDENTICAL regex through DuckDB's RE2.
    QueryDef("t_blocklist",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(lower(text),
         |    '$blockPattern', 1)) AS BIGINT) AS n_hits,
         |  len(regexp_extract_all(lower(text), '$blockPattern', 1)) > 0
         |    AS blocked
         |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.blocklistStats(W.read(s, dir, "documents"), blockPhrases)
    },

    // The Aho–Corasick shape of the same screening (functions/
    // MultiMatch, one automaton pass per row, flat in phrase-list
    // size) — SAME oracle as t_blocklist, so the driver gate
    // certifies the automaton's count end to end; MultiMatchSpec
    // separately pins bit-equality and boundary semantics.
    QueryDef("t_blocklist_ac",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(lower(text),
         |    '$blockPattern', 1)) AS BIGINT) AS n_hits,
         |  len(regexp_extract_all(lower(text), '$blockPattern', 1)) > 0
         |    AS blocked
         |FROM documents""".stripMargin) { (s, dir) =>
      TextAnalysis.blocklistStatsAc(W.read(s, dir, "documents"),
        blockPhrases)
    },

    // Per-source length-distribution profile: exact quartiles + p90 +
    // mean — the distribution table the data card's min/max bracket
    // can't show. Exact percentile is the certified path; statsState's
    // KLL quantiles are the mergeable 100-TB form.
    QueryDef("report_length_profile",
      """SELECT source, count(*) AS n_docs,
        |  round(avg(n_chars), 6) AS mean_chars,
        |  round(quantile_cont(n_chars, 0.25), 6) AS p25_chars,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
        |  round(quantile_cont(n_chars, 0.75), 6) AS p75_chars,
        |  round(quantile_cont(n_chars, 0.9), 6) AS p90_chars
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      CorpusReport.lengthProfile(W.read(s, dir, "documents"))
    },

    // J11 — group-limited range join: each event resolved to ONE
    // containing window (the most recently opened; id tie-break) — the
    // overlapJoin composed with a max-struct argmax instead of keeping
    // every overlap. The composition stays two shuffles: the
    // (keys, bucket) equi-join + the per-event argmax aggregate; no
    // window function, no row explosion survives the argmax.
    QueryDef("j11_range_top1",
      s"""WITH incidents AS (
         |  SELECT event_type, event_id AS incident_id,
         |    ts AS s_ts, ts + INTERVAL $winMinutes MINUTE AS e_ts
         |  FROM events WHERE value > 200),
         |m AS (
         |  SELECT e.event_id, e.event_type,
         |    i.incident_id, epoch_us(i.s_ts) AS s_us,
         |    row_number() OVER (PARTITION BY e.event_id
         |      ORDER BY i.s_ts DESC, i.incident_id DESC) AS rn
         |  FROM events e JOIN incidents i
         |    ON e.event_type = i.event_type
         |   AND e.ts >= i.s_ts AND e.ts < i.e_ts)
         |SELECT event_id, event_type, incident_id, s_us
         |FROM m WHERE rn = 1""".stripMargin) { (s, dir) =>
      val ev = W.read(s, dir, "events")
      val incidents = ev.filter(col("value") > 200)
        .select(col("event_type"), col("event_id").as("incident_id"),
          col("ts").as("s_ts"),
          (col("ts") + expr(s"INTERVAL $winMinutes MINUTES")).as("e_ts"))
      RangeJoin.overlapJoin(ev.select("event_id", "ts", "event_type"),
          incidents, Seq("event_type"), "ts", "s_ts", "e_ts",
          bucketSeconds = rjBucketSeconds)
        .groupBy("event_id", "event_type")
        .agg(max(struct(unix_micros(col("s_ts")).as("s_us"),
          col("incident_id"))).as("w"))
        .select(col("event_id"), col("event_type"),
          col("w.incident_id").as("incident_id"), col("w.s_us").as("s_us"))
    },

    // J12 — warehouse drift report: the J1 table diff and J2 partition
    // diff rolled into one per-db action summary (what an operator
    // reads before kicking a replication cycle: how much copy/update/
    // drop work per database, at both granularities). Pure composition
    // of the two certified diffs — one extra keyed aggregate each.
    QueryDef("j12_drift_report",
      C.withCtes(C.srcTables, C.destTables, C.srcPartitions,
        C.destPartitions)(
        """SELECT db, level, action, count(*) AS n
          |FROM (
          |  SELECT coalesce(s.db, d.db) AS db, 'table' AS level,
          |    CASE
          |      WHEN d.tldt IS NULL AND s.tldt IS NOT NULL THEN
          |        CASE WHEN s.partitioned THEN 'COPY_PARTITIONED_TABLE'
          |             ELSE 'COPY_UNPARTITIONED_TABLE' END
          |      WHEN s.tldt IS NULL THEN 'DROP_TABLE'
          |      WHEN s.tldt > d.tldt THEN 'COPY_METADATA'
          |      ELSE 'NO_OP' END AS action
          |  FROM src_tables s FULL OUTER JOIN dest_tables d
          |    ON s.db = d.db AND s.tbl = d.tbl
          |  UNION ALL
          |  SELECT coalesce(s.db, d.db) AS db, 'partition' AS level,
          |    CASE
          |      WHEN d.tldt IS NULL AND s.tldt IS NOT NULL THEN 'COPY_PARTITION'
          |      WHEN s.tldt IS NULL THEN 'DROP_PARTITION'
          |      WHEN s.nfiles <> d.nfiles OR s.bytes <> d.bytes
          |        THEN 'COPY_PARTITION'
          |      WHEN s.tldt > d.tldt THEN 'COPY_METADATA'
          |      ELSE 'NO_OP' END AS action
          |  FROM src_parts s FULL OUTER JOIN dest_parts d
          |    ON s.db = d.db AND s.tbl = d.tbl AND s.part_name = d.part_name)
          |GROUP BY 1, 2, 3""".stripMargin)) { (s, dir) =>
      val td = graft.operators.ReplicationOps
        .tableDiff(W.srcTables(s, dir), W.destTables(s, dir))
        .select(col("db"), lit("table").as("level"), col("action"))
      val pd = graft.operators.ReplicationOps
        .partitionDiff(W.srcPartitions(s, dir), W.destPartitions(s, dir))
        .select(col("db"), lit("partition").as("level"), col("action"))
      td.unionAll(pd).groupBy("db", "level", "action")
        .agg(count(lit(1)).as("n"))
    },

    // O7 — backfill range planner: missing partitions (dest-absent in
    // the certified J2 diff) folded into contiguous date ranges per
    // table — the catch-up plan an operator actually schedules (one
    // backfill job per RANGE, not per day). Gaps-and-islands: ds minus
    // its per-table row_number is constant within a run.
    QueryDef("o7_backfill_ranges",
      C.withCtes(C.srcPartitions, C.destPartitions)(
        """SELECT db, tbl,
          |  strftime(min(ds), '%Y-%m-%d') AS start_ds,
          |  strftime(max(ds), '%Y-%m-%d') AS end_ds,
          |  count(*) AS n_days
          |FROM (
          |  SELECT db, tbl, ds,
          |    ds - CAST(row_number() OVER (PARTITION BY db, tbl
          |      ORDER BY ds) AS INT) AS grp
          |  FROM (
          |    SELECT s.db, s.tbl, CAST(substr(s.part_name, 4) AS DATE) AS ds
          |    FROM src_parts s LEFT JOIN dest_parts d
          |      ON s.db = d.db AND s.tbl = d.tbl
          |     AND s.part_name = d.part_name
          |    WHERE d.tldt IS NULL))
          |GROUP BY db, tbl, grp""".stripMargin)) { (s, dir) =>
      val missing = graft.operators.ReplicationOps
        .partitionDiff(W.srcPartitions(s, dir), W.destPartitions(s, dir))
        .filter(col("dest_tldt").isNull && col("src_tldt").isNotNull)
        .select(col("db"), col("tbl"),
          to_date(substring(col("part_name"), 4, 10)).as("ds"))
      val w = Window.partitionBy("db", "tbl").orderBy("ds")
      missing
        .withColumn("grp", date_sub(col("ds"), row_number().over(w)))
        .groupBy("db", "tbl", "grp")
        .agg(date_format(min("ds"), "yyyy-MM-dd").as("start_ds"),
          date_format(max("ds"), "yyyy-MM-dd").as("end_ds"),
          count(lit(1)).as("n_days"))
        .drop("grp")
    },

    // J13 — CDC snapshot apply: the events change log folded into the
    // latest-wins state with 'error' events as delete tombstones — one
    // max-struct aggregate decides presence AND payload atomically
    // (operators/CdcApply). Completes the state-shape trio: AsOfJoin
    // (state at T), Scd2 (full history), CdcApply (current snapshot).
    QueryDef("j13_cdc_apply",
      """WITH latest AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    event_type AS state, round(value, 6) AS value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, us, event_id, op, state, value
        |FROM latest WHERE rn = 1 AND op <> 'D'""".stripMargin) { (s, dir) =>
      val changes = W.read(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"),
          when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
            .as("op"),
          col("event_type").as("state"), round(col("value"), 6).as("value"))
      graft.operators.CdcApply.snapshot(changes, Seq("user_id"),
        "us", "event_id", "op", "D")
    },

    // Token-budget data selection: the best ~B tokens by quality score
    // WITHOUT a global sort — value-quantized quality buckets, whole
    // buckets decided at scan speed, the exact running-sum cut only
    // inside the single boundary bucket. The oracle replays all three
    // phases with the identical quantization and window arithmetic.
    QueryDef("samp_budget_select", {
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
         |      AS BIGINT) AS n_tokens,
         |    round(0.5 * least(1.0,
         |        CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
         |          AS DOUBLE) / 100.0)
         |      + 0.5 * (CAST(len(regexp_extract_all(lower(text), '[a-z]'))
         |          AS DOUBLE) / CAST(n_chars AS DOUBLE)), 6) AS quality
         |  FROM documents),
         |d AS (
         |  SELECT *, least(CAST(floor(quality * $budgetBuckets) AS BIGINT),
         |    ${budgetBuckets - 1}) AS bkt FROM scored),
         |pb AS (SELECT bkt, sum(n_tokens) AS btoks FROM d GROUP BY 1),
         |mk AS (
         |  SELECT bkt, btoks,
         |    coalesce(sum(btoks) OVER (ORDER BY bkt DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
         |  FROM pb),
         |cut AS (
         |  SELECT bkt AS cut_b, $tokenBudget - above AS rem FROM mk
         |  WHERE above < $tokenBudget AND above + btoks >= $tokenBudget)
         |SELECT doc_id, bkt, quality, n_tokens FROM d
         |WHERE bkt IN (SELECT bkt FROM mk WHERE above + btoks < $tokenBudget)
         |UNION ALL
         |SELECT doc_id, bkt, quality, n_tokens FROM (
         |  SELECT d.*, sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, rem
         |  FROM d JOIN cut ON d.bkt = cut.cut_b)
         |WHERE cum <= rem""".stripMargin
    }) { (s, dir) =>
      val scored = W.read(s, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
          round(lit(0.5) * least(lit(1.0),
              size(TextAnalysis.tokens(col("text"))).cast("double") / 100.0)
            + lit(0.5) * (regexp_count(lower(col("text")), lit("[a-z]"))
              .cast("double") / col("n_chars").cast("double")), 6)
            .as("quality"))
      graft.pipeline.Sampling.tokenBudgetSelect(scored, tokenBudget,
        budgetBuckets)
    },

    // Binary sign-sketch ANN (Charikar SRP with coordinate planes):
    // one 64-bit word per vector, Hamming pre-rank, exact rescore of
    // the candMult*k survivors. The oracle builds the IDENTICAL
    // bit-packing (1<<d terms generated from the same loop) and
    // replays pre-rank + rescore end to end.
    QueryDef("sim_topk_binary", {
      val packTerms = (0 until 64).map { d =>
        // DuckDB's checked shift refuses 1<<63; the sign bit is written
        // as the explicit two's-complement literal (== Spark's 1L<<63)
        val bit = if (d == 63) "(-9223372036854775807 - 1)"
          else s"(CAST(1 AS BIGINT) << $d)"
        s"CASE WHEN v[${d + 1}] > 0 THEN $bit ELSE 0 END"
      }.mkString(" | ")
      val dcos = "list_sum(list_transform(generate_series(1, len(q.v)), " +
        "i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm)"
      s"""WITH e AS (
         |  SELECT vec_id, label, v,
         |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
         |  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |        FROM embeddings)),
         |ben AS (SELECT vec_id, label, v, nrm FROM e WHERE nrm > 0),
         |bsk AS (SELECT vec_id, ($packTerms) AS sk FROM ben),
         |bcand AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY bit_count(xor(qs.sk, cs.sk)), c.vec_id) AS crk
         |    FROM (SELECT * FROM ben WHERE vec_id < 8) q
         |    JOIN ben c ON c.label = q.label AND c.vec_id <> q.vec_id
         |    JOIN bsk qs ON qs.vec_id = q.vec_id
         |    JOIN bsk cs ON cs.vec_id = c.vec_id)
         |  WHERE crk <= ${binCandMult * binK})
         |SELECT q_id, c_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT bcand.q_id, bcand.c_id,
         |    round($dcos, 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY bcand.q_id
         |      ORDER BY round($dcos, 6) DESC, bcand.c_id) AS rank
         |  FROM bcand JOIN ben q ON q.vec_id = bcand.q_id
         |             JOIN ben c ON c.vec_id = bcand.c_id)
         |WHERE rank <= $binK""".stripMargin
    }) { (s, dir) =>
      val e = W.read(s, dir, "embeddings")
      graft.pipeline.Similarity.binaryTopK(
          e.filter(col("vec_id") < 8), e, binK, binCandMult)
        .select("q_id", "c_id", "cos_sim", "rank")
    }
  )
}
