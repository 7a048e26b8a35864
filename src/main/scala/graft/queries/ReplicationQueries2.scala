package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions._
import graft.planner.DiffPlanner
import graft.sim.{OracleCtes => C, WarehouseSim => W}

/** Second coverage batch: scalar functions (F1-F12), sorts/top-k (O4/O5),
  * window/running aggregations, streaming-offset semantics (ST2), lag
  * metric (A10), multi-root unions (U2), common-ancestor agg (A5). */
object ReplicationQueries2 {

  val defs: Seq[QueryDef] = Seq(

    // F1 — TSV plan-row codec with NULL sentinel.
    QueryDef("f1_tsv_codec",
      C.withCtes(C.srcTables)(
        """SELECT db, tbl,
          |  concat_ws(chr(9), coalesce(CAST(db AS VARCHAR), 'NULL'),
          |    coalesce(CAST(tbl AS VARCHAR), 'NULL'),
          |    coalesce(CAST(tldt AS VARCHAR), 'NULL'),
          |    coalesce(CASE WHEN partitioned THEN 'p' END, 'NULL')) AS tsv,
          |  CAST(split_part(concat_ws(chr(9),
          |    coalesce(CAST(db AS VARCHAR), 'NULL'),
          |    coalesce(CAST(tbl AS VARCHAR), 'NULL'),
          |    coalesce(CAST(tldt AS VARCHAR), 'NULL'),
          |    coalesce(CASE WHEN partitioned THEN 'p' END, 'NULL')),
          |    chr(9), 3) AS BIGINT) AS decoded_tldt
          |FROM src_tables""".stripMargin)) {
      (s, dir) => {
        val tsv = tsvEncode(col("db"), col("tbl"), col("tldt"),
          when(col("partitioned"), lit("p")))
        W.srcTables(s, dir).select(col("db"), col("tbl"), tsv.as("tsv"),
          tsvField(tsv, 2).cast("long").as("decoded_tldt"))
      }
    },

    // F3 — partition-name codec: extract key values back out.
    QueryDef("f3_part_name_codec",
      C.withCtes(C.srcPartitions)(
        """SELECT db, tbl, part_name,
          |  regexp_extract(part_name, '(?:^|/)ds=([^/]*)', 1) AS ds_value,
          |  'ds=' || regexp_extract(part_name, '(?:^|/)ds=([^/]*)', 1) AS rebuilt
          |FROM src_parts""".stripMargin)) {
      (s, dir) =>
        W.srcPartitions(s, dir).select(col("db"), col("tbl"), col("part_name"),
          partNameValue(col("part_name"), "ds").as("ds_value"),
          concat(lit("ds="), partNameValue(col("part_name"), "ds")).as("rebuilt"))
    },

    // F4 — exchange-partition SQL regex parse.
    QueryDef("f4_exchange_parse",
      C.withCtes(C.auditLog)(
        """SELECT id, cmd,
          |  regexp_extract(cmd, '(?i)alter\s+table\s+(\S+)\s+exchange\s+partition', 1)
          |    AS src_table,
          |  regexp_extract(cmd, '(?i)partition\s*\(([^)]*)\)', 1) AS part_spec,
          |  regexp_extract(cmd, '(?i)with\s+table\s+(\S+)', 1) AS dest_table
          |FROM (
          |  SELECT id, 'ALTER TABLE ' || db || '.' || tbl
          |    || ' EXCHANGE PARTITION (ds=2024-01-01) WITH TABLE '
          |    || db || '.x_' || tbl AS cmd
          |  FROM audit_log WHERE command_type = 'QUERY')""".stripMargin)) {
      (s, dir) => {
        val cmds = W.auditLog(s, dir).filter(col("command_type") === "QUERY")
          .select(col("id"), concat(lit("ALTER TABLE "), col("db"), lit("."),
            col("tbl"), lit(" EXCHANGE PARTITION (ds=2024-01-01) WITH TABLE "),
            col("db"), lit(".x_"), col("tbl")).as("cmd"))
        cmds.select(col("id"), col("cmd"),
          exchangePartitionSource(col("cmd")).as("src_table"),
          exchangePartitionSpec(col("cmd")).as("part_spec"),
          exchangePartitionDest(col("cmd")).as("dest_table"))
      }
    },

    // F9 — last-modified resolution: max(TLDT, TLMT) parsed from a params map.
    QueryDef("f9_tldt_max",
      C.withCtes(C.srcTables)(
        """SELECT db, tbl,
          |  greatest(tldt, tldt - p_partkey % 50) AS last_modified
          |FROM src_tables""".stripMargin)) {
      (s, dir) => {
        val t = W.srcTables(s, dir)
          .withColumn("params", map(
            lit(graft.model.TableMeta.Tldt), col("tldt").cast("string"),
            lit(graft.model.TableMeta.Tlmt),
            (col("tldt") - col("p_partkey") % 50).cast("string")))
        t.select(col("db"), col("tbl"),
          lastModified(col("params")).as("last_modified"))
      }
    },

    // F11 — exponential backoff table.
    QueryDef("f11_backoff",
      """SELECT attempt,
        |  least(3600000, 2000 * (CAST(1 AS BIGINT) << CAST(attempt AS INT)))
        |    AS backoff_ms
        |FROM (SELECT unnest(generate_series(0, 11)) AS attempt)""".stripMargin) {
      (s, dir) => {
        import s.implicits._
        s.range(0, 12).select(col("id").as("attempt"),
          backoffMs(col("id")).as("backoff_ms"))
      }
    },

    // F2/F12 — path builder + relativize + subdir test.
    QueryDef("f2_f12_path_ops",
      C.withCtes(C.srcPartitions)(
        """SELECT db, tbl, part_name,
          |  'hdfs://src-wh' || '/' || db || '/' || tbl || '/' || part_name AS full_path,
          |  db || '/' || tbl || '/' || part_name AS rel,
          |  true AS in_warehouse
          |FROM src_parts""".stripMargin)) {
      (s, dir) => {
        val full = pathJoin(lit("hdfs://src-wh"), col("db"), col("tbl"), col("part_name"))
        W.srcPartitions(s, dir).select(col("db"), col("tbl"), col("part_name"),
          full.as("full_path"),
          relPath(full, "hdfs://src-wh").as("rel"),
          isSubdir(full, "hdfs://src-wh").as("in_warehouse"))
      }
    },

    // O4 — retired-jobs ring buffer: keep the latest 200.
    QueryDef("o4_retired_ring",
      C.withCtes(C.auditLog)(
        """SELECT id, command_type FROM audit_log
          |ORDER BY id DESC LIMIT 200""".stripMargin)) {
      (s, dir) =>
        W.auditLog(s, dir).orderBy(col("id").desc).limit(200)
          .select("id", "command_type")
    },

    // O5/F8 — hash-bucket load balancing (md5-bucket so the oracle can
    // mirror it; production path uses Murmur3 `hash()` / repartition).
    QueryDef("o5_hash_balance",
      C.withCtes(C.srcFiles)(
        """SELECT bucket, count(*) AS n_files FROM (
          |  SELECT ((strpos('0123456789abcdef', substr(md5(rel_path), 1, 1)) - 1) * 16
          |    + (strpos('0123456789abcdef', substr(md5(rel_path), 2, 1)) - 1)) % 32
          |    AS bucket
          |  FROM src_files)
          |GROUP BY 1""".stripMargin)) {
      (s, dir) =>
        W.srcFiles(s, dir)
          .select(md5Bucket(col("rel_path"), 32).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_files"))
    },

    // A5 — common-ancestor directory per table over its partition
    // locations, via the distributive Aggregator (oracle exploits the
    // fixed location shape: >1 partition ⇒ the table dir, 1 ⇒ itself).
    QueryDef("a5_common_dir",
      C.withCtes(C.srcPartitions)(
        """SELECT db, tbl, count(*) AS n_parts,
          |  CASE WHEN count(*) > 1 THEN 'hdfs://src-wh/' || db || '/' || tbl
          |       ELSE min('hdfs://src-wh/' || db || '/' || tbl || '/' || part_name)
          |  END AS common_dir
          |FROM src_parts GROUP BY 1, 2""".stripMargin)) {
      (s, dir) => {
        val ca = udaf(DiffPlanner.CommonAncestorAgg,
          org.apache.spark.sql.Encoders.STRING)
        W.srcPartitions(s, dir)
          .withColumn("loc", concat(lit("hdfs://src-wh/"), col("db"), lit("/"),
            col("tbl"), lit("/"), col("part_name")))
          .groupBy("db", "tbl")
          .agg(count(lit(1)).as("n_parts"), ca(col("loc")).as("common_dir"))
      }
    },

    // ST2 — streaming offsets: max persisted id per 10-second bucket
    // (the watermark the incremental server advances).
    QueryDef("st2_offset_buckets",
      C.withCtes(C.auditLog)(
        """SELECT epoch_us(create_time) // 10000000 AS bucket,
          |  max(id) AS max_id, count(*) AS n
          |FROM audit_log GROUP BY 1""".stripMargin)) {
      (s, dir) =>
        W.auditLog(s, dir)
          .groupBy(expr(graft.pipeline.Recency.floorDivSql(
            "unix_micros(create_time)", 10000000L)).as("bucket"))
          .agg(max("id").as("max_id"), count(lit(1)).as("n"))
    },

    // §2.5 — running aggregation window (sequential per-key fold).
    QueryDef("w1_running_agg",
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS seq
        |FROM events""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(expr("unix_micros(ts)"), col("event_id"))
        W.read(s, dir, "events").select(col("user_id"), col("event_id"),
          round(sum("value").over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)), 6).as("running_value"),
          row_number().over(w).cast("long").as("seq"))
      }
    },

    // §2.5 — sessionization via lag(): gap > 1h starts a new session.
    QueryDef("w2_sessionize",
      """SELECT user_id,
        |  CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 3600000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events)
        |GROUP BY 1""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(expr("unix_micros(ts)"), col("event_id"))
        W.read(s, dir, "events")
          .select(col("user_id"), expr("unix_micros(ts)").as("us"),
            lag(expr("unix_micros(ts)"), 1).over(w).as("prev_us"))
          .groupBy("user_id")
          .agg(sum(when(col("prev_us").isNull ||
              col("us") - col("prev_us") > 3600000000L, 1).otherwise(0))
            .cast("long").as("n_sessions"),
            count(lit(1)).as("n_events"))
      }
    },

    // A10 — replication-lag metric: oldest in-flight age per command type.
    QueryDef("a10_job_lag",
      C.withCtes(C.auditLog)(
        """SELECT command_type,
          |  min(id) AS oldest_id,
          |  CAST((max(epoch_us(create_time)) - min(epoch_us(create_time)))
          |    // 1000000 AS BIGINT) AS span_s
          |FROM audit_log
          |WHERE command_type <> 'SHOWTABLES'
          |GROUP BY 1""".stripMargin)) {
      (s, dir) =>
        W.auditLog(s, dir).filter(col("command_type") =!= "SHOWTABLES")
          .groupBy("command_type")
          .agg(min("id").as("oldest_id"),
            expr("(max(unix_micros(create_time)) - min(unix_micros(create_time))) div 1000000")
              .as("span_s"))
    },

    // U2 — multi-root listing union with root tags.
    QueryDef("u2_multi_root_union",
      C.withCtes(C.srcFiles, C.destFiles)(
        """SELECT root, count(*) AS n_files,
          |  count(DISTINCT rel_path) AS n_paths,
          |  CAST(sum(size) AS BIGINT) AS total_bytes
          |FROM (
          |  SELECT 'root1' AS root, rel_path, size FROM src_files
          |  UNION ALL
          |  SELECT 'root2' AS root, rel_path, size FROM dest_files)
          |GROUP BY 1""".stripMargin)) {
      (s, dir) =>
        W.srcFiles(s, dir).select(lit("root1").as("root"), col("rel_path"), col("size"))
          .unionAll(W.destFiles(s, dir)
            .select(lit("root2").as("root"), col("rel_path"), col("size")))
          .groupBy("root")
          .agg(count(lit(1)).as("n_files"),
            countDistinct("rel_path").as("n_paths"),
            sum("size").as("total_bytes"))
    },

    // J8 — as-of (point-in-time) lookup: each QUERY audit entry joined to
    // the latest CREATETABLE for the same db at or before its timestamp
    // ("what was the last DDL state when this query ran"). DuckDB replays
    // it with a native ASOF LEFT JOIN; Spark runs the union-merge window
    // shape in operators/AsOfJoin.scala — one key shuffle, no range
    // explosion. The right side is reduced to one row per (db, ts) first
    // (max-id wins) so "the latest row at a timestamp" is well-defined in
    // both engines.
    QueryDef("j8_asof_lookup",
      C.withCtes(C.auditLog)(
        """SELECT q.q_id, q.db, q.q_us, ct.ct_id, ct.ct_us,
          |  round(ct.ct_value, 6) AS ct_value
          |FROM (
          |  SELECT id AS q_id, db, epoch_us(create_time) AS q_us
          |  FROM audit_log WHERE command_type = 'QUERY') q
          |ASOF LEFT JOIN (
          |  SELECT db, epoch_us(create_time) AS ct_us,
          |    max(id) AS ct_id, round(max_by(value, id), 6) AS ct_value
          |  FROM audit_log WHERE command_type = 'CREATETABLE'
          |  GROUP BY 1, 2) ct
          |ON q.db = ct.db AND q.q_us >= ct.ct_us""".stripMargin)) {
      (s, dir) => {
        val audit = W.auditLog(s, dir)
          .withColumn("us", expr("unix_micros(create_time)"))
        val q = audit.filter(col("command_type") === "QUERY")
          .select(col("db"), col("id").as("q_id"), col("us").as("q_us"))
        val ct = graft.operators.AsOfJoin.latestPerKeyTs(
          audit.filter(col("command_type") === "CREATETABLE")
            .select(col("db"), col("us").as("ct_us"),
              col("id").as("ct_id"), round(col("value"), 6).as("ct_value")),
          Seq("db"), "ct_us", "ct_id")
        graft.operators.AsOfJoin.asOf(q, ct, Seq("db"), "q_us", "ct_us")
          .select(col("q_id"), col("db"), col("q_us"),
            col("ct_id"), col("ct_us"), col("ct_value"))
      }
    }
  )
}
