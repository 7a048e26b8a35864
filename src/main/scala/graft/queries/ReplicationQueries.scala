package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.ReplicationOps
import graft.sim.{OracleCtes => C, WarehouseSim => W}

/**
 * The replication-engine operator surface as oracle-checked queries over the
 * simulated warehouse (SURVEY.md §2.1-§2.7 + §2.9). Query names carry the
 * SURVEY operator IDs they cover.
 */
object ReplicationQueries {

  val defs: Seq[QueryDef] = Seq(

    // S1/S2 — catalog inventory scan (enumerate all tables of the source
    // warehouse). Reference: MetastoreScanInputFormat.java:37-147.
    QueryDef("s1_catalog_scan",
      C.withCtes(C.srcTables)(
        "SELECT db, tbl, tldt, location, partitioned FROM src_tables")) {
      (s, dir) =>
        W.srcTables(s, dir).select("db", "tbl", "tldt", "location", "partitioned")
    },

    // S2 — table-list file scan: `db.table` lines parsed to (db, tbl).
    // The sim derives the "file" from the inventory; production reads
    // spark.read.textFile (BatchReplication.tableList).
    QueryDef("s2_table_list",
      C.withCtes(C.srcTables)(
        """SELECT split_part(line, '.', 1) AS db, split_part(line, '.', 2) AS tbl
          |FROM (SELECT db || '.' || tbl AS line FROM src_tables)""".stripMargin)) {
      (s, dir) =>
        W.srcTables(s, dir)
          .select(concat(col("db"), lit("."), col("tbl")).as("line"))
          .select(split_part(col("line"), lit("."), lit(1)).as("db"),
            split_part(col("line"), lit("."), lit(2)).as("tbl"))
    },

    // F5 — JSON list codec round-trip: partition lists encode to JSON for
    // the state row, decode back for execution (the reference's
    // src_partitions JSON columns, ReplicationUtils.java:204-258).
    QueryDef("f5_json_codec",
      C.withCtes(C.srcPartitions)(
        """SELECT db, tbl, parts_json,
          |  CAST(json_array_length(parts_json) AS INT) AS n_parts
          |FROM (SELECT db, tbl, to_json(list_sort(list(part_name))) AS parts_json
          |      FROM src_parts GROUP BY 1, 2)""".stripMargin)) {
      (s, dir) =>
        W.srcPartitions(s, dir)
          .groupBy("db", "tbl")
          .agg(graft.functions.jsonEncodeList(
            sort_array(collect_list(col("part_name")))).as("parts_json"))
          .select(col("db"), col("tbl"), col("parts_json"),
            size(graft.functions.jsonDecodeList(col("parts_json"))).as("n_parts"))
    },

    // F10 — UTC job-start stamp formatting.
    QueryDef("f10_timestamp_format",
      C.withCtes(C.auditLog)(
        """SELECT id, strftime(create_time, '%Y-%m-%d %H:%M:%S') AS start_stamp
          |FROM audit_log WHERE command_type = 'CREATETABLE'""".stripMargin)) {
      (s, dir) =>
        W.auditLog(s, dir).filter(col("command_type") === "CREATETABLE")
          .select(col("id"),
            graft.functions.utcStamp(col("create_time")).as("start_stamp"))
    },

    // S3 — partition-name scan per table.
    QueryDef("s3_partition_scan",
      C.withCtes(C.srcPartitions)(
        "SELECT db, tbl, part_name, nfiles, bytes, tldt FROM src_parts")) {
      (s, dir) =>
        W.srcPartitions(s, dir).select("db", "tbl", "part_name", "nfiles", "bytes", "tldt")
    },

    // J1 — table-inventory full-outer diff → replication actions.
    QueryDef("j1_table_diff",
      C.withCtes(C.srcTables, C.destTables)(
        """SELECT coalesce(s.db, d.db) AS db, coalesce(s.tbl, d.tbl) AS tbl,
          |  s.tldt AS src_tldt, d.tldt AS dest_tldt,
          |  CASE
          |    WHEN d.tldt IS NULL AND s.tldt IS NOT NULL THEN
          |      CASE WHEN s.partitioned THEN 'COPY_PARTITIONED_TABLE'
          |           ELSE 'COPY_UNPARTITIONED_TABLE' END
          |    WHEN s.tldt IS NULL THEN 'DROP_TABLE'
          |    WHEN s.tldt > d.tldt THEN 'COPY_METADATA'
          |    ELSE 'NO_OP' END AS action
          |FROM src_tables s FULL OUTER JOIN dest_tables d
          |  ON s.db = d.db AND s.tbl = d.tbl""".stripMargin)) {
      (s, dir) => ReplicationOps.tableDiff(W.srcTables(s, dir), W.destTables(s, dir))
    },

    // J2 — partition-inventory full-outer diff → per-partition actions.
    QueryDef("j2_partition_diff",
      C.withCtes(C.srcPartitions, C.destPartitions)(
        """SELECT coalesce(s.db, d.db) AS db, coalesce(s.tbl, d.tbl) AS tbl,
          |  coalesce(s.part_name, d.part_name) AS part_name,
          |  s.tldt AS src_tldt, d.tldt AS dest_tldt,
          |  CASE
          |    WHEN d.tldt IS NULL AND s.tldt IS NOT NULL THEN 'COPY_PARTITION'
          |    WHEN s.tldt IS NULL THEN 'DROP_PARTITION'
          |    WHEN s.nfiles <> d.nfiles OR s.bytes <> d.bytes THEN 'COPY_PARTITION'
          |    WHEN s.tldt > d.tldt THEN 'COPY_METADATA'
          |    ELSE 'NO_OP' END AS action
          |FROM src_parts s FULL OUTER JOIN dest_parts d
          |  ON s.db = d.db AND s.tbl = d.tbl AND s.part_name = d.part_name""".stripMargin)) {
      (s, dir) =>
        ReplicationOps.partitionDiff(W.srcPartitions(s, dir), W.destPartitions(s, dir))
    },

    // J3/A1/A3 — file-manifest diff rolled up per directory.
    QueryDef("j3_manifest_diff",
      C.withCtes(C.srcFiles, C.destFiles)(
        """SELECT coalesce(s.dir, regexp_extract(d.rel_path, '^([^/]+)', 1)) AS dir,
          |  count(*) AS n_files,
          |  count(CASE WHEN s.size = d.size THEN 1 END) AS n_match,
          |  count(CASE WHEN s.size IS NOT NULL AND d.size IS NOT NULL
          |             AND s.size <> d.size THEN 1 END) AS n_size_mismatch,
          |  count(CASE WHEN d.size IS NULL AND s.size IS NOT NULL THEN 1 END)
          |    AS n_missing_dest,
          |  count(CASE WHEN s.size IS NULL THEN 1 END) AS n_missing_src,
          |  CAST(coalesce(sum(CASE WHEN d.size IS NULL AND s.size IS NOT NULL
          |    THEN s.size
          |    WHEN s.size IS NOT NULL AND d.size IS NOT NULL AND s.size <> d.size
          |    THEN s.size END), 0) AS BIGINT) AS bytes_to_copy
          |FROM src_files s FULL OUTER JOIN dest_files d ON s.rel_path = d.rel_path
          |GROUP BY 1""".stripMargin)) {
      (s, dir) => ReplicationOps.manifestDiffSummary(W.srcFiles(s, dir), W.destFiles(s, dir))
    },

    // J4/U3 — dest-not-in-src anti-join (blocks distcp -update).
    QueryDef("j4_dest_only_files",
      C.withCtes(C.srcFiles, C.destFiles)(
        """SELECT d.rel_path, d.dir, d.size, d.mtime FROM dest_files d
          |WHERE NOT EXISTS (SELECT 1 FROM src_files s
          |                  WHERE s.rel_path = d.rel_path)""".stripMargin)) {
      (s, dir) =>
        ReplicationOps.destOnlyFiles(W.srcFiles(s, dir), W.destFiles(s, dir))
          .select("rel_path", "dir", "size", "mtime")
    },

    // J5/O3/§2.5 — latest-version-wins per key (window top-1).
    QueryDef("j5_latest_wins",
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin) {
      (s, dir) =>
        ReplicationOps.latestWins(W.read(s, dir, "events"),
          Seq("user_id"), "ts", "event_id")
          .select("user_id", "event_id", "event_type", "value")
    },

    // J6/A6/S7 — audit-log 1:N object assembly with per-category lists
    // (lists rendered as ','-joined strings so the driver can hash them).
    QueryDef("j6_audit_assemble",
      C.withCtes(C.auditObjects)(
        """SELECT l.id, l.command_type,
          |  coalesce(array_to_string(list_sort(list(o.name)
          |    FILTER (WHERE o.category = 'OUTPUT' AND o.object_type = 'TABLE')),
          |    ','), '') AS output_tables,
          |  coalesce(array_to_string(list_sort(list(o.name)
          |    FILTER (WHERE o.category = 'OUTPUT' AND o.object_type = 'PARTITION')),
          |    ','), '') AS output_partitions,
          |  coalesce(array_to_string(list_sort(list(o.name)
          |    FILTER (WHERE o.category = 'REFERENCE_TABLE')),
          |    ','), '') AS reference_tables
          |FROM audit_log l LEFT OUTER JOIN audit_objects o ON l.id = o.id
          |GROUP BY 1, 2""".stripMargin)) {
      (s, dir) =>
        ReplicationOps.auditAssemble(W.auditLog(s, dir), W.auditObjects(s, dir))
          .select(col("id"), col("command_type"),
            array_join(col("output_tables"), ",").as("output_tables"),
            array_join(col("output_partitions"), ",").as("output_partitions"),
            array_join(col("reference_tables"), ",").as("reference_tables"))
    },

    // J7 — reference-table lookup join (partition → its table, broadcast).
    QueryDef("j7_lookup_join",
      C.withCtes(C.srcTables, C.srcPartitions)(
        """SELECT p.db, p.tbl, p.part_name, t.location AS table_location,
          |  t.tldt AS table_tldt
          |FROM src_parts p LEFT OUTER JOIN src_tables t
          |  ON p.db = t.db AND p.tbl = t.tbl""".stripMargin)) {
      (s, dir) =>
        W.srcPartitions(s, dir).join(
          broadcast(W.srcTables(s, dir)
            .select(col("db"), col("tbl"), col("location").as("table_location"),
              col("tldt").as("table_tldt"))),
          Seq("db", "tbl"), "left_outer")
          .select("db", "tbl", "part_name", "table_location", "table_tldt")
    },

    // P1/P2 — regex blacklist filter on (db, tbl).
    QueryDef("p1_blacklist_filter",
      C.withCtes(C.srcTables)(
        """SELECT db, tbl FROM src_tables
          |WHERE NOT (regexp_matches(db, '^db_[0-2]$')
          |           AND regexp_matches(tbl, '[02468]$'))""".stripMargin)) {
      (s, dir) =>
        ReplicationOps.blacklistFilter(W.srcTables(s, dir),
          Seq(("^db_[0-2]$", "[02468]$"))).select("db", "tbl")
    },

    // P5 — hidden-file predicate over a raw listing.
    QueryDef("p5_hidden_filter",
      C.withCtes(C.rawListing)(
        """SELECT dir, rel_path, size FROM raw_listing
          |WHERE NOT starts_with(regexp_extract(rel_path, '([^/]+)$', 1), '_')
          |  AND NOT starts_with(regexp_extract(rel_path, '([^/]+)$', 1), '.')""".stripMargin)) {
      (s, dir) =>
        ReplicationOps.visibleFiles(W.rawListing(s, dir)).select("dir", "rel_path", "size")
    },

    // P8/P10 — location rewrite under dest root, s3 passthrough.
    QueryDef("p8_location_rewrite",
      C.withCtes(C.srcTables)(
        """SELECT db, tbl, location,
          |  CASE WHEN starts_with(location, 's3n://')
          |         OR starts_with(location, 's3a://') THEN location
          |       ELSE replace(location, 'hdfs://src-wh/', 'hdfs://dest-wh/')
          |  END AS dest_location
          |FROM src_tables""".stripMargin)) {
      (s, dir) =>
        W.srcTables(s, dir).select(col("db"), col("tbl"), col("location"),
          ReplicationOps.rewriteLocation(col("location"),
            "hdfs://src-wh/", "hdfs://dest-wh/").as("dest_location"))
    },

    // S6/O1 — audit-log page: id > watermark, SHOW* filtered at source,
    // ordered, limited (ROW_FETCH_SIZE=200).
    QueryDef("o1_audit_page",
      C.withCtes(C.auditLog)(
        """SELECT id, command_type, db, tbl FROM audit_log
          |WHERE id > 500 AND command_type NOT IN
          |  ('SHOWTABLES', 'SHOWPARTITIONS', 'SWITCHDATABASE')
          |ORDER BY id LIMIT 200""".stripMargin)) {
      (s, dir) =>
        W.auditLog(s, dir)
          .filter(col("id") > 500 &&
            !col("command_type").isin("SHOWTABLES", "SHOWPARTITIONS", "SWITCHDATABASE"))
          .orderBy("id").limit(200)
          .select("id", "command_type", "db", "tbl")
    },

    // A4 — min/max id watermark over one page.
    QueryDef("a4_watermark",
      C.withCtes(C.auditLog)(
        """SELECT min(id) AS min_id, max(id) AS max_id, count(*) AS n
          |FROM (SELECT id FROM audit_log WHERE id > 500 AND command_type NOT IN
          |  ('SHOWTABLES', 'SHOWPARTITIONS', 'SWITCHDATABASE')
          |  ORDER BY id LIMIT 200)""".stripMargin)) {
      (s, dir) =>
        W.auditLog(s, dir)
          .filter(col("id") > 500 &&
            !col("command_type").isin("SHOWTABLES", "SHOWPARTITIONS", "SWITCHDATABASE"))
          .orderBy("id").limit(200)
          .agg(min("id").as("min_id"), max("id").as("max_id"),
            count(lit(1)).as("n"))
    },

    // ST7 — event-type router: audit command type → operation type.
    // Default COPY (reference switch default); SHOW* → IGNORE.
    QueryDef("st7_event_router",
      C.withCtes(C.auditLog)(
        """SELECT command_type,
          |  CASE WHEN command_type IN ('SHOWTABLES','SHOWPARTITIONS',
          |         'SWITCHDATABASE') THEN 'IGNORE'
          |       WHEN command_type IN ('DROPTABLE','DROPVIEW',
          |         'ALTERTABLE_DROPPARTS','THRIFT_DROP_TABLE',
          |         'THRIFT_DROP_PARTITION') THEN 'DROP'
          |       WHEN command_type IN ('ALTERTABLE_RENAME','ALTERTABLE_RENAMEPART')
          |         THEN 'RENAME'
          |       ELSE 'COPY' END AS op_type,
          |  count(*) AS n
          |FROM audit_log GROUP BY 1, 2""".stripMargin)) {
      (s, dir) =>
        W.auditLog(s, dir)
          .groupBy(col("command_type"),
            ReplicationOps.routeOpType(col("command_type")).as("op_type"))
          .agg(count(lit(1)).as("n"))
    },

    // ST8 — dynamic-partition compaction: N partitions of one table in one
    // audit entry → one bulk COPY_PARTITIONS job.
    QueryDef("st8_partition_compaction",
      C.withCtes(C.auditObjects)(
        """SELECT id, db, tbl, n_parts,
          |  array_to_string(part_names, ',') AS part_names,
          |  CASE WHEN n_parts > 1 THEN 'COPY_PARTITIONS'
          |       ELSE 'COPY_PARTITION' END AS task_type
          |FROM (
          |  SELECT o.id,
          |    split_part(o.name, '.', 1) AS db,
          |    split_part(split_part(o.name, '.', 2), '/', 1) AS tbl,
          |    count(*) AS n_parts,
          |    list_sort(list(split_part(o.name, '/', 2))) AS part_names
          |  FROM audit_objects o
          |  WHERE o.category = 'OUTPUT' AND o.object_type = 'PARTITION'
          |  GROUP BY 1, 2, 3)""".stripMargin)) {
      (s, dir) =>
        ReplicationOps.compactPartitionJobs(
          W.auditObjects(s, dir)
            .filter(col("category") === "OUTPUT" && col("object_type") === "PARTITION")
            .select(col("id"),
              split_part(col("name"), lit("."), lit(1)).as("db"),
              split_part(split_part(col("name"), lit("."), lit(2)), lit("/"), lit(1)).as("tbl"),
              split_part(col("name"), lit("/"), lit(2)).as("part_name")))
          .select(col("id"), col("db"), col("tbl"), col("n_parts"),
            array_join(col("part_names"), ",").as("part_names"), col("task_type"))
    },

    // U1 — union+distinct of src/dest partition names.
    QueryDef("u1_union_distinct",
      C.withCtes(C.srcPartitions, C.destPartitions)(
        """SELECT DISTINCT db, tbl, part_name FROM (
          |  SELECT db, tbl, part_name FROM src_parts
          |  UNION ALL SELECT db, tbl, part_name FROM dest_parts)""".stripMargin)) {
      (s, dir) =>
        W.srcPartitions(s, dir).select("db", "tbl", "part_name")
          .unionAll(W.destPartitions(s, dir).select("db", "tbl", "part_name"))
          .distinct()
    },

    // A1/A2 — directory size rollup (recursive sum of file lengths).
    QueryDef("a1_dir_sizes",
      C.withCtes(C.srcFiles)(
        """SELECT dir, count(*) AS n_files,
          |  CAST(sum(size) AS BIGINT) AS total_bytes,
          |  max(mtime) AS max_mtime
          |FROM src_files GROUP BY 1""".stripMargin)) {
      (s, dir) =>
        W.srcFiles(s, dir).groupBy("dir")
          .agg(count(lit(1)).as("n_files"), sum("size").as("total_bytes"),
            max("mtime").as("max_mtime"))
    },

    // A9 — same-table check: do all partitions of each db share one table?
    QueryDef("a9_same_table_check",
      C.withCtes(C.srcPartitions)(
        """SELECT db, count(DISTINCT tbl) AS n_tables,
          |  count(DISTINCT tbl) = 1 AS single_table
          |FROM src_parts GROUP BY 1""".stripMargin)) {
      (s, dir) =>
        W.srcPartitions(s, dir).groupBy("db")
          .agg(countDistinct("tbl").as("n_tables"),
            (countDistinct("tbl") === 1).as("single_table"))
    }
  )
}
