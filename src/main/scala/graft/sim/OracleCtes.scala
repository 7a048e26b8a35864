package graft.sim

/**
 * DuckDB SQL mirrors of [[WarehouseSim]]'s derivations, as composable CTE
 * bodies. The driver's correctness gate runs each `SparkEntry.oracleSql`
 * string in DuckDB against the same parquet tables (registered under their
 * bare names), so every sim derivation needs an exact SQL twin.
 *
 * Parity notes (verified against DuckDB 1.0 semantics):
 *  - Spark `unix_timestamp(ts)` (UTC session) == DuckDB
 *    `CAST(floor(epoch(ts)) AS BIGINT)`.
 *  - Spark `date_format(ts,'yyyy-MM-dd')` == DuckDB `strftime(ts,'%Y-%m-%d')`.
 *  - Spark `round(double)` (HALF_UP) == DuckDB `round(double)` for positives.
 *  - Money is summed in integer cents (`CAST(round(x*100) AS BIGINT)`) so
 *    aggregates are order-independent and hash-exact at any parallelism.
 */
object OracleCtes {

  val srcTables: String =
    """src_tables AS (
      |  SELECT p_partkey,
      |    'db_' || CAST(p_partkey % 8 AS VARCHAR) AS db,
      |    't_' || CAST(p_partkey AS VARCHAR) AS tbl,
      |    CAST(p_size AS BIGINT) * 100 + p_partkey % 7 AS tldt,
      |    CASE WHEN p_partkey % 4 = 0 THEN 's3a' ELSE 'hdfs' END AS scheme,
      |    p_partkey % 3 = 0 AS partitioned,
      |    (CASE WHEN p_partkey % 4 = 0 THEN 's3a' ELSE 'hdfs' END)
      |      || '://src-wh/db_' || CAST(p_partkey % 8 AS VARCHAR)
      |      || '/t_' || CAST(p_partkey AS VARCHAR) AS location
      |  FROM part)""".stripMargin

  val destTables: String =
    """dest_tables AS (
      |  SELECT db, tbl,
      |    CASE WHEN p_partkey % 3 = 0 THEN tldt - 1 ELSE tldt END AS tldt,
      |    replace(location, '://src-wh/', '://dest-wh/') AS location,
      |    partitioned
      |  FROM src_tables WHERE p_partkey % 5 <> 0
      |  UNION ALL
      |  SELECT 'db_x' AS db, 'x_' || CAST(s_suppkey AS VARCHAR) AS tbl,
      |    CAST(s_suppkey AS BIGINT) AS tldt,
      |    'hdfs://dest-wh/db_x/x_' || CAST(s_suppkey AS VARCHAR) AS location,
      |    false AS partitioned
      |  FROM supplier)""".stripMargin

  val srcPartitions: String =
    """src_parts AS (
      |  SELECT
      |    'db_' || CAST(l_partkey % 8 AS VARCHAR) AS db,
      |    't_' || CAST(l_partkey AS VARCHAR) AS tbl,
      |    'ds=' || strftime(l_shipdate, '%Y-%m-%d') AS part_name,
      |    count(*) AS nfiles,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS bytes,
      |    max(CAST(floor(epoch(l_shipdate)) AS BIGINT)) AS tldt
      |  FROM lineitem WHERE l_partkey % 3 = 0
      |  GROUP BY 1, 2, 3)""".stripMargin

  val destPartitions: String =
    """dest_parts AS (
      |  SELECT db, tbl, part_name, nfiles, bytes,
      |    CASE WHEN (pk + dayv) % 7 = 0 THEN tldt - 10 ELSE tldt END AS tldt
      |  FROM (
      |    SELECT *, CAST(regexp_extract(tbl, 't_(\d+)', 1) AS BIGINT) AS pk,
      |      CAST(substr(part_name, 12, 2) AS INT) AS dayv
      |    FROM src_parts)
      |  WHERE (pk + dayv) % 11 <> 0)""".stripMargin

  val srcFiles: String =
    """src_files AS (
      |  SELECT
      |    't_' || CAST(l_partkey AS VARCHAR) AS dir,
      |    't_' || CAST(l_partkey AS VARCHAR) || '/part-'
      |      || CAST(l_orderkey AS VARCHAR) || '-'
      |      || CAST(l_linenumber AS VARCHAR) || '.parquet' AS rel_path,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS size,
      |    CAST(floor(epoch(l_shipdate)) AS BIGINT) AS mtime
      |  FROM lineitem)""".stripMargin

  val destFiles: String =
    """dest_files AS (
      |  SELECT
      |    't_' || CAST(l_partkey AS VARCHAR) AS dir,
      |    't_' || CAST(l_partkey AS VARCHAR) || '/part-'
      |      || CAST(l_orderkey AS VARCHAR) || '-'
      |      || CAST(l_linenumber AS VARCHAR) || '.parquet' AS rel_path,
      |    CAST(round(l_extendedprice * 100) AS BIGINT)
      |      + CASE WHEN l_orderkey % 17 = 0 THEN 1 ELSE 0 END AS size,
      |    CAST(floor(epoch(l_shipdate)) AS BIGINT) AS mtime
      |  FROM lineitem WHERE l_orderkey % 13 <> 0
      |  UNION ALL
      |  SELECT
      |    't_' || CAST(l_partkey AS VARCHAR) AS dir,
      |    't_' || CAST(l_partkey AS VARCHAR) || '/extra-'
      |      || CAST(l_orderkey AS VARCHAR) || '-'
      |      || CAST(l_linenumber AS VARCHAR) || '.tmp' AS rel_path,
      |    CAST(64 AS BIGINT) AS size,
      |    CAST(floor(epoch(l_shipdate)) AS BIGINT) AS mtime
      |  FROM lineitem WHERE l_orderkey % 19 = 0)""".stripMargin

  val rawListing: String =
    srcFiles + ",\n" +
    """raw_listing AS (
      |  SELECT dir, rel_path, size, mtime FROM src_files
      |  UNION ALL
      |  SELECT
      |    't_' || CAST(l_partkey AS VARCHAR) AS dir,
      |    't_' || CAST(l_partkey AS VARCHAR)
      |      || CASE WHEN l_orderkey % 2 = 0 THEN '/_tmp-' ELSE '/.stage-' END
      |      || CAST(l_orderkey AS VARCHAR) || '-'
      |      || CAST(l_linenumber AS VARCHAR) AS rel_path,
      |    CAST(0 AS BIGINT) AS size,
      |    CAST(floor(epoch(l_shipdate)) AS BIGINT) AS mtime
      |  FROM lineitem WHERE l_orderkey % 23 = 0)""".stripMargin

  val auditLog: String =
    """audit_log AS (
      |  SELECT event_id AS id, ts AS create_time, user_id,
      |    CASE event_type
      |      WHEN 'signup' THEN 'CREATETABLE'
      |      WHEN 'purchase' THEN 'QUERY'
      |      WHEN 'click' THEN 'ALTERTABLE_RENAME'
      |      WHEN 'error' THEN 'DROPTABLE'
      |      ELSE 'SHOWTABLES' END AS command_type,
      |    'db_' || CAST(user_id % 8 AS VARCHAR) AS db,
      |    't_' || CAST(user_id AS VARCHAR) AS tbl,
      |    value
      |  FROM events)""".stripMargin

  val auditObjects: String =
    auditLog + ",\n" +
    """audit_objects AS (
      |  SELECT id, 'OUTPUT' AS category, 'PARTITION' AS object_type,
      |    db || '.' || tbl || '/ds=2024-01-0' || CAST(n AS VARCHAR) AS name
      |  FROM (SELECT id, db, tbl, unnest(generate_series(1, id % 3 + 1)) AS n
      |        FROM audit_log
      |        WHERE command_type = 'QUERY')
      |  UNION ALL
      |  SELECT id, 'REFERENCE_TABLE' AS category, 'TABLE' AS object_type,
      |    db || '.' || tbl AS name
      |  FROM audit_log WHERE command_type = 'QUERY'
      |  UNION ALL
      |  SELECT id, 'OUTPUT' AS category, 'TABLE' AS object_type,
      |    db || '.' || tbl AS name
      |  FROM audit_log
      |  WHERE command_type NOT IN ('QUERY', 'SHOWTABLES'))""".stripMargin

  val urlDocs: String =
    """url_docs AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'http://example' || CAST((doc_id // 4) % 50 AS VARCHAR)
      |        || '.com/Page/' || CAST(doc_id // 4 AS VARCHAR) || '?a=1&b=2'
      |      WHEN 1 THEN 'HTTP://WWW.EXAMPLE' || CAST((doc_id // 4) % 50 AS VARCHAR)
      |        || '.COM:80/Page/' || CAST(doc_id // 4 AS VARCHAR)
      |        || '/?b=2&a=1&utm_medium=email'
      |      WHEN 2 THEN 'http://example' || CAST((doc_id // 4) % 50 AS VARCHAR)
      |        || '.com/Page/' || CAST(doc_id // 4 AS VARCHAR)
      |        || '?a=1&utm_source=feed&b=2'
      |      ELSE 'http://example' || CAST((doc_id // 4) % 50 AS VARCHAR)
      |        || '.com:80/Page/' || CAST(doc_id // 4 AS VARCHAR)
      |        || '?b=2&a=1#frag'
      |    END AS url
      |  FROM documents)""".stripMargin

  /** Compose a full query: `with(cteA, cteB)("SELECT ...")`. */
  def withCtes(ctes: String*)(select: String): String =
    "WITH " + ctes.mkString(",\n") + "\n" + select
}
