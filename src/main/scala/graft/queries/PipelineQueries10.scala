package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{CdcApply, ReplicationOps}
import graft.sim.{OracleCtes => C, WarehouseSim => W}

/**
 * Round-10 batch: the hash-certified incremental replication loop.
 *
 * `pipe_incremental_e2e` composes five individually-certified operators
 * into the reference's server loop shape
 * (`incremental/ReplicationServer.java:348-506`: poll audit entries →
 * filter/route → build jobs → execute in id order → converged warehouse
 * state) and certifies the COMPOSITION end to end: the DuckDB oracle
 * replays every stage — ST7 routing, ST8 dynamic-partition compaction,
 * CDC latest-wins apply with DROP tombstones (including the
 * "partition write after table drop re-creates the table" ordering
 * rule), and a J1-shape drift report of the replayed state against the
 * destination catalog — and the per-db report must hash-match.
 *
 * Scale shape: every stage is one keyed aggregate or equi-join on
 * (db, tbl[, part_name]) — no stage widens beyond the audit-log size,
 * the final report is db-cardinality, and nothing collects.
 */
object PipelineQueries10 {

  /** DuckDB replay of [[graft.pipeline.Dedup.canonicalizeUrl]] over the
    * `url_docs` CTE — shared by the full and incremental URL-dedup
    * oracles. */
  private val urlCanonCte: String =
    """canon AS (
          |  SELECT doc_id,
          |    CASE WHEN scheme = '' THEN url
          |         ELSE scheme || '://' || host || path ||
          |           CASE WHEN kept = '' THEN '' ELSE '?' || kept END
          |    END AS canonical_url
          |  FROM (
          |    SELECT doc_id, url, scheme,
          |      CASE WHEN scheme = 'http'
          |             THEN regexp_replace(host0, ':80$', '')
          |           WHEN scheme = 'https'
          |             THEN regexp_replace(host0, ':443$', '')
          |           ELSE host0 END AS host,
          |      regexp_replace(regexp_extract(tail, '^([^?]*)', 1),
          |        '/+$', '') AS path,
          |      array_to_string(list_sort(list_filter(
          |        string_split(regexp_extract(tail, '\?(.*)$', 1), '&'),
          |        p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&')
          |        AS kept
          |    FROM (
          |      SELECT doc_id, url,
          |        lower(regexp_extract(url,
          |          '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          |        regexp_replace(lower(regexp_extract(
          |          regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
          |          '^([^/?#]+)', 1)), '^(www\.)+', '') AS host0,
          |        regexp_replace(regexp_replace(
          |          regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
          |          '^[^/?#]+', ''), '#.*$', '') AS tail
          |      FROM url_docs)))""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    QueryDef("pipe_incremental_e2e",
      C.withCtes(C.auditObjects, C.srcTables, C.destTables,
        """routed AS (
          |  SELECT id, db, tbl,
          |    CASE WHEN command_type IN ('SHOWTABLES','SHOWPARTITIONS',
          |           'SWITCHDATABASE') THEN 'IGNORE'
          |         WHEN command_type IN ('DROPTABLE','DROPVIEW',
          |           'ALTERTABLE_DROPPARTS','THRIFT_DROP_TABLE',
          |           'THRIFT_DROP_PARTITION') THEN 'DROP'
          |         WHEN command_type IN ('ALTERTABLE_RENAME',
          |           'ALTERTABLE_RENAMEPART') THEN 'RENAME'
          |         ELSE 'COPY' END AS op_type
          |  FROM audit_log),
          |active AS (SELECT * FROM routed WHERE op_type <> 'IGNORE'),
          |tstate AS (
          |  SELECT db, tbl, id FROM (
          |    SELECT db, tbl, id,
          |      CASE WHEN op_type = 'DROP' THEN 'D' ELSE 'U' END AS op,
          |      row_number() OVER (PARTITION BY db, tbl
          |        ORDER BY id DESC) AS rn
          |    FROM active)
          |  WHERE rn = 1 AND op <> 'D'),
          |pobj AS (
          |  SELECT id, split_part(name, '.', 1) AS db,
          |    split_part(split_part(name, '.', 2), '/', 1) AS tbl,
          |    split_part(name, '/', 2) AS part_name
          |  FROM audit_objects
          |  WHERE category = 'OUTPUT' AND object_type = 'PARTITION'),
          |pjobs AS (
          |  SELECT id, db, tbl, count(*) AS n_parts,
          |    CASE WHEN count(*) > 1 THEN 'COPY_PARTITIONS'
          |         ELSE 'COPY_PARTITION' END AS task_type
          |  FROM pobj GROUP BY 1, 2, 3),
          |tdrop AS (
          |  SELECT db, tbl, max(id) AS drop_id FROM active
          |  WHERE op_type = 'DROP' GROUP BY 1, 2),
          |ptouch AS (
          |  SELECT db, tbl, part_name, max(id) AS last_id
          |  FROM pobj GROUP BY 1, 2, 3),
          |plive AS (
          |  SELECT p.db, p.tbl, count(*) AS n_live_parts
          |  FROM ptouch p LEFT JOIN tdrop d
          |    ON p.db = d.db AND p.tbl = d.tbl
          |  WHERE p.last_id > coalesce(d.drop_id, -1)
          |  GROUP BY 1, 2),
          |src_side AS (
          |  SELECT t.db, t.tbl, CAST(t.id AS BIGINT) AS tldt,
          |    coalesce(l.n_live_parts, 0) > 0 AS partitioned
          |  FROM tstate t LEFT JOIN plive l
          |    ON t.db = l.db AND t.tbl = l.tbl),
          |diff AS (
          |  SELECT coalesce(s.db, d.db) AS db,
          |    CASE WHEN d.tldt IS NULL AND s.tldt IS NOT NULL THEN
          |           CASE WHEN s.partitioned THEN 'COPY_PARTITIONED_TABLE'
          |                ELSE 'COPY_UNPARTITIONED_TABLE' END
          |         WHEN s.tldt IS NULL THEN 'DROP_TABLE'
          |         WHEN s.tldt > d.tldt THEN 'COPY_METADATA'
          |         ELSE 'NO_OP' END AS action
          |  FROM src_side s FULL OUTER JOIN dest_tables d
          |    ON s.db = d.db AND s.tbl = d.tbl),
          |dbs AS (
          |  SELECT db FROM tstate UNION SELECT db FROM plive
          |  UNION SELECT db FROM pjobs UNION SELECT db FROM diff),
          |lt AS (SELECT db, count(*) AS live_tables FROM tstate GROUP BY 1),
          |lp AS (SELECT db, sum(n_live_parts) AS live_parts
          |       FROM plive GROUP BY 1),
          |jb AS (SELECT db,
          |    sum(CASE WHEN task_type = 'COPY_PARTITIONS' THEN 1 ELSE 0 END)
          |      AS bulk_jobs,
          |    sum(CASE WHEN task_type = 'COPY_PARTITION' THEN 1 ELSE 0 END)
          |      AS single_jobs
          |  FROM pjobs GROUP BY 1),
          |df AS (SELECT db,
          |    sum(CASE WHEN action LIKE 'COPY%' THEN 1 ELSE 0 END) AS n_copy,
          |    sum(CASE WHEN action = 'DROP_TABLE' THEN 1 ELSE 0 END) AS n_drop,
          |    sum(CASE WHEN action = 'NO_OP' THEN 1 ELSE 0 END) AS n_noop
          |  FROM diff GROUP BY 1)""".stripMargin)(
        """SELECT dbs.db,
          |  CAST(coalesce(lt.live_tables, 0) AS BIGINT) AS live_tables,
          |  CAST(coalesce(lp.live_parts, 0) AS BIGINT) AS live_parts,
          |  CAST(coalesce(jb.bulk_jobs, 0) AS BIGINT) AS bulk_jobs,
          |  CAST(coalesce(jb.single_jobs, 0) AS BIGINT) AS single_jobs,
          |  CAST(coalesce(df.n_copy, 0) AS BIGINT) AS n_copy,
          |  CAST(coalesce(df.n_drop, 0) AS BIGINT) AS n_drop,
          |  CAST(coalesce(df.n_noop, 0) AS BIGINT) AS n_noop
          |FROM dbs
          |LEFT JOIN lt ON dbs.db = lt.db
          |LEFT JOIN lp ON dbs.db = lp.db
          |LEFT JOIN jb ON dbs.db = jb.db
          |LEFT JOIN df ON dbs.db = df.db""".stripMargin)) { (s, dir) =>
      // ST7: route audit entries to operation types; IGNORE drops out
      val routed = W.auditLog(s, dir)
        .select(col("id"), col("db"), col("tbl"),
          ReplicationOps.routeOpType(col("command_type")).as("op_type"))
        .filter(col("op_type") =!= "IGNORE")

      // ST8: OUTPUT partition objects → compacted per-entry bulk jobs
      val partObjs = W.auditObjects(s, dir)
        .filter(col("category") === "OUTPUT" &&
          col("object_type") === "PARTITION")
        .select(col("id"),
          split_part(col("name"), lit("."), lit(1)).as("db"),
          split_part(split_part(col("name"), lit("."), lit(2)), lit("/"),
            lit(1)).as("tbl"),
          split_part(col("name"), lit("/"), lit(2)).as("part_name"))
      val partJobs = ReplicationOps.compactPartitionJobs(partObjs)

      // CDC latest-wins replay at table + partition granularity — the
      // shared declarative model (ReplicationOps.replayAuditState),
      // bridge-certified against the actual server in IncrementalSpec
      val (tableState, liveParts) =
        ReplicationOps.replayAuditState(routed, partObjs)
      val livePartsByTbl = liveParts
        .groupBy("db", "tbl").agg(count(lit(1)).as("n_live_parts"))

      // J1-shape drift report: replayed live state vs the dest catalog
      val srcSide = tableState
        .join(livePartsByTbl, Seq("db", "tbl"), "left")
        .select(col("db"), col("tbl"), col("id").cast("long").as("tldt"),
          (coalesce(col("n_live_parts"), lit(0L)) > 0).as("partitioned"))
      val diff = ReplicationOps.tableDiff(srcSide, W.destTables(s, dir))

      // per-db e2e report (the operator's post-cycle summary)
      val lt = tableState.groupBy("db")
        .agg(count(lit(1)).as("live_tables"))
      val lp = livePartsByTbl.groupBy("db")
        .agg(sum("n_live_parts").as("live_parts"))
      val jb = partJobs.groupBy("db")
        .agg(sum(when(col("task_type") === "COPY_PARTITIONS", 1L)
            .otherwise(0L)).as("bulk_jobs"),
          sum(when(col("task_type") === "COPY_PARTITION", 1L)
            .otherwise(0L)).as("single_jobs"))
      val df = diff.groupBy("db")
        .agg(sum(when(col("action").startsWith("COPY"), 1L).otherwise(0L))
            .as("n_copy"),
          sum(when(col("action") === "DROP_TABLE", 1L).otherwise(0L))
            .as("n_drop"),
          sum(when(col("action") === "NO_OP", 1L).otherwise(0L))
            .as("n_noop"))
      lt.join(lp, Seq("db"), "full_outer")
        .join(jb, Seq("db"), "full_outer")
        .join(df, Seq("db"), "full_outer")
        .select(col("db"),
          coalesce(col("live_tables"), lit(0L)).as("live_tables"),
          coalesce(col("live_parts"), lit(0L)).as("live_parts"),
          coalesce(col("bulk_jobs"), lit(0L)).as("bulk_jobs"),
          coalesce(col("single_jobs"), lit(0L)).as("single_jobs"),
          coalesce(col("n_copy"), lit(0L)).as("n_copy"),
          coalesce(col("n_drop"), lit(0L)).as("n_drop"),
          coalesce(col("n_noop"), lit(0L)).as("n_noop"))
    },

    // URL-level dedup — the pipeline stage that runs BEFORE any text
    // scan: canonicalize crawl URLs (case, www, default port, utm_*,
    // param order, trailing slash, fragment) and assign keepers by
    // smallest id per canonical form. The oracle replays every
    // canonicalization rule with the same regex/list operations.
    QueryDef("dedup_url",
      C.withCtes(C.urlDocs, urlCanonCte)(
        """SELECT c.doc_id, c.canonical_url, k.keeper_id
          |FROM canon c JOIN (
          |  SELECT canonical_url, min(doc_id) AS keeper_id
          |  FROM canon GROUP BY 1) k
          |  ON c.canonical_url = k.canonical_url""".stripMargin)) {
      (s, dir) =>
        graft.pipeline.Dedup.urlDedup(W.urlDocs(s, dir))
    },

    // incremental URL admission: a crawl batch against the standing
    // corpus by canonical-URL anti-join. The new set mixes whole-block
    // increments (base % 7 = 0 — every variant new, admitted with the
    // within-batch collapse) and partial-block ids (doc_id % 10 < 2 —
    // the corpus holds sibling variants, so the anti-join rejects
    // them), exercising both admission outcomes.
    QueryDef("dedup_url_incremental",
      C.withCtes(C.urlDocs, urlCanonCte)(
        """SELECT canonical_url,
          |  CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
          |  CAST(count(*) AS BIGINT) AS n_dups
          |FROM canon
          |WHERE ((doc_id // 4) % 7 = 0 OR doc_id % 10 < 2)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM canon c
          |    WHERE NOT ((c.doc_id // 4) % 7 = 0 OR c.doc_id % 10 < 2)
          |      AND c.canonical_url = canon.canonical_url)
          |GROUP BY canonical_url""".stripMargin)) { (s, dir) =>
      val docs = W.urlDocs(s, dir)
      val isNew = (expr("doc_id div 4") % 7 === 0) ||
        (col("doc_id") % 10 < 2)
      graft.pipeline.Dedup.urlDedupIncremental(
        docs.filter(isNew), docs.filter(!isNew))
    },

    // per-domain crawl profile over canonical URLs: doc count, distinct
    // pages, the recrawl dup ratio they imply, mean document size —
    // the rollup behind domain allow/deny and crawl-budget decisions
    QueryDef("report_domain_profile",
      C.withCtes(C.urlDocs, urlCanonCte)(
        """SELECT
          |  regexp_extract(c.canonical_url,
          |    '^[a-z0-9+.-]+://([^/?#]+)', 1) AS domain,
          |  CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(count(DISTINCT c.canonical_url) AS BIGINT) AS n_pages,
          |  round(1.0 - CAST(count(DISTINCT c.canonical_url) AS DOUBLE)
          |    / CAST(count(*) AS DOUBLE), 6) AS dup_ratio,
          |  round(avg(CAST(d.n_chars AS DOUBLE)), 6) AS mean_chars
          |FROM canon c JOIN documents d ON c.doc_id = d.doc_id
          |GROUP BY 1""".stripMargin)) { (s, dir) =>
      graft.pipeline.CorpusReport.domainProfile(
        W.urlDocs(s, dir).join(
          W.read(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id"))
    },

    // production unicode normalization: sim text decorated with
    // typographic quotes / dashes / ellipsis / zero-width / NBSP /
    // control chars (deterministic per doc_id, built from chr() codes
    // on the oracle side so no literal survives JSON transport), then
    // normalized; the oracle replays every rule and the full cleaned
    // TEXT must hash-match, not just lengths
    QueryDef("t_normalize",
      """SELECT doc_id,
        |  regexp_replace(trim(noctl), '\s+', ' ', 'g') AS norm_text
        |FROM (
        |  SELECT doc_id, regexp_replace(dots, '\p{Cc}', ' ', 'g') AS noctl
        |  FROM (
        |    SELECT doc_id, replace(mapped, chr(8230), '...') AS dots
        |    FROM (
        |      SELECT doc_id, translate(nozw,
        |          chr(160)||chr(8201)||chr(8239)||chr(8216)||chr(8217)
        |            ||chr(8218)||chr(8220)||chr(8221)||chr(8222)
        |            ||chr(8211)||chr(8212)||chr(8213),
        |          '   ' || repeat(chr(39), 3) || repeat(chr(34), 3)
        |            || '---') AS mapped
        |      FROM (
        |        SELECT doc_id, regexp_replace(deco,
        |            '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}]', '', 'g')
        |          AS nozw
        |        FROM (
        |          SELECT doc_id,
        |            CASE WHEN doc_id % 5 = 0 THEN
        |              chr(8220)||'intro'||chr(8221)||chr(8212)||' '
        |              ELSE '' END
        |            || text
        |            || CASE WHEN doc_id % 3 = 0 THEN ' tail'||chr(8230)
        |               ELSE '' END
        |            || CASE WHEN doc_id % 7 = 0 THEN
        |               chr(8203)||chr(160)||'x'||chr(9)||'y' ELSE '' END
        |            AS deco
        |          FROM documents)))))""".stripMargin) { (s, dir) =>
      val deco = concat(
        when(col("doc_id") % 5 === 0, lit("\u201Cintro\u201D\u2014 "))
          .otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 3 === 0, lit(" tail\u2026")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("\u200B\u00A0x\ty"))
          .otherwise(lit("")))
      W.read(s, dir, "documents")
        .select(col("doc_id"),
          graft.pipeline.TextAnalysis.normalizeUnicode(deco)
            .as("norm_text"))
    },

    // shard-balance audit over the writer's deterministic xxhash64
    // shard assignment: per shard, docs / weight / balance factor. The
    // oracle replays Spark's xxhash64(long) bit-exactly via the XXH64
    // long-fold chain (seed 42), so the hash certifies the ASSIGNMENT,
    // not just the rollup. doc_ids are non-negative in the sim, so the
    // unsigned bit pattern is the value itself.
    QueryDef("report_shard_balance",
      C.withCtes(
        """shin AS MATERIALIZED (
          |  SELECT doc_id, n_chars, CAST(doc_id AS HUGEINT) AS v1
          |  FROM documents)""".stripMargin,
        graft.queries.XxhSql.longFoldChain("sh", "shin",
          Seq("doc_id", "n_chars"), 1),
        s"""per AS (
           |  SELECT ((band_hash % $balShards) + $balShards) % $balShards
           |      AS shard,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(n_chars) AS BIGINT) AS weight
           |  FROM shf GROUP BY 1)""".stripMargin)(
        s"""SELECT shard, n_docs, weight,
           |  round(CAST(weight AS DOUBLE) * $balShards
           |    / CAST(sum(weight) OVER () AS DOUBLE), 6) AS balance
           |FROM per""".stripMargin)) { (s, dir) =>
      graft.pipeline.CorpusWriter.shardBalanceReport(
        W.read(s, dir, "documents"), balShards)
    }
  )

  /** Shard count for the balance audit (output files at sf scale). */
  private val balShards = 16
}
