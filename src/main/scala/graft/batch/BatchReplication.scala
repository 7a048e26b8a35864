package graft.batch

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{CatalogConnector, CatalogSnapshot}
import graft.fs.{CopyExec, FsOps}
import graft.model._
import graft.tasks.{TaskContext, Tasks}

/**
 * Batch replication driver — the Spark re-expression of the reference's
 * 3-stage MR pipeline (`batch/hive/MetastoreReplicationJob.java:53-100`):
 *
 *   1. plan:   diff both catalog snapshots → Dataset[Action] → parquet
 *   2. data:   plan ⨝ file manifests → distributed copy
 *   3. commit: metadata ops per action against the dest catalog
 *
 * One Spark application, three jobs; `--step` resume semantics come from
 * the persisted plan parquet (reference: `MetastoreReplicationJob.java:308-356`).
 * Blacklist filtering happens before any FS probing (early pruning, P1).
 */
final case class BatchConfig(
    srcConnector: CatalogConnector,
    destConnector: CatalogConnector,
    srcFsRoot: String,
    destFsRoot: String,
    planDir: String,
    blacklist: Seq[(String, String)] = Seq.empty,
    copyParallelism: Int = 32,
    tableListPath: Option[String] = None,
    // checksum copy level: detect + re-copy same-size corrupted files
    // (CopyExec.md5 — config-gated, off on stores where reads are costly)
    verifyChecksum: Boolean = false)

final case class BatchStats(
    planned: Long, copies: Long, drops: Long, commitFailures: Long)

object BatchReplication {

  /** S2 — table-list file scan (`MetastoreReplicationJob.java:435-462,
    * 589-626`): one `db.table` per line, malformed lines skipped (the
    * reference logs and continues). The standard entry point for partial
    * replication runs — the result feeds [[plan]] as an allowlist. */
  def tableList(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.textFile(path)
      .map(_.trim)
      .flatMap { line =>
        line.split('.') match {
          case Array(db, tbl) if db.nonEmpty && tbl.nonEmpty => Some((db, tbl))
          case _ => None
        }
      }
  }

  /** Stage 1: snapshot + diff + persist the plan. */
  def plan(spark: SparkSession, cfg: BatchConfig): Dataset[Action] = {
    import spark.implicits._
    def blacklisted(db: String, table: String): Boolean =
      cfg.blacklist.exists { case (d, t) => db.matches(d) && table.matches(t) }
    // S2 allowlist: collected driver-side deliberately — a table list is a
    // human-supplied file (the reference caps splits at 60 KB of text)
    val allow: Option[Set[(String, String)]] =
      cfg.tableListPath.map(p => tableList(spark, p).collect().toSet)
    def allowed(db: String, table: String): Boolean =
      allow.forall(_.contains((db, table)))

    val srcTables = CatalogSnapshot.tables(spark, cfg.srcConnector)
      .filter((t: TableMeta) => !blacklisted(t.db, t.table) && allowed(t.db, t.table))
    val destTables = CatalogSnapshot.tables(spark, cfg.destConnector)
      .filter((t: TableMeta) => !blacklisted(t.db, t.table) && allowed(t.db, t.table))
    val srcParts = CatalogSnapshot.partitions(spark, cfg.srcConnector)
      .filter((p: PartitionMeta) => !blacklisted(p.db, p.table) && allowed(p.db, p.table))
    val destParts = CatalogSnapshot.partitions(spark, cfg.destConnector)
      .filter((p: PartitionMeta) => !blacklisted(p.db, p.table) && allowed(p.db, p.table))

    val actions = graft.planner.DiffPlanner.plan(
      (srcTables, srcParts), (destTables, destParts))
    actions.write.mode("overwrite").parquet(cfg.planDir)
    spark.read.parquet(cfg.planDir).as[Action]
  }

  /**
   * Stage 2: one global distributed copy job. The plan's COPY actions fan
   * out to per-file rows *inside* `mapPartitions` (directory listings never
   * touch the driver), src and dest manifests full-outer join on the dest
   * path, and mismatching files flow into one repartitioned copy pass —
   * the Spark translation of the reference's stage-2 MR job
   * (`Stage2DirectoryCopyMapper.java:49-132` + reducer).
   */
  def copyData(spark: SparkSession, cfg: BatchConfig): Long = {
    import spark.implicits._
    val destOf = locationRewriter(cfg)
    val verify = cfg.verifyChecksum
    val dirs = spark.read.parquet(cfg.planDir).as[Action]
      .filter((a: Action) =>
        a.updateData && a.srcPath.isDefined &&
          (a.taskType == TaskType.CopyUnpartitionedTable ||
           a.taskType == TaskType.CopyPartition))
      .map(a => (a.srcPath.get, destOf(a.srcPath.get)))
      .filter((p: (String, String)) => p._1 != p._2)

    def listUnder(pairs: Dataset[(String, String)], useSrc: Boolean) =
      pairs.repartition(cfg.copyParallelism).mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { case (srcDir, destDir) =>
          val root = if (useSrc) srcDir else destDir
          val p = new org.apache.hadoop.fs.Path(root)
          val fs = p.getFileSystem(conf)
          val rootUri = fs.makeQualified(p).toUri
          FsOps.listFilesLocal(fs, p).map { case (path, len, mtime) =>
            val rel = rootUri.relativize(new java.net.URI(path)).getPath
            // key by absolute dest path so manifests of all dirs join at once
            (s"$destDir/$rel", srcDir, destDir, rel, len, mtime)
          }
        }
      }.toDF("destKey", "srcDir", "destDir", "relPath", "size", "mtime")

    val srcManifest = listUnder(dirs, useSrc = true)
    val destManifest = listUnder(dirs, useSrc = false)
      .select(col("destKey"), col("size").as("destSize"))

    // checksum level: size-equal files may still be corrupt, so every src
    // file flows to the copy stage whose skip decision compares digests
    val toCopy = srcManifest.join(destManifest, Seq("destKey"), "left_outer")
      .filter(lit(verify) ||
        col("destSize").isNull || col("destSize") =!= col("size"))
      .select("srcDir", "destDir", "relPath", "size", "mtime")
      .as[(String, String, String, Long, Long)]

    // Per-file results never reach the driver: status rollup is a
    // distributed aggregate, and only a bounded failure sample is collected
    // (at 100 TB the result set is O(files) — a driver OOM as a collect).
    // persist() keeps the effectful copy pass from re-running for the
    // failure sample (copies are idempotent, but once is cheaper).
    val results = toCopy.repartition(cfg.copyParallelism).mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      it.map { case (srcDir, destDir, rel, _, _) =>
        val fs = new org.apache.hadoop.fs.Path(destDir).getFileSystem(conf)
        CopyExec.copyOnePublic(fs, conf, srcDir, destDir,
          FileEntry(srcDir, rel, 0L, 0L), verify)
      }
    }.persist()
    try {
      val row = results.agg(
        count(when(col("status") === "COPIED", 1)),
        count(when(col("status").startsWith("FAILED"), 1))).head()
      val (copied, failed) = (row.getLong(0), row.getLong(1))
      if (failed > 0) {
        val sample = results.filter(col("status").startsWith("FAILED"))
          .select("status").take(1).headOption.map(_.getString(0)).getOrElse("")
        throw new java.io.IOException(s"$failed copies failed, first: $sample")
      }
      copied
    } finally {
      results.unpersist()
      ()
    }
  }

  private def locationRewriter(cfg: BatchConfig): String => String = {
    val (srcRoot, destRoot) = (cfg.srcFsRoot, cfg.destFsRoot)
    (loc: String) =>
      if (loc.startsWith("s3a://") || loc.startsWith("s3n://")) loc
      else loc.replace(srcRoot, destRoot)
  }

  /** Commit one plan action's metadata against the dest catalog (data moved
    * in stage 2). Runs on executors — uses only catalog connections. */
  private def commitOne(ctx: TaskContext, src: graft.catalog.CatalogClient,
      a: Action): Unit = a.taskType match {
    case TaskType.CopyUnpartitionedTable =>
      src.getTable(a.db, a.table).foreach { t =>
        Tasks.resolveConflict(ctx, t)
        val dest = Tasks.destTableMeta(ctx, t)
        if (ctx.destCatalog.getTable(a.db, a.table).isEmpty)
          ctx.destCatalog.createTable(dest)
        else ctx.destCatalog.alterTable(a.db, a.table, dest)
      }
    case TaskType.CopyPartitionedTable =>
      src.getTable(a.db, a.table).foreach(t =>
        Tasks.copyPartitionedTable(ctx, t))
    case TaskType.CopyPartition =>
      for {
        t <- src.getTable(a.db, a.table)
        p <- src.getPartition(a.db, a.table, a.partName.get)
      } {
        val dest = Tasks.destPartitionMeta(ctx, p)
        if (ctx.destCatalog.getTable(a.db, a.table).isEmpty)
          Tasks.copyPartitionedTable(ctx, t)
        if (ctx.destCatalog.getPartition(a.db, a.table, p.partName).isEmpty)
          ctx.destCatalog.addPartition(dest)
        else ctx.destCatalog.alterPartition(dest)
      }
    case TaskType.DropTable =>
      Tasks.dropTable(ctx, a.db, a.table, None)
    case TaskType.DropPartition =>
      Tasks.dropPartition(ctx, a.db, a.table, a.partName.get, None)
    case _ => ()
  }

  /** Stage 3: commit metadata per action (T1-T7 dispatch, reference
    * `Stage3CommitChangeMapper.java:72-168` — 150 commit mappers). The plan
    * is hash-partitioned by (db, table) so each table's actions land in one
    * partition, sorted tables-before-partitions within it (a partition add
    * requires its table); cross-table commits run in parallel on executors
    * with one catalog connection per partition. The driver sees only the
    * per-task-type rollup, never O(actions) rows. */
  def commit(spark: SparkSession, cfg: BatchConfig): BatchStats = {
    import spark.implicits._
    val (srcConn, destConn) = (cfg.srcConnector, cfg.destConnector)
    val (srcRoot, destRoot) = (cfg.srcFsRoot, cfg.destFsRoot)
    val sorted = spark.read.parquet(cfg.planDir).as[Action]
      .repartition(cfg.copyParallelism, col("db"), col("table"))
      .sortWithinPartitions(col("db"), col("table"),
        col("partName").isNotNull, col("partName"))
    if (!srcConn.executorSafe || !destConn.executorSafe) {
      // a session-bound catalog is reachable only from the driver: stream
      // the plan through one driver-side pass (toLocalIterator — bounded
      // memory, one partition at a time) with incremental counters; a
      // cluster deployment plugs in an executor-safe Thrift-style
      // connector and takes the distributed path below
      val src = srcConn.connect()
      val ctx = TaskContext.metadataOnly(destConn.connect(), srcRoot, destRoot)
      var (planned, copies, drops, failures) = (0L, 0L, 0L, 0L)
      val it = sorted.toLocalIterator()
      while (it.hasNext) {
        val a = it.next()
        planned += 1
        if (a.taskType.startsWith("COPY")) copies += 1
        if (a.taskType.startsWith("DROP")) drops += 1
        try commitOne(ctx, src, a)
        catch { case _: Throwable => failures += 1 }
      }
      return BatchStats(planned, copies, drops, failures)
    }
    val results = sorted.mapPartitions { it =>
        val src = srcConn.connect()
        val ctx = TaskContext.metadataOnly(destConn.connect(), srcRoot, destRoot)
        it.map { a =>
          val ok = try { commitOne(ctx, src, a); true }
                   catch { case _: Throwable => false }
          (a.taskType, ok)
        }
      }
      .toDF("taskType", "ok")
      .agg(
        count(lit(1)),
        count(when(col("taskType").startsWith("COPY"), 1)),
        count(when(col("taskType").startsWith("DROP"), 1)),
        count(when(!col("ok"), 1)))
      .head()
    BatchStats(
      planned = results.getLong(0),
      copies = results.getLong(1),
      drops = results.getLong(2),
      commitFailures = results.getLong(3))
  }

  /** Run all three stages (steps resumable individually). */
  def run(spark: SparkSession, cfg: BatchConfig): BatchStats = {
    plan(spark, cfg)
    copyData(spark, cfg)
    commit(spark, cfg)
  }
}
