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
    copyParallelism: Int = 32)

final case class BatchStats(
    planned: Long, copies: Long, drops: Long, commitFailures: Long)

object BatchReplication {

  /** Stage 1: snapshot + diff + persist the plan. */
  def plan(spark: SparkSession, cfg: BatchConfig): Dataset[Action] = {
    import spark.implicits._
    def blacklisted(db: String, table: String): Boolean =
      cfg.blacklist.exists { case (d, t) => db.matches(d) && table.matches(t) }

    val srcTables = CatalogSnapshot.tables(spark, cfg.srcConnector)
      .filter((t: TableMeta) => !blacklisted(t.db, t.table))
    val destTables = CatalogSnapshot.tables(spark, cfg.destConnector)
      .filter((t: TableMeta) => !blacklisted(t.db, t.table))
    val srcParts = CatalogSnapshot.partitions(spark, cfg.srcConnector)
      .filter((p: PartitionMeta) => !blacklisted(p.db, p.table))
    val destParts = CatalogSnapshot.partitions(spark, cfg.destConnector)
      .filter((p: PartitionMeta) => !blacklisted(p.db, p.table))

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

    val toCopy = srcManifest.join(destManifest, Seq("destKey"), "left_outer")
      .filter(col("destSize").isNull || col("destSize") =!= col("size"))
      .select("srcDir", "destDir", "relPath", "size", "mtime")
      .as[(String, String, String, Long, Long)]

    val results = toCopy.repartition(cfg.copyParallelism).mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      it.map { case (srcDir, destDir, rel, _, _) =>
        val fs = new org.apache.hadoop.fs.Path(destDir).getFileSystem(conf)
        CopyExec.copyOnePublic(fs, conf, srcDir, destDir,
          FileEntry(srcDir, rel, 0L, 0L))
      }
    }.collect()
    val failed = results.filter(_.status.startsWith("FAILED"))
    if (failed.nonEmpty) throw new java.io.IOException(
      s"${failed.length} copies failed, first: ${failed.head.status}")
    results.count(_.status == "COPIED").toLong
  }

  private def locationRewriter(cfg: BatchConfig): String => String = {
    val (srcRoot, destRoot) = (cfg.srcFsRoot, cfg.destFsRoot)
    (loc: String) =>
      if (loc.startsWith("s3a://") || loc.startsWith("s3n://")) loc
      else loc.replace(srcRoot, destRoot)
  }

  /** Stage 3: commit metadata per action (T1-T7 dispatch,
    * reference `Stage3CommitChangeMapper.java:72-168`). */
  def commit(spark: SparkSession, cfg: BatchConfig): BatchStats = {
    import spark.implicits._
    val actions = spark.read.parquet(cfg.planDir).as[Action].collect()
    val src = cfg.srcConnector.connect()
    val ctx = TaskContext(spark, cfg.destConnector.connect(),
      cfg.srcFsRoot, cfg.destFsRoot)
    var failures = 0L
    // tables before their partitions (partition add requires the table)
    val ordered = actions.sortBy(a => (a.partName.isDefined, a.db, a.table))
    ordered.foreach { a =>
      try {
        a.taskType match {
          case TaskType.CopyUnpartitionedTable =>
            src.getTable(a.db, a.table).foreach { t =>
              // data moved in stage 2; just commit metadata
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
      } catch { case _: Throwable => failures += 1 }
    }
    BatchStats(
      planned = actions.length.toLong,
      copies = actions.count(_.taskType.startsWith("COPY")).toLong,
      drops = actions.count(_.taskType.startsWith("DROP")).toLong,
      commitFailures = failures)
  }

  /** Run all three stages (steps resumable individually). */
  def run(spark: SparkSession, cfg: BatchConfig): BatchStats = {
    plan(spark, cfg)
    copyData(spark, cfg)
    commit(spark, cfg)
  }
}
