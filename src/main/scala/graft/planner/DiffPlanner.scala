package graft.planner

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.model._

/**
 * The replication planner: diffs two catalog snapshots into a
 * `Dataset[Action]` — the engine's stage-1 (reference
 * `MetastoreReplicationJob` stage 1 + `TaskEstimator.analyze`,
 * `incremental/primitives/TaskEstimator.java:74-212`).
 *
 * Pure relational: two full-outer joins (tables, partitions) and `when`
 * case analysis. The plan is persisted as Parquet between phases (reference
 * persists gzip TSV, `MetastoreReplicationJob.java:402`).
 */
object DiffPlanner {

  import org.apache.spark.sql.{Row}

  /** J1 on real snapshots: classify each (db, table). */
  def planTables(src: Dataset[TableMeta], dest: Dataset[TableMeta]): Dataset[Action] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.as("s").joinWith(dest.as("d"),
        col("s.db") === col("d.db") && col("s.table") === col("d.table"),
        "full_outer")
      .map { case (s, d) =>
        val taskType = (Option(s), Option(d)) match {
          case (Some(st), None) =>
            if (st.isPartitioned) TaskType.CopyPartitionedTable
            else TaskType.CopyUnpartitionedTable
          case (None, Some(_)) => TaskType.DropTable
          case (Some(st), Some(dt)) =>
            // strip non-comparables (P9) and compare what the reference
            // compares: location-relative layout, cols, tldt
            if (st.lastModified > dt.lastModified ||
                st.cols != dt.cols || st.partitionKeys != dt.partitionKeys) {
              if (st.isPartitioned) TaskType.CopyPartitionedTable
              else TaskType.CopyUnpartitionedTable
            } else TaskType.NoOp
          case _ => TaskType.NoOp
        }
        val obj = Option(s).orElse(Option(d)).get
        Action(
          taskType = taskType,
          db = obj.db, table = obj.table, partName = None,
          updateMetadata = taskType != TaskType.NoOp,
          updateData = taskType == TaskType.CopyUnpartitionedTable && s != null,
          srcPath = Option(s).map(_.location),
          destPath = Option(d).map(_.location))
      }
  }

  /** J2 on real snapshots: classify each (db, table, partition). */
  def planPartitions(src: Dataset[PartitionMeta],
      dest: Dataset[PartitionMeta]): Dataset[Action] = {
    val spark = src.sparkSession
    import spark.implicits._
    src.as("s").joinWith(dest.as("d"),
        col("s.db") === col("d.db") && col("s.table") === col("d.table") &&
          col("s.partName") === col("d.partName"),
        "full_outer")
      .map { case (s, d) =>
        val taskType = (Option(s), Option(d)) match {
          case (Some(_), None) => TaskType.CopyPartition
          case (None, Some(_)) => TaskType.DropPartition
          case (Some(sp), Some(dp)) =>
            if (sp.lastModified > dp.lastModified) TaskType.CopyPartition
            else TaskType.NoOp
          case _ => TaskType.NoOp
        }
        val obj = Option(s).orElse(Option(d)).get
        Action(
          taskType = taskType,
          db = obj.db, table = obj.table, partName = Some(obj.partName),
          updateMetadata = taskType != TaskType.NoOp,
          updateData = taskType == TaskType.CopyPartition,
          srcPath = Option(s).map(_.location),
          destPath = Option(d).map(_.location))
      }
  }

  /** Full plan: table actions ∪ partition actions, NO_OPs dropped. */
  def plan(src: (Dataset[TableMeta], Dataset[PartitionMeta]),
      dest: (Dataset[TableMeta], Dataset[PartitionMeta])): Dataset[Action] =
    planTables(src._1, dest._1)
      .union(planPartitions(src._2, dest._2))
      .filter((a: Action) => a.taskType != TaskType.NoOp)

  /**
   * A5 — common-ancestor directory of a set of locations: component-wise
   * longest common prefix, guarded on scheme+authority equality. The
   * reference folds this on the driver (`ReplicationUtils.java:361-427`);
   * here it is a distributive `Aggregator` (merge of two LCPs is an LCP),
   * usable per-table via `groupBy(...).agg(commonAncestor)`.
   */
  object CommonAncestorAgg extends Aggregator[String, Option[Vector[String]], String] {
    private def components(loc: String): Vector[String] = {
      val u = java.net.URI.create(loc)
      val prefix = Option(u.getScheme).map(s =>
        s + "://" + Option(u.getAuthority).getOrElse("")).getOrElse("")
      Vector(prefix) ++ u.getPath.split("/").filter(_.nonEmpty).toVector
    }
    private def lcp(a: Vector[String], b: Vector[String]): Vector[String] =
      a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)

    def zero: Option[Vector[String]] = None
    def reduce(acc: Option[Vector[String]], loc: String): Option[Vector[String]] =
      acc match {
        case None => Some(components(loc))
        case Some(v) => Some(lcp(v, components(loc)))
      }
    def merge(a: Option[Vector[String]], b: Option[Vector[String]]): Option[Vector[String]] =
      (a, b) match {
        case (None, x) => x
        case (x, None) => x
        case (Some(x), Some(y)) => Some(lcp(x, y))
      }
    def finish(acc: Option[Vector[String]]): String = acc match {
      case None | Some(Vector()) => ""
      case Some(prefix +: rest) if prefix.nonEmpty =>
        if (rest.isEmpty) prefix else prefix + rest.mkString("/", "/", "")
      // scheme-less locations: components() put "" at the head — render
      // as an absolute path with "/" separators (not concatenated).
      case Some(v) => v.filter(_.nonEmpty).mkString("/", "/", "")
    }
    def bufferEncoder: Encoder[Option[Vector[String]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
