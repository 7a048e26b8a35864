package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, PipelineQueries2, PipelineQueries3, PipelineQueries4, PipelineQueries5, PipelineQueries6, PipelineQueries7, PipelineQueries8, PipelineQueries9, PipelineQueries10, PipelineQueries11, PipelineQueries12, PipelineQueries13, PipelineQueries14, PipelineQueries15, PipelineQueries16, PipelineQueries17, QueryDef, ReplicationQueries, ReplicationQueries2}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's full query surface: every SURVEY.md §2 operator (replication
  * diffs, manifest compares, audit assembly/routing) plus the training-data
  * pipeline operators (dedup, similarity, text analysis, multimodal), each
  * with a DuckDB oracle twin where SQL-expressible.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    ReplicationQueries.defs ++ ReplicationQueries2.defs ++
      PipelineQueries.defs ++ PipelineQueries2.defs ++ PipelineQueries3.defs ++
      PipelineQueries4.defs ++ PipelineQueries5.defs ++ PipelineQueries6.defs ++
      PipelineQueries7.defs ++ PipelineQueries8.defs ++ PipelineQueries9.defs ++
      PipelineQueries10.defs ++ PipelineQueries11.defs ++
      PipelineQueries12.defs ++ PipelineQueries13.defs ++
      PipelineQueries14.defs ++ PipelineQueries15.defs ++
      PipelineQueries16.defs ++ PipelineQueries17.defs

  /** Flagship query on /root/testdata/sf0.001: the J1 table-inventory diff —
    * the heart of the replication planner. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_table_diff")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
