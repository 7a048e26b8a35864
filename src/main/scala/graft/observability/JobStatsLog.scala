package graft.observability

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Per-job execution stats — the analog of the reference's
 * MapRedStats audit sidecar (`hive-hooks/.../MapRedStatsLogModule.java`:
 * one `mapred_stats` row per Hive stage with mappers/reducers/cpu_time/
 * counters, keyed by the audit-log id). A Spark replication job has no
 * MR stages; the per-job equivalents are the operation, its object
 * scope, wall duration, and the retry count — enough to attribute lag
 * and failure hot-spots to specific tables, which is what the reference
 * uses the table for.
 *
 * One JSON file per execution (atomic create, same discipline as the
 * audit dir), so concurrent workers never interleave writes and a crash
 * can't corrupt the log. [[JobStatsLog.read]] loads the directory as a
 * DataFrame for dashboards/rollups.
 */
final case class JobStats(
    job_id: Long,
    operation: String,
    db: String,
    table: String,
    n_partitions: Int,
    status: String,
    attempts: Int,
    duration_ms: Long,
    completed_at: String)

final class JobStatsLog(dir: String) {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def append(s: JobStats): Unit = {
    val node = mapper.createObjectNode()
    node.put("job_id", s.job_id)
    node.put("operation", s.operation)
    node.put("db", s.db)
    node.put("table", s.table)
    node.put("n_partitions", s.n_partitions)
    node.put("status", s.status)
    node.put("attempts", s.attempts)
    node.put("duration_ms", s.duration_ms)
    node.put("completed_at", s.completed_at)
    val d = graft.fs.LocalDirs.resolve(dir)
    Files.createDirectories(d)
    // nanos in the name: retries/recovery legally execute one job id
    // more than once, and each execution is its own stats row
    Files.write(d.resolve(f"stats-${s.job_id}%012d-${System.nanoTime()}.json"),
      (mapper.writeValueAsString(node) + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
  }
}

object JobStatsLog {
  import org.apache.spark.sql.types._


  val schema: StructType = StructType(Seq(
    StructField("job_id", LongType),
    StructField("operation", StringType),
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("n_partitions", IntegerType),
    StructField("status", StringType),
    StructField("attempts", IntegerType),
    StructField("duration_ms", LongType),
    StructField("completed_at", StringType)))

  /** Readers resolve through [[graft.fs.LocalDirs]] like the writer
    * does: `append` writes strictly to driver-local disk, so the read
    * path must carry an explicit `file:` scheme — otherwise on a
    * cluster whose Hadoop defaultFS is remote (HDFS/S3) the reader
    * would look at the wrong filesystem and silently see no files. */
  private def localUri(dir: String): String =
    graft.fs.LocalDirs.resolve(dir).toUri.toString

  /** The stats directory as a DataFrame (explicit schema — no inference
    * pass over what can be millions of small files). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(schema).json(localUri(dir))

  /** One job's execution rows only: the `stats-<id>-*` name prefix is
    * a glob filter, so a per-job drill-down reads just that job's
    * files instead of scanning the whole sidecar. */
  def readJob(spark: SparkSession, dir: String, jobId: Long): DataFrame =
    spark.read.schema(schema)
      .option("pathGlobFilter", f"stats-$jobId%012d-*.json")
      .json(localUri(dir))
}
