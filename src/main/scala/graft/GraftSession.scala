package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction so Verify/Bench/tests agree on the
  * configs that affect correctness and local-mode performance. */
object GraftSession {

  /** Apply graft's session configs to a builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read as epoch-nanos long and convert at the source
    // (WarehouseSim.read) with exact integer division.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // InferFiltersFromGenerate duplicates the generator's child expression
    // into a non-codegen pre-filter evaluated per input row — for computed
    // arrays (shingles) that re-runs the whole tokenize+shingle pipeline
    // 2x more per row, turning a 2s explode into 20s. The filter only
    // skips empty arrays, which our generates handle anyway.
    .config("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")

  /** Build the session AND install graft's extensions (native SQL
    * functions + the intersect-count optimizer rule) — one registration
    * up front instead of register-on-first-use per call site. */
  def create(b: SparkSession.Builder): SparkSession = {
    val spark = configure(b).getOrCreate()
    GraftExtensions.install(spark)
    spark
  }

  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    create(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus))
  }
}
