package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the pre-shuffle technique SCALE.md
  * prescribes for repeated big-big joins (e.g. nightly manifest diffs of
  * the same two warehouses): both sides written bucketed on the join key
  * join WITHOUT a shuffle exchange, and the result matches the exchange
  * plan exactly. */
class BucketingSpec extends TestBase {

  test("bucketed manifest tables diff without a shuffle exchange") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val src = graft.sim.WarehouseSim.srcFiles(spark, sfDir)
    val dest = graft.sim.WarehouseSim.destFiles(spark, sfDir)

    spark.sql("DROP TABLE IF EXISTS b_src_files")
    spark.sql("DROP TABLE IF EXISTS b_dest_files")
    def writeBucketed(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.write.mode("overwrite")
        .bucketBy(8, "rel_path").sortBy("rel_path")
        .format("parquet").saveAsTable(name)
    writeBucketed(src, "b_src_files")
    writeBucketed(dest, "b_dest_files")
    try {

    val joined = spark.table("b_src_files").as("s")
      .join(spark.table("b_dest_files").as("d"),
        col("s.rel_path") === col("d.rel_path"), "full_outer")
      .select(coalesce(col("s.rel_path"), col("d.rel_path")).as("rel_path"),
        col("s.size").as("src_size"), col("d.size").as("dest_size"))

    // the bucketed layout IS the shuffle, persisted: no exchange in plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    // identical results to the ordinary (exchange) plan
    val expected = src.as("s")
      .join(dest.as("d"), col("s.rel_path") === col("d.rel_path"), "full_outer")
      .select(coalesce(col("s.rel_path"), col("d.rel_path")).as("rel_path"),
        col("s.size").as("src_size"), col("d.size").as("dest_size"))
      .as[(String, Option[Long], Option[Long])].collect().toSet
    val got = joined.as[(String, Option[Long], Option[Long])].collect().toSet
    assert(got == expected)

    } finally {
      // drop even on assertion failure: the metastore/warehouse persist on
      // disk and stale managed tables would dirty later runs
      spark.sql("DROP TABLE IF EXISTS b_src_files")
      spark.sql("DROP TABLE IF EXISTS b_dest_files")
    }
  }
}
