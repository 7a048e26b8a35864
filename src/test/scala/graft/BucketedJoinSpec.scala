package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusWriter, TextAnalysis}
import graft.sim.WarehouseSim

/** Bucketed tables make the pipeline's doc_id-keyed merges exchange-free:
  * the shuffle is paid once at write time, then every join on the bucket
  * column reads co-located buckets. */
class BucketedJoinSpec extends TestBase {

  test("a doc_id-bucketed corpus joins its signal table with no exchange") {
    val docs = WarehouseSim.read(spark, "/root/testdata/sf0.001", "documents")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      CorpusWriter.writeBucketed(docs.select("doc_id", "text", "lang"),
        "bspec_corpus", "doc_id", 8, sortCols = Seq("doc_id"))
      CorpusWriter.writeBucketed(
        TextAnalysis.qualityGate(docs)
          .select("doc_id", "quality_score", "pass"),
        "bspec_signals", "doc_id", 8, sortCols = Seq("doc_id"))
      val joined = spark.table("bspec_corpus")
        .join(spark.table("bspec_signals"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and the merge is correct: one row per doc, signals attached
      assert(joined.count() == docs.count())
      assert(joined.filter(col("quality_score").isNull).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bspec_corpus")
      spark.sql("DROP TABLE IF EXISTS bspec_signals")
    }
  }

  test("bucket-pruned point lookup reads one bucket") {
    val docs = WarehouseSim.read(spark, "/root/testdata/sf0.001", "documents")
    // the planner drops bucket layout for plain filters unless auto
    // bucketed-scan selection is off — force it to see the pruning
    val prevAuto = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      CorpusWriter.writeBucketed(docs.select("doc_id", "text"),
        "bspec_prune", "doc_id", 8)
      val one = spark.table("bspec_prune").filter(col("doc_id") === 42L)
      // bucket pruning shows up as "Bucketed: true" with SelectedBucketsCount
      val scan = one.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"no bucket pruning in:\n$scan")
      assert(one.count() == 1)
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        prevAuto)
      spark.sql("DROP TABLE IF EXISTS bspec_prune")
    }
  }
}
