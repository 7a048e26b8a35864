package graft

import org.apache.spark.sql.functions._

import graft.functions.CmsProbe
import graft.pipeline.TextAnalysis
import graft.sim.{WarehouseSim => W}

/** Count-Min probe expression + the CMS-pruned exact heavy-grams path. */
class CmsProbeSpec extends TestBase {
  import spark.implicits._

  test("estimates are one-sided (never undercount) and exact without collisions") {
    // keys 1..20 with count = key; tiny eps so the 20-key fixture cannot
    // collide inside the sketch's own buckets
    val rows = (1 to 20).flatMap(k => Seq.fill(k)(k.toLong))
    val df = rows.toDF("h")
    val bytes = df
      .agg(expr("count_min_sketch(h, CAST(0.0001 AS DOUBLE), " +
        "CAST(0.999 AS DOUBLE), 42)").as("cms"))
      .head().getAs[Array[Byte]](0)
    val cms = CmsProbe.deserialize(bytes)
    val est = (1 to 20).map(_.toLong).toDF("h")
      .select(col("h"), CmsProbe.estimate(spark, cms, col("h")).as("est"))
      .as[(Long, Long)].collect().toMap
    (1 to 20).foreach { k =>
      assert(est(k.toLong) >= k.toLong, s"undercount for key $k")
      assert(est(k.toLong) === k.toLong, s"collision at tiny eps for key $k")
    }
    // an absent key estimates 0 here (nothing hashed near it)
    val absent = Seq(999999L).toDF("h")
      .select(CmsProbe.estimate(spark, cms, col("h"))).as[Long].collect().head
    assert(absent >= 0L)
  }

  test("null keys estimate to null, and the sketch literal must be binary") {
    val rows = Seq(1L, 1L, 2L).toDF("h")
    val bytes = rows.agg(expr("count_min_sketch(h, CAST(0.01 AS DOUBLE), " +
      "CAST(0.9 AS DOUBLE), 7)")).head().getAs[Array[Byte]](0)
    val cms = CmsProbe.deserialize(bytes)
    val out = Seq(Some(1L), None).toDF("h")
      .select(CmsProbe.estimate(spark, cms, col("h")).as("e"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq === Seq(Some(2L), None))
  }

  test("heavyGramsCms equals the unpruned exact aggregation") {
    val docs = W.read(spark, "/root/testdata/sf0.001", "documents")
    val pruned = TextAnalysis.heavyGramsCms(docs, minCount = 5L)
      .as[(String, Long)].collect().toSet
    val exact = docs
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(explode(TextAnalysis.bigrams(col("toks"))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 5L)
      .as[(String, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture threshold too high — no heavy grams")
    assert(pruned === exact)
  }

  test("the CMS filter runs map-side: under the count Exchange, codegen'd") {
    val docs = W.read(spark, "/root/testdata/sf0.001", "documents")
    val s = TextAnalysis.heavyGramsCms(docs, minCount = 5L)
      .queryExecution.executedPlan.toString
    val fi = s.indexOf("graft_cms_estimate")
    assert(fi >= 0, "CMS filter missing from the physical plan")
    // the tree prints parents above children: the count shuffle must sit
    // ABOVE the CMS filter, and nothing below the filter may shuffle
    val ei = s.indexOf("Exchange")
    assert(ei >= 0 && ei < fi,
      "count Exchange not found above the CMS filter")
    assert(!s.substring(fi).contains("Exchange"),
      "an Exchange appears beneath the CMS filter — the prune is not map-side")
  }
}
