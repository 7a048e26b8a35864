package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

class GlobalRankSpec extends TestBase {
  import spark.implicits._

  private def sampleDf(n: Int) = {
    // deliberately skewed scores (many ties) + unique id tie-break
    (0 until n).map(i => (i.toLong, (i * 7919) % 13, (i % 5 + 1).toLong))
      .toDF("id", "score", "w")
      .repartition(7) // multi-partition input, arbitrary placement
  }

  test("withGlobalRank equals the single-partition window twin") {
    val df = sampleDf(500)
    val order = Seq(col("score").desc, col("id"))
    val got = GlobalRank.withGlobalRank(df, order, partitions = 6)
      .select("id", "global_rank").as[(Long, Long)].collect().toMap
    val want = df.withColumn("global_rank",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("id", "global_rank").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("withGlobalRank is dense, 1-based, and deterministic across runs") {
    val df = sampleDf(300)
    val order = Seq(col("score"), col("id").desc)
    val a = GlobalRank.withGlobalRank(df, order, partitions = 5)
      .select("id", "global_rank").as[(Long, Long)].collect().sorted
    val b = GlobalRank.withGlobalRank(df, order, partitions = 11)
      .select("id", "global_rank").as[(Long, Long)].collect().sorted
    assert(a === b) // partition count must not change the ranks
    val ranks = a.map(_._2).sorted
    assert(ranks === (1L to 300L).toArray)
  }

  test("withRunningTotal equals the window prefix sum, inclusive") {
    val df = sampleDf(400)
    val order = Seq(col("id"))
    val got = GlobalRank.withRunningTotal(df, order, "w", partitions = 6)
      .select("id", "running_total").as[(Long, Long)].collect().toMap
    val want = df.withColumn("running_total",
        sum(col("w")).over(Window.orderBy(col("id"))))
      .select("id", "running_total").as[(Long, Long)].collect().toMap
    assert(got === want)
    // exclusive prefix of the first row in id order is 0
    val first = df.orderBy("id").select("id", "w").as[(Long, Long)].head()
    assert(got(first._1) === first._2)
  }

  test("withRunningTotal treats null values as zero and rejects non-numerics") {
    val df = Seq((1L, Some(2L)), (2L, None), (3L, Some(5L)))
      .toDF("id", "w").repartition(3)
    val got = GlobalRank.withRunningTotal(df, Seq(col("id")), "w")
      .select("id", "running_total").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 7L))
    val bad = Seq((1L, "x")).toDF("id", "w")
    val ex = intercept[org.apache.spark.SparkException] {
      GlobalRank.withRunningTotal(bad, Seq(col("id")), "w").collect()
    }
    assert(ex.getMessage != null)
  }

  test("tied order column: ranks are deterministic across partition counts") {
    // score has only 13 distinct values over 400 rows — heavy ties.
    // Without the internal row-hash tie-break, tie placement (and so
    // each row's rank) would depend on partition boundaries and task
    // fetch order; with it, the full assignment must reproduce exactly.
    val df = sampleDf(400)
    val order = Seq(col("score")) // deliberately NOT a total order
    def ranks(p: Int): Map[Long, Long] =
      GlobalRank.withGlobalRank(df, order, partitions = p)
        .select("id", "global_rank").as[(Long, Long)].collect().toMap
    val a = ranks(3); val b = ranks(9)
    assert(a === b, "tied ranks must not depend on partitioning")
    assert(a.values.toSeq.sorted === (1L to 400L),
      "ranks must stay dense and 1-based under ties")
    // ranks still respect the caller's order across tie groups
    val byId = df.select("id", "score").as[(Long, Int)].collect().toMap
    for ((id1, r1) <- a; (id2, r2) <- a if r1 < r2)
      assert(byId(id1) <= byId(id2),
        s"rank order must respect score: id $id1(r$r1) vs $id2(r$r2)")
  }

  test("tied order column: running totals are deterministic and consistent") {
    val df = sampleDf(400)
    val order = Seq(col("score")) // ties everywhere
    def totals(p: Int): Map[Long, Long] =
      GlobalRank.withRunningTotal(df, order, "w", partitions = p)
        .select("id", "running_total").as[(Long, Long)].collect().toMap
    val a = totals(3); val b = totals(9)
    assert(a === b, "tied running totals must not depend on partitioning")
    // the implied sequence is a valid prefix-sum of w in score order
    val rows = GlobalRank.withRunningTotal(df, order, "w", partitions = 5)
      .select("score", "w", "running_total")
      .as[(Int, Long, Long)].collect().sortBy(_._3)
    var acc = 0L
    var prevScore = Int.MinValue
    for ((score, w, total) <- rows) {
      acc += w
      assert(total === acc, "totals must be an exact inclusive prefix sum")
      assert(score >= prevScore, "prefix order must respect the score order")
      prevScore = score
    }
  }

  test("map-typed payload columns rank fine (excluded from the tie-break hash)") {
    // Spark's hash expressions reject MapType, so hashing every column
    // verbatim would fail at plan time on inputs that previously worked
    // with a caller-supplied total order. Map columns stay out of the
    // hash; everything else still tie-breaks deterministically.
    val df = (0 until 120)
      .map(i => (i.toLong, (i * 31) % 7, Map("k" -> i.toLong)))
      .toDF("id", "score", "payload").repartition(5)
    def ranks(p: Int): Map[Long, Long] =
      GlobalRank.withGlobalRank(df, Seq(col("score")), partitions = p)
        .select("id", "global_rank").as[(Long, Long)].collect().toMap
    val a = ranks(3); val b = ranks(8)
    assert(a === b, "ties must stay partition-count-stable with a map payload")
    assert(a.values.toSeq.sorted === (1L to 120L))
    // the map payload survives the rank append intact
    val row = GlobalRank.withGlobalRank(df, Seq(col("score"), col("id")))
      .filter(col("id") === 7L).select("payload")
      .as[Map[String, Long]].head()
    assert(row === Map("k" -> 7L))
  }

  test("no single-partition exchange: the plan range-shuffles instead") {
    val df = sampleDf(100)
    val ranked = GlobalRank.withGlobalRank(df, Seq(col("score"), col("id")),
      partitions = 4)
    // The ranked frame is built from an RDD zip over a range shuffle; a
    // window twin would show Exchange SinglePartition in its plan.
    val windowPlan = df.withColumn("r",
        row_number().over(Window.orderBy(col("score"), col("id"))))
      .queryExecution.executedPlan.toString
    assert(windowPlan.contains("SinglePartition"))
    assert(ranked.rdd.getNumPartitions === 4)
  }
}
