package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** The bounded-heap top-k aggregate vs the window formulation it
  * replaces: equality on the corpus (merge path forced through many
  * partitions), small-group and null handling, atomic-type support,
  * and the ObjectHashAggregate partial-aggregation plan pin. */
class TopKAggSpec extends TestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("topk(struct) matches the row_number window on the corpus") {
    val docs = graft.sim.WarehouseSim.read(spark, sfDir, "documents")
      .repartition(13) // force the serialize/merge partial path
    val got = docs.groupBy("lang")
      .agg(TopKAgg.topk(spark, struct(col("n_chars"), col("doc_id")), 5)
        .as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).as("rnk"),
        col("col.n_chars"), col("col.doc_id"))
      .as[(String, Int, Long, Long)].collect().toSet
    val w = Window.partitionBy("lang")
      .orderBy(col("n_chars").desc, col("doc_id").desc)
    val want = docs.select(col("lang"), row_number().over(w).as("rnk"),
        col("n_chars"), col("doc_id"))
      .filter(col("rnk") <= 5)
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("k larger than the group returns the whole group, sorted desc") {
    val df = Seq(("g", 3L), ("g", 1L), ("g", 2L)).toDF("g", "v")
    val got = df.groupBy("g").agg(TopKAgg.topk(spark, col("v"), 10).as("t"))
      .select("t").as[Seq[Long]].collect().head
    assert(got === Seq(3L, 2L, 1L))
  }

  test("nulls are ignored; all-null group yields an empty array") {
    val df = Seq(("g", Some(2L)), ("g", None), ("h", None))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(TopKAgg.topk(spark, col("v"), 3).as("t"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got === Map("g" -> Seq(2L), "h" -> Seq.empty))
  }

  test("atomic orderable types work — top strings") {
    val df = Seq("pear", "apple", "quince", "fig").toDF("s")
      .repartition(3)
    val got = df.agg(TopKAgg.topk(spark, col("s"), 2).as("t"))
      .select("t").as[Seq[String]].collect().head
    assert(got === Seq("quince", "pear"))
  }

  test("ties keep duplicates up to k (a multiset, not distinct)") {
    val df = Seq(5L, 5L, 5L, 1L).toDF("v")
    val got = df.agg(TopKAgg.topk(spark, col("v"), 3).as("t"))
      .select("t").as[Seq[Long]].collect().head
    assert(got === Seq(5L, 5L, 5L))
  }

  test("property: topk == sorted-take for arbitrary groups, values, k") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val dataGen = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 4)
        v <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      } yield (s"g$g", v))
    } yield rows
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(dataGen, Gen.choose(1, 12)) { (rows, k) =>
        val got = rows.toDF("g", "v").repartition(5)
          .groupBy("g").agg(TopKAgg.topk(spark, col("v"), k).as("t"))
          .as[(String, Seq[Long])].collect().toMap
        val want = rows.groupBy(_._1).map { case (g, rs) =>
          g -> rs.map(_._2).sorted(Ordering[Long].reverse).take(k)
        }
        Prop(got == want).label(s"k=$k n=${rows.size}")
      })
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  test("bottomk(struct) matches the ascending row_number window on the corpus") {
    val docs = graft.sim.WarehouseSim.read(spark, sfDir, "documents")
      .repartition(13) // force the serialize/merge partial path
    val got = docs.groupBy("lang")
      .agg(TopKAgg.bottomk(spark, struct(col("n_chars"), col("doc_id")), 5)
        .as("bot"))
      .select(col("lang"), posexplode(col("bot")))
      .select(col("lang"), (col("pos") + 1).as("rnk"),
        col("col.n_chars"), col("col.doc_id"))
      .as[(String, Int, Long, Long)].collect().toSet
    val w = Window.partitionBy("lang")
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val want = docs.select(col("lang"), row_number().over(w).as("rnk"),
        col("n_chars"), col("doc_id"))
      .filter(col("rnk") <= 5)
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("bottomk returns ascending order and ignores nulls") {
    val df = Seq(("g", Some(3L)), ("g", Some(1L)), ("g", None),
      ("g", Some(2L)), ("h", None)).toDF("g", "v").repartition(4)
    val got = df.groupBy("g").agg(TopKAgg.bottomk(spark, col("v"), 2).as("t"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got === Map("g" -> Seq(1L, 2L), "h" -> Seq.empty))
  }

  test("property: bottomk == sorted-take ascending (multi-partition merge)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val dataGen = for {
      n <- Gen.choose(0, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 4)
        v <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      } yield (s"g$g", v))
    } yield rows
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(dataGen, Gen.choose(1, 12)) { (rows, k) =>
        val got = rows.toDF("g", "v").repartition(5)
          .groupBy("g").agg(TopKAgg.bottomk(spark, col("v"), k).as("t"))
          .as[(String, Seq[Long])].collect().toMap
        val want = rows.groupBy(_._1).map { case (g, rs) =>
          g -> rs.map(_._2).sorted.take(k)
        }
        Prop(got == want).label(s"k=$k n=${rows.size}")
      })
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  test("topk aggregates a stream (complete mode) to the batch result") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val agg = input.toDF().toDF("g", "v")
      .groupBy("g").agg(TopKAgg.topk(spark, col("v"), 2).as("t"))
    val qName = s"topk_${System.nanoTime()}"
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(qName).start()
    try {
      input.addData(("a", 1L), ("a", 5L), ("b", 7L))
      q.processAllAvailable()
      input.addData(("a", 9L), ("b", 2L), ("b", 3L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(qName).as[(String, Seq[Long])].collect().toMap
    assert(got === Map("a" -> Seq(9L, 5L), "b" -> Seq(7L, 3L)))
  }

  test("plans as ObjectHashAggregate with a partial stage before the exchange") {
    val docs = graft.sim.WarehouseSim.read(spark, sfDir, "documents")
    val plan = docs.groupBy("lang")
      .agg(TopKAgg.topk(spark, struct(col("n_chars"), col("doc_id")), 5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // partial aggregation present: two ObjectHashAggregate nodes
    assert(plan.sliding("ObjectHashAggregate".length)
      .count(_ == "ObjectHashAggregate") >= 2, plan)
  }
}
