package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

import graft.functions.{VecDot, VecSqDist}
import graft.pipeline.{Semantic, Similarity}
import graft.sim.WarehouseSim

/** The native vector folds: rewrite firing, bit-identical results vs the
  * declarative HOF, null semantics, SQL registration. */
class VecFoldSpec extends TestBase {
  import spark.implicits._

  /** Fixture vectors on PARQUET so ConvertToLocalRelation cannot
    * constant-fold the expressions away before the rewrite runs. */
  private lazy val vecs: DataFrame = {
    val dir = tmpDir("vecfold").resolve("vecs").toString
    Seq(
      (1L, Seq(1.0, -2.5, 3.25), Seq(0.5, 4.0, -1.75)),
      (2L, Seq(0.0, -0.0, 1e300), Seq(-0.0, 0.0, 1e-300)),
      (3L, Seq(1.0 / 3.0, 2.0 / 7.0, -5.0 / 11.0),
        Seq(9.0 / 13.0, -3.0 / 17.0, 1.0 / 19.0)))
      .toDF("id", "x", "y").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def planHas(df: DataFrame)(pred: Expression => Boolean): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten.exists(_.exists(pred))

  test("the canonical dot/sqdist folds rewrite to VecDot/VecSqDist") {
    val dotDf = vecs.select(Similarity.dot(col("x"), col("y")))
    assert(planHas(dotDf)(_.isInstanceOf[VecDot]),
      s"no VecDot in:\n${dotDf.queryExecution.optimizedPlan}")
    val sqDf = vecs.select(
      aggregate(zip_with(col("x"), col("y"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(planHas(sqDf)(_.isInstanceOf[VecSqDist]),
      s"no VecSqDist in:\n${sqDf.queryExecution.optimizedPlan}")
  }

  test("rewritten folds are bit-identical to the interpreted HOF") {
    // `(acc,v) => v + acc` is NOT the canonical shape (no rewrite) but
    // IEEE addition is commutative, so its result is bit-identical
    val twin = vecs.select(col("id"),
      Similarity.dot(col("x"), col("y")).as("native"),
      aggregate(zip_with(col("x"), col("y"), (p, q) => p * q),
        lit(0.0), (acc, v) => v + acc).as("hof"))
    assert(planHas(twin)(_.isInstanceOf[VecDot]))
    val rows = twin.collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"id=${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}")
    }
    // scala-side sequential fold as a third witness
    val local = vecs.collect().map { r =>
      val x = r.getSeq[Double](1); val y = r.getSeq[Double](2)
      r.getLong(0) -> x.zip(y).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
    }.toMap
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(local(r.getLong(0))))
    }
  }

  test("null semantics mirror zip_with: mismatch, null element, null array") {
    val dir = tmpDir("vecfold").resolve("nulls").toString
    Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(1.0))),          // length mismatch
      (2L, Some(Seq(1.0, 2.0)), None),                    // null array
      (3L, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))))     // clean
      .toDF("id", "x", "y").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out: Array[Row] = df
      .select(col("id"), Similarity.dot(col("x"), col("y")).as("d"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1))
    assert(out(2).getDouble(1) == 11.0)
    // null ELEMENT inside an array
    val withNullElem = spark.sql(
      "SELECT vec_dot(array(1.0d, cast(null as double)), array(2.0d, 3.0d)) AS d")
    assert(withNullElem.collect()(0).isNullAt(0))
  }

  test("vec_dot / vec_sq_dist are callable from SQL") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  vec_sq_dist(array(1.0d, 2.0d), array(3.0d, 6.0d)) AS s""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 20.0)
  }

  test("the ANSI long fold rewrites to VecDotLong (SQ8 pre-rank)") {
    val emb = WarehouseSim.read(spark, "/root/testdata/sf0.001", "embeddings")
    val sq8 = Similarity.sq8TopK(emb.filter(col("vec_id") < 4), emb, 3)
    assert(planHas(sq8)(_.isInstanceOf[graft.functions.VecDotLong]),
      s"no VecDotLong in:\n${sq8.queryExecution.optimizedPlan}")
    val r = spark.sql(
      "SELECT vec_dot_long(array(2L, 3L), array(5L, 7L)) AS d").collect()(0)
    assert(r.getLong(0) == 31L)
  }

  test("vec_dot_long overflow raises Spark's ANSI ARITHMETIC_OVERFLOW") {
    val thrown = intercept[Throwable] {
      spark.sql(
        s"SELECT vec_dot_long(array(${Long.MaxValue}L, ${Long.MaxValue}L), " +
          "array(2L, 2L)) AS d").collect()
    }
    val chain = Iterator.iterate(thrown)(_.getCause).takeWhile(_ != null)
      .take(10).toSeq
    assert(chain.exists {
      case st: org.apache.spark.SparkThrowable =>
        st.getErrorClass == "ARITHMETIC_OVERFLOW"
      case _ => false
    }, s"no ARITHMETIC_OVERFLOW in cause chain: $chain")
  }

  test("similarity and k-means plans use the natives; results sane") {
    val emb = WarehouseSim.read(spark, "/root/testdata/sf0.001", "embeddings")
    val topk = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 4), emb, 3)
    assert(planHas(topk)(_.isInstanceOf[VecDot]),
      s"no VecDot in:\n${topk.queryExecution.optimizedPlan}")
    val km = Semantic.kmeansAssign(emb, k = 4, iters = 1)
    assert(planHas(km)(e =>
      e.isInstanceOf[VecSqDist] || e.isInstanceOf[VecDot]),
      s"no native fold in kmeansAssign plan")
    val rows = topk.filter(col("q_id") === 0).orderBy("rank")
      .select("c_id", "cos_sim").collect()
    assert(rows.length == 3 && rows(0).getDouble(1) >= rows(2).getDouble(1))
  }
}
