package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev profiling main for the SsjIndex admission path: times each
  * stage of the dedup_setjoin_incremental shape at SPARK_GRAFT_SF_DIR
  * so regressions localize to a stage instead of a line total. */
object DevSsjProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-ssj-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Dedup, SsjIndex, TextAnalysis}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def canon(docs: org.apache.spark.sql.DataFrame) = docs
      .select(col("doc_id"), col("text"),
        md5(concat_ws(" ", sort_array(array_distinct(
          TextAnalysis.tokens(col("text"))))))
          .as("__fp"))
      .withColumn("__crk", row_number().over(
        Window.partitionBy("__fp").orderBy("doc_id")))
      .filter(col("__crk") === 1)
      .select("doc_id", "text")
    val docs = graft.sim.WarehouseSim.read(spark, sfDir, "documents")
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-ssjprobe").getPath
    time("build(old split)") {
      SsjIndex.build(
        canon(docs).filter(col("doc_id") % 10 >= 2), dir, tauMilli = 700)
    }
    val tau = 700
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      val inc = canon(docs).filter(col("doc_id") % 10 < 2)
      val sets = time(s"[$i] sets materialize") {
        val s = inc.select(col("doc_id"),
            sort_array(array_distinct(TextAnalysis.tokens(col("text"))))
              .as("toks"))
          .withColumn("len", size(col("toks"))).persist()
        s.count(); s
      }
      time(s"[$i] freq fold+write") {
        val incCounts = sets.select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("tf"))
        spark.read.parquet(s"$dir/freq/cum=0")
          .select(col("tok"), col("tf").as("__a"))
          .join(incCounts.select(col("tok"), col("tf").as("__b")),
            Seq("tok"), "full_outer")
          .select(col("tok"),
            (coalesce(col("__a"), lit(0L)) + coalesce(col("__b"), lit(0L)))
              .as("tf"))
          .write.mode("overwrite").parquet(s"$dir/freq/cum=1")
      }
      val pNew = time(s"[$i] prefix rank") {
        val toks = sets.select(col("doc_id"), col("len"),
          explode(col("toks")).as("tok"))
        val wPos = Window.partitionBy("doc_id").orderBy(col("tf"), col("tok"))
        val p = toks.join(spark.read.parquet(s"$dir/order"),
            Seq("tok"), "left_outer")
          .withColumn("tf", coalesce(col("tf"), lit(0L)))
          .withColumn("pos", row_number().over(wPos))
          .filter(col("pos") <=
            col("len") - expr(s"($tau * len + 999) div 1000") + 1)
          .select(col("doc_id"), col("tok"), col("len")).persist()
        p.count(); p
      }
      time(s"[$i] prefix store write") {
        pNew.withColumn("batch", lit(1L))
          .withColumn("pb", pmod(xxhash64(col("tok")), lit(64L)))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch", "pb").parquet(s"$dir/prefix")
      }
      time(s"[$i] docs store write") {
        sets.withColumn("batch", lit(1L))
          .withColumn("db", pmod(xxhash64(col("doc_id")), lit(64L)))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch", "db").parquet(s"$dir/docs")
      }
      val touchedPb = time(s"[$i] touchedPb collect")(
        pNew.select(pmod(xxhash64(col("tok")), lit(64L)).as("pb"))
          .distinct().collect().map(_.getLong(0)).toSeq)
      val cand = time(s"[$i] candidate join") {
        val corpus = SsjIndex.storedPrefixes(spark, dir, 1L, touchedPb)
          .unionByName(pNew)
        val c = pNew.as("a").join(corpus.as("b"),
            col("a.tok") === col("b.tok") &&
            col("a.doc_id") =!= col("b.doc_id") &&
            least(col("a.len"), col("b.len")) * 1000 >=
              lit(tau) * greatest(col("a.len"), col("b.len")))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
          .distinct().persist()
        c.count(); c
      }
      val touchedDb = time(s"[$i] touchedDb collect")(
        cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
          .select(pmod(xxhash64(col("doc_id")), lit(64L)).as("db"))
          .distinct().collect().map(_.getLong(0)).toSeq)
      time(s"[$i] verify") {
        val vSets = SsjIndex.storedSets(spark, dir, 1L, touchedDb)
          .unionByName(sets.select("doc_id", "toks", "len"))
          .select(col("doc_id"), col("toks"), col("len").as("n"))
        val j = cand
          .join(vSets.select(col("doc_id").as("doc_a"), col("toks").as("ta"),
            col("n").as("na")), "doc_a")
          .join(vSets.select(col("doc_id").as("doc_b"), col("toks").as("tb"),
            col("n").as("nb")), "doc_b")
          .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
            graft.functions.SortedIntersectCount(spark,
              col("ta"), col("tb")).as("inter"))
          .filter(col("inter") * 1000 >=
            lit(tau) * (col("na") + col("nb") - col("inter")))
        println(s"  pairs: ${j.count()}")
      }
    }
    spark.stop()
  }
}
