package graft.tools

import org.apache.spark.sql.functions._

/** Dev profiling probe for the containment-LSH stages: tokenization,
  * signature pass, band index, candidate join, exact verify — each
  * timed separately so a regression can be localized. Not part of the
  * query surface. */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("graft-containment-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sim.WarehouseSim.read(spark, sfDir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // warmup full query once (JIT + codegen)
    graft.pipeline.Dedup.containmentPairsLsh(docs, 0.8).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    val toks = docs.select(col("doc_id"),
      sort_array(array_distinct(
        graft.pipeline.TextAnalysis.tokens(col("text")))).as("toks"))
      .filter(size(col("toks")) > 0)
    time("tokenize+distinct+sort")(toks.count())
    val sig = toks.select(col("doc_id"),
      floor(log2(size(col("toks")))).cast("int").as("tier"),
      graft.functions.MinHashSig(spark, col("toks"), 16).as("sig"))
    time("   + minhash sig (k=16)")(sig.count())
    val nCand = time("candidates only (cold)") {
      graft.pipeline.Dedup.containmentLshCandidates(docs, 0.8).count()
    }
    println(s"  candidates: $nCand")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    time("full query (cold caches)") {
      graft.pipeline.Dedup.containmentPairsLsh(docs, 0.8).count()
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    time("full query again")(
      graft.pipeline.Dedup.containmentPairsLsh(docs, 0.8).count())
    spark.stop()
  }
}
