package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Classifier

/** Dev probe: quality parity of sample-trained vs full-trained quality
  * classifier (the 100-TB recipe's supporting measurement — SCALE.md
  * round 7). Prints per-model confusion vs labels at the 0.5 gate plus
  * verdict agreement. Usage: ClassifierParityProbe [sampleRate] */
object ClassifierParityProbe {
  def main(args: Array[String]): Unit = {
    val rate = if (args.nonEmpty) args(0).toDouble else 0.25
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-classifier-parity")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sim.WarehouseSim.read(spark, sfDir, "documents")

    def confusion(scored: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val r = scored.agg(
        count(lit(1)).as("n"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as("ok"),
        sum(when(col("pred") === 1 && col("label") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") === 1 && col("label") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("pred") === 0 && col("label") === 1, 1L).otherwise(0L)).as("fn"))
        .head()
      val (n, ok, tp, fp, fn) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      val prec = if (tp + fp > 0) tp.toDouble / (tp + fp) else Double.NaN
      val rec = if (tp + fn > 0) tp.toDouble / (tp + fn) else Double.NaN
      println(f"$name: n=$n acc=${ok.toDouble / n}%.4f precision=$prec%.4f recall=$rec%.4f")
    }

    val full = Classifier.lrScores(docs).localCheckpoint()
    val sampled = Classifier.lrScoresSampled(docs, rate).localCheckpoint()
    confusion(full, "full-train ")
    confusion(sampled, f"sampled $rate%.2f")
    val agree = full.select(col("doc_id"), col("pred").as("pf"))
      .join(sampled.select(col("doc_id"), col("pred").as("ps")), "doc_id")
      .agg(avg(when(col("pf") === col("ps"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    println(f"verdict agreement (pred parity): $agree%.4f")
    spark.stop()
  }
}
