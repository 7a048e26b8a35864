package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.LshIndex

/**
 * Streaming near-duplicate SCREEN against a persisted MinHash-LSH
 * index ([[LshIndex]]): a `foreachBatch` sink that drops every
 * incoming document whose verified shingle Jaccard against ANY
 * admitted document reaches `minJaccard`, and lands the survivors
 * under `outDir/batch=<epoch>` — the TEXT twin of the embedding
 * contamination gate ([[StreamingIvfAdmit.screenedSink]]), riding the
 * index's read-only [[LshIndex.lookup]] (bucket-pruned band join +
 * shingle-store verify; nothing writes to the index, no admission id
 * machinery involved).
 *
 * Production shapes this covers: "drop near-dups of the benchmark
 * from the training stream" (decontamination — the index holds the
 * benchmark), and "drop re-crawls of the existing corpus" (the index
 * holds the corpus; pair with [[StreamingLshAdmit]] on the survivors
 * when the corpus should also grow).
 *
 * Exactly-once by layout: the output is a dynamic partition overwrite
 * scoped to the stream's OWN epoch id, so a crashed epoch replayed by
 * Structured Streaming replaces its partial survivors. The screen
 * follows the index's CURRENT state by design: a takedown
 * ([[LshIndex.delete]]) means later epochs stop blocking near-dups of
 * the deleted document — the replay caveat documented on
 * [[StreamingIvfAdmit.screenedSink]] applies (a replayed epoch
 * screens against the index as it stands at replay time).
 */
object StreamingLshScreen {

  def sink(dir: String, outDir: String, minJaccard: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, Long) => Unit = {
    require(minJaccard >= 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in [0,1], got $minJaccard")
    (batch: DataFrame, epochId: Long) => {
      val blocked = LshIndex.lookup(batch, dir, idCol, textCol)
        .filter(col("jaccard") >= minJaccard)
        .select(col("q_id").as(idCol)).distinct()
      batch.join(blocked, Seq(idCol), "left_anti")
        .withColumn("batch", lit(epochId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(outDir)
    }
  }
}
