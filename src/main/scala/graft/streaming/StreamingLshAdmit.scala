package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.LshIndex

/**
 * Streaming admission into a persisted MinHash-LSH index
 * ([[LshIndex]]): a `foreachBatch` sink that admits each micro-batch
 * and lands the verified band-collision near-dup pairs touching it
 * under `pairsDir/batch=<index batch id>` — continuous APPROXIMATE
 * near-duplicate detection on an ingest stream, the LSH twin of
 * [[StreamingSsjAdmit]] (which is exact) and [[StreamingIvfAdmit]]
 * (which is embeddings). At web-crawl volume this is the sink a
 * production dedup pipeline actually runs: admission cost is flat in
 * corpus size and the index needs no rebuild maintenance at all.
 *
 * Exactly-once by layout, twice ([[StreamingSsjAdmit]]'s contract):
 * the index admission overwrites its own `batch=` partitions on a
 * replayed epoch, and the pairs output is a dynamic partition
 * overwrite scoped to the same id. Epoch → index-batch ids are
 * AUTO-DERIVED from the admission high-water mark with per-epoch
 * records under `pairsDir` ([[EpochIds]]): crashed epochs replay
 * their own id (minus any documents a takedown removed in between —
 * [[LshIndex.admit]]'s replay screen), mid-stream deletions never
 * strand the sink, and a fresh checkpoint after [[LshIndex.compact]]
 * self-paces — provided it comes with a fresh `pairsDir` (a stale
 * epoch record that cannot be a legitimate replay refuses loudly).
 *
 * Usage:
 * {{{
 *   docs.writeStream
 *     .foreachBatch(StreamingLshAdmit.sink(indexDir, pairsDir))
 *     .option("checkpointLocation", ckpt).start()
 * }}}
 */
object StreamingLshAdmit {

  /** Sentinel for [[sink]]'s `idOffset`: derive each epoch's index
    * batch id from the admission high-water mark (see object doc). */
  val AutoOffset: Long = EpochIds.AutoOffset

  /** `idOffset = AutoOffset` (default) derives ids from the index's
    * high-water mark with a per-epoch record under `pairsDir`; an
    * explicit offset maps epoch N to index batch N + idOffset
    * unconditionally (declared fixed replays). */
  def sink(dir: String, pairsDir: String, idCol: String = "doc_id",
      textCol: String = "text",
      idOffset: Long = AutoOffset): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val id = EpochIds.derive(spark, "StreamingLshAdmit", pairsDir,
        batchId, idOffset,
        LshIndex.admittedHwm(spark, dir),
        LshIndex.burnedIds(spark, dir))
      LshIndex.admit(batch, dir, batchId = Some(id),
          allowReplay = true, idCol = idCol, textCol = textCol)
        .withColumn("batch", lit(id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(pairsDir)
    }
}
