package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.SsjIndex

/**
 * Streaming admission into a persisted set-similarity-join index
 * ([[SsjIndex]]): a `foreachBatch` sink that admits micro-batch N as
 * index batch N+1 and lands the EXACT Jaccard ≥ τ pairs touching it
 * under `pairsDir/batch=N+1` — continuous near-duplicate detection on
 * an ingest stream, the set-join twin of [[StreamingIvfAdmit]].
 *
 * Exactly-once by layout, twice: the index admission overwrites its
 * own `batch=` partitions on a replayed epoch ([[SsjIndex.admit]]'s
 * contract), and the pairs output is a dynamic partition overwrite
 * scoped to the same batch id, so a crashed epoch retried by
 * Structured Streaming replaces its partial pairs instead of
 * duplicating them. The pairs directory accumulates one partition per
 * epoch; reading it whole gives every cross- and intra-batch near-dup
 * pair that ever touched an admitted batch (old×old pairs from before
 * the build are the [[graft.pipeline.Dedup.setSimilarityJoin]] batch
 * job's business, not the stream's).
 *
 * ONE stream per index lifetime (the [[StreamingIvfAdmit.sink]]
 * argument): this sink passes `allowReplay = true` because the
 * checkpoint proves a re-presented batch id replays the same epoch; a
 * NEW stream from a fresh checkpoint would reuse ids and overwrite
 * earlier admissions — resume the original checkpoint or rebuild.
 *
 * Usage:
 * {{{
 *   docs.writeStream
 *     .foreachBatch(StreamingSsjAdmit.sink(indexDir, pairsDir))
 *     .option("checkpointLocation", ckpt).start()
 * }}}
 */
object StreamingSsjAdmit {

  /** `idOffset` maps epoch N to index batch N + idOffset (default 1 —
    * admissions start above the build's batch 0). A stream RESTARTED
    * from a fresh checkpoint after a deletion (which burns an id, so
    * the old stream's next epoch is refused) passes an offset above
    * the index's high-water mark to continue admission. */
  def sink(dir: String, pairsDir: String, idCol: String = "doc_id",
      textCol: String = "text",
      idOffset: Long = 1L): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val id = batchId + idOffset
      SsjIndex.admit(batch, dir, batchId = Some(id),
          allowReplay = true, idCol = idCol, textCol = textCol)
        .withColumn("batch", lit(id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(pairsDir)
    }
}
