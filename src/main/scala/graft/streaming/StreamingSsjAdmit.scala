package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.SsjIndex

/**
 * Streaming admission into a persisted set-similarity-join index
 * ([[SsjIndex]]): a `foreachBatch` sink that admits each micro-batch
 * and lands the EXACT Jaccard ≥ τ pairs touching it under
 * `pairsDir/batch=<index batch id>` — continuous near-duplicate
 * detection on an ingest stream, the set-join twin of
 * [[StreamingIvfAdmit]].
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
 * ID DERIVATION (default, `idOffset = AutoOffset`): each epoch takes
 * the index's current high-water mark + 1, and records its assignment
 * at `pairsDir/_epoch_ids/<epochId>` BEFORE admitting — so a crashed
 * epoch replayed by Structured Streaming reuses its original id (the
 * record is the source of truth; the replay overwrites its own
 * partitions and, via [[SsjIndex.admit]]'s replay screen, drops any
 * document a takedown removed in between). This makes the sink
 * self-pacing across the whole lifecycle with NO hand-computed
 * offsets: a mid-stream [[SsjIndex.delete]] burns an id and the next
 * epoch simply lands above it; a stream restarted from a FRESH
 * checkpoint (e.g. after [[SsjIndex.compact]] restarts the id
 * lifecycle) continues above whatever the mark then is — provided the
 * fresh checkpoint comes with a fresh `pairsDir` (the epoch-id record
 * is per stream generation; a reused record whose ids cannot be a
 * legitimate replay of the current mark is refused loudly).
 *
 * The explicit `idOffset` knob remains for DECLARED fixed mappings
 * (epoch N → N + offset), e.g. replaying a recorded feed into a
 * rebuilt index at known positions.
 *
 * Usage:
 * {{{
 *   docs.writeStream
 *     .foreachBatch(StreamingSsjAdmit.sink(indexDir, pairsDir))
 *     .option("checkpointLocation", ckpt).start()
 * }}}
 */
object StreamingSsjAdmit {

  /** Sentinel for [[sink]]'s `idOffset`: derive each epoch's index
    * batch id from the admission high-water mark (see object doc). */
  val AutoOffset: Long = EpochIds.AutoOffset

  /** `idOffset = AutoOffset` (default) derives ids from the index's
    * high-water mark with a per-epoch record under `pairsDir`
    * ([[EpochIds.derive]] — survives crashes, deletions, and
    * id-lifecycle restarts with no operator arithmetic). An explicit
    * offset maps epoch N to index batch N + idOffset unconditionally. */
  def sink(dir: String, pairsDir: String, idCol: String = "doc_id",
      textCol: String = "text",
      idOffset: Long = AutoOffset): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val id = EpochIds.derive(spark, "StreamingSsjAdmit", pairsDir,
        batchId, idOffset,
        SsjIndex.admittedHwm(spark, dir),
        SsjIndex.burnedIds(spark, dir))
      SsjIndex.admit(batch, dir, batchId = Some(id),
          allowReplay = true, idCol = idCol, textCol = textCol)
        .withColumn("batch", lit(id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(pairsDir)
    }
}
