package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.pipeline.Similarity

/**
 * Streaming admission into a persisted IVF index
 * ([[Similarity.buildIvfIndex]]): a `foreachBatch` sink that lands
 * micro-batch N under the index's `batch=N+1` partitions via
 * [[Similarity.extendIvfIndex]]'s dynamic partition overwrite.
 *
 * Exactly-once WITHOUT a transaction log: Structured Streaming replays
 * an uncommitted epoch after a crash by re-invoking `foreachBatch` with
 * the SAME batchId and the same data, and the batch-scoped overwrite
 * then REPLACES the partial partitions the crashed attempt left behind
 * instead of appending duplicates — idempotence by layout, the same
 * discipline [[VersionedStateFold]] applies to state
 * (StreamingIvfAdmitSpec pins replay no-op and serve-the-union).
 *
 * The `+1` keeps streaming admissions clear of the build's `batch=0`.
 * ONE stream per index lifetime: a different stream (or one restarted
 * from a FRESH checkpoint) would reuse batch ids and overwrite earlier
 * admissions — resume the original checkpoint, or rebuild the index.
 *
 * Usage:
 * {{{
 *   embeddings.writeStream
 *     .foreachBatch(StreamingIvfAdmit.sink(indexDir))
 *     .option("checkpointLocation", ckpt).start()
 * }}}
 */
object StreamingIvfAdmit {

  def sink(dir: String, idCol: String = "vec_id",
      vecCol: String = "embedding", attrCols: Seq[String] = Nil)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      Similarity.extendIvfIndex(batch, dir, batchId = Some(batchId + 1L),
        idCol = idCol, vecCol = vecCol, attrCols = attrCols)
}
