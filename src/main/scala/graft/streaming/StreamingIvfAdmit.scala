package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /**
   * [[sink]] with a CONTAMINATION GATE in front: each micro-batch is
   * screened against the benchmark set BEFORE admission — a batch row
   * whose embedding is cosine-similar (≥ `tau`, same coarse cell) to
   * any benchmark vector is dropped, the rest admit as usual. This is
   * eval hygiene enforced at the ingestion boundary instead of by
   * after-the-fact audits: a paraphrased eval item can never enter the
   * index in the first place (the
   * [[graft.pipeline.Decontamination.semanticOverlapsIndexed]]
   * discipline, applied to the feed rather than the standing corpus).
   *
   * Both sides assign against the index's OWN trained sidecar
   * ([[Similarity.assignWithIndex]], dim-validated), so the screen
   * speaks the index's cell language and costs one same-cell broadcast
   * join per micro-batch — the benchmark side is eval-set-sized and
   * travels as a broadcast; the batch is scanned once. Zero-norm batch
   * rows carry no direction, cannot be screened, and still admit
   * (consistent with the family's zero-norm contract).
   *
   * Exactly-once carries over unchanged: the gate is a deterministic
   * function of (batch, benchmark, sidecar), so a replayed epoch drops
   * the same rows and its batch-scoped overwrite replaces the same
   * partitions.
   */
  def screenedSink(dir: String, benchEmb: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      attrCols: Seq[String] = Nil): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      def side(df: DataFrame, id: String, v: String, n: String): DataFrame =
        Similarity.assignWithIndex(df, dir, idCol, vecCol)
          .select(col(idCol).as(id), col("cell"),
            transform(col(vecCol), x => x.cast("double")).as(v))
          .withColumn(n, Similarity.norm(col(v)))
          .filter(col(n) > 0)
      val b = side(batch, "batch_id", "b_v", "b_nrm")
      val m = side(benchEmb, "bench_id", "m_v", "m_nrm")
      val dirty = b.join(broadcast(m), "cell")
        .filter(round(Similarity.dot(col("b_v"), col("m_v")) /
          (col("b_nrm") * col("m_nrm")), 6) >= tau)
        .select(col("batch_id").as(idCol)).distinct()
      val clean = batch.join(dirty, Seq(idCol), "left_anti")
      Similarity.extendIvfIndex(clean, dir, batchId = Some(batchId + 1L),
        idCol = idCol, vecCol = vecCol, attrCols = attrCols)
    }
}
