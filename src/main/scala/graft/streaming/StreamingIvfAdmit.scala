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
 * ONE stream per index lifetime: this sink passes `allowReplay = true`
 * (the checkpoint IS the proof that a re-presented batch id replays
 * the same epoch), so a DIFFERENT stream — one restarted from a FRESH
 * checkpoint — would reuse batch ids 1..N and overwrite earlier
 * admissions. [[Similarity.extendIvfIndex]]'s high-water guard cannot
 * see across that boundary once the replay assertion is made: resume
 * the original checkpoint, or rebuild the index. (A bare
 * `extendIvfIndex` caller without `allowReplay` IS refused at or
 * below the mark — the guard catches fresh-checkpoint restarts that
 * go through the non-streaming path.)
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
        idCol = idCol, vecCol = vecCol, attrCols = attrCols,
        allowReplay = true)

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
   *
   * The benchmark side is assigned, normed, and SNAPSHOT once at SINK
   * CONSTRUCTION (the index must already exist): the sidecar is
   * immutable between retrains — and a retrain requires a fresh sink
   * anyway — so re-reading meta + centroids and re-assigning an
   * identical eval frame every micro-batch was pure per-epoch waste
   * (round-12 ADVICE). The collected rows (bounded by the same
   * eval-set-size argument that lets the benchmark broadcast) rebuild
   * as a LOCAL relation inside the closure: zero jobs, zero scans,
   * broadcast-ready. Consequence worth knowing: the gate screens
   * against the benchmark AS OF construction — a benchmark source
   * mutated under a running sink does not change the screen (the spec
   * pins this snapshot semantics) — UNLESS `refreshEvery = Some(n)`,
   * which re-collects the snapshot at the start of every epoch whose
   * `batchId % n == 0` (except epoch 0 — construction just paid that
   * collect). A benchmark row added mid-stream then starts screening
   * at the next refresh boundary. The explicit trade: a refresh-
   * boundary epoch REPLAYED after a crash screens against the CURRENT
   * benchmark — admission stays exactly-once by layout, but the
   * dropped-row set of that one epoch can differ if the benchmark
   * mutated between attempts. Default ∞ keeps the deterministic
   * snapshot contract.
   *
   * Caveat for refreshing FILE sources: a captured DataFrame pins its
   * file listing at resolution, so re-collecting the SAME frame after
   * an in-place overwrite fails (stale listing) — use
   * [[screenedSinkFrom]] with a re-reading thunk
   * (`() => spark.read.parquet(benchPath)`) plus
   * `spark.catalog.refreshByPath` when the path is rewritten in place.
   * This DataFrame variant's refresh is meant for sources that
   * re-resolve per query (tables/views).
   */
  def screenedSink(dir: String, benchEmb: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      attrCols: Seq[String] = Nil,
      refreshEvery: Option[Long] = None): (DataFrame, Long) => Unit =
    screenedSinkFrom(dir, () => benchEmb, tau, idCol, vecCol, attrCols,
      refreshEvery)

  /** [[screenedSink]] with the benchmark supplied as a RE-READING
    * thunk — the refresh-capable form (each refresh re-resolves the
    * source, picking up rows added since construction). */
  def screenedSinkFrom(dir: String, benchSource: () => DataFrame,
      tau: Double, idCol: String, vecCol: String, attrCols: Seq[String],
      refreshEvery: Option[Long]): (DataFrame, Long) => Unit = {
    require(refreshEvery.forall(_ >= 1L),
      s"refreshEvery must be >= 1 epoch, got $refreshEvery")
    val spark = benchSource().sparkSession
    def collectBench(): (org.apache.spark.sql.types.StructType,
        java.util.List[org.apache.spark.sql.Row]) = {
      val mFrame = Similarity.assignWithIndex(benchSource(), dir, idCol,
          vecCol)
        .select(col(idCol).as("bench_id"), col("cell"),
          transform(col(vecCol), x => x.cast("double")).as("m_v"))
        .withColumn("m_nrm", Similarity.norm(col("m_v")))
        .filter(col("m_nrm") > 0)
      (mFrame.schema, java.util.Arrays.asList(mFrame.collect(): _*))
    }
    // one writer per sink (foreachBatch is serial) — plain var is safe
    var snap = collectBench()
    (batch: DataFrame, batchId: Long) => {
      refreshEvery.foreach { n =>
        if (batchId > 0 && batchId % n == 0) snap = collectBench()
      }
      val (mSchema, mRows) = snap
      val m = spark.createDataFrame(mRows, mSchema)
      val b = Similarity.assignWithIndex(batch, dir, idCol, vecCol)
        .select(col(idCol).as("batch_id"), col("cell"),
          transform(col(vecCol), x => x.cast("double")).as("b_v"))
        .withColumn("b_nrm", Similarity.norm(col("b_v")))
        .filter(col("b_nrm") > 0)
      val dirty = b.join(broadcast(m), "cell")
        .filter(round(Similarity.dot(col("b_v"), col("m_v")) /
          (col("b_nrm") * col("m_nrm")), 6) >= tau)
        .select(col("batch_id").as(idCol)).distinct()
      val clean = batch.join(dirty, Seq(idCol), "left_anti")
      Similarity.extendIvfIndex(clean, dir, batchId = Some(batchId + 1L),
        idCol = idCol, vecCol = vecCol, attrCols = attrCols,
        allowReplay = true)
    }
  }
}
