package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.AsOfJoin

/**
 * Streaming as-of enrichment: each event micro-batch is joined (batch
 * [[AsOfJoin.asOf]] semantics — latest dimension row at or before the
 * event's timestamp) against a dimension state table that dimension
 * updates append to continuously. The foreachBatch + parquet-state
 * shape is the same one [[StreamingNearDedup]] uses, and the join
 * itself is the certified batch operator — one code path for both
 * modes.
 *
 * Consistency contract (processing-time snapshot, event-time join): a
 * batch sees every dimension row PERSISTED before it runs, and within
 * that snapshot the match is exact event-time as-of. A dimension update
 * that arrives after an event batch already processed does not
 * retroactively re-enrich it — the standard foreachBatch enrichment
 * trade; replay the events through [[enrichBatch]] to heal.
 *
 * Crash-replay idempotence: a reprocessed dimension batch appends
 * duplicate (key, ts, payload) rows; [[AsOfJoin.latestPerKeyTs]]
 * reduces duplicates to the same winner (max tieBreak is idempotent
 * under row duplication), so enrichment output is unchanged —
 * StreamingAsOfSpec pins it.
 *
 * Scale shape: the dimension state is key-count-sized (slowly-changing
 * dimension), read once per micro-batch and reduced map-side; the
 * as-of union-merge shuffles (batch + dim) once on the key columns.
 * For dimension tables large enough that the per-batch read dominates,
 * partition the state dir by a key prefix and prune with `isin` — the
 * [[StreamingNearDedup.runBatchPartitioned]] discipline applies
 * unchanged.
 */
object StreamingAsOf {

  /** Append a dimension-update frame to the state table. */
  def appendDim(updates: DataFrame, stateDir: String): Unit =
    updates.write.mode("append").parquet(stateDir)

  /** Enrich one (micro-)batch of events against the current dimension
    * state: latest state row per (keys, ts) wins (`tieBreak` breaks
    * same-timestamp duplicates), then the standard as-of join. */
  def enrichBatch(spark: SparkSession, events: DataFrame, stateDir: String,
      keys: Seq[String], leftTs: String, rightTs: String,
      tieBreak: String): DataFrame = {
    val dim = AsOfJoin.latestPerKeyTs(
      spark.read.parquet(stateDir), keys, rightTs, tieBreak)
    AsOfJoin.asOf(events, dim, keys, leftTs, rightTs)
  }

  /** Continuous enrichment: one foreachBatch step per event micro-batch;
    * `sink` must materialize its input (the plan reads the state dir
    * lazily). */
  def run(events: DataFrame, stateDir: String, keys: Seq[String],
      leftTs: String, rightTs: String, tieBreak: String,
      sink: DataFrame => Unit): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(enrichBatch(batch.sparkSession, batch, stateDir,
          keys, leftTs, rightTs, tieBreak))
      }
      .start()
}
