package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.RangeJoin

/**
 * Streaming interval enrichment — [[StreamingAsOf]]'s sibling for
 * window-shaped dimensions: each event micro-batch is range-joined
 * (batch [[RangeJoin.overlapJoin]] semantics — every containing
 * interval matches, start-inclusive end-exclusive) against an interval
 * state table that window definitions append to continuously
 * (maintenance windows, incident windows, campaign flights). Same
 * foreachBatch + parquet-state shape, same one-code-path-both-modes
 * guarantee: the join the stream runs IS the oracle-certified batch
 * operator.
 *
 * Consistency contract mirrors [[StreamingAsOf]]: a batch sees every
 * interval PERSISTED before it runs (processing-time snapshot,
 * event-time containment within it). Late-defined windows do not
 * retroactively enrich already-processed events; replay the events
 * through [[enrichBatch]] to heal.
 *
 * Scale shape: interval state is windows-count-sized; per batch the
 * bucketized equi-join shuffles (batch + exploded intervals) once on
 * (keys, bucket). A replayed batch re-emits the same rows (the join is
 * pure) — downstream idempotence is the sink's usual foreachBatch
 * obligation.
 */
object StreamingRangeJoin {

  /** Append interval definitions to the window state table. */
  def appendWindows(updates: DataFrame, stateDir: String): Unit =
    updates.write.mode("append").parquet(stateDir)

  /** Enrich one (micro-)batch of events against the current window
    * state. */
  def enrichBatch(spark: SparkSession, events: DataFrame, stateDir: String,
      keys: Seq[String], leftTs: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame =
    RangeJoin.overlapJoin(events, spark.read.parquet(stateDir),
      keys, leftTs, startCol, endCol, bucketSeconds)

  /** Continuous enrichment: one foreachBatch step per event micro-batch;
    * `sink` must materialize its input (the plan reads the state dir
    * lazily). */
  def run(events: DataFrame, stateDir: String, keys: Seq[String],
      leftTs: String, startCol: String, endCol: String,
      bucketSeconds: Long, sink: DataFrame => Unit): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(enrichBatch(batch.sparkSession, batch, stateDir,
          keys, leftTs, startCol, endCol, bucketSeconds))
      }
      .start()
}
