package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.CardSketch

/**
 * Continuously-maintained cardinality sketches: each micro-batch
 * reduces to its [[CardSketch]] state (HLL registers or KMV bottom-k)
 * and folds into a persisted state via [[VersionedStateFold]] — the
 * batch operator IS the streaming operator (the [[StreamingCard]]
 * discipline), and because both sketches merge EXACTLY (per-bucket
 * max / bottom-k of the union), the streamed state is bit-identical
 * to the one-shot sketch of everything seen, not an approximation of
 * an approximation (StreamingCardinalitySpec pins the equality).
 *
 * Replay safety is [[VersionedStateFold]]'s: versioned state subdirs
 * keyed by batchId + an atomically-renamed CURRENT pointer, so a
 * crash-replayed committed batch overwrites its own version instead
 * of double-merging (double-merging would actually be HARMLESS here —
 * both merges are idempotent — but the shared discipline costs
 * nothing and keeps one recovery story).
 *
 * Scale shape: per batch one scan of the BATCH, a sketch-sized merge
 * (≤ 2^p or k rows), a sketch-sized write. The stream's full history
 * is never re-read.
 */
object StreamingCardinality {

  /** Maintain an HLL register state over a streaming value column. */
  def hllRun(values: DataFrame, stateDir: String, valueCol: String,
      p: Int = 9, trigger: Trigger = Trigger.ProcessingTime(0L))
      : StreamingQuery =
    VersionedStateFold.run(values, stateDir,
      CardSketch.hllState(_, valueCol, p), CardSketch.hllMerge, trigger)

  /** Maintain a KMV bottom-k state over a streaming value column. */
  def kmvRun(values: DataFrame, stateDir: String, valueCol: String,
      k: Int = 256, trigger: Trigger = Trigger.ProcessingTime(0L))
      : StreamingQuery =
    VersionedStateFold.run(values, stateDir,
      CardSketch.kmvState(_, valueCol, k),
      CardSketch.kmvMerge(_, _, k), trigger)

  /** Maintain a hash-sample quantile sketch over a stream: the
    * streamed sample is bit-identical to the one-shot
    * [[CardSketch.sampleSketch]] of everything seen (bottom-k by
    * (hash, id) merges exactly), so
    * [[CardSketch.sampleQuantiles]] over [[currentState]] is the
    * continuously-maintained percentile monitor. */
  def sampleRun(rows: DataFrame, stateDir: String, idCol: String,
      valueCols: Seq[String], k: Int = 512,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    VersionedStateFold.run(rows, stateDir,
      CardSketch.sampleSketch(_, idCol, valueCols, k),
      CardSketch.sampleMerge(_, _, k), trigger)

  /** Current state frame (None before the first committed batch). */
  def currentState(spark: SparkSession,
      stateDir: String): Option[DataFrame] =
    VersionedStateFold.readState(spark, stateDir)

  /** Current HLL distinct estimate over everything streamed so far. */
  def currentHllEstimate(spark: SparkSession, stateDir: String,
      p: Int = 9): Option[Long] =
    currentState(spark, stateDir).map(CardSketch.hllEstimate(_, p))

  /** Current KMV distinct estimate over everything streamed so far. */
  def currentKmvEstimate(spark: SparkSession, stateDir: String,
      k: Int = 256): Option[Long] =
    currentState(spark, stateDir).map(CardSketch.kmvDistinct(_, k))
}
