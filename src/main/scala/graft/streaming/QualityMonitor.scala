package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/**
 * Windowed corpus-ingest quality monitor: tumbling event-time rollups
 * of [[TextAnalysis.qualityGate]] verdicts over a document feed — the
 * live twin of the batch gate, for watching a crawl/ingest pipeline's
 * health (reject-rate spikes, token-volume drops) as data lands rather
 * than at the nightly rebuild.
 *
 * One code path serves both modes: on a streaming frame the event-time
 * column gets a watermark (`lateness`) and Structured Streaming emits
 * each window once the watermark passes it (append mode) — state is
 * bounded by windows-in-flight, late rows beyond the watermark are
 * dropped, exactly Spark's windowed-aggregation contract; on a batch
 * frame the same plan is an ordinary grouped aggregation, which is what
 * the DuckDB oracle checks (`st_quality_monitor`).
 *
 * Scale shape: the gate is a pure projection (scan-speed), so the only
 * shuffle is the window aggregate — partial-aggregated, ≤ one row per
 * (window) per partition on the wire.
 */
object QualityMonitor {

  /** Per-window gate rollup: `(w_start, w_end, n_docs, n_pass,
    * reject_rate, total_tokens, avg_quality)`. */
  def rollup(docs: DataFrame, windowLen: String = "1 hour",
      lateness: String = "10 minutes", tsCol: String = "ingest_ts",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    gated(docs, lateness, tsCol, idCol, textCol)
      .groupBy(window(col(tsCol), windowLen))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("pass").cast("long")).as("n_pass"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("quality_score")), 6).as("avg_quality"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("n_docs"), col("n_pass"),
        round(lit(1.0) -
          col("n_pass").cast("double") / col("n_docs"), 6).as("reject_rate"),
        col("total_tokens"), col("avg_quality"))

  /** Per-window, per-verdict counts (`fail_reason` null → 'pass') — the
    * drill-down when [[rollup]] shows a reject-rate spike. */
  def rollupByReason(docs: DataFrame, windowLen: String = "1 hour",
      lateness: String = "10 minutes", tsCol: String = "ingest_ts",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    gated(docs, lateness, tsCol, idCol, textCol)
      .groupBy(window(col(tsCol), windowLen),
        coalesce(col("fail_reason"), lit("pass")).as("verdict"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("verdict"), col("n"))

  /** Per-window lexical-diversity rollup: mean token entropy and the
    * low-entropy share — the live spam-burst detector ([[TextAnalysis
    * .tokenEntropy]] is a pure scan fold, so it rides the stream at
    * scan speed; the only shuffle is the window aggregate). The
    * per-window mean is an integer micro-sum of the per-doc rounded
    * entropies, so batch and DuckDB replays agree bit-for-bit. */
  def entropyRollup(docs: DataFrame, windowLen: String = "1 hour",
      lateness: String = "10 minutes", lowThr: Double = 2.0,
      tsCol: String = "ingest_ts", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val src =
      if (docs.isStreaming) docs.withWatermark(tsCol, lateness) else docs
    TextAnalysis.tokenEntropy(src, idCol = idCol, textCol = textCol,
        carryCols = Seq(tsCol))
      .groupBy(window(col(tsCol), windowLen))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(round(col("entropy") * 1e6).cast("long")).as("ent_micro"),
        sum(when(col("entropy") < lowThr, 1L).otherwise(0L)).as("n_low"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("n_docs"),
        round(col("ent_micro").cast("double") /
          (col("n_docs").cast("double") * 1e6), 6).as("avg_entropy"),
        col("n_low"),
        round(col("n_low").cast("double") / col("n_docs").cast("double"), 6)
          .as("low_frac"))
  }

  /** Per-window garbage-rate rollup over [[TextAnalysis
    * .withGarbageScore]] — the live encoding-wreck detector (a crawler
    * that starts emitting binary-as-text spikes `garbage_frac` within
    * one window). The screen is pure scan-speed column math, so the
    * stream pays only the window aggregate; the per-window mean symbol
    * fraction sums integer micros of the per-doc rounded values (exact
    * in any order, DuckDB-replayable). */
  def garbageRollup(docs: DataFrame, windowLen: String = "1 hour",
      lateness: String = "10 minutes", tsCol: String = "ingest_ts",
      textCol: String = "text"): DataFrame = {
    val src =
      if (docs.isStreaming) docs.withWatermark(tsCol, lateness) else docs
    TextAnalysis.withGarbageScore(src, textCol = textCol)
      .groupBy(window(col(tsCol), windowLen))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_garbage").cast("long")).as("n_garbage"),
        sum(round(col("sym_frac") * 1e6).cast("long")).as("sym_micro"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("n_docs"), col("n_garbage"),
        round(col("n_garbage").cast("double") /
          col("n_docs").cast("double"), 6).as("garbage_frac"),
        round(col("sym_micro").cast("double") /
          (col("n_docs").cast("double") * 1e6), 6).as("avg_sym_frac"))
  }

  private def gated(docs: DataFrame, lateness: String, tsCol: String,
      idCol: String, textCol: String): DataFrame = {
    val src =
      if (docs.isStreaming) docs.withWatermark(tsCol, lateness) else docs
    TextAnalysis.qualityGate(src, idCol = idCol, textCol = textCol,
      carryCols = Seq(tsCol))
  }
}
