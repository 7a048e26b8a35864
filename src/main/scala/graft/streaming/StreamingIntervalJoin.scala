package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-STREAM interval overlap join on Spark's native join engine —
 * the continuous twin of [[graft.operators.IntervalJoin.overlapJoin]]
 * for when BOTH sides arrive live (view windows joining purchase
 * windows as sessions happen). Unlike the foreachBatch enrichment
 * family ([[StreamingRangeJoin]]), this uses Structured Streaming's
 * built-in stream-stream inner join: both sides watermarked on their
 * START timestamps, the exact overlap predicate
 * `a_ts < b_te AND b_ts < a_te`, and — the part that makes it RUN at
 * scale — an explicit time-band `b_ts BETWEEN a_ts − maxLen AND
 * a_ts + maxLen` that Spark's state manager uses to EVICT buffered
 * rows once the other side's watermark passes the band. Without the
 * band the state grows forever (Spark keeps every row, waiting for an
 * arbitrarily-late match); with it, state is bounded by
 * rate × (maxLen + watermark delay).
 *
 * The band is sound only if intervals are genuinely shorter than
 * `maxLen` (an interval [s, e) with e ≤ s + maxLen overlaps another
 * such interval only when their starts are within maxLen of each
 * other) — so the contract is ENFORCED per row with `raise_error`, the
 * family's loud-refusal rule: an over-long interval fails the query
 * instead of silently missing matches after eviction.
 *
 * Column conventions mirror the batch operator: `(keys…, a_id, a_ts,
 * a_te)` × `(keys…, b_id, b_ts, b_te)` with TIMESTAMP start/end
 * columns, half-open [s, e); output `keys… + (a_id, b_id, overlap)`
 * with overlap in microseconds. Inner-join append mode: matches emit
 * as they form; results are final (no retraction) because the overlap
 * predicate is pure.
 */
object StreamingIntervalJoin {

  def overlapJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
      maxLen: String = "1 hour",
      watermarkDelay: String = "10 seconds"): DataFrame = {
    require(keys.nonEmpty, "stream-stream overlap join needs equi-keys " +
      "(a keyless band join buffers every row against every row)")
    def guarded(df: DataFrame, s: String, e: String,
        side: String): DataFrame =
      df.withColumn(e,
        when(col(e) <= col(s) ||
            col(e) > expr(s"$s + interval $maxLen"),
          raise_error(concat(
            lit(s"StreamingIntervalJoin: $side interval must satisfy " +
              s"s < e <= s + $maxLen (the state-eviction band is only " +
              "sound for bounded intervals), got ["),
            col(s).cast("string"), lit(", "), col(e).cast("string"),
            lit(")"))))
          .otherwise(col(e)))
        .withWatermark(s, watermarkDelay)
    val aw = guarded(a, "a_ts", "a_te", "left")
    val bw = guarded(b, "b_ts", "b_te", "right")
    val keyCond = keys.map(k => aw(k) === bw(k)).reduce(_ && _)
    val band = bw("b_ts") >= expr(s"a_ts - interval $maxLen") &&
      bw("b_ts") <= expr(s"a_ts + interval $maxLen")
    val overlap = aw("a_ts") < bw("b_te") && bw("b_ts") < aw("a_te")
    aw.join(bw, keyCond && band && overlap)
      .select(keys.map(aw(_)) ++ Seq(col("a_id"), col("b_id"),
        (unix_micros(least(col("a_te"), col("b_te"))) -
          unix_micros(greatest(col("a_ts"), col("b_ts"))))
          .as("overlap")): _*)
  }
}
