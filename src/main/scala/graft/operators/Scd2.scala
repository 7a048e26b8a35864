package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension type-2 history build: turn a change log
 * (one row per state change, keyed + timestamped) into validity
 * intervals — each state row becomes `[effective_from, effective_to)`
 * with `effective_to` = the next change's timestamp (null = still
 * current). The reference keeps only latest-wins state (its TLDT
 * guards, `j5_latest_wins`); this is the other half a warehouse needs:
 * the full history, so any past instant can be queried — and the
 * natural producer of the interval side consumed by
 * [[RangeJoin.overlapJoin]] and the dimension side of
 * [[AsOfJoin.asOf]].
 *
 * Execution shape: dedup to one row per (keys, ts) via the max-struct
 * aggregate ([[AsOfJoin.latestPerKeyTs]] — deterministic, no
 * self-join), then ONE `lead(ts)` window per key. Two key-hash
 * shuffles total (agg + window; AQE coalesces them when partitioning
 * aligns), no joins, no row explosion — the same cost class as any
 * per-key sort, spillable and skew-splittable at 100 TB. Contrast
 * with the naive `l JOIN r ON l.ts < r.ts` + argmin formulation,
 * which explodes quadratically per key.
 */
object Scd2 {

  /**
   * Build the SCD2 history. Output = keys…, payload…, plus
   * `effective_from` (the change's own timestamp), `effective_to`
   * (next change, null for the current row) and `is_current`.
   * `tieBreak` resolves same-timestamp changes per key (max wins,
   * whole-row-atomically).
   */
  def buildHistory(changes: DataFrame, keys: Seq[String], tsCol: String,
      tieBreak: String): DataFrame = {
    val uniq = AsOfJoin.latestPerKeyTs(changes, keys, tsCol, tieBreak)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    uniq
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumnRenamed(tsCol, "effective_from")
      .withColumn("is_current", col("effective_to").isNull)
  }
}
