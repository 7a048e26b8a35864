package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join: for every left row, attach the payload of
 * the LATEST right row with the same key whose timestamp is `<=` the
 * left row's timestamp (DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND
 * l.ts >= r.ts` semantics — a right row exactly at the left timestamp
 * matches). Left rows with no eligible right row survive with null
 * payload, left-join style.
 *
 * The warehouse uses it to answer "what was the last DDL state when
 * this query ran" (audit-log queries as-of the latest prior
 * CREATETABLE, `j8_asof_lookup`), but the operator is generic: any
 * slowly-changing dimension lookup (config as of event time, watermark
 * as of job start) is this join.
 *
 * Execution shape — why not a range join: a naive
 * `l.ts >= r.ts` theta-join explodes to |matches| rows per left row
 * and needs a per-left-row argmax; Spark would nested-loop it without
 * an equi-condition on ts. Instead both sides are union-merged and
 * swept with ONE window:
 *
 *   1. tag right rows 0, left rows 1; union on (keys, ts, tag, payload)
 *   2. `last(payload, ignoreNulls)` over
 *      `partitionBy(keys).orderBy(ts, tag).rowsBetween(-inf, current)`
 *   3. keep tag=1 rows — each left row sees exactly the latest
 *      right-payload at or before its timestamp (ties: tag 0 sorts
 *      first, so a same-timestamp right row is visible to the left row)
 *
 * Cost: ONE hash shuffle on the key columns and a per-key sort — the
 * same cost class as any windowed aggregation, no row explosion, no
 * broadcast requirement on either side, and AQE-splittable on skewed
 * keys. At 100 TB this is the only as-of shape that survives: the
 * merge is streaming within each key partition and spills, never
 * materializing the cross product a range join would.
 *
 * Determinism contract: the right side must be unique per
 * (keys, rightTs) — otherwise "the" latest row at a timestamp is
 * ambiguous. [[latestPerKeyTs]] reduces an arbitrary right frame to
 * that shape deterministically (max `tieBreak` wins).
 */
object AsOfJoin {

  /** Reduce `right` to one row per (keys, tsCol): the row with the
    * greatest `tieBreak` value wins (its full payload, atomically, via
    * a single max-struct aggregate — no self-join). */
  def latestPerKeyTs(right: DataFrame, keys: Seq[String], tsCol: String,
      tieBreak: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    require(payload.contains(tieBreak),
      s"tieBreak '$tieBreak' must be a non-key payload column")
    // tieBreak leads the struct so max() orders by it; remaining payload
    // columns ride along and are recovered from the winning struct
    val ordered = col(tieBreak) +: payload.filterNot(_ == tieBreak).map(col)
    right.groupBy((keys :+ tsCol).map(col): _*)
      .agg(max(struct(ordered: _*)).as("_w"))
      .select((keys :+ tsCol).map(col) ++
        (tieBreak +: payload.filterNot(_ == tieBreak))
          .map(c => col(s"_w.$c").as(c)): _*)
  }

  /**
   * Left as-of join. Output = every left column, plus every non-key
   * right column (the right timestamp included, so callers see WHICH
   * version matched) — null when no right row is at or before the left
   * timestamp. Right must be unique per (keys, rightTs); see
   * [[latestPerKeyTs]].
   */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val lNonKey = lCols.filterNot(keys.contains)
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    val overlap = rPayload.intersect(lNonKey)
    require(overlap.isEmpty,
      s"right payload columns collide with left columns: ${overlap.mkString(", ")}")

    val lType = org.apache.spark.sql.types.StructType(
      left.select(lNonKey.map(col): _*).schema.fields)
    val rType = org.apache.spark.sql.types.StructType(
      right.select(rPayload.map(col): _*).schema.fields)

    val lPart = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_tag"),
        struct(lNonKey.map(col): _*).as("_l"),
        lit(null).cast(rType).as("_r")): _*)
    val rPart = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_tag"),
        lit(null).cast(lType).as("_l"),
        struct(rPayload.map(col): _*).as("_r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lPart.unionAll(rPart)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(keys.map(col) ++
        lCols.filterNot(keys.contains).map(c => col(s"_l.$c").as(c)) ++
        rPayload.map(c => col(s"_m.$c").as(c)): _*)
  }
}
