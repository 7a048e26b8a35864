package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed interval OVERLAP join — the temporal join Spark has no
 * native operator for (a raw `a.s < b.e AND b.s < a.e` join plans as a
 * per-key nested loop; with a weak or absent key it degenerates to a
 * cartesian). The classic fix: quantize time into fixed buckets, emit
 * each interval into every bucket it touches, equi-join on
 * (keys, bucket), and keep each overlapping pair EXACTLY ONCE by
 * accepting it only in the canonical bucket `max(floor(a.s/w),
 * floor(b.s/w))` — the first bucket both intervals cover (they both
 * cover it precisely when they overlap), so no distinct pass is
 * needed. The exact overlap predicate then filters bucket-mates that
 * never actually intersect.
 *
 * Scale shape: the only join is an equi-join on (keys, bucket) —
 * shuffle-partitionable, AQE-skew-splittable, never a nested loop.
 * Replication factor is (interval length / bucket) + 1 per side: size
 * `bucket` near the TYPICAL interval length so most intervals emit
 * 1-2 rows; a bucket far below interval length inflates the shuffle,
 * far above it degrades toward per-bucket quadratic work — the same
 * knob every banded operator here exposes.
 *
 * Inputs carry (`a_id`, `a_s`, `a_e`) / (`b_id`, `b_s`, `b_e`) plus
 * the shared `keys` columns. Intervals are half-open [s, e) over
 * NON-NEGATIVE longs (epoch micros; `div` truncation = floor only
 * there), e > s enforced per row. Output: keys + (a_id, b_id,
 * overlap) with overlap = least(e) − greatest(s) > 0.
 */
object IntervalJoin {

  def overlapJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    // integer `div`, not `/` (long / long is DOUBLE in Spark — a
    // quotient rounding up across an integer would misplace a bucket)
    def idiv(c: String): Column = expr(s"CAST($c AS BIGINT) div ${bucket}L")
    def buckets(s: String, e: String, side: String): Column =
      when(col(s) < 0 || col(e) <= col(s), raise_error(concat(
        lit(s"overlapJoin: $side interval must satisfy 0 <= s < e, got ["),
        col(s), lit(", "), col(e), lit(")"))))
        .otherwise(expr(s"sequence(CAST($s AS BIGINT) div ${bucket}L, " +
          s"(CAST($e AS BIGINT) - 1) div ${bucket}L)"))
    val ae = a.withColumn("__bk", explode(buckets("a_s", "a_e", "left")))
    val be = b.withColumn("__bk", explode(buckets("b_s", "b_e", "right")))
    ae.join(be, keys :+ "__bk")
      .filter(col("__bk") === greatest(idiv("a_s"), idiv("b_s")))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select(keys.map(col) ++ Seq(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap")): _*)
  }
}
