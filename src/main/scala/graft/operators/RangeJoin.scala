package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/**
 * Interval (range-overlap) join: every left row paired with every right
 * interval that CONTAINS its timestamp — `l.ts >= r.start AND
 * l.ts < r.end` (end-exclusive), optionally with equi-keys. The
 * warehouse shape behind it: "which maintenance / incident / SLA
 * window was this event inside" — the reference answers the analogous
 * question (which replication window covered this audit entry) with
 * per-job timestamp comparisons in the reducer; here it is one
 * declarative join usable by any query.
 *
 * Execution shape — why not the naive theta-join: with only range
 * predicates (no equi-condition) Spark plans BroadcastNestedLoopJoin —
 * O(|L|·|R|) compares and a broadcast requirement on one whole side.
 * That dies first at 100 TB. Instead the range condition is REDUCED to
 * an equi-join by time-bucketing (the standard overlap-join trick,
 * cf. interval joins in stream processors):
 *
 *   1. left rows get ONE bucket: `floor(epoch_us(ts) / W)`;
 *   2. each interval explodes to the buckets it covers:
 *      `sequence(floor(s/W), floor((e-1)/W))` — end-exclusive, so an
 *      interval ending exactly on a bucket boundary does NOT claim the
 *      next bucket;
 *   3. hash equi-join on (keys…, bucket), then the EXACT range
 *      predicate re-filters — bucketing is a candidate generator, the
 *      filter is the semantics.
 *
 * Each matching (left, interval) pair meets in exactly one bucket (the
 * left row's), so no dedup pass is needed and overlapping intervals
 * come out once per interval, matching the SQL range join row-for-row.
 *
 * Cost at scale: ONE shuffle on (keys, bucket) — the same cost class
 * as any equi-join, AQE-splittable on hot buckets — plus an interval
 * blow-up of `ceil(len/W)+1` rows per interval. `bucketSeconds` is the
 * knob: pick it near the typical interval length so the blow-up is
 * ~2×; `maxBucketsPerInterval` makes a mis-sized bucket (one giant
 * interval exploding to millions of rows) fail loudly instead of
 * silently producing a runaway shuffle. Degenerate (`end <= start`)
 * intervals match nothing and are dropped before exploding.
 */
object RangeJoin {

  /**
   * Inner overlap join. Output = every left column, then every
   * non-key right column (start/end included so callers see which
   * window matched). Timestamp columns are compared at microsecond
   * precision (cast through session-zone TIMESTAMP, the
   * [[graft.sim.WarehouseSim.normalizeTimestamps]] ingestion
   * contract).
   */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, startCol: String, endCol: String,
      bucketSeconds: Long = 1800L,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val overlap = right.columns.toSeq.filterNot(keys.contains)
      .intersect(left.columns.toSeq.filterNot(keys.contains))
    require(overlap.isEmpty,
      s"right payload columns collide with left columns: ${overlap.mkString(", ")}")
    val w = bucketSeconds * 1000000L
    def us(c: String) = unix_micros(col(c).cast(TimestampType))

    val lB = left.withColumn("_rjb", floor(us(leftTs) / w).cast("long"))
    val rB = right
      .withColumn("_s_us", us(startCol)).withColumn("_e_us", us(endCol))
      .filter(col("_e_us") > col("_s_us"))
      .withColumn("_b1", floor((col("_e_us") - 1) / w).cast("long"))
      .withColumn("_b0", floor(col("_s_us") / w).cast("long"))
      .filter(assert_true(col("_b1") - col("_b0") < maxBucketsPerInterval,
        concat(lit("interval spanning "), col("_b1") - col("_b0") + 1,
          lit(s" buckets exceeds maxBucketsPerInterval=$maxBucketsPerInterval" +
            " — raise bucketSeconds or the cap"))).isNull)
      .withColumn("_rjb", explode(sequence(col("_b0"), col("_b1"))))
      .drop("_b0", "_b1")

    lB.join(rB, keys :+ "_rjb")
      .filter(us(leftTs) >= col("_s_us") && us(leftTs) < col("_e_us"))
      .drop("_rjb", "_s_us", "_e_us")
  }

  /**
   * Derive `bucketSeconds` from the interval-length distribution: the
   * chosen quantile of `end - start` (sketch aggregate, one tiny
   * collect), so a typical interval explodes to ~`1/q`+1 bucket rows.
   * Join OUTPUT is bucket-width-independent (the exact predicate
   * re-filters); only the candidate volume changes — so auto-sizing is
   * always safe, just not always optimal. Returns 1s for empty/
   * degenerate inputs.
   */
  def autoBucketSeconds(right: DataFrame, startCol: String, endCol: String,
      quantile: Double = 0.75): Long = {
    require(quantile > 0 && quantile <= 1, s"quantile in (0,1], got $quantile")
    val r = right
      .select(((unix_micros(col(endCol).cast(TimestampType)) -
        unix_micros(col(startCol).cast(TimestampType))) / 1000000L)
        .as("len"))
      .filter(col("len") > 0)
      .agg(percentile_approx(col("len"), lit(quantile), lit(10000)))
      .collect()
    if (r.isEmpty || r.head.isNullAt(0)) 1L
    else math.max(1L, math.round(r.head.getDouble(0)))
  }
}
