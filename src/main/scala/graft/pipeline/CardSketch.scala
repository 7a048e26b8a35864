package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HyperLogLog distinct-count sketch with a FULLY DETERMINISTIC,
 * cross-engine-replayable register state (Flajolet et al. 2007; the
 * practical corrections from Heule et al. 2013's reading of the
 * original paper).
 *
 * Why another HLL when Spark ships two (`approx_count_distinct`,
 * `hll_sketch_agg`): their binary sketch states are engine-private, so
 * the DuckDB oracle can grade them rows-only at best. This one is
 * built from pieces the oracle replays bit-for-bit — Spark's own
 * `xxhash64` (the [[graft.queries.XxhSql]] chain), integer
 * bucket/rank extraction (a comparison cascade, NO log2 — libm
 * last-ulp behavior differs by engine), and a max-per-bucket
 * aggregate — which makes the sketch itself hash-certifiable, not
 * just its estimate. The estimate stays a driver-side fold over the
 * ≤ 2^p-row state ([[hllEstimate]]), accuracy-tested rather than
 * hash-matched because its small-range correction needs `ln`.
 *
 * Scale shape: ONE scan computing two integer columns, then a
 * (bucket → max) aggregate with map-side partials — the state is
 * 2^p rows no matter the corpus, merges by per-bucket max
 * ([[hllMerge]]: the streaming/incremental/union story for free), and
 * never shuffles more than 2^p rows per partition.
 */
object CardSketch {

  /** Register state of the value column: `(bucket, m_rank)` for every
    * NON-EMPTY bucket (missing bucket ⇒ register 0), bucket from the
    * top `p` bits of xxhash64(value), rank = 1 + leading zeros of the
    * remaining 64−p-bit window (window 0 ⇒ the max rank 64−p+1). */
  def hllState(df: DataFrame, valueCol: String, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val window = 64 - p
    val h = xxhash64(col(valueCol))
    val bucket = shiftrightunsigned(h, window).cast("int")
    val w = h.bitwiseAND(lit((1L << window) - 1L))
    // rank via a pure comparison cascade: w ≥ 2^(window−r) ⇔ the
    // window's bit-length is window−r+1 ⇔ r−1 leading zeros
    val rank = (1 to window).foldRight(lit(window + 1): Column) {
      (r, rest) => when(w >= lit(1L << (window - r)), lit(r)).otherwise(rest)
    }
    df.select(bucket.as("bucket"), rank.as("__r"))
      .groupBy("bucket").agg(max(col("__r")).cast("int").as("m_rank"))
  }

  /** Per-group register states: `(group…, bucket, m_rank)` — one
    * [[hllState]] per key in a single grouped aggregate (map-side
    * partials; duplicate values within a group are absorbed by the
    * max, no distinct pass needed). The building block for
    * partitioned-by-time sketch tables: materialize per-day states
    * once, answer any window by merging states
    * ([[hllSlidingMerge]]) — the 100-TB distinct-users pattern where
    * re-scanning raw events per window is the anti-pattern. */
  def hllStateByGroup(df: DataFrame, valueCol: String,
      groupCols: Seq[String], p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    require(groupCols.nonEmpty, "hllStateByGroup needs group columns")
    val window = 64 - p
    val h = xxhash64(col(valueCol))
    val bucket = shiftrightunsigned(h, window).cast("int")
    val w = h.bitwiseAND(lit((1L << window) - 1L))
    val rank = (1 to window).foldRight(lit(window + 1): Column) {
      (r, rest) => when(w >= lit(1L << (window - r)), lit(r)).otherwise(rest)
    }
    df.select(groupCols.map(col) :+ bucket.as("bucket") :+
        rank.as("__r"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("__r")).cast("int").as("m_rank"))
  }

  /** Sliding-window union over per-index states ([[hllStateByGroup]]
    * keyed by an integer window index, e.g. day number): for every
    * index present in `states`, the merged register state of indices
    * in `[idx − windowLen + 1, idx]`. Banded, not windowed: each state
    * row explodes to the ≤ `windowLen` target indices it contributes
    * to and a grouped max folds them — replication factor windowLen
    * over STATE rows (≤ 2^p per index, never the corpus), one
    * equi-semi-join against the present-index spine, no non-equi join,
    * no per-index re-scan of raw data. Because merge is per-bucket
    * max, the result for each index is bit-identical to a one-shot
    * sketch of the window's raw union. */
  def hllSlidingMerge(states: DataFrame, idxCol: String,
      windowLen: Int, keyCols: Seq[String] = Nil): DataFrame = {
    require(windowLen >= 1, s"windowLen must be >= 1, got $windowLen")
    // the present-index spine is GLOBAL (an index is "present" when any
    // key has a state there) so every key reports over the same window
    // set — per-key spines would make cross-key comparison windows
    // disagree about which trailing weeks exist
    val present = states.select(col(idxCol)).distinct()
    states
      .withColumn("__t", explode(expr(
        s"sequence(CAST($idxCol AS BIGINT), " +
          s"CAST($idxCol AS BIGINT) + ${windowLen - 1}L)")))
      .join(present.select(col(idxCol).cast("long").as("__t")),
        Seq("__t"), "left_semi")
      .groupBy(keyCols.map(col) :+ col("__t").as(idxCol) :+
        col("bucket"): _*)
      .agg(max(col("m_rank")).cast("int").as("m_rank"))
  }

  /** Union of two sketches = per-bucket max (missing bucket = 0): the
    * merged state of two corpus halves is bit-identical to the state
    * of the union — the property that makes HLL the incremental /
    * streaming / cross-shard cardinality tool. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("bucket"), col("m_rank").as("__a"))
      .join(b.select(col("bucket"), col("m_rank").as("__b")),
        Seq("bucket"), "full_outer")
      .select(col("bucket"),
        greatest(coalesce(col("__a"), lit(0)), coalesce(col("__b"), lit(0)))
          .as("m_rank"))

  /** Distinct-count estimate from a state frame: the harmonic-mean
    * raw estimator with the small-range linear-counting correction.
    * Driver-side over ≤ 2^p rows; the harmonic sum is EXACT (BigInt in
    * units of 2^−(64−p+1)) so the only float ops are two divisions and
    * (in the small range) one `ln` — which is why the estimate is
    * accuracy-tested, not oracle-hashed. */
  def hllEstimate(state: DataFrame, p: Int = 9): Long = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val maxRank = 64 - p + 1
    val regs = new Array[Int](m)
    state.collect().foreach { r =>
      val b = r.getInt(0)
      require(b >= 0 && b < m, s"bucket $b out of range for p=$p")
      regs(b) = r.getInt(1)
    }
    val sumUnits = regs.foldLeft(BigInt(0)) { (acc, mr) =>
      acc + (BigInt(1) << (maxRank - mr))
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m.toDouble * m.toDouble *
      math.pow(2.0, maxRank) / sumUnits.toDouble
    val zeros = regs.count(_ == 0)
    val est =
      if (raw <= 2.5 * m && zeros > 0)
        m.toDouble * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  // ======================= KMV / theta sketch ==========================

  /** Unsigned position of a signed xxhash64 value in [0, 2^64). */
  private def pos(h: Long): BigInt = BigInt(h) + (BigInt(1) << 63)

  /**
   * KMV ("k minimum values") sketch — the theta-sketch family's base
   * (Bar-Yossef et al. 2002; Dasgupta et al. 2016 for the set-algebra
   * reading): the k smallest DISTINCT xxhash64 values of the column
   * in signed order (one fixed rotation of the uniform 64-bit space —
   * the estimators only need uniform positions, which
   * `pos = h + 2^63` restores exactly). Where [[hllState]] estimates
   * ONE cardinality better per byte, KMV composes: sketches
   * intersect/union by plain set algebra over the kept hashes, giving
   * overlap estimates HLL fundamentally cannot — and every estimator
   * here is PURE INTEGER arithmetic (BigInt shifts and divisions), so
   * unlike the HLL estimate the KMV estimates are oracle-hashable.
   *
   * Scale shape: one scan + distinct + global bottom-k
   * (TakeOrderedAndProject after the distinct exchange) — the state is
   * k rows regardless of corpus size.
   */
  def kmvState(df: DataFrame, valueCol: String, k: Int = 256): DataFrame = {
    require(k >= 16 && k <= 65536, s"k must be in [16, 65536], got $k")
    df.select(xxhash64(col(valueCol)).as("h")).distinct()
      .orderBy(col("h")).limit(k)
  }

  /** Union of two KMV sketches: the k smallest of the merged kept
    * sets — bit-identical to the sketch of the unioned inputs (each
    * side kept the bottom-k of its part, and the union's bottom-k is
    * contained in the union of the parts' bottom-ks), which is what
    * makes the sketch incrementally / stream-maintainable. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame =
    a.unionByName(b).distinct().orderBy(col("h")).limit(k)

  /** Distinct-count estimate: exact when the sketch kept everything
    * (fewer than k hashes exist), else the KMV estimator
    * `(k−1)·2^64 / (pos(kth smallest) + 1)` — exact integer division,
    * replayed verbatim by the oracle. */
  def kmvDistinct(state: DataFrame, k: Int = 256): Long = {
    val hs = state.collect().map(_.getLong(0)).sorted
    if (hs.length < k) hs.length.toLong
    else (((BigInt(k) - 1) << 64) / (pos(hs.last) + 1)).toLong
  }

  /**
   * Per-group KMV distinct estimates as ONE distributed query — the
   * grouped data-card shape (`n_unique` per cell) with the sketch's
   * cost profile AND an oracle-hashable estimator: per group, the
   * bottom-k hash ranks come from a window over the distinct
   * (group, hash) pairs, and the estimate column is the same
   * `(k−1)·2^64 / (pos+1)` — computed in DOUBLE ((k−1)·2^64 is exact
   * for k ≤ 2^9; the divisor's rounding is the identical IEEE op in
   * both engines) and floored to a long. Groups with fewer than k
   * distinct values report exactly.
   *
   * Scale shape: distinct + one window + one group-agg, all keyed by
   * the group column — map-side partial distinct, k rows per group
   * after the rank filter.
   */
  def kmvByGroup(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 16 && k <= 512, s"k must be in [16, 512], got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("h"))
    df.select(col(groupCol), xxhash64(col(valueCol)).as("h")).distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(groupCol).agg(count(lit(1)).as("n_kept"),
        max(col("h")).as("__mx"))
      .select(col(groupCol), col("n_kept"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(floor(lit(((BigInt(k) - 1) << 64).toDouble) /
            (col("__mx").cast("double") + lit((BigInt(1) << 63).toDouble)
              + lit(1.0))).cast("long"))
          .as("est"))
  }

  /**
   * Mergeable hash-sample sketch for QUANTILES — the distribution
   * sibling of [[kmvState]]: keep the k rows with the smallest
   * (xxhash64(id), id) keys, carrying whatever value columns the
   * quantiles are wanted over. The hash order is a uniform random
   * permutation fixed by the data itself, so the kept rows are a
   * uniform k-sample of the corpus that is DETERMINISTIC across
   * re-runs, retries, partitionings — and MERGEABLE: bottom-k of two
   * sketches' union is bit-identical to the sketch of the unioned
   * inputs (the [[kmvMerge]] argument, row-level). Quantile error is
   * the standard sampling bound (~1/√k per quantile).
   *
   * One scan + global bottom-k; k rows regardless of corpus size;
   * no sort of the data, no libm anywhere — sketch AND quantile
   * extraction replay in the oracle.
   */
  def sampleSketch(df: DataFrame, idCol: String,
      valueCols: Seq[String], k: Int = 512): DataFrame = {
    require(k >= 16 && k <= 65536, s"k must be in [16, 65536], got $k")
    require(valueCols.nonEmpty, "sampleSketch needs value columns")
    df.select(xxhash64(col(idCol)).as("h") +: col(idCol).as("id") +:
        valueCols.map(col): _*)
      .orderBy(col("h"), col("id")).limit(k)
  }

  /** Union of two sample sketches = bottom-k of the merged rows
    * (distinct first: a row present in both halves is one row). */
  def sampleMerge(a: DataFrame, b: DataFrame, k: Int = 512): DataFrame =
    a.unionByName(b).distinct().orderBy(col("h"), col("id")).limit(k)

  /** Per-group bottom-k hash samples ([[sampleSketch]] keyed by
    * `groupCols`): one rank window per group instead of a global
    * top-k. Group partitions are corpus-sized before the rank — size
    * the group key (days, sources) so hot groups stay executor-sized,
    * the usual windowed-operator contract. */
  def sampleSketchByGroup(df: DataFrame, idCol: String,
      valueCols: Seq[String], groupCols: Seq[String],
      k: Int = 512): DataFrame = {
    require(k >= 16 && k <= 65536, s"k must be in [16, 65536], got $k")
    require(groupCols.nonEmpty, "sampleSketchByGroup needs group columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("h"), col("id"))
    df.select(groupCols.map(col) ++ (xxhash64(col(idCol)).as("h") +:
        col(idCol).as("id") +: valueCols.map(col)): _*)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Sliding-window bottom-k over per-index samples: for every index
    * present, the bottom-k (by (h, id)) of the union of the trailing
    * `windowLen` indices' samples. Banded like [[hllSlidingMerge]]
    * (explode STATE rows to their target windows + one rank window
    * per target index — raw rows are never re-scanned), and exact by
    * the same subset argument: any row in a window's true global
    * bottom-k is in its own index's bottom-k, so selecting from the
    * merged states equals a one-shot sketch of the window's raw rows
    * (ids must be globally unique — the family's id contract).
    *
    * `keyCols` gives every segment its own trailing-window sample
    * (the [[hllSlidingMerge]] keyed shape — per-segment rolling
    * percentiles): ranks partition by (key, window index), while the
    * present-index spine stays GLOBAL so every key reports over the
    * same window set. State-row replication is still windowLen× of
    * ≤ k·keys rows — never the raw events. */
  def sampleSlidingMerge(states: DataFrame, idxCol: String,
      windowLen: Int, k: Int = 512,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(windowLen >= 1, s"windowLen must be >= 1, got $windowLen")
    val present = states.select(col(idxCol)).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col) :+ col("__t"): _*)
      .orderBy(col("h"), col("id"))
    states
      .withColumn("__t", explode(expr(
        s"sequence(CAST($idxCol AS BIGINT), " +
          s"CAST($idxCol AS BIGINT) + ${windowLen - 1}L)")))
      .join(present.select(col(idxCol).cast("long").as("__t")),
        Seq("__t"), "left_semi")
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk").drop(idxCol)
      .withColumnRenamed("__t", idxCol)
  }

  /** Distributed nearest-rank quantiles per window index over a
    * ([[sampleSlidingMerge]]-shaped) state frame: for each index and
    * each requested permille point, the sample element at position
    * `(p_milli · (n−1)) div 1000` ordered by (value, id) — all-integer
    * positional selection, no interpolation, so the extraction itself
    * is oracle-replayable. Output: `(idx, p_milli, value)` long
    * format, one row per (index, point). */
  def sampleWindowQuantiles(states: DataFrame, idxCol: String,
      valueCol: String, psMilli: Seq[Int],
      keyCols: Seq[String] = Nil): DataFrame = {
    require(psMilli.nonEmpty && psMilli.forall(p => p >= 0 && p <= 1000),
      s"permille points must be in [0,1000], got $psMilli")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col) :+ col(idxCol): _*)
    val wRank = wAll.orderBy(col(valueCol), col("id"))
    states
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("p_milli",
        explode(array(psMilli.map(p => lit(p.toLong)): _*)))
      .filter(col("__rk") === expr("(p_milli * (__n - 1)) div 1000") + 1)
      .select(keyCols.map(col) :+ col(idxCol) :+ col("p_milli") :+
        col(valueCol): _*)
  }

  /** Nearest-rank quantiles of a sketch's value column: the element at
    * position floor(p·(n−1)) of the sample ordered by (value, id) —
    * pure positional selection, deterministic, oracle-replayable.
    * Driver-side over the ≤ k-row state. Returns (p, value) pairs. */
  def sampleQuantiles(state: DataFrame, valueCol: String,
      ps: Seq[Double]): Seq[(Double, Double)] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile points must be in [0,1], got $ps")
    val rows = state.select(col(valueCol).cast("double"), col("id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(identity)
    require(rows.nonEmpty, "sampleQuantiles on an empty sketch")
    ps.map(p => p -> rows(math.floor(p * (rows.length - 1)).toInt)._1)
  }

  /**
   * Theta-sketch intersection estimate from two [[kmvState]] frames:
   * θ = min of the two sketches' thresholds (a sketch that kept
   * everything is exact — θ = 2^64), the common kept hashes below θ
   * are an unbiased uniform sample of the intersection at rate
   * θ/2^64, so `est = n_common · 2^64 / θ` (integer division).
   * Returns (n_common, est).
   */
  def kmvIntersect(a: DataFrame, b: DataFrame,
      k: Int = 256): (Long, Long) = {
    val full = BigInt(1) << 64
    def load(df: DataFrame): (Set[Long], BigInt) = {
      val hs = df.collect().map(_.getLong(0)).sorted
      (hs.toSet, if (hs.length < k) full else pos(hs.last) + 1)
    }
    val (ha, ta) = load(a)
    val (hb, tb) = load(b)
    val theta = ta min tb
    val common = (ha intersect hb).count(pos(_) < theta)
    (common.toLong, ((BigInt(common) << 64) / theta).toLong)
  }
}
