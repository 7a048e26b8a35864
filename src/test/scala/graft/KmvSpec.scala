package graft

import org.apache.spark.sql.functions.{col, lit}

import graft.pipeline.CardSketch

/**
 * KMV / theta sketch ([[CardSketch.kmvState]] family): exactness below
 * k, estimator accuracy above it, and intersection estimates against
 * constructed overlaps.
 */
class KmvSpec extends TestBase {

  import spark.implicits._

  private def ids(r: Range) = r.map(_.toLong).toDF("id")

  test("below k the sketch is the exact distinct set") {
    val st = CardSketch.kmvState(ids(1 to 100), "id", k = 256)
    assert(st.count() == 100)
    assert(CardSketch.kmvDistinct(st, k = 256) == 100L)
  }

  test("above k the estimator lands within 3 sigma (~1/sqrt(k))") {
    for (n <- Seq(5000, 50000)) {
      val est = CardSketch.kmvDistinct(
        CardSketch.kmvState(ids(1 to n), "id", k = 256), k = 256)
      val rel = math.abs(est.toDouble - n) / n
      assert(rel < 3.0 / math.sqrt(256.0),
        s"n=$n estimated $est (${rel * 100}%% off)")
    }
  }

  test("intersection: constructed 50% overlap estimated within " +
      "tolerance; disjoint sets give zero") {
    // A = [1, 4000], B = [2001, 6000] -> |A ∩ B| = 2000
    val a = CardSketch.kmvState(ids(1 to 4000), "id", k = 256)
    val b = CardSketch.kmvState(ids(2001 to 6000), "id", k = 256)
    val (nc, est) = CardSketch.kmvIntersect(a, b, k = 256)
    assert(nc > 0)
    val rel = math.abs(est.toDouble - 2000) / 2000
    assert(rel < 0.5, s"overlap estimated $est vs 2000 ($rel off)")
    val d = CardSketch.kmvState(ids(10001 to 12000), "id", k = 256)
    assert(CardSketch.kmvIntersect(a, d, k = 256) == ((0L, 0L)),
      "disjoint sets must estimate zero")
  }

  test("one exact sketch (below k) intersected with a sampled one " +
      "uses the sampled theta") {
    // B exact (100 values all inside A) -> estimate ~100
    val a = CardSketch.kmvState(ids(1 to 50000), "id", k = 256)
    val b = CardSketch.kmvState(ids(1 to 100), "id", k = 256)
    val (_, est) = CardSketch.kmvIntersect(a, b, k = 256)
    // theta = theta_A (tiny): the common set is subsampled at A's rate;
    // the estimate is noisy at |B|=100 << 50000/256 resolution, so only
    // pin the order of magnitude and non-absurdity
    assert(est >= 0 && est < 2000,
      s"a 100-element subset must not estimate past 2000, got $est")
  }

  test("grouped estimates: small groups exact, large groups within " +
      "3 sigma, one query") {
    val rows = (1L to 20000L).map(i => (if (i <= 50) "small" else "big", i))
      .toDF("g", "v")
    val got = CardSketch.kmvByGroup(rows, "g", "v", k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("small") == ((50L, 50L)), "below k must be exact")
    val (kept, est) = got("big")
    assert(kept == 64L)
    assert(math.abs(est - 19950.0) / 19950.0 < 3.0 / 8.0,
      s"big-group estimate $est")
  }

  test("sample sketch: quantiles land near truth; merge of halves is " +
      "bit-identical to the whole; empty refuses") {
    val rows = (1L to 50000L).map(i => (i, ((i * 7919) % 100000).toDouble))
      .toDF("id", "v")
    val st = CardSketch.sampleSketch(rows, "id", Seq("v"), k = 512)
    val qs = CardSketch.sampleQuantiles(st, "v",
      Seq(0.1, 0.5, 0.9)).toMap
    // true quantiles of the (near-uniform) value distribution
    for ((p, truth) <- Seq(0.1 -> 10000.0, 0.5 -> 50000.0,
        0.9 -> 90000.0)) {
      assert(math.abs(qs(p) - truth) / 100000.0 < 0.08,
        s"q$p = ${qs(p)} vs ~$truth")
    }
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val a = CardSketch.sampleSketch(
      rows.filter(col("id") <= 30000), "id", Seq("v"), k = 512)
    val b = CardSketch.sampleSketch(
      rows.filter(col("id") > 30000), "id", Seq("v"), k = 512)
    assert(sorted(CardSketch.sampleMerge(a, b, k = 512)) == sorted(st))
    intercept[IllegalArgumentException] {
      CardSketch.sampleQuantiles(st.filter(lit(false)), "v", Seq(0.5))
    }
  }

  test("duplicates do not move the sketch") {
    val once = CardSketch.kmvState(ids(1 to 3000), "id", k = 64)
      .collect().map(_.getLong(0)).sorted.toSeq
    val twice = CardSketch
      .kmvState(ids(1 to 3000).unionAll(ids(1 to 3000)), "id", k = 64)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(once == twice)
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("grouped samples equal per-group one-shot samples; sliding " +
      "merge equals a one-shot sketch of each window's raw rows") {
    // days 0,1,2,4 (3 absent); globally unique ids
    val rows = (1L to 6000L)
      .map(i => (Seq(0L, 1L, 2L, 4L)(((i % 4)).toInt), i,
        ((i * 131) % 997).toDouble))
      .toDF("d", "id", "v")
    val byDay = CardSketch.sampleSketchByGroup(rows, "id", Seq("v"),
      Seq("d"), k = 64)
    for (d <- Seq(0L, 1L, 2L, 4L)) {
      val one = CardSketch.sampleSketch(
        rows.filter(col("d") === d).select("id", "v"), "id", Seq("v"),
        k = 64)
      assert(sortedRows(byDay.filter(col("d") === d)
          .select("h", "id", "v")) == sortedRows(one),
        s"day $d grouped sample diverged")
    }
    val slid = CardSketch.sampleSlidingMerge(byDay, "d",
      windowLen = 2, k = 64)
    for ((d, win) <- Seq(0L -> Seq(0L), 1L -> Seq(0L, 1L),
        2L -> Seq(1L, 2L), 4L -> Seq(4L))) {
      val one = CardSketch.sampleSketch(
        rows.filter(col("d").isin(win: _*)).select("id", "v"),
        "id", Seq("v"), k = 64)
      assert(sortedRows(slid.filter(col("d") === d)
          .select("h", "id", "v")) == sortedRows(one),
        s"window ending at $d must equal the one-shot window sketch")
    }
    // positional extraction: per-index nearest-rank points
    val qs = CardSketch.sampleWindowQuantiles(slid, "d", "v",
      Seq(0, 500, 1000))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    for (d <- Seq(0L, 1L, 2L, 4L)) {
      val vs = slid.filter(col("d") === d)
        .select(col("v"), col("id")).collect()
        .map(r => (r.getDouble(0), r.getLong(1))).sorted.map(_._1)
      assert(qs((d, 0L)) == vs.head, s"p0 at $d")
      assert(qs((d, 500L)) == vs((500 * (vs.length - 1)) / 1000),
        s"p50 at $d")
      assert(qs((d, 1000L)) == vs.last, s"p100 at $d")
    }
  }

  test("keyed sliding sample: each key's window equals its own " +
      "one-shot sketch; the present-index spine is global") {
    val rows = (0 until 300).map { i =>
      (s"g${i % 2}", (i % 5).toLong, i.toLong + 1000L,
        ((i * 37) % 101).toDouble)
    }.toDF("g", "d", "id", "v")
      // key g1 is absent on day 3: the GLOBAL spine still reports a
      // g1 window ending there (from day 2's carryover)
      .filter(!(col("g") === "g1" && col("d") === 3L))
    val byKeyDay = CardSketch.sampleSketchByGroup(rows, "id", Seq("v"),
      Seq("g", "d"), k = 16)
    val slid = CardSketch.sampleSlidingMerge(byKeyDay, "d",
      windowLen = 2, k = 16, keyCols = Seq("g"))
    for (g <- Seq("g0", "g1"); (d, win) <- Seq(1L -> Seq(0L, 1L),
        3L -> Seq(2L, 3L), 4L -> Seq(3L, 4L))) {
      val one = CardSketch.sampleSketch(
        rows.filter(col("g") === g && col("d").isin(win: _*))
          .select("id", "v"), "id", Seq("v"), k = 16)
      assert(sortedRows(slid.filter(col("g") === g && col("d") === d)
          .select("h", "id", "v")) == sortedRows(one),
        s"($g, window ending $d) must equal the one-shot sketch")
    }
    val qs = CardSketch.sampleWindowQuantiles(slid, "d", "v",
      Seq(1000), keyCols = Seq("g"))
    assert(qs.columns.toSeq == Seq("g", "d", "p_milli", "v"))
    val m = qs.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val g0max = slid.filter(col("g") === "g0" && col("d") === 1L)
      .agg(org.apache.spark.sql.functions.max("v")).head().getDouble(0)
    assert(m(("g0", 1L)) == g0max, "p1000 is the per-(key, window) max")
  }
}
