package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CardSketch

/**
 * Deterministic HLL ([[CardSketch]]): estimate accuracy in both
 * regimes (linear-counting small range, harmonic-mean raw), bit-exact
 * mergeability, determinism, and state bounds.
 */
class HllSpec extends TestBase {

  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("id")

  private def err(est: Long, truth: Long): Double =
    math.abs(est.toDouble - truth) / truth

  test("estimate within tolerance across regimes (p=9: linear " +
      "counting below ~1280, raw harmonic mean above)") {
    for (n <- Seq(30, 500, 2000, 20000)) {
      val est = CardSketch.hllEstimate(
        CardSketch.hllState(ids(n), "id"), p = 9)
      // standard error 1.04/sqrt(512) ~ 4.6%; allow 3 sigma
      assert(err(est, n) < 0.14,
        s"n=$n estimated $est (${err(est, n) * 100}%% off)")
    }
  }

  test("duplicates do not move the sketch: state(ids ++ ids) == " +
      "state(ids)") {
    val once = CardSketch.hllState(ids(1000), "id")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val twice = CardSketch.hllState(ids(1000).unionAll(ids(1000)), "id")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(once == twice)
  }

  test("merge of disjoint halves is bit-identical to the whole; " +
      "merge is idempotent") {
    val whole = CardSketch.hllState(ids(5000), "id")
    val a = CardSketch.hllState(ids(5000).filter(col("id") % 2 === 0), "id")
    val b = CardSketch.hllState(ids(5000).filter(col("id") % 2 =!= 0), "id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(CardSketch.hllMerge(a, b)) == rows(whole))
    assert(rows(CardSketch.hllMerge(whole, whole)) == rows(whole),
      "self-merge must be a no-op (per-bucket max)")
  }

  test("state is bounded by 2^p rows with ranks in [1, 64-p+1]") {
    val st = CardSketch.hllState(ids(100000), "id", p = 6).collect()
    assert(st.length <= 64)
    assert(st.forall { r =>
      val b = r.getInt(0); val m = r.getInt(1)
      b >= 0 && b < 64 && m >= 1 && m <= 59
    })
  }

  test("p out of range refuses") {
    intercept[IllegalArgumentException] {
      CardSketch.hllState(ids(10), "id", p = 3)
    }
    intercept[IllegalArgumentException] {
      CardSketch.hllEstimate(ids(10).toDF("bucket").withColumn(
        "m_rank", lit(1)), p = 17)
    }
  }

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("grouped states equal per-group one-shot states") {
    val rows = (1L to 3000L).map(i => (i % 5, i)).toDF("g", "id")
    val grouped = CardSketch.hllStateByGroup(rows, "id", Seq("g"), p = 6)
    for (g <- 0L until 5L) {
      val one = CardSketch.hllState(
        rows.filter(col("g") === g).select("id"), "id", p = 6)
      val got = grouped.filter(col("g") === g).select("bucket", "m_rank")
      assert(sorted(got) == sorted(one), s"group $g diverged")
    }
  }

  test("sliding merge equals one-shot sketches of each window's raw " +
      "union, including across a day gap") {
    // days 0,1,2,4 (3 missing): window 2 at day 4 covers only {3,4}∩present={4}
    val rows = Seq.tabulate(4000) { i =>
      (Seq(0L, 1L, 2L, 4L)(i % 4), (i * 37L) % 997L)
    }.toDF("d", "id")
    val slid = CardSketch.hllSlidingMerge(
      CardSketch.hllStateByGroup(rows, "id", Seq("d"), p = 6), "d",
      windowLen = 2)
    assert(sorted(slid.select("d").distinct()) ==
      Seq(Seq(0L), Seq(1L), Seq(2L), Seq(4L)),
      "output indices = present indices only")
    for ((d, win) <- Seq(0L -> Seq(0L), 1L -> Seq(0L, 1L),
        2L -> Seq(1L, 2L), 4L -> Seq(4L))) {
      val one = CardSketch.hllState(
        rows.filter(col("d").isin(win: _*)).select("id"), "id", p = 6)
      val got = slid.filter(col("d") === d).select("bucket", "m_rank")
      assert(sorted(got) == sorted(one),
        s"window ending at $d must be bit-identical to the one-shot")
    }
  }

  test("keyed sliding merge: each key's window equals its own one-shot " +
      "sketch over the GLOBAL present-day spine") {
    val rows = Seq.tabulate(3000) { i =>
      (if (i % 3 == 0) "a" else "b", Seq(0L, 1L, 3L)(i % 3),
        (i * 13L) % 701L)
    }.toDF("g", "d", "id")
    val slid = CardSketch.hllSlidingMerge(
      CardSketch.hllStateByGroup(rows, "id", Seq("g", "d"), p = 6),
      "d", windowLen = 2, keyCols = Seq("g"))
    // key "a" has states only at d=0; key "b" at d=1 and d=3 — but the
    // spine is global {0,1,3}
    for ((g, d, win) <- Seq(("a", 0L, Seq(0L)), ("a", 1L, Seq(0L, 1L)),
        ("b", 1L, Seq(0L, 1L)), ("b", 3L, Seq(3L)))) {
      val one = CardSketch.hllState(
        rows.filter(col("g") === g && col("d").isin(win: _*))
          .select("id"), "id", p = 6)
      val got = slid.filter(col("g") === g && col("d") === d)
        .select("bucket", "m_rank")
      assert(sorted(got) == sorted(one), s"($g, $d) diverged")
    }
    // a key with no state in a window simply has no rows there
    assert(slid.filter(col("g") === "b" && col("d") === 0L).count() == 0)
  }
}
