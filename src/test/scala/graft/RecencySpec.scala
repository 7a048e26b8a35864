package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Recency

/**
 * Exact half-life decay algebra ([[Recency]]): hand-checked staircase
 * weights, the advancement composition law, exact merge, and the
 * backwards-horizon refusal.
 */
class RecencySpec extends TestBase {

  import spark.implicits._

  private def df(rows: Seq[(String, Long)]): DataFrame =
    rows.toDF("k", "us").withColumn("ts", expr("timestamp_micros(us)"))

  private def stateMap(st: DataFrame): Map[String, (Long, Long, Long)] =
    st.collect().map { r =>
      r.getString(r.fieldIndex("k")) ->
        ((r.getLong(r.fieldIndex("horizon_p")),
          r.getLong(r.fieldIndex("decayed_micro")),
          r.getLong(r.fieldIndex("n_rows"))))
    }.toMap

  private val rows = Seq(
    ("a", 0L), ("a", 1500L), ("a", 3200L), ("b", 3999L))

  test("staircase weights on the period grid, hand-checked") {
    val st = stateMap(Recency.decayedState(df(rows), "ts", Seq("k"),
      halfLifeUs = 1000L))
    // horizon period = 3; a: p=0,1,3 -> 125000 + 250000 + 1000000
    assert(st("a") == ((3L, 1375000L, 3L)))
    assert(st("b") == ((3L, 1000000L, 1L)))
  }

  test("advance composes exactly: two hops equal one hop equal " +
      "recompute") {
    val st = Recency.decayedState(df(rows), "ts", Seq("k"), 1000L)
    val twoHop = stateMap(Recency.advance(Recency.advance(st, 4L), 5L))
    val oneHop = stateMap(Recency.advance(st, 5L))
    assert(twoHop == oneHop)
    assert(oneHop("a") == ((5L, 343750L, 3L)), "1375000 div 4")
    // recompute from rows with two future placeholder rows removed:
    // append a horizon-setting row under an unused key instead
    val future = stateMap(Recency.decayedState(
      df(rows :+ ("z", 5999L)), "ts", Seq("k"), 1000L))
    assert(future("a") == oneHop("a") && future("b") == oneHop("b"),
      "advanced state must equal recomputation at the later horizon")
  }

  test("merge advances both sides to the common horizon and adds " +
      "exactly (equals the one-shot state)") {
    val (early, late) = rows.partition(_._2 < 2000L)
    val merged = stateMap(Recency.merge(
      Recency.decayedState(df(early), "ts", Seq("k"), 1000L),
      Recency.decayedState(df(late), "ts", Seq("k"), 1000L)))
    val oneShot = stateMap(Recency.decayedState(df(rows), "ts",
      Seq("k"), 1000L))
    assert(merged == oneShot)
    // and the merge is symmetric
    val swapped = stateMap(Recency.merge(
      Recency.decayedState(df(late), "ts", Seq("k"), 1000L),
      Recency.decayedState(df(early), "ts", Seq("k"), 1000L)))
    assert(swapped == oneShot)
  }

  test("advancing backwards refuses loudly") {
    val st = Recency.decayedState(df(rows), "ts", Seq("k"), 1000L)
    val ex = intercept[Exception] {
      Recency.advance(st, 2L).collect()
    }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("horizons only move forward"))
  }

  test("deep decay floors to zero without overflow (shift cap)") {
    val st = Recency.decayedState(df(Seq(("a", 0L))), "ts", Seq("k"),
      1000L)
    val far = stateMap(Recency.advance(st, 100L))
    assert(far("a") == ((100L, 0L, 1L)))
  }

  test("pre-1970 timestamps land on the FLOOR grid period (true floor " +
      "division, matching the oracle's // semantics)") {
    // us = -1 is period -1 on a 1000us grid under floor division;
    // truncating div would put it in period 0 with the us = 500 row
    val st = stateMap(
      Recency.decayedState(df(Seq(("a", -1L), ("a", 500L))), "ts",
        Seq("k"), 1000L))
    // horizon is period 0 (the 500us row); the -1us row sits one
    // period back and carries half weight: 1000000 + 500000
    assert(st("a") == ((0L, 1500000L, 2L)))
    assert(Recency.floorDivSql("x", 10L) ==
      "((x) - pmod((x), 10L)) div 10L")
  }
}
