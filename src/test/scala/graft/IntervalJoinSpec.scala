package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Bucketed interval overlap join ([[IntervalJoin.overlapJoin]]):
  * equality with the naive non-equi definition over randomized
  * intervals, exactly-once across bucket spans, boundary semantics,
  * the bad-interval guard, and the equi-join plan shape. */
class IntervalJoinSpec extends TestBase {

  import spark.implicits._

  private def mk(pfx: String, rows: Seq[(String, Long, Long, Long)]) =
    rows.toDF("user_id", s"${pfx}_id", s"${pfx}_s", s"${pfx}_e")

  private def naive(a: Seq[(String, Long, Long, Long)],
      b: Seq[(String, Long, Long, Long)]) =
    (for {
      (ku, ai, as_, ae) <- a
      (kb, bi, bs, be) <- b
      if ku == kb && as_ < be && bs < ae
    } yield (ku, ai, bi, math.min(ae, be) - math.max(as_, bs)))
      .sortBy(_.toString)

  private def run(a: Seq[(String, Long, Long, Long)],
      b: Seq[(String, Long, Long, Long)], bucket: Long) =
    IntervalJoin.overlapJoin(mk("a", a), mk("b", b),
        Seq("user_id"), bucket)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_.toString).toSeq

  test("equals the naive non-equi join over hash-random intervals, " +
      "several bucket sizes") {
    val a = (1L to 120L).map { i =>
      val s = (i * 131) % 1000; (s"u${i % 5}", i, s, s + 1 + (i * 7) % 90)
    }
    val b = (1L to 120L).map { i =>
      val s = (i * 577) % 1000
      (s"u${i % 5}", 1000L + i, s, s + 1 + (i * 13) % 90)
    }
    for (bucket <- Seq(7L, 64L, 1000L, 100000L)) {
      assert(run(a, b, bucket) == naive(a, b),
        s"bucket=$bucket must equal the naive definition")
    }
  }

  test("a pair spanning many buckets appears exactly once; touching " +
      "half-open intervals do not match") {
    val a = Seq(("u", 1L, 0L, 1000L))            // spans 100 buckets at 10
    val b = Seq(("u", 2L, 500L, 2000L), ("u", 3L, 1000L, 1100L))
    val got = run(a, b, 10L)
    assert(got == Seq(("u", 1L, 2L, 500L)),
      s"one overlap row, none for the touching [1000,1100): $got")
  }

  test("keys never mix") {
    val a = Seq(("u1", 1L, 0L, 100L))
    val b = Seq(("u2", 2L, 0L, 100L))
    assert(run(a, b, 10L).isEmpty)
  }

  test("bad intervals fail the job loudly") {
    val ex = intercept[Exception] {
      run(Seq(("u", 1L, 50L, 50L)), Seq(("u", 2L, 0L, 10L)), 10L)
    }
    assert(ex.getMessage.contains("0 <= s < e") ||
      Option(ex.getCause).exists(_.getMessage.contains("0 <= s < e")))
  }

  test("plan is an equi-join on (keys, bucket) — no nested loop") {
    val df = IntervalJoin.overlapJoin(
      mk("a", Seq(("u", 1L, 0L, 10L))), mk("b", Seq(("u", 2L, 5L, 15L))),
      Seq("user_id"), 10L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"must plan an equi-join:\n$plan")
  }
}
