package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.SequenceMatch

/** CEP-style funnel matching: earliest-completion semantics, strict
  * ordering at equal timestamps, window cutoff, and equality with the
  * naive grouped-min range join on randomized streams. */
class SequenceMatchSpec extends TestBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toSeq.map { case (u, us, t, id) =>
      (u, new Timestamp(us / 1000), t, id)
    }.toDF("user_id", "ts", "event_type", "event_id")

  private val S = 1000000L // one second in micros

  test("matches the earliest strictly-later event per step") {
    val df = ev(
      (1L, 10 * S, "view", 1L),
      (1L, 10 * S, "click", 2L), // equal ts: NOT a valid step (strict >)
      (1L, 20 * S, "click", 3L),
      (1L, 15 * S, "click", 4L), // earlier than 20 but after view: earliest
      (1L, 30 * S, "purchase", 5L),
      (1L, 25 * S, "purchase", 6L)) // earliest after the 15s click
    val out = SequenceMatch.funnelMatch(df,
        Seq("view", "click", "purchase"), withinSeconds = 3600)
      .select("user_id", "id0", "t0", "t1", "t2")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out === Array((1L, 1L, 10 * S, 15 * S, 25 * S)))
  }

  test("whole sequence must complete inside the window") {
    val df = ev(
      (1L, 0L, "view", 1L),
      (1L, 10 * S, "click", 2L),
      (1L, 4000 * S, "purchase", 3L), // completes 4000s after anchor
      (2L, 0L, "view", 4L),
      (2L, 3599 * S, "click", 5L),
      (2L, 3600 * S, "purchase", 6L)) // exactly at the bound: kept
    val out = SequenceMatch.funnelMatch(df,
        Seq("view", "click", "purchase"), withinSeconds = 3600)
      .select("user_id").as[Long].collect()
    assert(out === Array(2L))
  }

  test("keys never mix and incomplete funnels drop") {
    val df = ev(
      (1L, 0L, "view", 1L),
      (2L, 10 * S, "click", 2L), // other user's click must not match
      (1L, 20 * S, "purchase", 3L),
      (3L, 0L, "view", 4L), (3L, 5 * S, "click", 5L)) // no purchase
    assert(SequenceMatch.funnelMatch(df,
      Seq("view", "click", "purchase"), 3600).count() === 0)
  }

  test("equals the naive grouped-min range join on a randomized stream") {
    val types = Array("view", "click", "purchase", "error")
    val rows = (0 until 800).map { i =>
      val u = (i * 7919) % 13
      val us = ((i * 104729) % 5000).toLong * S
      (u.toLong, us, types((i * 31) % 4), i.toLong)
    }
    val df = ev(rows: _*)
    val got = SequenceMatch.funnelMatch(df,
        Seq("view", "click", "purchase"), withinSeconds = 1800)
      .select("user_id", "id0", "t0", "t1", "t2")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val e = df.select(col("user_id").as("u"),
      unix_micros(col("ts")).as("us"), col("event_type").as("et"),
      col("event_id").as("id"))
    val v = e.filter(col("et") === "view")
      .select(col("u"), col("id").as("id0"), col("us").as("t0"))
    val c = e.filter(col("et") === "click")
      .select(col("u").as("cu"), col("us").as("tc"))
    val p = e.filter(col("et") === "purchase")
      .select(col("u").as("pu"), col("us").as("tp"))
    val s1 = v.join(c, col("u") === col("cu") && col("tc") > col("t0"))
      .groupBy("u", "id0", "t0").agg(min("tc").as("t1"))
    val want = s1.join(p, col("u") === col("pu") && col("tp") > col("t1"))
      .groupBy("u", "id0", "t0", "t1").agg(min("tp").as("t2"))
      .filter(col("t2") - col("t0") <= 1800L * 1000000L)
      .select("u", "id0", "t0", "t1", "t2")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture should produce at least one funnel")
  }

  test("rejects degenerate parameters loudly") {
    val df = ev((1L, 0L, "view", 1L))
    intercept[IllegalArgumentException] {
      SequenceMatch.funnelMatch(df, Seq("view"), 3600)
    }
    intercept[IllegalArgumentException] {
      SequenceMatch.funnelMatch(df, Seq("view", "click"), 0)
    }
  }
}
