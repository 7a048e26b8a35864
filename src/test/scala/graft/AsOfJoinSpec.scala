package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Hand-traced fixtures for the union-merge as-of join (DuckDB ASOF
  * LEFT JOIN semantics: latest right row with right.ts <= left.ts per
  * key; equal timestamps match; unmatched left rows survive with null
  * payload). */
class AsOfJoinSpec extends TestBase {
  import spark.implicits._

  private def left =
    Seq(("a", 10L, 100L), ("a", 5L, 101L), ("a", 3L, 102L),
      ("b", 7L, 103L), ("c", 1L, 104L))
      .toDF("k", "lts", "lid")

  private def right =
    Seq(("a", 4L, 1L, "v4"), ("a", 5L, 2L, "v5"), ("a", 9L, 3L, "v9"),
      ("b", 7L, 4L, "v7"), ("b", 8L, 5L, "v8"))
      .toDF("k", "rts", "rid", "rv")

  test("asOf picks the latest right row at or before each left timestamp") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
      .select("k", "lid", "rid", "rv").as[(String, Long, Option[Long], Option[String])]
      .collect().toSet
    assert(out === Set(
      ("a", 100L, Some(3L), Some("v9")), // lts=10 -> rts=9
      ("a", 101L, Some(2L), Some("v5")), // lts=5 -> rts=5 (equal ts matches)
      ("a", 102L, None, None),           // lts=3 -> nothing at or before
      ("b", 103L, Some(4L), Some("v7")), // equal ts on key b
      ("c", 104L, None, None)))          // key with no right rows at all
  }

  test("asOf returns every left row exactly once and the right ts column") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("k", "lts", "lid", "rts", "rid", "rv"))
    val row = out.filter(col("lid") === 100L).select("rts").as[Option[Long]]
      .collect().head
    assert(row === Some(9L))
  }

  test("asOf rejects colliding payload column names") {
    val bad = right.withColumnRenamed("rv", "lid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, bad, Seq("k"), "lts", "rts")
    }
    assert(e.getMessage.contains("lid"))
  }

  test("latestPerKeyTs keeps the max-tieBreak row's full payload atomically") {
    val dup = Seq(("a", 4L, 9L, "late"), ("a", 4L, 2L, "early"),
      ("a", 6L, 1L, "only")).toDF("k", "rts", "rid", "rv")
    val red = AsOfJoin.latestPerKeyTs(dup, Seq("k"), "rts", "rid")
      .as[(String, Long, Long, String)].collect().toSet
    assert(red === Set(("a", 4L, 9L, "late"), ("a", 6L, 1L, "only")))
  }

  test("asOf plan shuffles once on the key, no cartesian/range join") {
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the union-merge shape is a window over one hashpartitioning on k
    assert("hashpartitioning\\(k".r.findAllIn(plan).size >= 1)
    assert(plan.contains("Window"))
  }
}
