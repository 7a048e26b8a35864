package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** SCD2 history build: interval chaining (each row's effective_to is
  * the next row's effective_from), exactly one current row per key,
  * and deterministic same-timestamp collapse via the tie-break. */
class Scd2Spec extends TestBase {
  import spark.implicits._

  private def changes =
    Seq(("u1", 10L, 1L, "A"), ("u1", 20L, 2L, "B"), ("u1", 30L, 3L, "C"),
      ("u2", 5L, 4L, "X"),
      // same-timestamp pair on u3: max tie-break (id=6) must win whole-row
      ("u3", 7L, 5L, "old"), ("u3", 7L, 6L, "new"))
      .toDF("k", "ts", "id", "state")

  private def hist = Scd2.buildHistory(changes, Seq("k"), "ts", "id")

  test("intervals chain: effective_to equals the next effective_from") {
    val u1 = hist.filter(col("k") === "u1")
      .select("effective_from", "effective_to", "state")
      .as[(Long, Option[Long], String)].collect().sortBy(_._1)
    assert(u1.toSeq === Seq((10L, Some(20L), "A"), (20L, Some(30L), "B"),
      (30L, None, "C")))
  }

  test("exactly one current row per key, flagged") {
    val cur = hist.filter(col("is_current"))
      .select("k", "state").as[(String, String)].collect().toMap
    assert(cur === Map("u1" -> "C", "u2" -> "X", "u3" -> "new"))
    assert(hist.filter(col("is_current")).count() === 3)
  }

  test("same-timestamp changes collapse to the max tie-break row") {
    val u3 = hist.filter(col("k") === "u3")
      .select("id", "state", "effective_from")
      .as[(Long, String, Long)].collect()
    assert(u3.toSeq === Seq((6L, "new", 7L)))
  }
}
