package graft

import org.apache.spark.sql.functions._

import graft.operators.CdcApply

/** CDC snapshot apply: latest change decides presence + payload
  * atomically; tombstones drop keys; re-inserts after a delete
  * resurrect; same-timestamp changes collapse via the tie-break. */
class CdcApplySpec extends TestBase {
  import spark.implicits._

  private def changes =
    Seq(
      ("u1", 10L, 1L, "U", "a"), ("u1", 20L, 2L, "U", "b"), // upserts
      ("u2", 5L, 3L, "U", "x"), ("u2", 9L, 4L, "D", ""),    // deleted
      ("u3", 1L, 5L, "D", ""), ("u3", 7L, 6L, "U", "back"), // resurrected
      ("u4", 3L, 7L, "U", "old"), ("u4", 3L, 8L, "U", "new")) // ts tie
      .toDF("k", "ts", "id", "op", "v")

  test("latest change decides presence and payload") {
    val snap = CdcApply.snapshot(changes, Seq("k"), "ts", "id", "op", "D")
      .select("k", "v", "id").as[(String, String, Long)].collect().toSet
    assert(snap === Set(("u1", "b", 2L), ("u3", "back", 6L),
      ("u4", "new", 8L)))
  }

  test("snapshot is idempotent under change-log duplication (replay-safe)") {
    val doubled = changes.unionAll(changes)
    val a = CdcApply.snapshot(changes, Seq("k"), "ts", "id", "op", "D")
      .collect().map(_.toSeq).toSet
    val b = CdcApply.snapshot(doubled, Seq("k"), "ts", "id", "op", "D")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("misnamed control columns are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      CdcApply.snapshot(changes, Seq("k"), "nope", "id", "op", "D")
    }
    assert(e.getMessage.contains("nope") || e.getMessage.contains("non-key"))
  }
}
