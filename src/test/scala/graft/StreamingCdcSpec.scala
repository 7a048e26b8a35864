package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CdcApply
import graft.streaming.StreamingCdc

/** Streaming CDC apply: a stream of change batches converges to the
  * one-shot batch snapshot of the full log; late (older) changes
  * cannot regress the snapshot; committed-batch replay is a no-op. */
class StreamingCdcSpec extends TestBase {
  import spark.implicits._

  private val log = Seq(
    ("u1", 10L, 1L, "U", "a"), ("u1", 20L, 2L, "U", "b"),
    ("u2", 5L, 3L, "U", "x"), ("u2", 9L, 4L, "D", ""),
    ("u3", 1L, 5L, "D", ""), ("u3", 7L, 6L, "U", "back"),
    ("u4", 3L, 7L, "U", "solo"))

  private def snapOf(dir: String) =
    StreamingCdc.currentSnapshot(spark, dir, "op", "D").get
      .select("k", "ts", "id", "op", "v")
      .as[(String, Long, Long, String, String)].collect().toSet

  test("streamed batches converge to the one-shot snapshot of the log") {
    val stateDir = tmpDir("cdc-state").toString
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, String, String)]
    val changes = input.toDF().toDF("k", "ts", "id", "op", "v")
    val q = StreamingCdc.run(changes, stateDir, Seq("k"), "ts", "id",
      "op", "D")
    try {
      log.grouped(3).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()
    val oneShot = CdcApply.snapshot(
      log.toDF("k", "ts", "id", "op", "v"), Seq("k"), "ts", "id", "op", "D")
      .as[(String, Long, Long, String, String)].collect().toSet
    assert(snapOf(stateDir) === oneShot)
    assert(snapOf(stateDir).map(_._1) === Set("u1", "u3", "u4"))
  }

  test("late out-of-order changes lose to newer state; replay is a no-op") {
    val stateDir = tmpDir("cdc-late").toString
    val df = (rows: Seq[(String, Long, Long, String, String)]) =>
      rows.toDF("k", "ts", "id", "op", "v")
    StreamingCdc.updateState(df(Seq(("u1", 20L, 2L, "U", "new"))),
      stateDir, 0L, Seq("k"), "ts", "id", "op", "D")
    // a LATE change with an older timestamp must not regress the value
    StreamingCdc.updateState(df(Seq(("u1", 10L, 1L, "U", "stale"),
        ("u2", 1L, 9L, "U", "fresh"))),
      stateDir, 1L, Seq("k"), "ts", "id", "op", "D")
    assert(snapOf(stateDir) === Set(("u1", 20L, 2L, "U", "new"),
      ("u2", 1L, 9L, "U", "fresh")))
    // replaying the committed batch changes nothing
    StreamingCdc.updateState(df(Seq(("u1", 10L, 1L, "U", "stale"),
        ("u2", 1L, 9L, "U", "fresh"))),
      stateDir, 1L, Seq("k"), "ts", "id", "op", "D")
    assert(snapOf(stateDir) === Set(("u1", 20L, 2L, "U", "new"),
      ("u2", 1L, 9L, "U", "fresh")))
    // a late TOMBSTONE older than current state also loses…
    StreamingCdc.updateState(df(Seq(("u1", 15L, 3L, "D", ""))),
      stateDir, 2L, Seq("k"), "ts", "id", "op", "D")
    assert(snapOf(stateDir).map(_._1) === Set("u1", "u2"),
      "stale tombstone must not delete newer state")
    // …while a NEWER tombstone deletes
    StreamingCdc.updateState(df(Seq(("u1", 25L, 4L, "D", ""))),
      stateDir, 3L, Seq("k"), "ts", "id", "op", "D")
    assert(snapOf(stateDir).map(_._1) === Set("u2"))
    // and a late pre-delete upsert CANNOT resurrect: the retained
    // tombstone (ts=25) still wins
    StreamingCdc.updateState(df(Seq(("u1", 22L, 5L, "U", "zombie"))),
      stateDir, 4L, Seq("k"), "ts", "id", "op", "D")
    assert(snapOf(stateDir).map(_._1) === Set("u2"),
      "retained tombstone must block resurrection")
  }
}
