package graft

import org.apache.spark.sql.functions._

import graft.fs.CompactionPlanner

/** Contiguous-fill compaction binning: fill bound (a bin exceeds the
  * target only by its last file), oversized-file isolation, listing-
  * order contiguity, and partitioning-independence of the assignment. */
class CompactionPlannerSpec extends TestBase {
  import spark.implicits._

  private def manifest = graft.sim.WarehouseSim
    .srcFiles(spark, "/root/testdata/sf0.001")

  test("bins respect the fill bound: bytes minus the last file < target") {
    val t = 64000000L
    val s = CompactionPlanner.plan(manifest, t)
      .groupBy("dir", "bin")
      .agg(sum("size").as("bytes"), max(struct(col("rel_path"), col("size")))
        .as("last"))
      .select(col("bytes") - col("last.size") < t)
      .as[Boolean].collect()
    assert(s.nonEmpty && s.forall(identity))
  }

  test("an oversized file sits alone in its own bin") {
    val files = Seq(("d", "a", 10L), ("d", "b", 500L), ("d", "c", 10L),
      ("d", "e", 10L)).toDF("dir", "rel_path", "size")
    val got = CompactionPlanner.plan(files, 100L)
      .select("rel_path", "bin").as[(String, Long)].collect().toMap
    // before: a=0, b=10, c=510, e=520 -> bins 0, 0, 5, 5
    assert(got === Map("a" -> 0L, "b" -> 0L, "c" -> 5L, "e" -> 5L))
  }

  test("bins are contiguous ranges of the per-dir listing order") {
    val p = CompactionPlanner.plan(manifest, 16000000L)
      .select("dir", "rel_path", "bin")
      .as[(String, String, Long)].collect()
    p.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2).map(_._3)
      assert(ordered.sameElements(ordered.sorted), "bin ids not monotone")
    }
  }

  test("assignment is a pure function of the manifest, not its partitioning") {
    val a = CompactionPlanner.plan(manifest, 32000000L)
      .select("rel_path", "bin").as[(String, Long)].collect().toMap
    val b = CompactionPlanner.plan(manifest.repartition(17), 32000000L)
      .select("rel_path", "bin").as[(String, Long)].collect().toMap
    assert(a === b)
  }
}
