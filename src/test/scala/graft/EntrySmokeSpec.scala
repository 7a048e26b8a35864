package graft

/** Library-surface smoke: `entry()` returns rows and EVERY declared query
  * executes end-to-end at sf0.001 (catches runtime breakage of the driver
  * contract inside `sbt test`, without the external verify script). */
class EntrySmokeSpec extends TestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry() runs and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // queries whose legitimate result CAN be empty at sf0.001 (pair finders
  // on a corpus with no near-dups at this scale); everything else returning
  // 0 rows means a silently broken join/filter — the only in-repo guard
  // for the rows-only (no-oracle) queries
  private val mayBeEmpty = Set("dedup_simhash_pairs", "dedup_clusters")

  test("every declared query executes and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, sfDir).count()
          if (n == 0 && !mayBeEmpty(name)) Some(s"$name: returned 0 rows")
          else None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries failed:\n${failures.mkString("\n")}")
  }

  test("every oracleSql key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }
}
