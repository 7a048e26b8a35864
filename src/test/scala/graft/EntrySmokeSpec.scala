package graft

/** Library-surface smoke: `entry()` returns rows and EVERY declared query
  * executes end-to-end at sf0.001 (catches runtime breakage of the driver
  * contract inside `sbt test`, without the external verify script). */
class EntrySmokeSpec extends TestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry() runs and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries failed:\n${failures.mkString("\n")}")
  }

  test("every oracleSql key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }
}
