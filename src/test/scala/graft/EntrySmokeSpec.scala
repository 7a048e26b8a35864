package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives the driver contract end-to-end: entry() rows>0, every declared
  * query runs at sf0.001, and each oracleSql key has a queries twin. */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test")

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without queries impl: $extra")
  }
}
