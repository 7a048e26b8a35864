package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.RangeJoin

/** ScalaCheck hardening of the bucketized interval join: on arbitrary
  * event/interval sets and bucket widths, the operator equals the
  * naive theta join — pair-exact, no duplicates, no drops. Spark-backed
  * (the property under test IS the distributed plan), so generator
  * sizes are kept small and iterations moderate. */
class RangeJoinPropertySpec extends TestBase {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val eventsGen = for {
    n <- Gen.choose(0, 60)
    ts <- Gen.listOfN(n, Gen.choose(0L, 5000L))
  } yield ts.zipWithIndex.map { case (t, i) => (i.toLong, s"k${i % 3}", t) }

  private val intervalsGen = for {
    n <- Gen.choose(0, 25)
    iv <- Gen.listOfN(n, for {
      s <- Gen.choose(0L, 5000L)
      len <- Gen.choose(-50L, 800L) // negative/zero lengths must drop
    } yield (s, s + len))
  } yield iv.zipWithIndex.map { case ((s, e), i) =>
    (i.toLong, s"k${i % 3}", s, e)
  }

  test("overlapJoin == theta join for arbitrary inputs and bucket widths") {
    check(Prop.forAll(eventsGen, intervalsGen,
        Gen.oneOf(1L, 7L, 60L, 900L, 10000L)) { (evs, ivs, w) =>
      val l = evs.toDF("event_id", "k", "t")
      val r = ivs.toDF("iid", "k", "s", "e")
      val got = RangeJoin.overlapJoin(l, r, Seq("k"), "t", "s", "e", w)
        .select("event_id", "iid").as[(Long, Long)].collect()
      val want = l.as("l").join(r.as("r"),
          org.apache.spark.sql.functions.col("l.k") ===
            org.apache.spark.sql.functions.col("r.k") &&
          org.apache.spark.sql.functions.col("l.t") >=
            org.apache.spark.sql.functions.col("r.s") &&
          org.apache.spark.sql.functions.col("l.t") <
            org.apache.spark.sql.functions.col("r.e"))
        .select("event_id", "iid").as[(Long, Long)].collect().toSet
      Prop(got.length == got.toSet.size && got.toSet == want)
        .label(s"w=$w evs=${evs.size} ivs=${ivs.size}")
    })
  }
}
