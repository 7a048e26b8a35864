package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Packing, Sampling}

/** Property tests over the pure cores (no Spark session): the greedy
  * packer's invariants on arbitrary inputs, and the sampling threshold
  * arithmetic. Raw ScalaCheck (the scalatest bridge isn't a dependency);
  * a failing property surfaces via the labeled result. */
class PackingPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val docsGen = for {
    n <- Gen.choose(0, 200)
    toks <- Gen.listOfN(n, Gen.choose(1L, 900L))
  } yield toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("greedyFold: every doc packed once, in order, bins consecutive and tight") {
    check(Prop.forAll(docsGen, Gen.choose(1L, 600L)) { (docs, budget) =>
      val out = Packing.greedyFold(docs.iterator, budget).toList
      val orderOk = out.map(o => (o._1, o._2)) == docs
      val bins = out.map(_._3)
      val startsAtZero = bins.headOption.forall(_ == 0L)
      val stepsByOne = bins.zip(bins.drop(1)).forall { case (a, b) =>
        b == a || b == a + 1
      }
      val byBin = out.groupBy(_._3).values
      val noOverflow = byBin.forall(ds => ds.map(_._2).sum <= budget || ds.size == 1)
      val tight = out.zip(out.drop(1)).forall { case (a, b) =>
        b._3 != a._3 + 1 ||
          out.filter(_._3 == a._3).map(_._2).sum + b._2 > budget
      }
      val fillOk = byBin.forall { ds =>
        ds.scanLeft(0L)(_ + _._2).tail.zip(ds.map(_._4)).forall(t => t._1 == t._2)
      }
      orderOk && startsAtZero && stepsByOne && noOverflow && tight && fillOk
    })
  }

  test("rateThreshold: monotone, exact at the ends, within one unit of rate*2^32") {
    assert(Sampling.rateThreshold(0.0) == 0L)
    assert(Sampling.rateThreshold(1.0) == Sampling.HashSpace)
    check(Prop.forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      Sampling.rateThreshold(lo) <= Sampling.rateThreshold(hi) &&
        math.abs(Sampling.rateThreshold(a) - a * Sampling.HashSpace.toDouble) <= 0.5 + 1e-9
    })
  }

  test("rateThreshold: positive rate below hash resolution is refused, not dropped") {
    // token budget of 1M against a 100-TB-scale stratum total: at 16 bits
    // this rounded to threshold 0 and silently emptied the stratum
    val tiny = 1.0e6 / 2.0e13
    assert(Sampling.rateThreshold(tiny) > 0L)
    intercept[IllegalArgumentException] {
      Sampling.rateThreshold(1.0e-11)
    }
  }
}
