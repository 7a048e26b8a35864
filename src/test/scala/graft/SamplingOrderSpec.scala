package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/**
 * Order-sampling + skyline operators ([[Sampling.sequentialPoissonSample]],
 * [[Sampling.skyline]]): weight-proportional inclusion, determinism,
 * edges, and skyline equality with the naive quadratic definition.
 */
class SamplingOrderSpec extends TestBase {

  import spark.implicits._

  test("sequential Poisson: deterministic, sized, ranked, and " +
      "weight-proportional in aggregate") {
    val docs = (1L to 4000L).map { i =>
      (i, if (i % 4 == 0) 900L else 100L) // 25% of rows carry 9x weight
    }.toDF("doc_id", "w")
    val s1 = Sampling.sequentialPoissonSample(docs, "doc_id", "w", 400)
      .collect().sortBy(_.getLong(0))
    val s2 = Sampling.sequentialPoissonSample(docs, "doc_id", "w", 400)
      .collect().sortBy(_.getLong(0))
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq,
      "re-running the sampler must reproduce the identical sample")
    assert(s1.length == 400)
    assert(s1.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 400).toSeq)
    val heavy = s1.count(_.getAs[Long]("w") == 900L).toDouble / 400
    // heavy rows are 25% of the population with 9x weight: expected
    // share 0.25*9/(0.25*9+0.75) = 0.75; allow wide tolerance
    assert(heavy > 0.6 && heavy < 0.9,
      s"9x-weighted quarter must dominate the sample, got share $heavy")
  }

  test("sequential Poisson: non-positive weights never drawn; " +
      "n above the eligible count returns all eligible") {
    val docs = Seq((1L, 5L), (2L, 0L), (3L, -3L), (4L, 2L))
      .toDF("doc_id", "w")
    val got = Sampling.sequentialPoissonSample(docs, "doc_id", "w", 10)
      .collect()
    assert(got.map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L),
      "zero/negative weights must be ineligible")
  }

  private def naiveSkyline(rows: Seq[(Long, Double, Double)]) =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, ox, oy) =>
        ox >= x && oy >= y && (ox > x || oy > y)
      }
    }.map(_._1).sorted

  test("skyline equals the naive quadratic definition on hash-random " +
      "data, duplicates kept, tiny pruner set still exact") {
    val rows = (1L to 500L).map { i =>
      (i, ((i * 131) % 997).toDouble, ((i * 577) % 991).toDouble)
    } ++ Seq((9001L, 996.0, 990.0), (9002L, 996.0, 990.0)) // dup corner
    val df = rows.toDF("id", "x", "y")
    for (pruners <- Seq(2, 1024)) {
      val got = Sampling.skyline(df, Seq("x", "y"), "id",
          pruners = pruners)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == naiveSkyline(rows),
        s"skyline(pruners=$pruners) must equal the naive definition")
    }
    val got = Sampling.skyline(df, Seq("x", "y"), "id")
      .select("id").collect().map(_.getLong(0))
    assert(got.contains(9001L) && got.contains(9002L),
      "duplicate Pareto-optimal rows must BOTH survive (neither " +
        "strictly dominates the other)")
  }

  test("skyline: rows with NULL dims are excluded, not immortal") {
    val df = Seq((1L, Some(5.0), Some(5.0)), (2L, None, Some(9.0)),
        (3L, Some(1.0), Some(1.0)))
      .toDF("id", "x", "y")
    val got = Sampling.skyline(df, Seq("x", "y"), "id")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L),
      s"null-dim rows must be excluded and dominated rows dropped: $got")
  }

  test("skyline in 3 dims equals the naive definition") {
    val rows = (1L to 300L).map { i =>
      (i, ((i * 131) % 97).toDouble, ((i * 577) % 89).toDouble,
        ((i * 263) % 83).toDouble)
    }
    val naive = rows.filter { case (_, x, y, z) =>
      !rows.exists { case (_, ox, oy, oz) =>
        ox >= x && oy >= y && oz >= z && (ox > x || oy > y || oz > z)
      }
    }.map(_._1).sorted
    val got = Sampling
      .skyline(rows.toDF("id", "x", "y", "z"), Seq("x", "y", "z"), "id")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == naive, "3-dim skyline must equal the naive definition")
  }
}
