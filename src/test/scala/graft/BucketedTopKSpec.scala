package graft

import org.apache.spark.sql.functions._

import graft.operators.BucketedTopK

/** The shared hierarchical top-k against the naive global sort, on
  * adversarial inputs: heavy ties, skewed keys, groups smaller and
  * larger than k, and bucket counts down to 1. Exactness claim: under
  * a TOTAL order, any global top-k row is top-k in its own bucket. */
class BucketedTopKSpec extends TestBase {
  import spark.implicits._

  private def naive(rows: Seq[(String, String, Long)], k: Int)
      : Map[String, Seq[(String, Long, Int)]] =
    rows.groupBy(_._1).view.mapValues { g =>
      g.map(r => (r._2, r._3))
        .sortBy { case (key, n) => (-n, key) }
        .take(k).zipWithIndex
        .map { case ((key, n), i) => (key, n, i + 1) }.toSeq
    }.toMap

  private def run(rows: Seq[(String, String, Long)], k: Int,
      buckets: Int): Map[String, Seq[(String, Long, Int)]] =
    BucketedTopK.rank(rows.toDF("grp", "key", "n"), Seq(col("grp")),
        Seq(col("n").desc, col("key")), col("key"), k, buckets)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._4).map(r => (r._2, r._3, r._4)).toSeq).toMap

  test("equals the naive sort on randomized heavy-tie inputs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val rows = Seq.tabulate(300) { i =>
        (s"g${rnd.nextInt(3)}", f"k${rnd.nextInt(80)}%03d",
          rnd.nextInt(5).toLong) // few distinct counts -> massive ties
      }.distinct.map { case (g, key, _) =>
        (g, key, rnd.nextInt(5).toLong)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      for (k <- Seq(1, 7, 500); buckets <- Seq(1, 2, 64)) {
        assert(run(rows, k, buckets) == naive(rows, k),
          s"trial $trial diverged at k=$k buckets=$buckets")
      }
    }
  }

  test("no partition column: one global group") {
    val rows = Seq(("x", 5L), ("y", 5L), ("z", 9L), ("w", 1L))
      .toDF("key", "n")
    val got = BucketedTopK.rank(rows, Nil,
        Seq(col("n").desc, col("key")), col("key"), 2)
      .collect().map(r => (r.getString(0), r.getInt(2))).toSet
    assert(got == Set(("z", 1), ("x", 2)),
      "n desc then key asc: z first, then the x/y tie breaks to x")
  }

  test("rejects degenerate parameters loudly") {
    val df = Seq(("a", 1L)).toDF("key", "n")
    intercept[IllegalArgumentException] {
      BucketedTopK.rank(df, Nil, Seq(col("n")), col("key"), 0)
    }
    intercept[IllegalArgumentException] {
      BucketedTopK.rank(df, Nil, Seq(col("n")), col("key"), 5, buckets = 0)
    }
  }
}
