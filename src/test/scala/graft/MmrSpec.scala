package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/**
 * Greedy MMR re-rank ([[Similarity.mmrRerank]]): the hand-computable
 * diversification example, the λ=1 degeneration to the input ranking,
 * and the short-pool edge.
 */
class MmrSpec extends TestBase {

  import spark.implicits._

  // query 100 at (1,0); two near-duplicates of the best candidate and
  // one diverse candidate that pure relevance would rank last
  private lazy val vecs = Seq(
    (100L, Array(1.0, 0.0)),  // query
    (1L, Array(1.0, 0.1)),    // best, rel highest
    (2L, Array(1.0, 0.12)),   // near-duplicate of 1
    (3L, Array(0.3, 1.0))     // diverse
  ).toDF("vec_id", "embedding")

  private def pool(qId: Long) =
    Similarity.bruteForceTopK(vecs.filter(col("vec_id") === qId), vecs, 3)
      .select(col("q_id"), col("c_id"), col("cos_sim").as("rel"))

  test("diversification beats pure relevance: the near-duplicate of " +
      "rank 1 is demoted below the diverse candidate") {
    val got = Similarity.mmrRerank(pool(100L), vecs, k = 3, lambda = 0.3)
      .orderBy("rank").select("c_id").collect().map(_.getLong(0)).toSeq
    // rank 1 = best rel (1); rank 2 = diverse (3), because 2's max-sim
    // to {1} is ~0.9998 and the 0.7 redundancy penalty buries it
    assert(got == Seq(1L, 3L, 2L),
      s"MMR at lambda=0.3 must interleave diversity, got $got")
  }

  test("lambda = 1 degenerates to the input relevance ranking") {
    val got = Similarity.mmrRerank(pool(100L), vecs, k = 3, lambda = 1.0)
      .orderBy("rank").select("c_id").collect().map(_.getLong(0)).toSeq
    val rel = pool(100L).orderBy(col("rel").desc, col("c_id"))
      .select("c_id").collect().map(_.getLong(0)).toSeq
    assert(got == rel, s"lambda=1 must reproduce the relevance order: " +
      s"got $got, relevance $rel")
  }

  test("pool shorter than k: every pool member selected once, no " +
      "padding rows") {
    val small = pool(100L).filter(col("c_id").isin(1L, 3L))
    val got = Similarity.mmrRerank(small, vecs, k = 5, lambda = 0.5)
      .collect()
    assert(got.length == 2, s"2-item pool must yield 2 rows, got " +
      s"${got.length}")
    assert(got.map(_.getAs[Long]("c_id")).toSet == Set(1L, 3L))
    assert(got.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2))
  }

  test("multiple queries advance independently in the same greedy pass") {
    val p = pool(100L).unionByName(
      pool(100L).withColumn("q_id", lit(200L)))
    val got = Similarity.mmrRerank(p, vecs, k = 2, lambda = 0.3)
    val byQ = got.collect().groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(100L, 200L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("c_id")).toSeq.sorted ==
        Seq(1L, 3L), "both queries must get the same diversified picks")
    }
  }
}
