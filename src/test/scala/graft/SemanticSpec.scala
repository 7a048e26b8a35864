package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Semantic, Similarity}
import graft.sim.WarehouseSim

/** Semantic clustering + SemDeDup invariants (the oracle twin verifies
  * exact values; these pin the algorithmic properties and the
  * partitioning-independence a 1000-executor run relies on). */
class SemanticSpec extends TestBase {

  private lazy val emb =
    WarehouseSim.read(spark, "/root/testdata/sf0.001", "embeddings")

  test("kmeans assignment is total, bounded by k, and repartition-invariant") {
    val a = Semantic.kmeansAssign(emb, k = 8, iters = 2)
    val n = emb.count()
    assert(a.count() == n)
    assert(a.select("vec_id").distinct().count() == n)
    val clusters = a.select("cluster_id").distinct().collect().map(_.getInt(0))
    assert(clusters.length <= 8 && clusters.forall(c => c >= 0 && c < 8))
    // the sample decision must not depend on how the input is split
    val b = Semantic.kmeansAssign(emb.repartition(13), k = 8, iters = 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("iterations strictly refine: mean sq_dist does not increase") {
    def meanDist(iters: Int): Double =
      Semantic.kmeansAssign(emb, k = 8, iters = iters)
        .agg(avg("sq_dist")).head().getDouble(0)
    val d0 = meanDist(0)
    val d2 = meanDist(2)
    assert(d2 <= d0 + 1e-9, s"iter0 mean=$d0, iter2 mean=$d2")
  }

  test("farthestAssign: seeds spread (2-approx property), assignment total, repartition-invariant") {
    val k = 6
    val a = Semantic.farthestAssign(emb, k)
    val n = emb.count()
    assert(a.count() == n)
    val clusters = a.select("cluster_id").distinct().collect().map(_.getInt(0))
    assert(clusters.length == k, "every farthest-point seed owns itself")
    // Gonzalez guarantee: max assignment distance <= the min pairwise
    // seed separation (each new seed was the farthest point, so any
    // point's distance to its seed is <= distance between any two seeds)
    val maxAssign = a.agg(max("sq_dist")).head().getDouble(0)
    val seeds = a.filter(col("sq_dist") === 0.0)
      .select("vec_id").collect().map(_.getLong(0))
    val sv = emb.filter(col("vec_id").isin(seeds: _*))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => r.getSeq[Double](1).toArray)
    val minSeedSep = (for {
      i <- sv.indices; j <- sv.indices if i < j
    } yield sv(i).zip(sv(j)).map { case (x, y) => (x - y) * (x - y) }.sum).min
    assert(maxAssign <= minSeedSep + 1e-6,
      s"farthest-point cover radius $maxAssign must not exceed seed separation $minSeedSep")
    val b = Semantic.farthestAssign(emb.repartition(13), k)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("semanticDedup: kept set has no dominated member and keeps each cluster's head") {
    val assign = Semantic.kmeansAssign(emb, k = 8, iters = 2)
    val kept = Semantic.semanticDedup(emb, assign, tau = 0.3)
    val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.nonEmpty && keptIds.size < emb.count())

    // no kept pair within a cluster is cosine >= tau (dominance is gone)
    val v = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .join(assign.select("vec_id", "cluster_id"), "vec_id")
      .join(kept.select("vec_id"), Seq("vec_id"), "left_semi")
    val a = v.select(col("vec_id").as("a_id"), col("v").as("a_v"),
      col("nrm").as("a_nrm"), col("cluster_id"))
    val b = v.select(col("vec_id").as("b_id"), col("v").as("b_v"),
      col("nrm").as("b_nrm"), col("cluster_id"))
    val survivors = a.join(b, "cluster_id")
      .filter(col("a_id") < col("b_id"))
      .filter(round(Similarity.dot(col("a_v"), col("b_v")) /
        (col("a_nrm") * col("b_nrm")), 6) >= 0.3)
    assert(survivors.isEmpty, "kept set still contains a dominated pair")

    // the lowest id of every cluster can never be dominated
    val heads = assign.groupBy("cluster_id").agg(min("vec_id").as("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(heads.subsetOf(keptIds))
  }

  test("clusterStats purity is in (0,1] and members sum to the corpus") {
    val assign = Semantic.kmeansAssign(emb, k = 8, iters = 2)
    val stats = Semantic.clusterStats(assign, emb).collect()
    assert(stats.map(_.getAs[Long]("n_members")).sum == emb.count())
    assert(stats.forall { r =>
      val p = r.getAs[Double]("purity"); p > 0.0 && p <= 1.0
    })
  }

  test("kmeans survives k larger than distinct vectors (clusters may die)") {
    val tiny = emb.filter(col("vec_id") < 5)
    val a = Semantic.kmeansAssign(tiny, k = 8, iters = 2)
    assert(a.count() == 5)
    assert(a.select("cluster_id").distinct().count() <= 5)
  }

  test("semanticDedupIncremental: corpus-identical new vectors rejected, admission ⊆ new, batch-vs-rerun stable") {
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    // new batch = odd ids, plus exact clones of two corpus vectors
    val clones = corpus.filter(col("vec_id") <= 4)
      .select((col("vec_id") + 100001).as("vec_id"), col("embedding"),
        col("label"))
    val newB = emb.filter(col("vec_id") % 2 === 1).unionByName(clones)
    val admitted = Semantic.semanticDedupIncremental(
      corpus, newB, k = 8, iters = 2, tau = 0.3)
    val ids = admitted.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!ids.exists(_ > 100000L),
      "clones of standing-corpus vectors must be rejected (cos = 1 >= tau)")
    val newIds = newB.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(newIds), "admission returns only new-batch rows")
    // determinism under repartitioning (the retry/replay contract)
    val again = Semantic.semanticDedupIncremental(
      corpus.repartition(7), newB.repartition(5), k = 8, iters = 2,
      tau = 0.3).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
  }

  test("semanticDedupIncremental: tau above every cosine admits the whole batch; stricter tau admits a subset") {
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val newB = emb.filter(col("vec_id") % 2 === 1)
    val loose = Semantic.semanticDedupIncremental(
      corpus, newB, k = 8, iters = 2, tau = 1.000001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(loose == newB.select("vec_id").collect().map(_.getLong(0)).toSet,
      "tau above the cosine range must reject nothing")
    val strict = Semantic.semanticDedupIncremental(
      corpus, newB, k = 8, iters = 2, tau = 0.1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val mid = Semantic.semanticDedupIncremental(
      corpus, newB, k = 8, iters = 2, tau = 0.5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(strict.subsetOf(mid),
      "lowering tau can only reject more (admission is tau-monotone)")
  }

  test("drift family refuses empty embedding vectors loudly") {
    import spark.implicits._
    // a zero-length vector explodes to no (cell, pos) rows — without the
    // guard it silently vanishes from per-cell counts and the drift
    // report under-counts with no trace
    val withEmpty = Seq(
      (1L, 0, Seq(1.0f, 2.0f)),
      (2L, 0, Seq.empty[Float])).toDF("vec_id", "label", "embedding")
    val e1 = intercept[Exception] {
      Semantic.cellState(withEmpty).collect()
    }
    assert(e1.getMessage.contains("zero-length embedding"),
      s"cellState must name the failure: ${e1.getMessage}")
    val ok = Seq((3L, 1, Seq(3.0f, 4.0f))).toDF("vec_id", "label", "embedding")
    val e2 = intercept[Exception] {
      Semantic.embeddingDrift(withEmpty, ok).collect()
    }
    assert(e2.getMessage.contains("zero-length embedding"),
      s"embeddingDrift must name the failure: ${e2.getMessage}")
    // non-empty frames are untouched by the guard
    assert(Semantic.cellState(ok).count() === 2L)
  }
}
