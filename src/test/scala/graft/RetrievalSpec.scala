package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}

/** BM25 retrieval + b-bit MinHash triage fixtures. */
class RetrievalSpec extends TestBase {
  import spark.implicits._

  test("bm25TopK ranks by term relevance, excludes termless docs, breaks ties by id") {
    val docs = Seq(
      (1L, "spark spark spark join"),        // high tf for 'spark'
      (2L, "spark join filter merge"),       // one hit
      (3L, "join filter merge sort"),        // no query terms
      (4L, "spark join filter merge")).toDF("doc_id", "text") // tie with 2
    val out = TextAnalysis.bm25TopK(docs, Seq("spark"), k = 10)
      .as[(Long, Long, Long)].collect().toList
    assert(out.map(_._1) === List(1L, 2L, 4L), "order: tf-heavy first, ties by id")
    assert(out.map(_._3) === List(1L, 2L, 3L), "dense ranks over selected rows")
    assert(out(1)._2 === out(2)._2, "identical docs score identically")
    assert(out(0)._2 > out(1)._2, "higher tf scores strictly higher here")
  }

  test("bm25TopK length normalization: same tf, shorter doc wins") {
    val docs = Seq(
      (1L, "spark a b c d e f g h i j k l m n o p"),
      (2L, "spark a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("spark"), k = 2)
      .as[(Long, Long, Long)].collect().toList
    assert(out.head._1 === 2L, "shorter doc ranks first at equal tf")
  }

  test("bm25TopK plans TakeOrdered, not a global sort") {
    val docs = Seq((1L, "spark join"), (2L, "hash merge")).toDF("doc_id", "text")
    val plan = TextAnalysis.bm25TopK(docs, Seq("spark", "hash"), k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"),
      "top-k should plan as TakeOrderedAndProject")
  }

  test("rrfFuse: hand-traced fusion — overlap beats either single " +
      "ranking, absent-from-one still places, ties break by id") {
    // ranking A: 1,2,3   ranking B: 3,4   — doc 3 appears in both
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((3L, 1L), (4L, 2L)).toDF("doc_id", "rank")
    val out = TextAnalysis.rrfFuse(Seq(a, b), k = 10)
      .as[(Long, Double, Long)].collect().toList
    // 3: 1/63 + 1/61 > 1: 1/61 > 4: 1/62 > 2: 1/62... no: 4 = 1/62, 2 = 1/62
    val expect = Map(
      1L -> (1.0 / 61), 2L -> (1.0 / 62), 3L -> (1.0 / 63 + 1.0 / 61),
      4L -> (1.0 / 62))
    assert(out.map(_._1) === List(3L, 1L, 2L, 4L),
      "both-rankings doc first; the 2-vs-4 tie breaks by id")
    out.foreach { case (id, s, _) =>
      assert(math.abs(s - expect(id)) < 1e-9, s"score of $id") }
    assert(out.map(_._3) === List(1L, 2L, 3L, 4L), "dense fused ranks")
    intercept[IllegalArgumentException] {
      TextAnalysis.rrfFuse(Seq(a), k = 1)
    }
  }

  test("rrfFuse composes lexical BM25 with a VECTOR ranking — the " +
      "hybrid-search shape, rank-space only, no score calibration") {
    import graft.pipeline.Similarity
    import graft.sim.WarehouseSim
    val docs = WarehouseSim.read(spark, "/root/testdata/sf0.001", "documents")
    val emb = WarehouseSim.read(spark, "/root/testdata/sf0.001", "embeddings")
    val lexical = TextAnalysis.bm25TopK(docs, Seq("spark", "hash"), k = 20)
    // a vector ranking for ONE query vector, re-keyed to the shared id
    // space (the hybrid deployment shape: both systems rank doc ids)
    val vec = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === 0), emb, k = 20)
      .select(col("c_id").as("doc_id"), col("rank").cast("long").as("rank"))
    val fused = TextAnalysis.rrfFuse(Seq(lexical, vec), k = 10)
      .as[(Long, Double, Long)].collect().toList
    assert(fused.size === 10)
    assert(fused.map(_._3) === (1L to 10L).toList)
    // fused scores are pure rank arithmetic: every score is a sum of
    // at most two reciprocals from the 1/(60+r) family
    val legal = (1 to 20).map(r => 1.0 / (60 + r))
    fused.foreach { case (_, s, _) =>
      val ok = legal.exists(x => math.abs(s - x) < 1e-9) ||
        legal.exists(x => legal.exists(y => math.abs(s - x - y) < 1e-9))
      assert(ok, s"score $s must decompose into rank reciprocals")
    }
  }

  test("b-bit pairs: exact clones estimate 1.0 and n_agree = 64") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, base), (2L, base), (3L, "totally different words " +
      "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashBbitPairs(docs, tau = 0.5)
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out === List((1L, 2L, 64L, 1.0)))
  }

  test("graphRank: hand-traced path graph — center dominates, ends tie") {
    // path 1-2-3: N=3, BASE=333333, base15=49999; three integer
    // iterations traced by hand (floor div throughout)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = Dedup.graphRank(pairs).as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 209725L, 2L -> 580536L, 3L -> 209725L))
  }

  test("graphRank: symmetric clique ranks equally") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = Dedup.graphRank(pairs).as[(Long, Long)].collect().toMap
    assert(r.values.toSet.size === 1, s"clique ranks diverged: $r")
    assert(r.keySet === Set(1L, 2L, 3L))
  }

  test("b-bit estimate tracks exact Jaccard on the corpus candidates") {
    val docs = graft.sim.WarehouseSim
      .read(spark, "/root/testdata/sf0.001", "documents")
    val bbit = Dedup.minhashBbitPairs(docs, tau = 0.5)
      .select(col("doc_a"), col("doc_b"), col("est_sim"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val exact = Dedup.minhashLshPairsFast(docs)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(bbit.nonEmpty)
    // every triage survivor is a banded candidate of the fast path, and
    // the 1-bit estimate stays within estimator noise of exact Jaccard
    // (sigma ~ 0.25 at k=64; allow 3 sigma)
    bbit.foreach { case (pair, est) =>
      assert(exact.contains(pair), s"$pair not among fast-path candidates")
      assert(math.abs(est - exact(pair)) < 0.75,
        s"$pair est $est vs exact ${exact(pair)}")
    }
    // high-similarity pairs must survive triage: every exact pair with
    // jaccard >= 0.9 appears in the bbit output
    exact.filter(_._2 >= 0.9).keys.foreach { pair =>
      assert(bbit.contains(pair), s"high-jaccard pair $pair dropped by triage")
    }
  }
}
