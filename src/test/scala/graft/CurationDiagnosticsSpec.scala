package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusReport, Sampling, Semantic, TextAnalysis}

/** Round-10 batch-3 diagnostics: RRF fusion, Heaps curve, dup
  * inflation, cluster purity, the garbage screen, and the centroid
  * silhouette. */
class CurationDiagnosticsSpec extends TestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))

  test("rrfFusionSelect equals the window-rank twin and orders by fused rank") {
    val df = docs((1L to 40L).map(i =>
      (i, s"the of and token${i} " + ("x " * (i % 7).toInt), "s")): _*)
    val got = Sampling.rrfFusionSelect(df, n = 10)
    val q = TextAnalysis.withQuality(df).select(col("doc_id"), col("quality_score"))
    val nll = TextAnalysis.unigramNll(df).select(col("doc_id"), col("mean_nll"))
    val want = q.join(nll, "doc_id")
      .withColumn("r_quality", row_number().over(
        Window.orderBy(col("quality_score").desc, col("doc_id"))).cast("long"))
      .withColumn("r_nll", row_number().over(
        Window.orderBy(col("mean_nll").asc, col("doc_id"))).cast("long"))
      .withColumn("rrf_nano",
        (round(lit(1e9) / (lit(60) + col("r_quality"))) +
          round(lit(1e9) / (lit(60) + col("r_nll")))).cast("long"))
      .orderBy(col("rrf_nano").desc, col("doc_id")).limit(10)
      .select("doc_id", "r_quality", "r_nll", "rrf_nano")
    assert(got.select("doc_id", "r_quality", "r_nll", "rrf_nano")
      .collect().toSet === want.collect().toSet)
    assert(got.count() === 10)
  }

  test("heapsCurve: monotone, ends at the full vocabulary, exact positions") {
    val df = docs(
      (1L, "a b c", "s"), (2L, "a b d e", "s"), (3L, "f f f", "s"),
      (4L, "g h a b", "s"))
    val got = CorpusReport.heapsCurve(df, checkpoints = 7)
      .orderBy("checkpoint_tokens")
      .as[(Long, Long)].collect()
    val total = 3 + 4 + 3 + 4
    assert(got.map(_._1) ===
      (1 to 7).map(j => j.toLong * total / 7).distinct.filter(_ > 0).toArray)
    // vocab is non-decreasing and ends at the distinct-token count (8)
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    assert(got.last._2 === 8L)
    // first checkpoint at 2 tokens has seen exactly {a, b}
    assert(got.head._1 === 2L && got.head._2 === 2L)
  }

  test("dupInflation weighs duplicate cost by tokens, per source") {
    val df = docs(
      (1L, "x y z w", "web"), (2L, "x y z w", "web"), // dup of 1 (4 tok)
      (3L, "q r", "web"),
      (4L, "x  y z W".toLowerCase, "books")) // normalizes to doc 1's text
    val out = CorpusReport.dupInflation(df)
      .orderBy("source")
      .select("source", "n_docs", "n_dup_docs", "n_tokens", "n_dup_tokens")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out === Array(
      ("books", 1L, 1L, 4L, 4L), // doc 4 loses to doc 1 across sources
      ("web", 3L, 1L, 10L, 4L)))
  }

  test("clusterPurity flags only clusters spanning several sources") {
    val d = docs((1L, "t", "a"), (2L, "t", "a"), (3L, "t", "b"),
      (4L, "t", "b"), (5L, "t", "c"))
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster_id") // {1,2,3} cross; {4} solo; 5 singleton
    val out = CorpusReport.clusterPurity(d, clusters).orderBy("source")
      .select("source", "n_docs", "n_cross_docs", "n_cross_clusters")
      .as[(String, Long, Long, Long)].collect()
    assert(out === Array(
      ("a", 2L, 2L, 1L), ("b", 2L, 1L, 1L), ("c", 1L, 0L, 0L)))
  }

  test("withGarbageScore trips on symbol soup, consonant mash, and run-ons") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "@@@@ #### $$$$ %%%% ^^^^ &&&&"),
      (3L, "zxcvbnmqwrtp zxcvbnmqwrtp normal words here"),
      (4L, "supercalifragilisticexpialidocious" * 3)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withGarbageScore(df)
      .select("doc_id", "is_garbage").as[(Long, Boolean)].collect().toMap
    assert(out(1L) === false)
    assert(out(2L) === true) // sym_frac ≈ 0.69
    assert(out(3L) === true) // 2/5 tokens have 5+ consonant runs
    assert(out(4L) === true) // one 102-char token
  }

  test("percentileGate keeps exactly ceil(p*n) best-quality docs") {
    val df = docs((1L to 37L).map(i =>
      (i, "the of and words " + ("filler " * (i % 9).toInt), "s")): _*)
    val kept = Sampling.percentileGate(df, p = 0.25)
    assert(kept.count() === math.ceil(0.25 * 37).toLong)
    // the kept set is the window twin's top segment
    val want = TextAnalysis.withQuality(df)
      .select(col("doc_id"), col("quality_score"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("quality_score").desc, col("doc_id"))))
      .filter(col("r") <= math.ceil(0.25 * 37).toLong)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.select("doc_id").as[Long].collect().toSet === want)
  }

  test("piiProfile counts typed matches and flags carrier docs per source") {
    val df = Seq(
      ("web", "mail me at a@b.com or c@d.org"),
      ("web", "clean text, nothing here"),
      ("logs", "from 10.0.0.1 call 555-123-4567")
    ).toDF("source", "text")
    val out = CorpusReport.piiProfile(df).orderBy("source")
      .select("source", "n_docs", "n_docs_with_pii", "n_emails", "n_ips",
        "n_phones")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out === Array(
      ("logs", 1L, 1L, 0L, 1L, 1L),
      ("web", 2L, 1L, 2L, 0L, 0L)))
  }

  test("phashPairs: identical payloads collide at hamming 0, byte deltas stay near") {
    import graft.pipeline.Multimodal
    val media = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog again and AGAIN"),
      (4L, "completely different payload with other bytes entirely xyzzy")
    ).toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(Multimodal.withMediaColumn(media))
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) === 0) // exact byte-equal => identical signature
    assert(pairs.forall(_._3 <= 3)) // verify bound respected
    assert(!m.contains((1L, 4L)) || m((1L, 4L)) <= 3)
    // payloads under 4 bytes produce no signature and no pairs
    val tiny = Seq((9L, "abc"), (10L, "abc")).toDF("doc_id", "text")
    assert(Multimodal.phashPairs(Multimodal.withMediaColumn(tiny)).count() === 0)
  }

  test("vocabState merge equals one-shot and is associative; empty merges are no-ops") {
    val all = docs(
      (1L, "a b c", "s"), (2L, "a d", "s"), (3L, "e b f g", "s"),
      (4L, "h e a", "s"), (5L, "i j", "s"))
    def curve(st: org.apache.spark.sql.DataFrame) =
      CorpusReport.renderHeaps(st, checkpoints = 7)
        .as[(Long, Long)].collect().sorted.toSeq
    val oneShot = curve(CorpusReport.vocabState(all))
    val s1 = CorpusReport.vocabState(all.filter(col("doc_id") <= 2))
    val s2 = CorpusReport.vocabState(
      all.filter(col("doc_id") > 2 && col("doc_id") <= 4))
    val s3 = CorpusReport.vocabState(all.filter(col("doc_id") > 4))
    val leftFold = CorpusReport.mergeVocabState(
      CorpusReport.mergeVocabState(s1, s2), s3)
    val rightFold = CorpusReport.mergeVocabState(
      s1, CorpusReport.mergeVocabState(s2, s3))
    assert(curve(leftFold) === oneShot)
    assert(curve(rightFold) === oneShot)
    val empty = CorpusReport.vocabState(all.filter(col("doc_id") > 99))
    assert(curve(CorpusReport.mergeVocabState(leftFold, empty)) === oneShot)
    assert(curve(CorpusReport.mergeVocabState(empty, leftFold)) === oneShot)
  }

  test("curationScorecard composes the four per-source signals") {
    val d = docs(
      (1L, "the of and is a good document with many words", "web"),
      (2L, "the of and is a good document with many words", "web"), // dup
      (3L, "@@@@ #### $$$$ %%%% ^^^^ &&&&", "web"),
      (4L, "another normal the of and text", "books"))
    val clusters = Seq((1L, 1L), (2L, 1L), (4L, 1L))
      .toDF("doc_id", "cluster_id") // web+books share a cluster
    val out = CorpusReport.curationScorecard(d, clusters)
      .orderBy("source").collect()
    assert(out.length === 2)
    val web = out(1)
    assert(web.getAs[String]("source") === "web")
    assert(web.getAs[Long]("n_docs") === 3L)
    assert(web.getAs[Double]("dup_token_frac") > 0.3) // doc 2 is a dup
    assert(web.getAs[Double]("garbage_frac") === 0.333333)
    assert(web.getAs[Double]("cross_frac") === 0.666667) // docs 1,2 cross
    val books = out(0)
    assert(books.getAs[Double]("cross_frac") === 1.0) // doc 4 in cluster 1
    assert(books.getAs[Double]("dup_token_frac") === 0.0)
  }

  test("rakeKeywords: degree/frequency math, phrase capping, tie order") {
    val df = Seq(
      (1L, "deep learning of deep networks"),
      (2L, "the gradient descent and gradient flow"),
      (3L, "a b c d is x") // 4-word run: capped out of candidates
    ).toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeywords(df, k = 10)
      .select("rank", "phrase", "n_occ", "rake_score")
      .as[(Int, String, Long, Double)].collect()
    val byPhrase = out.map(r => r._2 -> r).toMap
    // deep: freq 2, deg 4 -> 2.0; learning/networks: freq 1, deg 2 -> 2.0
    assert(byPhrase("deep learning")._4 === 4.0)
    assert(byPhrase("deep networks")._4 === 4.0)
    // gradient: freq 2, deg 4 -> 2.0; descent/flow freq 1 deg 2 -> 2.0
    assert(byPhrase("gradient descent")._4 === 4.0)
    // the 4-word run never becomes a candidate, but "x" (after "is") does
    assert(!out.exists(_._2.startsWith("a b")))
    assert(byPhrase.contains("x"))
    // ties rank by phrase ascending
    val tied = out.filter(_._4 === 4.0).sortBy(_._1).map(_._2)
    assert(tied === tied.sorted)
  }

  test("qualityVolumeCurve: zero threshold keeps all, counts fall monotonically") {
    val df = docs((1L to 30L).map(i =>
      (i, "the of and is a " + ("zq " * (i % 11).toInt), "s")): _*)
    val out = CorpusReport.qualityVolumeCurve(df)
      .orderBy("thr_idx")
      .select("thr_idx", "n_docs_kept", "n_tokens_kept", "token_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.head._1 === 0L && out.head._2 === 30L)
    assert(out.head._4 === 1.0) // thr 0 keeps every token
    assert(out.map(_._2).toSeq === out.map(_._2).sorted.reverse.toSeq)
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.reverse.toSeq)
  }

  test("silhouetteReport: separated clusters score high, members add up") {
    // two tight blobs far apart -> silhouette ≈ 1, nothing negative
    val vecs = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0.0f else 100.0f
      (i.toLong, Seq(base + (i / 2) * 0.01f, base))
    }.toDF("vec_id", "embedding")
    val out = Semantic.silhouetteReport(vecs, k = 2, iters = 2)
      .select("cluster_id", "n_members", "avg_silhouette", "n_negative")
      .as[(Int, Long, Double, Long)].collect()
    assert(out.map(_._2).sum === 20L)
    assert(out.forall(_._3 > 0.9))
    assert(out.forall(_._4 === 0L))
  }
}
