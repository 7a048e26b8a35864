package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Boilerplate, Decontamination, Sampling, TextAnalysis}

/** Semantics of span removal, decontamination masking, bigram-LM scoring,
  * and DSIR importance weights on hand-built fixtures (the oracle twins
  * hash-verify the corpus runs; these pin the edge cases). */
class RewriteSpec extends TestBase {
  import spark.implicits._

  private val span = "w1 w2 w3 w4 w5 w6 w7 w8"

  test("removeDupSpans cuts covered tokens everywhere, keeps unique text in order") {
    val docs = Seq(
      (1L, s"$span tail1 tail2"),   // shares the 8-window with doc 2
      (2L, s"lead1 $span"),
      (3L, s"$span x $span"),       // self-repeat: both occurrences cut
      (4L, "short doc here")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val out = Boilerplate.removeDupSpans(docs, w = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 10L, 8L, "tail1 tail2"),
      (2L, 9L, 8L, "lead1"),
      (3L, 17L, 16L, "x"),
      (4L, 3L, 0L, "short doc here")))
  }

  test("removeDupSpans: a fully-duplicated doc survives as empty text") {
    val docs = Seq((1L, span), (2L, span)).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val out = Boilerplate.removeDupSpans(docs, w = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 8L, ""), (2L, 8L, "")))
  }

  test("maskSpans cuts bench-shared trigrams, keeps the rest of the document") {
    val corpus = Seq(
      (1L, "intro words then the secret answer is tail text"),
      (2L, "nothing shared here at all")).toDF("doc_id", "text")
    val bench = Seq((100L, "the secret answer is forty two")).toDF("doc_id", "text")
    val out = Decontamination.maskSpans(corpus, bench, w = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    // corpus windows matching bench trigrams: "the secret answer",
    // "secret answer is" -> covered positions 4..7 of doc 1
    assert(out.toSeq == Seq(
      (1L, 4L, "intro words then tail text"),
      (2L, 0L, "nothing shared here at all")))
  }

  test("maskSpans maxDf prune: corpus-frequent windows are not masked") {
    val boiler = "click here now"
    val corpus = ((1 to 5).map(i => (i.toLong, s"$boiler doc$i body")) ++ Seq(
      (6L, "rare leaked span doc6"),
      // one degenerate doc repeating the leak must NOT push it over the
      // cap — maxDf counts DOCUMENTS, not occurrences
      (7L, (1 to 5).map(_ => "rare leaked span").mkString(" "))))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"$boiler rare leaked span")).toDF("doc_id", "text")
    val out = Decontamination.maskSpans(corpus, bench, w = 3, maxDf = Some(3))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // "click here now" appears in 5 > maxDf=3 docs -> kept everywhere;
    // "rare leaked span" appears in 2 docs -> masked from both
    assert((1 to 5).forall(i => out(i.toLong) == 0L))
    assert(out(6L) == 3L)
    assert(out(7L) == 15L)
  }

  test("bigramNll: exact micro-nat arithmetic on a tiny corpus") {
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    // uni: a=3, b=3, N=6; bigrams: doc1 (a,b),(b,a),(a,b); doc2 (b,a)
    val lambda = 0.9
    val l2 = 1.0 - lambda
    def nll(cb: Long, c1: Long, c2: Long): Long =
      math.round(-math.log(
        lambda * cb.toDouble / c1.toDouble + l2 * c2.toDouble / 6.0) * 1e6)
    val ab = nll(2, 3, 3); val ba = nll(2, 3, 3)
    val out = TextAnalysis.bigramNll(docs, lambda).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((3L, ab * 2 + ba), (1L, ba)))
  }

  test("trigramBackoffNll: every backoff level scores exactly") {
    // train: c1(a,b,c)=2 each, N=6; c2(a,b)=2,(b,c)=2,(c,a)=1;
    // c3(a,b,c)=2,(b,c,a)=1,(c,a,b)=1
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"),  // L1: c3/c2ctx = 2/2 = 1 -> nll 0
      (2L, "x b c"),  // L2: alpha * c2(b,c)/c1(b) = 0.4 * 2/2
      (3L, "x y c"),  // L3: alpha^2 * c1(c)/N
      (4L, "x y z"),  // L4: alpha^2 / N (OOV floor)
      (5L, "q")       // too short: zeros
    ).toDF("doc_id", "text")
    val a = 0.4; val aSq = a * a
    val exp = Map(
      1L -> 0L,
      2L -> math.round(-math.log(a * 2.0 / 2.0) * 1e6),
      3L -> math.round(-math.log(aSq * 2.0 / 6.0) * 1e6),
      4L -> math.round(-math.log(aSq / 6.0) * 1e6),
      5L -> 0L)
    val out = TextAnalysis.trigramBackoffNll(docs, train, a)
      .orderBy("doc_id").collect()
    assert(out.map(r => r.getLong(0) -> r.getLong(2)).toMap == exp)
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("trigramBackoffNll ranks in-distribution text below novel text") {
    val base = (1 to 40).map(_ => "the cat sat on the mat").mkString(" ")
    val docs = Seq((1L, base), (2L, "the cat sat on the mat"),
      (3L, "mat the on sat cat the")).toDF("doc_id", "text")
    val train = Sampling.deterministicSample(docs, "doc_id", 1.0, "lm")
      .filter($"doc_id" === 1L)
    val out = TextAnalysis.trigramBackoffNll(docs, train)
      .select("doc_id", "mean_nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 2's trigrams are all in-distribution; doc 3's word order is
    // novel, so it lives on the backoff levels and scores higher NLL
    assert(out(2L) < out(3L))
  }

  test("bigramNll ranks predictable word order below shuffled order") {
    // same unigram profile, different transition regularity
    val regular = (1 to 30).map(_ => "the cat sat").mkString(" ")
    val shuffled = "the the cat sat sat cat " +
      (1 to 27).map(_ => "the cat sat").mkString(" ")
    val docs = Seq((1L, regular), (2L, shuffled)).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(docs)
      .select("doc_id", "mean_nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < out(2L))
  }

  test("dsirWeights ranks target-like docs above off-target docs") {
    val target = (1 to 10).map(i =>
      (100L + i, "formal prose about science and method")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "formal prose about science and method indeed"),
      (2L, "lol click free pills now win big")).toDF("doc_id", "text")
    val out = Sampling.dsirWeights(corpus, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) > out(2L),
      s"target-like doc should outrank spam: ${out(1L)} vs ${out(2L)}")
  }

  test("dupSpanIslands merges consecutive dup starts; scattered matches stay separate") {
    // docs 1+2 share a 10-token passage -> 3 consecutive dup starts in
    // each = ONE island of 3 + 7 = 10 tokens; doc 3 shares only the span
    // head and tail separately -> two 1-start islands of 8 tokens
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    val head8 = "p1 p2 p3 p4 p5 p6 p7 p8"
    val docs = Seq(
      (1L, s"$passage x1 x2"),
      (2L, s"y1 $passage"),
      (3L, s"$head8 z1 z2 z3 z4 z5 z6 z7 $head8"),
      (4L, "no duplicated content at all here")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val out = Boilerplate.dupSpanIslands(docs, w = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out(0) == ((1L, 1L, 10L)), out.mkString(","))
    assert(out(1) == ((2L, 1L, 10L)))
    // doc 3: the repeated 8-token block at both ends -> 2 islands of 8
    assert(out(2) == ((3L, 2L, 8L)))
    assert(out(3) == ((4L, 0L, 0L)))
  }

  test("containmentPairs flags a snippet inside a larger doc that Jaccard misses") {
    val snippet = "the quick brown fox jumps over the lazy dog"
    val filler = (1 to 60).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, s"$filler $snippet"),   // snippet buried in a big doc
      (2L, snippet),               // the snippet alone
      (3L, "completely different words here")).toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val cont = graft.pipeline.Dedup.containmentPairs(docs, "source", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // doc2 ⊂ doc1: cont_b = 1.0; cont_a small
    assert(cont.toSeq.map(c => (c._1, c._2)) == Seq((1L, 2L)))
    assert(cont(0)._4 == 1.0 && cont(0)._3 < 0.2)
    // Jaccard at the same threshold misses the pair entirely
    val jac = graft.pipeline.Dedup.ngramJaccardPairs(docs, "source", 0.9)
    assert(jac.count() == 0)
  }

  test("trainingOrder is a deterministic permutation; salt draws a new one") {
    val docs = graft.sim.WarehouseSim.read(spark, "/root/testdata/sf0.001",
      "documents")
    val n = docs.count()
    val a = graft.pipeline.CorpusWriter.trainingOrder(docs, shards = 8)
    val b = graft.pipeline.CorpusWriter.trainingOrder(docs.repartition(13),
      shards = 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // every doc exactly once; positions within a shard are 0..count-1
    assert(a.count() == n && a.select("doc_id").distinct().count() == n)
    val posOk = a.groupBy("shard")
      .agg(count(lit(1)).as("c"), max(col("pos")).as("mx"))
      .filter(col("mx") =!= col("c") - 1).count()
    assert(posOk == 0)
    // a different salt produces a different order (overwhelmingly likely)
    val c = graft.pipeline.CorpusWriter.trainingOrder(docs, shards = 8,
      salt = "epoch1")
    assert(c.exceptAll(a).count() > 0)
  }

  test("nllTiers: common-vocab docs land in the head, rare-vocab in the tail") {
    val docs = ((1 to 6).map(i => (i.toLong, "the common words appear here")) ++
      Seq((7L, "zyx wvu tsr qpo nml"), (8L, "abc def ghi jkl mno"),
        (9L, "the common words appear here")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.nllTiers(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 9 docs, 3 tiers of 3: the 7 common-text docs fill head+middle and
    // one lands in tail with the two rare-vocab docs? No — tiers split
    // by rank: common docs rank 1-7, rare docs rank 8-9. Tier 3 = ranks
    // 7-9, so docs 7 and 8 are tail and every common doc is tier <= 3
    // with at most one in the tail.
    assert(out(7L) == 3L && out(8L) == 3L)
    assert((1 to 6).count(i => out(i.toLong) < 3L) >= 5)
  }

  test("bpePairStats counts adjacent char pairs; top pair is BPE's first merge") {
    val docs = Seq((1L, "aaab aab"), (2L, "ab")).toDF("doc_id", "text")
    // pairs: "aaab" -> aa,aa,ab; "aab" -> aa,ab; "ab" -> ab
    val out = TextAnalysis.bpePairStats(docs, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "aa", 3L), (2L, "ab", 3L)))
  }

  test("qualityGate reports the first failing rule in fixed order") {
    val clean = (1 to 20).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, "x! y?"),                                   // short AND non-alpha
      (2L, (1 to 10).map(_ => "the cat sat").mkString(" ")), // repetitive
      (3L, clean),                                     // passes everything
      (4L, (1 to 20).map(_ => "1234!").mkString(" "))) // non-alpha
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityGate(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(4)), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, Some("too_short"), false),   // too_short outranks non_alpha
      (2L, Some("repetition"), false),
      (3L, None, true),
      (4L, Some("non_alpha"), false)))
  }

  test("dsirSelect keeps the top-n by weight with TakeOrdered, not a global sort") {
    val target = (1 to 10).map(i =>
      (100L + i, "formal prose about science and method")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "formal prose about science and method indeed"),
      (2L, "lol click free pills now win big"),
      (3L, "prose about science here too")).toDF("doc_id", "text")
    val sel = Sampling.dsirSelect(corpus, target, n = 2)
    assert(sel.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "top-n selection regressed to a global sort")
    val rows = sel.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.length == 2 && rows.map(_._1).toSet == Set(1L, 3L),
      s"expected the two target-like docs, got ${rows.mkString(",")}")
  }

  test("overlapsBloom probes with the native expression — no ScalaUDF in the plan") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"leak$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"clean$i").mkString(" "))).toDF("doc_id", "text")
    val bench = Seq((10L, (1 to 30).map(i => s"leak$i").mkString(" ")))
      .toDF("doc_id", "text")
    val report = Decontamination.overlapsBloom(docs, bench, minShared = 3)
    val plan = report.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "corpus-side Bloom pre-filter missing from the physical plan")
    assert(!plan.contains("UDF"),
      "Bloom membership fell back to a ScalaUDF — codegen fence reintroduced")
    assert(report.select("doc_id", "bench_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
  }

  test("dsirWeights is repartition-invariant (integer micro-nat sums)") {
    val docs = graft.sim.WarehouseSim.read(spark, "/root/testdata/sf0.001", "documents")
    val target = docs.filter(col("lang") === "en")
    val a = Sampling.dsirWeights(docs, target)
    val b = Sampling.dsirWeights(docs.repartition(13), target.repartition(7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
