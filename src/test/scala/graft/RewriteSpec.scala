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
    val corpus = ((1 to 5).map(i => (i.toLong, s"$boiler doc$i body")) :+
      (6L, s"rare leaked span doc6")).toDF("doc_id", "text")
    val bench = Seq((100L, s"$boiler rare leaked span")).toDF("doc_id", "text")
    val out = Decontamination.maskSpans(corpus, bench, w = 3, maxDf = Some(3))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // "click here now" occurs 5 > maxDf=3 times in the corpus -> kept;
    // "rare leaked span" occurs once -> masked from doc 6
    assert((1 to 5).forall(i => out(i.toLong) == 0L))
    assert(out(6L) == 3L)
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

  test("dsirWeights is repartition-invariant (integer micro-nat sums)") {
    val docs = graft.sim.WarehouseSim.read(spark, "/root/testdata/sf0.001", "documents")
    val target = docs.filter(col("lang") === "en")
    val a = Sampling.dsirWeights(docs, target)
    val b = Sampling.dsirWeights(docs.repartition(13), target.repartition(7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
