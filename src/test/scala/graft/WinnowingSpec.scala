package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}

/** Semantics of winnowing fingerprint selection, MOSS-style overlap
  * pairs, and per-language CCNet tiers on hand-built fixtures (the
  * oracle twins hash-verify the corpus runs; these pin the guarantees
  * the hash can't express). */
class WinnowingSpec extends TestBase {
  import spark.implicits._

  private val k = 8
  private val w = 4

  test("winnowing guarantee: a shared substring of length >= w+k-1 shares a fingerprint") {
    // 11-char shared run ("magic stone" = w+k-1 chars) inside otherwise
    // disjoint documents
    val shared = "magic stone"
    assert(shared.length == w + k - 1)
    val docs = Seq(
      (1L, s"aaaa bbbb cccc $shared dddd eeee ffff"),
      (2L, s"zzzz yyyy $shared xxxx wwww vvvv uuuu")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, k, w)
    val a = fps.filter($"doc_id" === 1L).select("fp").as[String].collect().toSet
    val b = fps.filter($"doc_id" === 2L).select("fp").as[String].collect().toSet
    assert(a.intersect(b).nonEmpty,
      "substring of w+k-1 chars must contribute at least one common fingerprint")
  }

  test("winnowing density: selection is a subset of k-gram hashes, far sparser") {
    val text = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val nKg = text.length - (k - 1)
    val nFp = TextAnalysis.winnowFingerprints(docs, k, w).count()
    assert(nFp > 0 && nFp < nKg / 2,
      s"winnowed $nFp of $nKg k-grams — expected well under half")
  }

  test("winnowing: documents shorter than k+w-1 normalized chars yield no fingerprints") {
    val docs = Seq(
      (1L, "tiny"), // < k chars
      (2L, "abcdefghij"), // k-grams exist but fewer than w windows
      (3L, "exactly twelve c")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, k, w)
    assert(fps.filter($"doc_id" === 1L).count() == 0)
    assert(fps.filter($"doc_id" === 2L).count() == 0)
    assert(fps.filter($"doc_id" === 3L).count() > 0)
  }

  test("winnowOverlapPairs finds a planted copied passage and scores containment") {
    val passage = "the secret formula is seven parts honey to one part fire"
    val docs = Seq(
      (1L, s"intro text before the copy $passage and some trailing words"),
      (2L, s"completely different framing here $passage closing remarks"),
      (3L, "no copied material in this document at all nothing shared")).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, k, w, minShared = 3, maxDf = 20)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val row = pairs.head
    assert(row.getLong(2) >= 3, "the long passage must share many fingerprints")
    val containment = row.getDouble(3)
    assert(containment > 0.0 && containment <= 1.0)
  }

  test("winnowOverlapPairs: corpus-wide boilerplate is df-capped out of pairing") {
    // every doc carries the same footer; only 1<->2 share real content
    val footer = "all rights reserved contact us at example dot com"
    val body = "the unique shared body passage appears only here twice"
    val docs = (1L to 30L).map { i =>
      val text =
        if (i <= 2) s"$body $footer"
        else s"document number $i with its own words $footer"
      (i, text)
    }.toDF("doc_id", "text")
    // maxDf=20 < 30 docs: footer fingerprints are dropped, body survives
    val pairs = Dedup.winnowOverlapPairs(docs, k, w, minShared = 3, maxDf = 20)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
      s"only the true copy pair should survive the df cap, got ${pairs.toSeq}")
  }

  test("nllTiersBy grades each language against its own LM and its own boundaries") {
    // lang A: 6 docs, lang B: 3 docs. Every tier must be populated
    // WITHIN each language (global tiering would let one language
    // dominate tier 1).
    val docs = Seq(
      (1L, "aa bb aa bb aa bb", "A"), (2L, "aa bb cc dd ee ff", "A"),
      (3L, "aa aa aa aa aa aa", "A"), (4L, "gg hh ii jj kk ll", "A"),
      (5L, "aa bb aa cc aa dd", "A"), (6L, "mm nn oo pp qq rr", "A"),
      (7L, "xx yy xx yy xx yy", "B"), (8L, "xx zz ww vv uu tt", "B"),
      (9L, "qq rr ss xx yy zz", "B")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.nllTiersBy(docs, "lang", 3)
    val byLang = out.groupBy("part").agg(
      countDistinct("tier").as("n_tiers"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLang("A") == ((3L, 6L)))
    assert(byLang("B") == ((3L, 3L)))
    // within-language ordering: lower mean_nll -> lower tier
    val a = out.filter($"part" === "A")
      .orderBy("mean_nll", "doc_id").select("tier").as[Long].collect()
    assert(a.sameElements(a.sorted), "tiers must be monotone in mean_nll")
  }

  test("noveltyScores: copied docs score 0, fresh docs score 1, blends in between") {
    val ref = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta"),
      (102L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // verbatim
      (2L, "totally fresh words never seen anywhere at all"), // disjoint
      // half-and-half: first 4 tokens from ref (2 seen trigrams of 6)
      (3L, "one two three four brand new closing words"),
      (4L, "xy") // < 3 tokens -> no trigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScores(corpus, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L)._3 == 0.0, s"verbatim copy must be 0-novel: ${out(1L)}")
    assert(out(2L)._3 == 1.0, s"disjoint doc must be fully novel: ${out(2L)}")
    assert(out(3L)._3 > 0.0 && out(3L)._3 < 1.0,
      s"partial copy must blend: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0.0)), "sub-n docs report (0, 0, 0.0)")
    assert(out.size == 4, "one row per corpus doc")
  }

  test("nllTiersBy with a single language matches global nllTiers") {
    val docs = Seq(
      (1L, "aa bb cc dd"), (2L, "aa aa aa aa"), (3L, "ee ff gg hh"),
      (4L, "aa bb aa bb"), (5L, "ii jj kk ll"), (6L, "aa cc ee gg"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val by = TextAnalysis.nllTiersBy(docs, "lang", 3)
      .select("doc_id", "tier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = TextAnalysis.nllTiers(docs)
      .select("doc_id", "tier").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(by == global)
  }
}
