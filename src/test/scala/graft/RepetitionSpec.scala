package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusReport, Packing, Sampling, TextAnalysis}

/** Hand-traced fixtures for the round-8 curation additions: the Gopher
  * repetition-rule bundle, SoftDedup down-weighting, length-bucketed
  * batching, and the Zipf/Heaps report. */
class RepetitionSpec extends TestBase {
  import spark.implicits._

  // ---- gopherRepetition ----------------------------------------------------

  private def gopherOf(text: String) = {
    val docs = Seq((1L, text))
      .toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
    TextAnalysis.gopherRepetition(docs).head()
  }

  test("gopher: clean prose passes every rule") {
    // all-distinct tokens, 8 per line — long enough that a single
    // occurrence of the top 4-gram stays under its 16% limit (the
    // published rules target documents, not snippets)
    val toks = (1 to 120).map(i => s"word$i")
    val r = gopherOf(toks.grouped(8).map(_.mkString(" ")).mkString("\n"))
    assert(r.getAs[Boolean]("gopher_pass"))
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    assert(r.getAs[Double]("dup_10gram_char_frac") == 0.0)
  }

  test("gopher: duplicate lines are counted beyond the first occurrence") {
    // 4 lines, "spam spam" twice -> 1 duplicate occurrence of 4 lines
    val r = gopherOf("spam spam\nreal text here\nspam spam\nmore real text")
    assert(r.getAs[Double]("dup_line_frac") == 0.25)
    // dup chars = 9 of (9+14+9+14) = 9/46
    assert(r.getAs[Double]("dup_line_char_frac") ==
      math.round(9.0 / 46.0 * 1e6) / 1e6)
  }

  test("gopher: top-2-gram fraction counts all occurrences of the argmax gram") {
    // "ab cd" x3 among 8 tokens; top 2-gram "ab cd" (count 3, 4 chars;
    // interior bigrams "cd ab" occur 2x) -> 3*4 / tok_chars(16) = 0.75
    val r = gopherOf("ab cd ab cd ab cd xx yy")
    assert(r.getAs[Double]("top_2gram_char_frac") == 0.75)
    assert(!r.getAs[Boolean]("gopher_pass"))
  }

  test("gopher: overlapping duplicate n-grams never double-count coverage") {
    // 12 identical tokens: every 5-gram duplicates every other, all
    // positions covered exactly once -> dup_5gram_char_frac = 1.0
    val r = gopherOf(Seq.fill(12)("tok").mkString(" "))
    assert(r.getAs[Double]("dup_5gram_char_frac") == 1.0)
    assert(r.getAs[Double]("dup_10gram_char_frac") == 1.0)
    assert(!r.getAs[Boolean]("gopher_pass"))
  }

  test("gopher: documents shorter than n emit zero for that n") {
    val r = gopherOf("only four tokens here")
    assert(r.getAs[Double]("dup_5gram_char_frac") == 0.0)
    assert(r.getAs[Double]("top_4gram_char_frac") > 0.0)
  }

  // ---- softDedupSample -----------------------------------------------------

  test("softDedup: unique docs always survive; duplicate groups thin toward 1/c") {
    val uniq = (1L to 200L).map(i => (i, s"unique document number $i"))
    val dups = (1000L to 1199L).map(i => (i, "the exact same text"))
    val docs = (uniq ++ dups).toDF("doc_id", "text")
    val kept = Sampling.softDedupSample(docs)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert((1L to 200L).forall(keptIds.contains),
      "weight 1.0 rows must all survive")
    val dupKept = keptIds.count(_ >= 1000L)
    // expected 200 * 1/200 = 1 survivor; allow generous binomial slack
    assert(dupKept <= 10, s"200-way dup group kept $dupKept rows")
    assert(kept.filter($"doc_id" >= 1000L).select("weight").distinct()
      .as[Double].collect().forall(_ == 0.005))
  }

  test("softDedup: alpha=0 keeps everything; rerun is row-identical") {
    val docs = (1L to 100L).map(i => (i, s"text ${i % 7}")).toDF("doc_id", "text")
    assert(Sampling.softDedupSample(docs, alpha = 0.0).count() == 100)
    val a = Sampling.softDedupSample(docs).select("doc_id").as[Long]
      .collect().sorted.toSeq
    val b = Sampling.softDedupSample(docs.repartition(7)).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(a == b, "keep decision must be partitioning-independent")
  }

  // ---- lengthBuckets -------------------------------------------------------

  test("lengthBuckets: batches respect size cap, tiers bound lengths, padding math is exact") {
    val docs = (1L to 500L).map(i => (i, 1L + (i * 37) % 200))
      .toDF("doc_id", "n_tokens")
    val b = Packing.lengthBuckets(docs, batchSize = 16, shards = 4)
    val rows = b.collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500)
    assert(rows.forall(_.getAs[Long]("n_docs") <= 16))
    rows.foreach { r =>
      val pad = r.getAs[Long]("n_docs") * r.getAs[Long]("max_len") -
        r.getAs[Long]("sum_len")
      assert(r.getAs[Long]("pad_tokens") == pad)
      assert(pad >= 0)
    }
    // every batch's members fit the tier bounds: max_len < bound(tier)
    val bounds = Packing.lengthTierBounds
    rows.foreach { r =>
      val t = r.getAs[Int]("tier")
      if (t < bounds.size) assert(r.getAs[Long]("max_len") < bounds(t))
      // the batch max is a member, so it must sit at or above the tier's
      // lower bound too
      if (t > 0) assert(r.getAs[Long]("max_len") >= bounds(t - 1),
        s"tier $t batch max ${r.getAs[Long]("max_len")} below lower bound")
    }
  }

  test("lengthBuckets: bucketing by length cuts padding vs one unsorted stream") {
    val docs = (1L to 512L).map(i => (i, 1L + (i * 131) % 1000))
      .toDF("doc_id", "n_tokens")
    val bucketed = Packing.lengthBuckets(docs, batchSize = 16, shards = 2)
    val bucketPad = bucketed.agg(sum("pad_tokens")).head().getLong(0)
    // naive: batches of 16 in doc_id order
    val naive = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).grouped(16)
      .map(g => g.map(_._2).max * g.size - g.map(_._2).sum).sum
    assert(bucketPad < naive / 2,
      s"bucketed padding $bucketPad vs naive $naive — expected < half")
  }

  test("gopher inline gate is streaming-append-legal (pure projection)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val qName = s"gopher_stream_${System.nanoTime()}"
    val docs = input.toDF().toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
    val q = TextAnalysis.gopherRepetitionInline(docs)
      .select("doc_id", "gopher_pass")
      .writeStream.outputMode("append").format("memory").queryName(qName)
      .start()
    try {
      input.addData(
        1L -> (1 to 120).map(i => s"tok$i").mkString(" "),
        2L -> Seq.fill(30)("spam").mkString(" "))
      q.processAllAvailable()
      val out = spark.table(qName).as[(Long, Boolean)].collect().toMap
      assert(out == Map(1L -> true, 2L -> false))
    } finally q.stop()
  }

  // ---- hashedVectors -------------------------------------------------------

  test("hashedVectors: unit-norm, deterministic, and lexical similarity orders cosine") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // identical content
      (3L, "alpha beta gamma epsilon"), // 3/4 overlap
      (4L, "zeta eta theta iota")) // disjoint
      .toDF("doc_id", "text")
    val hv = TextAnalysis.hashedVectors(docs, dim = 16)
    val vecs = hv.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(vecs.size == 4)
    vecs.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"norm $n should be ~1")
    }
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(vecs(1).sameElements(vecs(2)),
      "identical text must hash to the identical vector")
    assert(cos(vecs(1), vecs(3)) > cos(vecs(1), vecs(4)),
      "3/4 token overlap must out-score disjoint vocabulary")
    // partitioning-independence (quantized components)
    val again = TextAnalysis.hashedVectors(docs.repartition(3), dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again.forall { case (k, v) => vecs(k).toSeq == v })
  }

  // ---- zipfReport ----------------------------------------------------------

  test("zipf: a synthetic Zipfian corpus fits slope ~ -1 with high r2") {
    // token w_r appears ceil(1000/r) times, r = 1..50
    val words = (1 to 50).flatMap(r => Seq.fill(1000 / r)(s"w$r"))
    val docs = words.grouped(40).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val r = CorpusReport.zipfReport(docs, topK = 50).head()
    val slope = r.getAs[Double]("zipf_slope")
    val r2 = r.getAs[Double]("zipf_r2")
    assert(math.abs(slope + 1.0) < 0.1, s"slope $slope should be ~ -1")
    assert(r2 > 0.98, s"r2 $r2 should be near 1 on exact Zipf data")
    assert(r.getAs[Long]("top_k") == 50)
  }

  test("zipf: report is partitioning-invariant (integer sums, fixed tie-break)") {
    val docs = (1L to 300L).map(i => (i, s"a b c d${i % 9} e${i % 17}"))
      .toDF("doc_id", "text")
    val a = CorpusReport.zipfReport(docs, topK = 20).head()
    val b = CorpusReport.zipfReport(docs.repartition(13), topK = 20).head()
    assert(a == b)
  }
}
