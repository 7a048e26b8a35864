package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Boilerplate, Packing, TextAnalysis}

/** Semantics of line-level dedup, duplicated-span detection, unigram-LM
  * scoring, and overlapping chunking on hand-built fixtures (the oracle
  * twin hash-verifies the corpus run; these pin the edge cases). */
class BoilerplateSpec extends TestBase {
  import spark.implicits._

  test("lineDedup removes every occurrence of a corpus-frequent line, keeps order") {
    val docs = Seq(
      (1L, "alpha one\nsubscribe now\nbeta two"),
      (2L, "gamma three\nsubscribe now\ndelta four"),
      (3L, "subscribe now\nepsilon five"),
      (4L, "unique line only")).toDF("doc_id", "text")
    val out = Boilerplate.lineDedup(docs, maxOcc = 2)
      .orderBy("doc_id").collect()
    // "subscribe now" occurs 3 times > maxOcc=2 -> gone everywhere
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq == Seq(
      (1L, 3L, 1L, "alpha one\nbeta two"),
      (2L, 3L, 1L, "gamma three\ndelta four"),
      (3L, 2L, 1L, "epsilon five"),
      (4L, 1L, 0L, "unique line only")))
  }

  test("lineDedup: a fully-boilerplate document survives with empty text") {
    val docs = Seq(
      (1L, "spam\nspam"), (2L, "spam"), (3L, "spam\nham")).toDF("doc_id", "text")
    val out = Boilerplate.lineDedup(docs, maxOcc = 1)
      .orderBy("doc_id").collect()
    // "spam" occurs 4 times total -> removed; doc 1 and 2 become empty
    assert(out.map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq ==
      Seq((1L, 2L, ""), (2L, 1L, ""), (3L, 1L, "ham")))
  }

  test("lineDedup is repartition-invariant") {
    val docs = WarehouseDocs.relined(spark)
    val a = Boilerplate.lineDedup(docs, maxOcc = 1)
    val b = Boilerplate.lineDedup(docs.repartition(13), maxOcc = 1)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("dupSpanStats flags cross-doc and self-repeated spans; short docs report zero") {
    val mk = (s: String) => s.trim
    val span = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (1L, mk(s"$span tail1 tail2")),        // shares the 8-window with doc 2
      (2L, mk(s"lead1 $span")),
      (3L, mk(s"$span x $span")),            // self-repeat
      (4L, "short doc here")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val out = Boilerplate.dupSpanStats(docs, w = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc1: 3 windows, window@1 is shared (docs 1,2,3) -> 1 dup
    // doc2: 2 windows, window@2 is the span -> 1 dup
    // doc3: 10 windows, span appears at pos 1 and 10 -> 2 dups
    // doc4: 3 tokens < w -> 0 windows
    assert(out == Seq((1L, 3L, 1L), (2L, 2L, 1L), (3L, 10L, 2L), (4L, 0L, 0L)))
  }

  test("unigramNll: exact micro-nat arithmetic on a tiny corpus") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2, b=2, c=1, N=5
    val nll = Map(
      "a" -> math.round(-math.log(2.0 / 5.0) * 1e6),
      "b" -> math.round(-math.log(2.0 / 5.0) * 1e6),
      "c" -> math.round(-math.log(1.0 / 5.0) * 1e6))
    val out = TextAnalysis.unigramNll(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(
      nll("a") * 2 + nll("b"), nll("b") + nll("c")))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L))
  }

  test("unigramNll scores boilerplate below rare-vocabulary text") {
    val docs = (1 to 20).map(i => (i.toLong, "the the the common common"))
      .toDF("doc_id", "text")
      .union(Seq((21L, "zephyr quixotic ineffable")).toDF("doc_id", "text"))
    val out = TextAnalysis.unigramNll(docs)
      .select("doc_id", "mean_nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) < out(21L))
  }

  test("chunk covers every token, respects stride overlap, one chunk for short docs") {
    val toks = (1 to 50).map(i => s"t$i")
    val docs = Seq((1L, toks), (2L, Seq("a", "b", "c"))).toDF("doc_id", "toks")
    val out = Packing.chunk(docs, chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // starts 0 and 24; second chunk reaches the end (26 tokens)
    assert(d1.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 32L), (1L, 26L)))
    assert(d1(1).getString(3).split(" ").last == "t50")
    // short doc: exactly one chunk, whole doc
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq ==
      Seq((0L, 3L, "a b c")))
  }

  test("chunk at exact-multiple boundaries emits no empty chunk") {
    // n == chunkSize: one chunk; n == chunkSize + stride: two chunks
    val docs = Seq(
      (1L, (1 to 32).map(_.toString)),
      (2L, (1 to 56).map(_.toString))).toDF("doc_id", "toks")
    val out = Packing.chunk(docs, chunkSize = 32, stride = 24)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), min("n_tokens").as("mn"))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 32L), (2L, 2L, 32L)))
  }
}

/** The re-lined synthetic corpus shared by spec + query (no newlines in
  * the generated text, so tests inject them the same way the query does). */
object WarehouseDocs {
  def relined(spark: org.apache.spark.sql.SparkSession) = {
    val docs = graft.sim.WarehouseSim.read(spark, "/root/testdata/sf0.001", "documents")
    val toked = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    toked.select(col("doc_id"), array_join(
      transform(
        sequence(lit(0L), ceil(size(col("toks")).cast("double") / 8).cast("long") - 1),
        g => concat_ws(" ", slice(col("toks"), (g * 8 + 1).cast("int"), lit(8)))),
      "\n").as("text"))
  }
}
