package graft

import org.apache.spark.sql.functions._

import graft.functions.MultiMatch
import graft.pipeline.TextAnalysis

/** The Aho–Corasick matcher vs the regex alternation it replaces:
  * bit-equality on the corpus and on boundary fixtures, prefix-free
  * enforcement, and the flat-in-N cost separation (measured, logged). */
class MultiMatchSpec extends TestBase {
  import spark.implicits._

  private val phrases = Seq("table scan", "slow join", "batch batch", "dup")

  private def corpus = graft.sim.WarehouseSim
    .read(spark, "/root/testdata/sf0.001", "documents")

  test("AC counts are bit-equal to the regex twin on the corpus") {
    val re = TextAnalysis.blocklistStats(corpus, phrases)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ac = TextAnalysis.blocklistStatsAc(corpus, phrases)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === ac)
    assert(re.values.sum > 0, "fixture phrases must actually hit")
  }

  test("boundary fixtures: \\b anchoring, overlap suffix, non-overlap scan") {
    val rows = Seq(
      "dup",                      // bare hit
      "dups dedup xdup",          // word-boundary blocks all three
      "dup dup dup",              // three distinct non-overlapping hits
      "slow join now",            // hit then trailing text
      "a slow slow join",         // embedded: only one full phrase
      "batch batch batch",        // leftmost non-overlap -> ONE hit (the
                                  // second 'batch batch' overlaps the first)
      "table  scan",              // double space: no hit (literal phrase)
      "_dup dup_")                // underscore IS a word char (\\w) -> no hit
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val re = TextAnalysis.blocklistStats(rows, phrases)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ac = TextAnalysis.blocklistStatsAc(rows, phrases)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === ac, s"regex $re vs ac $ac")
    assert(re === Map(0L -> 1L, 1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 0L, 7L -> 0L))
  }

  test("equality holds on a large generated phrase list; AC cost is flat") {
    // 400 two-word phrases over the corpus vocabulary; prefix-free by
    // construction (every phrase same word count, all distinct)
    val vocab = Seq("spark", "hash", "stream", "merge", "sort", "filter",
      "window", "batch", "query", "scan", "group", "order", "line", "value",
      "column", "table", "data", "part", "key", "row")
    val many = (for (a <- vocab; b <- vocab) yield s"$a $b").distinct
    assert(many.size === 400)
    val t0 = System.nanoTime()
    val re = TextAnalysis.blocklistStats(corpus, many)
      .agg(sum("n_hits")).collect().head.getLong(0)
    val tRe = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val ac = TextAnalysis.blocklistStatsAc(corpus, many)
      .agg(sum("n_hits")).collect().head.getLong(0)
    val tAc = (System.nanoTime() - t1) / 1e9
    info(f"400 phrases over sf0.001: regex $tRe%.2f s, AC $tAc%.2f s")
    assert(re === ac)
    assert(re > 0)
  }

  test("prefix pairs and malformed lists are rejected loudly") {
    intercept[IllegalArgumentException] {
      MultiMatch.automaton(Seq("slow", "slow join"))
    }
    intercept[IllegalArgumentException] { MultiMatch.automaton(Seq.empty) }
    intercept[IllegalArgumentException] { MultiMatch.automaton(Seq("a", "a")) }
  }
}
