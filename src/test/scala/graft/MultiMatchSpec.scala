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

  test("suffix phrases: boundary-blocked long match must not shadow a " +
      "valid short one (ADVICE r8 repro)") {
    // "slow join" ends at the same position as "join"; on "zslow join"
    // the long match fails the left \b (z|s word-word) but "join" is
    // boundary-valid — regex counts 1, the old AC counted 0
    val suffixy = Seq("slow join", "join")
    val rows = Seq(
      "zslow join",            // the reported repro: expect 1 ("join")
      "slow join",             // long phrase valid: expect 1, not 2
      "a slow join b",         // same, embedded
      "join zslow join join",  // 1 + 1 + 1
      "zslow joinz",           // both ends blocked: 0
      "slow slow join")        // "slow" isn't a phrase; 1
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val re = TextAnalysis.blocklistStats(rows, suffixy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ac = TextAnalysis.blocklistStatsAc(rows, suffixy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === ac, s"regex $re vs ac $ac")
    assert(re === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 0L,
      5L -> 1L))
  }

  test("nested phrases: leftmost-START commit, not earliest-end greedy") {
    // "b" and "c" sit strictly inside "a b c" with valid boundaries on
    // all three; Matcher.find counts the leftmost start ("a b c") once
    // and skips the contained matches — an earliest-end greedy counts 2
    val nested = Seq("a b c", "b", "c")
    val rows = Seq(
      "a b c",        // ONE match (the long phrase), not b+c
      "x b c",        // long phrase can't match: b and c both count
      "a b c b",      // long phrase, then trailing standalone b
      "b a b c c")    // leading b, long phrase, trailing c
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val re = TextAnalysis.blocklistStats(rows, nested)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ac = TextAnalysis.blocklistStatsAc(rows, nested)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === ac, s"regex $re vs ac $ac")
    assert(re === Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 3L))
  }

  test("randomized suffix/nested lists stay bit-equal to the regex twin") {
    val rnd = new scala.util.Random(9)
    // deliberately suffix-heavy: every long phrase's tail word is also
    // a phrase ("click here"/"here" shape the advice called out)
    val words = Seq("click", "here", "join", "scan", "now", "free", "win",
      "z", "q")
    val phraseList = Seq("click here", "here", "slow join", "join",
      "win now", "now", "free win now", "q z")
    val texts = (0 until 300).map { i =>
      val k = 1 + rnd.nextInt(12)
      (0 until k).map { _ =>
        val w = words(rnd.nextInt(words.size))
        // sometimes glue a word char on either side to block boundaries
        rnd.nextInt(4) match {
          case 0 => s"x$w"
          case 1 => s"${w}x"
          case _ => w
        }
      }.mkString(rnd.nextInt(3) match {
        case 0 => " "
        case 1 => ", "
        case _ => "  "
      })
    }
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val re = TextAnalysis.blocklistStats(rows, phraseList)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ac = TextAnalysis.blocklistStatsAc(rows, phraseList)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val diffs = re.keySet.filter(k => re(k) != ac(k))
      .map(k => s"doc $k: regex ${re(k)} ac ${ac(k)} text '${texts(k.toInt)}'")
    assert(diffs.isEmpty, diffs.mkString("\n"))
    assert(re.values.sum > 0, "fixture must actually hit")
  }

  test("prefix pairs and malformed lists are rejected loudly") {
    intercept[IllegalArgumentException] {
      MultiMatch.automaton(Seq("slow", "slow join"))
    }
    intercept[IllegalArgumentException] { MultiMatch.automaton(Seq.empty) }
    intercept[IllegalArgumentException] { MultiMatch.automaton(Seq("a", "a")) }
    // space-edged phrases invert \b semantics vs the regex twin
    // (\b(join )\b on "a join b": regex 1, AC 0) — rejected loudly
    intercept[IllegalArgumentException] { MultiMatch.automaton(Seq("join ")) }
    intercept[IllegalArgumentException] { MultiMatch.automaton(Seq(" scan")) }
  }
}
