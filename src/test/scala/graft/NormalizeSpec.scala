package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** normalizeUnicode rules, one fixture per rule; case preservation and
  * composition with the lowercased hashing key. */
class NormalizeSpec extends TestBase {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t")
      .select(TextAnalysis.normalizeUnicode(col("t")).as("n"))
      .as[String].collect().head

  test("each normalization rule, in isolation") {
    // zero-width chars, BOM, soft hyphen removed (no space left behind)
    assert(norm("a​b‌c‍d﻿e­f") === "abcdef")
    // NBSP + thin/narrow spaces become plain spaces
    assert(norm("a b c d") === "a b c d")
    // typographic quotes become straight
    assert(norm("“x” ‘y’ „z‚") ===
      "\"x\" 'y' \"z'")
    // en/em dash + horizontal bar become '-'
    assert(norm("a–b—c―d") === "a-b-c-d")
    // ellipsis becomes three dots
    assert(norm("wait…") === "wait...")
    // control characters become spaces (then collapse)
    assert(norm("ab\tc\nd") === "a b c d")
    // whitespace collapse + trim
    assert(norm("  a   b  ") === "a b")
    // case is PRESERVED (content cleanup, not a dedup key)
    assert(norm("MiXeD Case") === "MiXeD Case")
  }

  test("property: normalization is idempotent over special-char strings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val pool: Seq[Char] = "abC 19.,!-'\"" ++
      "​‌﻿­  ‘’“”" ++
      "–—…\t\n"
    val strGen = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(pool)).map(_.mkString))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30),
      Prop.forAll(Gen.listOfN(50, strGen)) { ss =>
        import org.apache.spark.sql.functions._
        val rows = ss.toDF("t")
          .select(TextAnalysis.normalizeUnicode(col("t")).as("n1"))
          .select(col("n1"),
            TextAnalysis.normalizeUnicode(col("n1")).as("n2"))
          .as[(String, String)].collect()
        Prop(rows.forall { case (a, b) => a == b })
          .label(rows.find { case (a, b) => a != b }.toString)
      })
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  test("composes with the hashing key: variant renderings fingerprint equal") {
    val plain = "He said \"stop\" - wait..."
    val fancy = "He said “stop” — wait…​"
    val fps = Seq(plain, fancy).toDF("t")
      .select(TextAnalysis.fingerprint(
        TextAnalysis.normalizeUnicode(col("t"))).as("fp"))
      .as[String].collect()
    assert(fps(0) === fps(1),
      "normalized variant renderings must hash identically")
  }
}
