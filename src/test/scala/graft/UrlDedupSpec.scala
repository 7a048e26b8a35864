package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** URL canonicalization rules, one fixture per rule, plus keeper
  * assignment and the sim 4-variant collapse. */
class UrlDedupSpec extends TestBase {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Dedup.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().head

  test("each canonicalization rule, in isolation") {
    // scheme + host lowercase; path case preserved
    assert(canon("HTTP://ExAmple.COM/CaseD/Path") ===
      "http://example.com/CaseD/Path")
    // www. stripped
    assert(canon("http://www.example.com/a") === "http://example.com/a")
    // default ports stripped per scheme; non-default kept
    assert(canon("http://example.com:80/a") === "http://example.com/a")
    assert(canon("https://example.com:443/a") === "https://example.com/a")
    assert(canon("http://example.com:8080/a") === "http://example.com:8080/a")
    assert(canon("https://example.com:80/a") === "https://example.com:80/a")
    // fragment dropped
    assert(canon("http://example.com/a#sec-2") === "http://example.com/a")
    // utm_* params dropped; the rest sorted; emptied query drops '?'
    assert(canon("http://example.com/a?utm_source=x&utm_medium=y") ===
      "http://example.com/a")
    assert(canon("http://example.com/a?b=2&a=1") ===
      "http://example.com/a?a=1&b=2")
    assert(canon("http://example.com/a?b=2&utm_source=x&a=1") ===
      "http://example.com/a?a=1&b=2")
    // trailing slashes stripped
    assert(canon("http://example.com/a/") === "http://example.com/a")
    assert(canon("http://example.com/a///") === "http://example.com/a")
    // bare host: no path, no query
    assert(canon("http://example.com") === "http://example.com")
    // scheme-less and protocol-relative inputs pass through UNCHANGED —
    // rewriting them would collapse malformed rows onto garbage keys
    assert(canon("example.com/Some/Path?b=2&a=1") ===
      "example.com/Some/Path?b=2&a=1")
    assert(canon("//host.com/x") === "//host.com/x")
    assert(canon("http://example.com/") === "http://example.com")
  }

  test("urlDedup: keeper is the smallest id per canonical form") {
    val docs = Seq(
      (10L, "http://example.com/a?b=2&a=1"),
      (3L, "HTTP://WWW.Example.COM:80/a/?a=1&b=2&utm_source=x#f"),
      (7L, "http://example.com/a?a=1&b=2"),
      (5L, "http://other.com/z")
    ).toDF("doc_id", "url")
    val got = Dedup.urlDedup(docs)
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set(
      (10L, "http://example.com/a?a=1&b=2", 3L),
      (3L, "http://example.com/a?a=1&b=2", 3L),
      (7L, "http://example.com/a?a=1&b=2", 3L),
      (5L, "http://other.com/z", 5L)))
  }

  test("property: canonicalization is idempotent (canonical form is a " +
      "fixed point)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "ftp")
      wwws <- Gen.choose(0, 2)
      host <- Gen.oneOf("Example.com", "a-b.ORG", "x.co")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.listOfN(2, Gen.oneOf("A", "b", "Path7"))
      slashes <- Gen.oneOf("", "/", "//")
      params <- Gen.someOf(Seq("b=2", "a=1", "utm_source=x", "z=", "q=Mix"))
      frag <- Gen.oneOf("", "#sec", "#x/y?z")
    } yield scheme + "://" + ("www." * wwws) + host + port +
      "/" + segs.mkString("/") + slashes +
      (if (params.isEmpty) "" else "?" + params.mkString("&")) + frag
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30),
      Prop.forAll(Gen.listOfN(40, urlGen)) { urls =>
        import org.apache.spark.sql.functions._
        val rows = urls.toDF("u")
          .select(Dedup.canonicalizeUrl(col("u")).as("c1"))
          .select(col("c1"),
            Dedup.canonicalizeUrl(col("c1")).as("c2"))
          .as[(String, String)].collect()
        Prop(rows.forall { case (c1, c2) => c1 == c2 })
          .label(rows.find { case (c1, c2) => c1 != c2 }.toString)
      })
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  test("urlDedupIncremental: already-crawled canonicals rejected, " +
      "new ones admitted with within-batch collapse") {
    val corpus = Seq(
      (1L, "http://example.com/a"),
      (2L, "http://example.com/b?x=1")
    ).toDF("doc_id", "url")
    val batch = Seq(
      (10L, "HTTP://WWW.Example.com:80/a/"), // canonical dup of corpus 1
      (11L, "http://example.com/c"),          // new
      (12L, "http://example.com/c?utm_source=x"), // same canonical as 11
      (13L, "http://example.com/b?x=1&utm_medium=m") // dup of corpus 2
    ).toDF("doc_id", "url")
    val got = Dedup.urlDedupIncremental(batch, corpus)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("http://example.com/c", 11L, 2L)))
  }

  test("sim variants: all four URL forms of a base page collapse") {
    val dedup = Dedup.urlDedup(
      graft.sim.WarehouseSim.urlDocs(spark, "/root/testdata/sf0.001"))
    val groups = dedup.groupBy("canonical_url")
      .agg(countDistinct("doc_id").as("n"),
        min("doc_id").as("lo"), max("doc_id").as("hi"))
      .as[(String, Long, Long, Long)].collect()
    assert(groups.nonEmpty)
    // full 4-groups collapse exactly the div-4 block; keeper = min id
    groups.filter(_._2 == 4).foreach { case (u, _, lo, hi) =>
      assert(hi - lo === 3, s"$u spans ids $lo..$hi")
      assert(lo % 4 === 0)
    }
    assert(groups.forall(_._2 <= 4))
  }
}
