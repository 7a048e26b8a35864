package graft

import graft.pipeline.{CorpusReport, TextAnalysis}

/** Fixture-level pins for the round-10 lexical-stat operators: token
  * entropy, PMI collocations, and the median/MAD outlier screen. The
  * oracle twins verify exact values at sf0.01; these pin the closed-form
  * cases where the right answer is known analytically. */
class LexStatsSpec extends TestBase {

  import spark.implicits._

  test("tokenEntropy: all-identical tokens -> H=0; uniform -> log2(n)") {
    val docs = Seq(
      (1L, "a a a a a a a a"),            // 8 copies of one type: H = 0
      (2L, "a b c d e f g h"),            // 8 distinct: H = log2(8) = 3
      (3L, "x x y y"),                    // 2+2: H = 1
      (4L, "w")                           // single token: H = 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((8L, 1L, 0.125, 0.0)))
    assert(got(2L) == ((8L, 8L, 1.0, 3.0)))
    assert(got(3L) == ((4L, 2L, 0.5, 1.0)))
    assert(got(4L) == ((1L, 1L, 1.0, 0.0)))
  }

  test("tokenEntropy: skewed distribution matches the closed form") {
    // 3 of 'a', 1 of 'b': H = log2(4) - (3*log2(3))/4 = 2 - 0.75*log2(3)
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val h = TextAnalysis.tokenEntropy(docs).collect().head.getDouble(4)
    val expect = BigDecimal(2.0 - 3.0 * (math.log(3.0) / math.log(2.0)) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(h - expect) < 2e-6, s"got $h expected ~$expect")
  }

  test("pmiCollocations: perfect collocation outranks independent pair") {
    // 'alpha beta' always co-occur (PMI high); 'x' and 'y' appear widely
    // but pair up rarely relative to their marginals (PMI lower).
    val glue = (1 to 8).map(i => (i.toLong, "alpha beta"))
    val noise = (9 to 16).map(i =>
      (i.toLong, "x y x q y q x p y p x r y r"))
    val docs = (glue ++ noise).toDF("doc_id", "text")
    val rows = TextAnalysis.pmiCollocations(docs, minCount = 5, k = 10)
      .collect()
    assert(rows.nonEmpty)
    val byRank = rows.map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byRank(1) == "alpha beta",
      s"the glued pair must rank first, got ${byRank(1)}")
    // rank column is dense 1..n and pmi is non-increasing
    val pmis = rows.sortBy(_.getInt(0)).map(_.getDouble(5))
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to rows.length),
      "ranks must be dense")
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b },
      "pmi must be non-increasing in rank")
  }

  test("pmiCollocations: minCount guard drops rare pairs") {
    val docs = (1 to 4).map(i => (i.toLong, "rare pair"))
      .toDF("doc_id", "text")
    // pair count 4 < minCount 5 -> empty result
    assert(TextAnalysis.pmiCollocations(docs, minCount = 5, k = 10)
      .collect().isEmpty)
  }

  test("qualityOutlierReport: known median/MAD and fence counts") {
    // lang 'en': token counts 1..7 plus one 100-token doc.
    // median of (1,2,3,4,5,6,7,100) = 4.5; |x-med| = (3.5,2.5,1.5,0.5,
    // 0.5,1.5,2.5,95.5) -> MAD = median = 2.0. Fence: 4.5 ± 6 ->
    // [-1.5, 10.5]: only the 100-token doc is out (high).
    val en = Seq.tabulate(7)(i => (i.toLong, "en",
      (1 to (i + 1)).map(_ => "w").mkString(" "))) :+
      (7L, "en", (1 to 100).map(_ => "w").mkString(" "))
    val docs = en.toDF("doc_id", "lang", "text")
    val r = CorpusReport.qualityOutlierReport(docs, z = 3.0).collect().head
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 8L)
    assert(r.getDouble(2) == 4.5)
    assert(r.getDouble(3) == 2.0)
    assert(r.getLong(4) == 0L, "no low outliers")
    assert(r.getLong(5) == 1L, "exactly the 100-token doc is high")
    assert(r.getDouble(6) == 0.125)
  }

  test("langidConfusion: shares sum to 1 per label; perfect docs hit diagonal") {
    val docs = Seq(
      (1L, "en", "the cat is of the house and a dog"),
      (2L, "en", "the a of and is"),
      (3L, "es", "el la de que los"),
      (4L, "de", "der die das und ist"),
      (5L, "de", "nothing recognizable here")   // -> 'und'
    ).toDF("doc_id", "lang", "text")
    val rows = TextAnalysis.langidConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(rows(("en", "en")) == ((2L, 1.0)))
    assert(rows(("es", "es")) == ((1L, 1.0)))
    assert(rows(("de", "de")) == ((1L, 0.5)))
    assert(rows(("de", "und")) == ((1L, 0.5)))
    // shares sum to 1 within every labeled row
    rows.keys.map(_._1).toSeq.distinct.foreach { l =>
      val s = rows.collect { case ((`l`, _), (_, f)) => f }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"label $l shares must sum to 1")
    }
  }

  test("vocabCoverage: histogram slice math matches the direct sort") {
    // frequencies: a:5 b:4 c:3 d:3 e:1 f:1 g:1  (total 18)
    val text = (Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(3)("d") ++ Seq("e", "f", "g")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val cov = graft.pipeline.CorpusReport
      .vocabCoverage(docs, cutoffs = Seq(1L, 2L, 3L, 4L, 100L)).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(cov(1L) == ((1L, 5L, 18L, BigDecimal(5.0 / 18)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(cov(2L)._2 == 9L)     // a+b
    assert(cov(3L)._2 == 12L)    // a+b+ one of the tied 3s
    assert(cov(4L)._2 == 15L)    // both tied 3s — tie-invariant
    assert(cov(100L) == ((7L, 18L, 18L, 1.0)))
  }

  test("embeddingPca: collinear cloud -> explained_frac 1, diagonal loading") {
    // points on the line y = x: all variance on one component
    val embs = Seq(
      (1L, Seq(1.0f, 1.0f)), (2L, Seq(-1.0f, -1.0f)),
      (3L, Seq(2.0f, 2.0f)), (4L, Seq(-2.0f, -2.0f))
    ).toDF("vec_id", "embedding")
    val rows = graft.pipeline.Semantic.embeddingPca(embs).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 2)
    val r = rows.head
    assert(r.getDouble(1) == 0.0, "mean is zero")
    assert(rows.forall(_.getDouble(2) == 0.707107),
      "pc1 = (1,1)/sqrt(2) with the positive sign convention")
    assert(r.getDouble(3) == 5.0, "lambda1 = full variance")
    assert(r.getDouble(4) == 5.0, "trace")
    assert(r.getDouble(5) == 1.0, "fully collapsed onto one line")
  }

  test("embeddingPca: isotropic cloud -> explained_frac 0.5") {
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val r = graft.pipeline.Semantic.embeddingPca(embs).collect().head
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 0.5,
      "equal variance in both dims: top component explains half")
  }

  test("pcaState: merged slice states render the one-shot report") {
    import graft.pipeline.Semantic
    val embs = Seq(
      (1L, Seq(1.0f, 1.0f)), (2L, Seq(-1.0f, -1.0f)),
      (3L, Seq(2.0f, 2.0f)), (4L, Seq(-2.0f, -2.0f)),
      (5L, Seq(0.5f, -0.5f)), (6L, Seq(-0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val oneShot = Semantic.embeddingPca(embs).collect().toSet
    val merged = Semantic.renderPca(Semantic.mergePcaState(
      Semantic.pcaState(embs.filter($"vec_id" % 2 === 0)),
      Semantic.pcaState(embs.filter($"vec_id" % 2 =!= 0)))).collect().toSet
    assert(merged == oneShot,
      "additive state must reproduce the one-shot report bit-for-bit")
  }

  test("abttProject: removing PC1 from a collinear cloud leaves ~zero") {
    val embs = Seq(
      (1L, Seq(1.0f, 1.0f)), (2L, Seq(-1.0f, -1.0f)),
      (3L, Seq(2.0f, 2.0f)), (4L, Seq(-2.0f, -2.0f))
    ).toDF("vec_id", "embedding")
    val rows = graft.pipeline.Semantic.abttProject(embs).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows(1L)._2 == 1.414214 && rows(3L)._2 == 2.828427,
      "centered norms are |v|·sqrt(2)")
    rows.values.foreach { case (c, nb, na) =>
      assert(math.abs(math.abs(c) - nb) < 1e-5,
        "PC1 carries the whole vector")
      assert(na <= 1e-5, s"residual after ABTT must vanish, got $na")
    }
  }

  test("infoGainSelect: repeated word order gains more than shuffled") {
    // same unigram multiset everywhere; docs 1-3 repeat one bigram
    // pattern (context predicts), docs 4-6 scramble it differently
    val structured = "a b c d a b c d a b c d"
    val docs = Seq(
      (1L, structured), (2L, structured), (3L, structured),
      (4L, "a d b c b d a c c a d b"),
      (5L, "b a d c a c b d d b c a"),
      (6L, "c b a d d a c b b d a c")
    ).toDF("doc_id", "text")
    val g = graft.pipeline.Sampling.infoGainSelect(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(g(1L) == g(2L) && g(2L) == g(3L))
    Seq(4L, 5L, 6L).foreach { id =>
      assert(g(1L) > g(id),
        s"structured gain ${g(1L)} must beat shuffled doc $id's ${g(id)}")
    }
  }

  test("sourceKl: disjoint vocabularies give log2(N/Ns); identical give 0") {
    val docs = Seq(
      (1L, "A", "a b c d"), (2L, "A", "a b c d"),
      (3L, "B", "x y z w"), (4L, "B", "x y z w")
    ).toDF("doc_id", "source", "text")
    val kl = TextAnalysis.sourceKl(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // each source owns half the corpus mass exclusively: KL = log2(2)
    assert(kl("A") == 1.0 && kl("B") == 1.0, s"got $kl")

    val same = Seq((1L, "A", "a b"), (2L, "B", "a b"))
      .toDF("doc_id", "source", "text")
    val kl0 = TextAnalysis.sourceKl(same).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(kl0.values.forall(_ == 0.0),
      s"identical distributions must have zero divergence: $kl0")
  }

  test("burstiness: piled-up counts out-rank uniform ones, exact VMR") {
    // 'x': counts (5, 1) across its two docs -> VMR = (2*26-36)/(2*6)
    // = 4/3; 'y': counts (1, 1) -> VMR = 0
    val docs = Seq(
      (1L, "x x x x x y"),
      (2L, "x y")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.burstiness(docs, minDf = 2, k = 10).collect()
      .map(r => r.getString(1) ->
        (r.getInt(0), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows("x") == ((1, 2L, 6L, 1.333333)), s"got $rows")
    assert(rows("y") == ((2, 2L, 2L, 0.0)), s"got $rows")
  }

  test("ksDrift: identical slices give 0, disjoint supports give 1") {
    val a = Seq((1L, "w"), (2L, "w w")).toDF("doc_id", "text")
    val same = graft.pipeline.CorpusReport.ksDrift(a, a).collect().head
    assert(same.getDouble(2) == 0.0 && same.getLong(3) == 1L)

    val b = Seq((3L, "w w w w w"), (4L, "w w w w w")).toDF("doc_id", "text")
    val far = graft.pipeline.CorpusReport.ksDrift(a, b).collect().head
    assert(far.getDouble(2) == 1.0,
      "disjoint length supports must give the maximal statistic")
    assert(far.getLong(3) == 2L,
      "the gap is maximal once all of A has accumulated (v=2)")
  }

  test("lexicalScreen: per-flag counts and the kept set, hand-computed") {
    // doc k has k distinct tokens -> H = log2(k); plus one 100-token
    // monotone doc. Lengths (1..7, 100): med 4.5, MAD 2.0, fence
    // [-1.5, 10.5] -> only the 100-doc is a length outlier. Entropy
    // floor 2.0 (strict <) flags k = 1, 2, 3 and the monotone doc.
    val docs = (1 to 7).map(k =>
      (k.toLong, "en", (1 to k).map(i => s"t$i").mkString(" "))) :+
      (8L, "en", Seq.fill(100)("w").mkString(" "))
    val r = graft.pipeline.Sampling.lexicalScreen(
      docs.toDF("doc_id", "lang", "text"),
      z = 3.0, entropyFloor = 2.0, gainFloor = -1.0).collect().head
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 8L, "n_docs")
    assert(r.getLong(2) == 1L, "exactly the 100-token doc is length-out")
    assert(r.getLong(3) == 4L, "H < 2 for k=1,2,3 and the monotone doc")
    assert(r.getLong(4) == 0L, "gain floor disabled")
    assert(r.getLong(5) == 4L, "k=4..7 survive both fences")
    assert(r.getDouble(6) == 0.5)
  }

  test("qualityOutlierReport: uniform lengths flag nothing") {
    val docs = (1 to 10).map(i => (i.toLong, "de", "a b c"))
      .toDF("doc_id", "lang", "text")
    val r = CorpusReport.qualityOutlierReport(docs, z = 3.0).collect().head
    assert((r.getLong(4), r.getLong(5)) == ((0L, 0L)))
    assert(r.getDouble(3) == 0.0, "MAD of constant lengths is 0")
  }
}
