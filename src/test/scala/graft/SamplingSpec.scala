package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sampling
import graft.sim.WarehouseSim

/** Deterministic sampling / split / mixing invariants: stability across
  * re-runs and repartitioning, rate accuracy, nested samples, disjoint-
  * exhaustive splits, exact stratified counts. */
class SamplingSpec extends TestBase {

  private val sfDir = "/root/testdata/sf0.01"
  private def docs = WarehouseSim.read(spark, sfDir, "documents")

  test("deterministic sample: same rows on re-run and after repartitioning") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(17), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample changed under repartitioning")
    assert(a.nonEmpty)
  }

  test("deterministic sample: rate is honored within binomial noise") {
    val n = docs.count()
    val k = Sampling.deterministicSample(docs, "doc_id", 0.25).count()
    // 4 sigma of Binomial(n, .25)
    val sigma = math.sqrt(n * 0.25 * 0.75)
    assert(math.abs(k - n * 0.25) <= 4 * sigma + 1,
      s"kept $k of $n at rate 0.25")
  }

  test("same-salt samples nest: rate 0.1 is a subset of rate 0.3") {
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("different salts draw (near-)independent samples") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.5, "saltA")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.5, "saltB")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val n = docs.count().toDouble
    val overlap = a.intersect(b).size
    // expected overlap n/4; 4-sigma band
    assert(math.abs(overlap - n / 4) <= 4 * math.sqrt(n) + 1,
      s"overlap $overlap of $n")
  }

  test("split assignment is total, disjoint, and roughly proportioned") {
    val split = docs.select(col("doc_id"),
      Sampling.assignSplit(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("s"))
    val counts = split.groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(counts.values.sum == n, "splits must partition the corpus")
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > n * 6 / 10, s"train too small: $counts")
    assert(counts("val") < n / 4 && counts("test") < n / 4, counts.toString)
  }

  test("weighted mix honors per-source rates") {
    val mixed = Sampling.weightedMix(docs, "source",
      Map("src0" -> 0.0, "src1" -> 1.0), defaultRate = 0.5)
    val bySrc = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src0"), "rate-0 source must vanish")
    val src1Total = docs.filter(col("source") === "src1").count()
    assert(bySrc("src1") == src1Total, "rate-1 source must be complete")
    val otherTotal = docs.filter(!col("source").isin("src0", "src1")).count()
    val otherKept = bySrc.filterNot(kv => kv._1 == "src1").values.sum
    assert(math.abs(otherKept - otherTotal / 2.0) <=
      4 * math.sqrt(otherTotal) + 1, s"default-rate strata: $bySrc")
  }

  test("cluster-balanced sample: singletons always keep; members keep at 1/size exactly") {
    import spark.implicits._
    // clique {1,2,3,4} (pairwise near-dups) + singletons 10..29
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val docs = (Seq(1L, 2L, 3L, 4L) ++ (10L to 29L)).toDF("doc_id")
    val out = Sampling.clusterBalancedSample(docs, pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every singleton keeps (hash * 1 < 2^32 always) with itself as cluster
    (10L to 29L).foreach(id => assert(out(id) == ((id, 1L)), s"singleton $id"))
    // clique members keep iff hash32(id) * 4 < 2^32 — recompute the exact rule
    val expectKept = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
      .filter(Sampling.hash32(col("doc_id"), "cbal") * lit(4L) <
        lit(Sampling.HashSpace))
      .as[Long].collect().toSet
    assert(out.keySet.filter(_ <= 4L) == expectKept)
    expectKept.foreach(id => assert(out(id) == ((1L, 4L))))
  }

  test("unimax allocation: water-filling caps small sources and cascades the leftover") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(10), "A"), (2L, words(100), "B"), (3L, words(1000), "C")
    ).toDF("doc_id", "text", "source")
    // budget 600, maxEpochs 2, ascending fold:
    //  A: quota 600/3=200, cap 20   -> 20,  left 580
    //  B: quota 580/2=290, cap 200  -> 200, left 380
    //  C: quota 380/1=380, cap 2000 -> 380
    val out = Sampling.unimaxAllocation(docs, budget = 600L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out("A") == ((10L, 20L, 2.0)), "small source capped at maxEpochs")
    assert(out("B") == ((100L, 200L, 2.0)), "cascaded leftover lifts B to its cap")
    assert(out("C") == ((1000L, 380L, 0.38)), "largest source absorbs the rest")
    assert(out.values.map(_._2).sum == 600L, "budget fully spent when demand exceeds it")
  }

  test("token-budget mix hits each stratum's token budget in expectation") {
    val withTok = docs.select(col("source"), col("doc_id"),
      size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))
        .cast("long").as("n_tok"))
    val totals = withTok.groupBy("source").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = Map(
      "src0" -> totals("src0") / 4, // downsample to a quarter
      "src1" -> totals("src1") * 2) // over-budget → keep whole
    val mixed = Sampling.tokenBudgetMix(withTok, "source", "n_tok", budgets)
    val got = mixed.groupBy("source").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate-1 strata (absent or over-budget) keep every token
    assert(got("src1") == totals("src1"))
    assert(got("src2") == totals("src2"))
    // the downsampled stratum lands near its budget (Bernoulli on docs:
    // generous 3-sigma-ish band for a ~25-doc stratum)
    val target = budgets("src0").toDouble
    assert(math.abs(got.getOrElse("src0", 0L) - target) <= target,
      s"src0 kept ${got.get("src0")} of budget $target")
  }

  test("temperature mix: alpha=1 is proportional, alpha<1 flattens toward small strata") {
    val withTok = docs.select(col("source"), col("doc_id"),
      size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))
        .cast("long").as("n_tok"))
    val totals = withTok.groupBy("source").agg(sum("n_tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = totals.values.sum / 3
    def share(alpha: Double): Map[String, Double] = {
      val got = Sampling.temperatureMix(withTok, "source", "n_tok", alpha, budget)
        .groupBy("source").agg(sum("n_tok").as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val tot = got.values.sum.toDouble
      got.map { case (s, t) => s -> t / tot }
    }
    // alpha=1: every stratum sampled at the same rate -> kept shares track
    // corpus shares (generous band: Bernoulli on few-hundred-doc strata)
    val prop = share(1.0)
    val corpusShare = totals.map { case (s, t) =>
      s -> t.toDouble / totals.values.sum }
    prop.foreach { case (s, p) =>
      assert(math.abs(p - corpusShare(s)) < 0.12, s"alpha=1 $s: $p vs $corpusShare") }
    // alpha<1: the smallest stratum's share must strictly rise
    val smallest = totals.minBy(_._2)._1
    val flat = share(0.3)
    assert(flat(smallest) > prop(smallest),
      s"flattening did not boost $smallest: $flat vs $prop")
    // total kept tokens ~ budget for alpha=1 (all rates < 1 there)
    val keptTotal = Sampling.temperatureMix(withTok, "source", "n_tok", 1.0, budget)
      .agg(sum("n_tok")).head().getLong(0)
    assert(math.abs(keptTotal - budget.toDouble) < 0.35 * budget,
      s"kept $keptTotal vs budget $budget")
  }

  test("stratified sample: exactly n per stratum (or the whole stratum)") {
    val out = Sampling.stratifiedSample(docs, "source", 5)
    val sizes = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == full.keySet)
    sizes.foreach { case (src, k) =>
      assert(k == math.min(5L, full(src)), s"$src: $k of ${full(src)}")
    }
    // deterministic: second run picks the same rows
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(docs.repartition(13), "source", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("domainReweight: structured domain (bigram headroom) is upweighted; weights sum to 1") {
    import spark.implicits._
    // Domain "pat": every doc cycles the same 20-token sequence — the
    // unigram LM sees a flat 1/20 distribution (high NLL) but the
    // bigram successor is deterministic => large excess loss.
    // Domain "mix": the SAME flat unigram distribution, but each doc
    // cycles its OWN deterministic shuffle — successors disagree across
    // docs, so bigrams carry much less signal => smaller excess.
    val vocab = (1 to 20).map(i => s"v$i")
    val pat = (1L to 6L).map(i =>
      (i, Seq.fill(3)(vocab).flatten.mkString(" "), "pat"))
    val mix = (11L to 16L).map { i =>
      val perm = new scala.util.Random(i).shuffle(vocab)
      (i, Seq.fill(3)(perm).flatten.mkString(" "), "mix")
    }
    val docs = (pat ++ mix).toDF("doc_id", "text", "source")
    val out = Sampling.domainReweight(docs).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(5), r.getDouble(6))).toMap
    val (patShare, patExcess, patW) = out("pat")
    val (_, mixExcess, mixW) = out("mix")
    assert(patExcess > mixExcess,
      s"alternating domain must show more bigram headroom: $patExcess vs $mixExcess")
    assert(patW > patShare,
      s"excess-rich domain must be upweighted over its share: $patW vs $patShare")
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-4,
      s"weights must sum to ~1: ${out.values.map(_._3).sum}")
  }

  test("tokenBudgetSelect: budget respected, higher buckets kept whole, " +
      "boundary cut is a greedy prefix") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (0 until 300).map(i =>
      (i.toLong, ((i * 37 % 100) / 100.0), (10L + i % 50)))
      .toDF("doc_id", "quality", "n_tokens")
    val budget = 2000L
    val kept = Sampling.tokenBudgetSelect(docs, budget, buckets = 16)
      .select("doc_id", "quality", "n_tokens", "bkt")
      .as[(Long, Double, Long, Long)].collect()
    val keptIds = kept.map(_._1).toSet
    assert(kept.map(_._3).sum <= budget)
    // buckets strictly above the lowest kept bucket are kept in full
    val minKeptB = kept.map(_._4).min
    val all = docs.withColumn("bkt",
        least(floor(col("quality") * 16).cast("long"), lit(15L)))
      .as[(Long, Double, Long, Long)].collect()
    all.filter(_._4 > minKeptB).foreach(d =>
      assert(keptIds.contains(d._1), s"doc ${d._1} in higher bucket dropped"))
    // within the boundary bucket the kept set is the strict running-sum
    // PREFIX of the (q desc, id) order: everything before the first
    // overflow kept, everything from it on dropped (prefix cut, not
    // first-fit — whole-doc granularity, documented)
    val boundary = all.filter(_._4 == minKeptB)
      .sortBy(d => (-d._2, d._1))
    val keptTokensInBoundary = kept.filter(_._4 == minKeptB).map(_._3).sum
    val rem = budget - all.filter(_._4 > minKeptB).map(_._3).sum
    val cums = boundary.scanLeft(0L)(_ + _._3).tail
    val prefix = boundary.zip(cums).takeWhile(_._2 <= rem).map(_._1)
    boundary.foreach { d =>
      val expect = prefix.exists(_._1 == d._1)
      assert(keptIds.contains(d._1) == expect,
        s"boundary doc ${d._1}: kept=${keptIds.contains(d._1)} expect=$expect")
    }
    assert(prefix.map(_._3).sum === keptTokensInBoundary)

    // degenerate budgets
    assert(Sampling.tokenBudgetSelect(docs, 0L, 16).count() === 0)
    val total = docs.agg(sum("n_tokens")).collect().head.getLong(0)
    assert(Sampling.tokenBudgetSelect(docs, total, 16).count() === 300)
  }

  test("stratifiedSampleAgg selects bit-identically to the window form") {
    import org.apache.spark.sql.functions._
    val docs = graft.sim.WarehouseSim
      .read(spark, "/root/testdata/sf0.001", "documents")
      .repartition(13) // force the heap's serialize/merge partial path
    for (n <- Seq(1, 5, 10000)) { // incl. n > every stratum size
      val win = Sampling.stratifiedSample(docs, "source", n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val agg = Sampling.stratifiedSampleAgg(docs, "source", n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(agg === win, s"window/heap divergence at n=$n")
    }
  }

  test("stratifiedSampleAgg handles string doc_ids (no numeric-id assumption)") {
    // The heap form must not require a numeric idCol: the selection rule
    // (smallest salted hash, native id tie-break) is type-agnostic via
    // bottomk's natural struct ordering. Pin window/heap equality on a
    // string id column, including hash-collision tie-breaks on the id.
    import org.apache.spark.sql.functions._
    val docs = graft.sim.WarehouseSim
      .read(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("sid", concat(lit("doc-"), col("doc_id")))
      .repartition(13)
    for (n <- Seq(1, 7)) {
      val win = Sampling.stratifiedSample(docs, "source", n, idCol = "sid")
        .select("sid").collect().map(_.getString(0)).toSet
      val agg = Sampling.stratifiedSampleAgg(docs, "source", n, idCol = "sid")
        .select("sid").collect().map(_.getString(0)).toSet
      assert(agg === win, s"window/heap divergence at n=$n on string ids")
    }
  }
}
