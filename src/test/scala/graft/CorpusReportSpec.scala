package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusReport, Sampling}
import graft.sim.WarehouseSim

/** Data-card rollup + curation-diff invariants (the oracle twins verify
  * exact values; these pin the marginal arithmetic and the flag
  * semantics). */
class CorpusReportSpec extends TestBase {

  private lazy val docs =
    WarehouseSim.read(spark, "/root/testdata/sf0.001", "documents")

  test("dataCard: marginals are consistent with the full matrix") {
    val card = CorpusReport.dataCard(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cells = card.filter { case ((l, s), _) => l != "ALL" && s != "ALL" }
    val total = card(("ALL", "ALL"))
    assert(cells.values.map(_._1).sum == total._1, "doc counts must roll up")
    assert(cells.values.map(_._3).sum == total._3, "token counts must roll up")
    card.foreach { case (k, (n, u, _)) =>
      assert(u <= n && u > 0, s"$k: n_unique $u must be in (0, $n]")
    }
    // lang marginal = sum of its row
    val langs = cells.keySet.map(_._1)
    langs.foreach { l =>
      assert(card((l, "ALL"))._1 ==
        cells.filter(_._1._1 == l).values.map(_._1).sum)
    }
  }

  test("dataCardDiff: removed = before - after; an all-true flag removes nothing") {
    val flagged = docs.withColumn("kept", col("doc_id") % 3 =!= 0)
    val diff = CorpusReport.dataCardDiff(flagged, col("kept")).collect()
    diff.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
      assert(r.getLong(7) == r.getLong(5) - r.getLong(6))
      assert(r.getLong(3) <= r.getLong(2))
    }
    val total = diff.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    assert(total.getLong(4) > 0, "the mod-3 flag must remove some docs")
    val none = CorpusReport.dataCardDiff(docs.withColumn("kept", lit(true)),
      col("kept")).collect()
    assert(none.forall(r => r.getLong(4) == 0 && r.getLong(7) == 0))
  }

  test("qualityWeightedSample: decision replays from the published rate; floor honored") {
    val kept = Sampling.qualityWeightedSample(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(kept.nonEmpty && kept.length < docs.count())
    kept.foreach { case (_, score, rate) =>
      assert(rate >= 0.05 && rate <= 1.0)
      assert(rate >= BigDecimal(score).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble - 1e-9)
    }
    // the keep decision is exactly hash32 < round(rate * 2^32)
    val ids = kept.map(_._1).toSet
    val replay = docs.select(col("doc_id"),
        Sampling.hash32(col("doc_id"), "qsamp").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    kept.foreach { case (id, _, rate) =>
      assert(replay(id) < math.round(rate * Sampling.HashSpace.toDouble),
        s"doc $id kept but hash ${replay(id)} >= threshold for rate $rate")
    }
    // deterministic: a rerun over a repartitioned input picks the same set
    val again = Sampling.qualityWeightedSample(docs.repartition(13))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
  }

  test("dataCardApprox: HLL cells inside the rsd envelope, exact columns equal") {
    val docs = graft.sim.WarehouseSim
      .read(spark, "/root/testdata/sf0.001", "documents")
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1))
    val exact = CorpusReport.dataCard(docs).collect()
      .map(r => key(r) -> r).toMap
    val approx = CorpusReport.dataCardApprox(docs).collect()
      .map(r => key(r) -> r).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // non-estimate columns are bit-equal
      Seq(2, 4, 5, 6, 7).foreach(i =>
        assert(a.getLong(i) === e.getLong(i), s"cell $k col $i"))
      // the HLL estimate stays within 4x the 5% rsd of the exact distinct
      val ex = e.getLong(3).toDouble
      assert(math.abs(a.getLong(3) - ex) <= math.max(1.0, 0.2 * ex),
        s"cell $k approx ${a.getLong(3)} vs exact $ex")
    }
  }

  test("statsState merge: additive columns bit-equal to the one-shot card, " +
      "HLL estimate inside the envelope, merge associative") {
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1))
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
    val c = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
    def st(d: org.apache.spark.sql.DataFrame) = CorpusReport.statsState(d)
    val merged = CorpusReport.mergeStatsState(
      CorpusReport.mergeStatsState(st(a), st(b)), st(c))
    val oneShot = CorpusReport.statsState(docs)

    val m = CorpusReport.renderState(merged).collect()
      .map(r => key(r) -> r.toSeq).toMap
    val o = CorpusReport.renderState(oneShot).collect()
      .map(r => key(r) -> r.toSeq).toMap
    assert(m.keySet === o.keySet)
    m.keys.foreach { k =>
      // additive columns (all but the index-3 estimate) bit-equal
      Seq(2, 4, 5, 6, 7).foreach(i =>
        assert(m(k)(i) === o(k)(i), s"cell $k col $i"))
      // merged-sketch estimate within the envelope of the exact distinct
      val exact = docs.filter(col("lang") === k._1 && col("source") === k._2)
        .select(graft.pipeline.TextAnalysis.fingerprint(col("text")))
        .distinct().count().toDouble
      assert(math.abs(m(k)(3).asInstanceOf[Long] - exact)
        <= math.max(1.0, 0.2 * exact), s"cell $k est ${m(k)(3)} vs $exact")
      // merged KLL p50 is an ORDER STATISTIC (no interpolation): it
      // must be an actual cell value whose rank sits at the median
      // within the sketch tolerance (±1 for the tiny sf0.001 cells)
      val vals = docs.filter(col("lang") === k._1 && col("source") === k._2)
        .select("n_chars").collect().map(_.getLong(0)).sorted
      val p50 = m(k)(8).asInstanceOf[Long]
      assert(vals.contains(p50), s"cell $k p50 $p50 not a data value")
      val rank = vals.count(_ <= p50)
      val tol = math.max(1.0, 0.02 * vals.length)
      assert(math.abs(rank - 0.5 * vals.length) <= tol + 1,
        s"cell $k p50 $p50 rank $rank of ${vals.length}")
    }
    // associativity: the other grouping renders the same card
    val merged2 = CorpusReport.mergeStatsState(
      st(a), CorpusReport.mergeStatsState(st(b), st(c)))
    val m2 = CorpusReport.renderState(merged2).collect()
      .map(r => key(r) -> r.toSeq).toMap
    assert(m === m2)
  }

  test("sourceVennSketch lands inside the envelope of the exact venn") {
    import graft.pipeline.Dedup
    val exact = Dedup.sourceVenn(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    val est = Dedup.sourceVennSketch(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (2 to 6).map(r.getLong)).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, e) =>
      exact(k).zip(e).zipWithIndex.foreach { case ((ex, ap), i) =>
        assert(math.abs(ap - ex) <= math.max(2.0, 0.2 * ex),
          s"pair $k col $i est $ap vs exact $ex")
      }
    }
  }
}
