package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusReport

/** Exact-moment correlation matrix ([[CorpusReport.corrMatrix]]):
  * known correlations, partitioning invariance (the point of exact
  * integer moments), and pair ordering. */
class CorrMatrixSpec extends TestBase {

  import spark.implicits._

  private lazy val data = (1L to 5000L).map { i =>
    val x = ((i * 7919) % 1000).toDouble / 10.0
    (i, x, 2.0 * x + 5.0, -x, ((i * 104729) % 1000).toDouble / 10.0)
  }.toDF("id", "x", "lin", "neg", "ind")

  private def corrs(df: org.apache.spark.sql.DataFrame) =
    CorpusReport.corrMatrix(df, Seq("x", "lin", "neg", "ind"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(2)).toMap

  test("known correlations: +1 for affine, -1 for negated, ~0 for " +
      "an unrelated hash sequence") {
    val c = corrs(data)
    assert(c(("x", "lin")) == 1.0)
    assert(c(("x", "neg")) == -1.0)
    assert(math.abs(c(("x", "ind"))) < 0.15,
      s"independent-ish pair: ${c(("x", "ind"))}")
    assert(c.keySet.size == 6, "4 columns -> 6 unordered pairs")
  }

  test("partitioning cannot move the result (exact integer moments)") {
    val base = corrs(data)
    for (p <- Seq(1, 7, 32)) {
      assert(corrs(data.repartition(p)) == base,
        s"repartition($p) must be bit-identical")
    }
  }
}
