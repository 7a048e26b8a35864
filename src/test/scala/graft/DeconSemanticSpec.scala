package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Decontamination, Similarity}
import graft.sim.WarehouseSim

/** Semantic decontamination: planted paraphrase-twins flag at their
  * cosine, sub-threshold and cross-cell pairs stay silent, zero-norm
  * vectors drop. */
class DeconSemanticSpec extends TestBase {
  import spark.implicits._

  private def vecs(rows: (Long, Int, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "label", "embedding")

  test("plants flag, sub-threshold and cross-cell stay silent, zero-norm drops") {
    val corpus = vecs(
      (1L, 0, Seq(1f, 0f, 0f)),   // identical twin of bench 100 → cos 1.0
      (2L, 0, Seq(0f, 1f, 0f)),   // orthogonal to bench 100 → cos 0.0
      (3L, 1, Seq(1f, 0f, 0f)),   // same direction but DIFFERENT cell
      (4L, 0, Seq(0f, 0f, 0f)),   // zero-norm: dropped
      (5L, 0, Seq(0.9f, 0.1f, 0f))) // high-cos paraphrase shape
    val bench = vecs(
      (100L, 0, Seq(1f, 0f, 0f)),
      (101L, 2, Seq(0f, 0f, 1f))) // cell nobody probes
    val got = Decontamination.semanticOverlaps(corpus, bench, tau = 0.8)
      .select("corpus_id", "bench_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(t => (t._1, t._2)) === Set((1L, 100L), (5L, 100L)),
      s"exactly the planted twins must flag: $got")
    assert(got.find(_._1 == 1L).get._3 === 1.0)
    // the sub-threshold pair exists in the same cell but stays silent
    val loose = Decontamination.semanticOverlaps(corpus, bench, tau = -1.0)
      .select("corpus_id").as[Long].collect().toSet
    assert(loose === Set(1L, 2L, 5L),
      "cell bounds candidates; zero-norm and cross-cell never pair")
  }

  test("screen-against-index: indexed decon equals the label-free twin " +
      "built from the same sidecar assignment") {
    import org.apache.spark.sql.DataFrame
    val emb = WarehouseSim.read(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter(col("vec_id") % 7 =!= 0)
    val bench = emb.filter(col("vec_id") % 7 === 0)
    val dir = tmpDir("decon-idx").toString
    Similarity.buildIvfIndex(corpus, dir, kCells = 8, iters = 2)
    val got = Decontamination
      .semanticOverlapsIndexed(spark, dir, bench, tau = 0.3)
      .select("corpus_id", "bench_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    // the reference twin: assign BOTH sides with the same persisted
    // sidecar, then run the caller-supplied-cell operator on that column
    def assigned(df: DataFrame): DataFrame =
      Similarity.assignWithIndex(df, dir)
        .select(col("vec_id"), col("cell"), col("embedding"))
    val want = Decontamination.semanticOverlaps(
        assigned(corpus), assigned(bench), tau = 0.3, cellCol = "cell")
      .select("corpus_id", "bench_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.nonEmpty, "the fixture must flag at least one pair")
    assert(got === want,
      "the indexed screen must equal assign-then-screen exactly")
  }
}
