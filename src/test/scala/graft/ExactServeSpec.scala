package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sim.WarehouseSim

/**
 * The radius-bounded EXACT serve ([[Similarity.exactIndexedTopK]]):
 * certified equality with brute force on every lifecycle state
 * (build / extend / delete / compact / filtered), demonstrable pruning
 * on clustered data (the point of the bound), the radii sidecar's
 * maintenance invariant, and the legacy-index refusal + backfill path.
 */
class ExactServeSpec extends TestBase
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = WarehouseSim.read(spark, sfDir, "embeddings")

  /** Deterministic well-separated clusters: `n` points in `dim` dims,
    * cluster c centered at 10·c on every axis, members jittered by a
    * hash-derived offset in [0, 1) — tight cells, far apart, so the
    * triangle bound must prune almost everything. */
  private def clustered(n: Int, clusters: Int, dim: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % clusters
      val v = (0 until dim).map { d =>
        10.0 * c + ((i * 31 + d * 7) % 97) / 97.0
      }.toArray
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def posNorm(df: DataFrame): DataFrame = {
    val n = sqrt(aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")),
      lit(0.0), (a, x) => a + x))
    df.filter(n > 0)
  }

  private def assertSame(actual: DataFrame, expected: DataFrame,
      hint: String): Unit = {
    val a = actual.select("q_id", "c_id", "cos_sim", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    val e = expected.select("q_id", "c_id", "cos_sim", "rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == e.toSeq, hint)
  }

  test("exact serve equals brute force on the real embeddings " +
      "(seedProbe 1 and 3, several k)") {
    val dir = tmpDir("exact-serve").toString
    Similarity.buildIvfIndex(emb, dir, kCells = 8, iters = 2)
    val q = emb.filter(col("vec_id") < 8)
    for (k <- Seq(1, 5); sp <- Seq(1, 3)) {
      assertSame(
        Similarity.exactIndexedTopK(spark, q, dir, k = k, seedProbe = sp),
        Similarity.bruteForceTopK(posNorm(q), posNorm(emb), k),
        s"k=$k seedProbe=$sp must equal brute force")
    }
  }

  test("pruning is real on clustered data: the final scan reads fewer " +
      "files than the corpus holds") {
    val data = clustered(300, 6, 8)
    val dir = tmpDir("exact-prune").toString
    Similarity.buildIvfIndex(data, dir, kCells = 6, iters = 2)
    val q = data.filter(col("vec_id") < 4)
    val topk = Similarity.exactIndexedTopK(spark, q, dir, k = 3)
    assertSame(topk, Similarity.bruteForceTopK(q, data, 3),
      "clustered exact serve must equal brute force")
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    val filesTotal = walk(new java.io.File(s"$dir/corpus"))
    val corpusScans = collectWithSubqueries(
        topk.queryExecution.executedPlan) {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("corpus")) => f
    }
    assert(corpusScans.nonEmpty, "plan must scan the corpus")
    corpusScans.foreach { s =>
      val read = s.metrics("numFiles").value
      assert(read < filesTotal,
        s"with 6 well-separated clusters the bound must prune: " +
          s"read $read of $filesTotal files")
    }
  }

  test("exact serve composes with a where pre-filter: equals brute " +
      "force over the filtered corpus") {
    val dir = tmpDir("exact-where").toString
    Similarity.buildIvfIndex(emb, dir, kCells = 8, iters = 2,
      attrCols = Seq("label"))
    val q = emb.filter(col("vec_id") < 6)
    assertSame(
      Similarity.exactIndexedTopK(spark, q, dir, k = 4,
        where = Some(col("label") % 2 === 0)),
      Similarity.bruteForceTopK(posNorm(q),
        posNorm(emb.filter(col("label") % 2 === 0)), 4),
      "filtered exact serve must equal brute force over the filter")
  }

  test("full lifecycle stays exact: build -> extend -> delete -> " +
      "compact -> extend; radii fold to batch 0 on compaction") {
    import spark.implicits._
    val data = clustered(400, 5, 8)
    val dir = tmpDir("exact-life").toString
    Similarity.buildIvfIndex(data.filter(col("vec_id") < 200), dir,
      kCells = 5, iters = 2)
    Similarity.extendIvfIndex(
      data.filter(col("vec_id") >= 200 && col("vec_id") < 300), dir)
    val deleted = Similarity.deleteFromIvfIndex(spark, dir,
      (0L until 50L).toDF("vec_id"))
    assert(deleted == 50)
    Similarity.compactIvfIndex(spark, dir)
    val batches = new java.io.File(s"$dir/radii").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(batches == Seq("batch=0"),
      s"compaction must fold radii to batch 0, got $batches")
    Similarity.extendIvfIndex(data.filter(col("vec_id") >= 300), dir)
    val live = data.filter(col("vec_id") >= 50)
    val q = data.filter(col("vec_id") >= 50 && col("vec_id") < 54)
    assertSame(
      Similarity.exactIndexedTopK(spark, q, dir, k = 3),
      Similarity.bruteForceTopK(q, live, 3),
      "post-lifecycle exact serve must equal brute force on the " +
        "surviving corpus")
  }

  test("zero-norm vectors: dropped as candidates, unprunable-cell " +
      "radii stay NULL-safe") {
    import spark.implicits._
    // two mirrored points force a zero-vector centroid for their cell
    // (unprunable, radius NULL); a zero-norm member must never surface
    val rows = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(-1.0, 0.0)), // mirror pair
      (2L, Array(0.0, 0.0)),                          // zero-norm member
      (3L, Array(5.0, 5.0)), (4L, Array(5.1, 5.0)), (5L, Array(5.0, 5.1)))
    val data = rows.toDF("vec_id", "embedding")
    val dir = tmpDir("exact-zero").toString
    Similarity.buildIvfIndex(data, dir, kCells = 2, iters = 2)
    val q = data.filter(col("vec_id").isin(0L, 3L))
    val got = Similarity.exactIndexedTopK(spark, q, dir, k = 5)
    assertSame(got,
      Similarity.bruteForceTopK(posNorm(q), posNorm(data), 5),
      "zero-norm-adjacent exact serve must equal positive-norm brute force")
    assert(!got.select("c_id").collect().map(_.getLong(0)).contains(2L),
      "a zero-norm vector has no direction and must never be returned")
  }

  test("exact serve over a QUANTIZED index still equals brute force " +
      "(the raw column is the rescore source; codes are ignored)") {
    val dir = tmpDir("exact-pq").toString
    Similarity.buildIvfIndex(emb, dir, kCells = 8, iters = 2,
      codec = "pq", pqM = 8, pqKs = 16, pqIters = 1)
    val q = emb.filter(col("vec_id") < 5)
    assertSame(
      Similarity.exactIndexedTopK(spark, q, dir, k = 4),
      Similarity.bruteForceTopK(posNorm(q), posNorm(emb), 4),
      "exactness must be codec-independent")
  }

  test("legacy index (no radii sidecar) refuses loudly; " +
      "backfillIvfRadii upgrades it") {
    val dir = tmpDir("exact-legacy").toString
    Similarity.buildIvfIndex(emb, dir, kCells = 8, iters = 2)
    // simulate a pre-radii index
    val rp = new org.apache.hadoop.fs.Path(s"$dir/radii")
    rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(rp, true)
    val q = emb.filter(col("vec_id") < 2)
    val ex = intercept[IllegalArgumentException] {
      Similarity.exactIndexedTopK(spark, q, dir, k = 3)
    }
    assert(ex.getMessage.contains("backfillIvfRadii"),
      s"refusal must point at the upgrade path, got: ${ex.getMessage}")
    // a legacy-index admission must NOT create a partial radii sidecar
    Similarity.extendIvfIndex(
      emb.filter(col("vec_id") < 0), dir, batchId = Some(1L),
      allowReplay = true)
    assert(!new java.io.File(s"$dir/radii").exists(),
      "extend on a radii-less index must not write a partial sidecar")
    Similarity.backfillIvfRadii(spark, dir)
    assertSame(
      Similarity.exactIndexedTopK(spark, q, dir, k = 3),
      Similarity.bruteForceTopK(posNorm(q), posNorm(emb), 3),
      "backfilled exact serve must equal brute force")
  }

  test("radii opt-out: a radii=false admission leaves a coverage gap " +
      "the serve refuses loudly; backfill closes it") {
    val data = clustered(200, 4, 8)
    val dir = tmpDir("exact-optout").toString
    Similarity.buildIvfIndex(data.filter(col("vec_id") < 150), dir,
      kCells = 4, iters = 2)
    Similarity.extendIvfIndex(data.filter(col("vec_id") >= 150), dir,
      radii = false)
    val q = data.filter(col("vec_id") < 3)
    val ex = intercept[IllegalArgumentException] {
      Similarity.exactIndexedTopK(spark, q, dir, k = 3)
    }
    assert(ex.getMessage.contains("does not cover corpus") &&
      ex.getMessage.contains("batch=1"), ex.getMessage)
    Similarity.backfillIvfRadii(spark, dir)
    assertSame(
      Similarity.exactIndexedTopK(spark, q, dir, k = 3),
      Similarity.bruteForceTopK(q, data, 3),
      "backfill must restore exactness over the full corpus")
    // a radii=false BUILD deletes the sidecar outright
    Similarity.buildIvfIndex(data, dir, kCells = 4, iters = 2,
      radii = false)
    assert(!new java.io.File(s"$dir/radii").exists())
  }

  test("extend replay overwrites its own radii rows (idempotent)") {
    val data = clustered(200, 4, 8)
    val dir = tmpDir("exact-replay").toString
    Similarity.buildIvfIndex(data.filter(col("vec_id") < 150), dir,
      kCells = 4, iters = 2)
    val batch = data.filter(col("vec_id") >= 150)
    Similarity.extendIvfIndex(batch, dir, batchId = Some(1L))
    val first = spark.read.parquet(s"$dir/radii")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    Similarity.extendIvfIndex(batch, dir, batchId = Some(1L),
      allowReplay = true)
    val second = spark.read.parquet(s"$dir/radii")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(first == second, "a replayed admission must leave radii " +
      "bit-identical, not duplicated")
  }
}
