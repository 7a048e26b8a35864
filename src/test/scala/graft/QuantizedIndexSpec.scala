package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.pipeline.{Semantic, Similarity}
import graft.sim.WarehouseSim

/**
 * The QUANTIZED persisted IVF index (`buildIvfIndex(codec = "sq8"/
 * "pq")`): codes ride the cell-partitioned corpus as columns, the
 * serve pre-ranks on codes and exact-rescored survivors only touch the
 * raw vectors. Pins:
 *
 *  - exactness envelope: full probe + a candMult wide enough to pass
 *    every candidate EQUALS brute force (pre-rank only prunes — the
 *    [[graft.pipeline.Similarity.sq8TopK]]/pqTopK exactness argument,
 *    carried to the persisted path);
 *  - the lifecycle composes: extend encodes under the PERSISTED
 *    codebook, delete/compact carry codes, the union serves;
 *  - I/O shape: the pre-rank scan's ReadSchema has NO raw-vector
 *    column (parquet's columnar layout is the raw sidecar), and the
 *    re-rank scan pushes the survivor ids into the parquet scan;
 *  - strategy parity: the literal-LUT and explode-join ADC paths, and
 *    the broadcast and shuffle query regimes, return identical top-k.
 */
class QuantizedIndexSpec extends TestBase
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val kCells = 8
  private lazy val emb = WarehouseSim.read(spark, sfDir, "embeddings")
  // wide enough to pass every probed candidate at sf0.001 (500 rows)
  private val passAll = 200

  private def topkSet(df: org.apache.spark.sql.DataFrame) =
    df.select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet

  for (codec <- Seq("sq8", "pq", "pqr")) {
    test(s"$codec: full probe + pass-all candMult equals brute force; " +
        "codes and nrm ride the corpus") {
      val dir = tmpDir(s"ivf-$codec").toString
      Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2,
        codec = codec)
      val corpus = spark.read.parquet(s"$dir/corpus")
      assert(corpus.columns.sorted.toSeq ===
        Seq("batch", "cell", "codes", "embedding", "nrm", "vec_id"))
      assert(corpus.count() === emb.count())
      val q = emb.filter(col("vec_id") < 8)
      val got = topkSet(Similarity.indexedTopK(spark, q, dir, k = 5,
        nprobe = kCells, candMult = passAll))
      val want = topkSet(Similarity.bruteForceTopK(q, emb, 5))
      assert(got === want,
        s"$codec full-probe pass-all serve must equal brute force")
      // the narrow pre-rank is a real pruner: results exist and are
      // the exact ranking's head whenever the pre-rank kept the truth
      assert(Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = 2)
        .count() > 0)
    }

    test(s"$codec: extend encodes under the persisted codec; " +
        "delete + compact carry codes; the composed lifecycle serves") {
      val dir = tmpDir(s"ivf-$codec-life").toString
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 =!= 2), dir,
        kCells = kCells, iters = 2, codec = codec)
      Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 2), dir)
      val n1 = Similarity.deleteFromIvfIndex(spark, dir,
        emb.filter(col("vec_id") % 7 === 0).select("vec_id"))
      assert(n1 > 0)
      Similarity.compactIvfIndex(spark, dir, filesPerCell = 1)
      val corpus = spark.read.parquet(s"$dir/corpus")
      assert(corpus.filter(col("codes").isNull).count() === 0,
        "every surviving row must still carry its codes")
      val surviving = emb.filter(col("vec_id") % 7 =!= 0)
      assert(corpus.count() === surviving.count())
      val q = emb.filter(col("vec_id") < 8)
      val got = topkSet(Similarity.indexedTopK(spark, q, dir, k = 5,
        nprobe = kCells, candMult = passAll))
      val want = topkSet(Similarity.bruteForceTopK(q, surviving, 5))
      assert(got === want,
        s"$codec lifecycle must serve exactly the surviving corpus")
    }
  }

  test("pq: literal-LUT and explode-join ADC paths return identical top-k; " +
      "so do the broadcast and shuffle query regimes") {
    val dir = tmpDir("ivf-pq-parity").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2,
      codec = "pq")
    val q = emb.filter(col("vec_id") < 16)
    def serve() = Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = 3)
      .select("q_id", "c_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val base = serve()
    assert(base.nonEmpty)
    spark.conf.set(Semantic.LiteralAssignMaxKey, "0")
    try {
      // NOTE literalMax=0 also flips probe ranking to the join path —
      // parity here covers the composed above-threshold serve
      assert(serve() === base, "explode-join ADC must equal literal LUT")
    } finally spark.conf.unset(Semantic.LiteralAssignMaxKey)
    spark.conf.set(Similarity.ServeBroadcastMaxQueries, "0")
    try {
      assert(serve() === base, "the shuffle query regime must match")
    } finally spark.conf.unset(Similarity.ServeBroadcastMaxQueries)
  }

  for (codec <- Seq("pq", "pqr"))
  test(s"$codec encode strategies (literal expression vs broadcast join) " +
      "write identical codes, build and admission alike") {
    val dirL = tmpDir(s"$codec-enc-lit").toString
    val dirJ = tmpDir(s"$codec-enc-join").toString
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    def build(dir: String): Unit = {
      Similarity.buildIvfIndex(base, dir, kCells = kCells, iters = 2,
        codec = codec)
      Similarity.extendIvfIndex(fresh, dir)
    }
    build(dirL)
    spark.conf.set(Semantic.LiteralAssignMaxKey, "0")
    try build(dirJ) finally spark.conf.unset(Semantic.LiteralAssignMaxKey)
    // NOTE the coarse ASSIGNMENT strategy also flips with the conf, so
    // cell equality here additionally re-pins AssignStrategySpec's
    // invariant on the codec path
    def codesOf(dir: String): Map[Long, (Int, Seq[Short])] =
      spark.read.parquet(s"$dir/corpus")
        .select(col("vec_id"), col("cell"), col("codes"))
        .as[(Long, Int, Seq[Short])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(codesOf(dirJ) === codesOf(dirL),
      "the encode strategy switch must be semantics-free")
  }

  test("sq8: pre-filter search over attr payload stays exact and " +
      "all-satisfying") {
    val dir = tmpDir("ivf-sq8-attr").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2,
      codec = "sq8", attrCols = Seq("label"))
    val q = emb.filter(col("vec_id") < 8)
    val pred = col("label") <= 3
    val got = topkSet(Similarity.indexedTopK(spark, q, dir, k = 5,
      nprobe = kCells, where = Some(pred), candMult = passAll))
    val want = topkSet(
      Similarity.bruteForceTopK(q, emb.filter(pred), 5))
    assert(got === want,
      "filtered quantized full-probe must equal brute force over the " +
        "filtered candidates")
  }

  test("I/O shape: the pre-rank scan never reads the raw vectors; the " +
      "re-rank scan pushes the survivor ids") {
    val dir = tmpDir("ivf-pq-io").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2,
      codec = "pq")
    val scans = new ConcurrentLinkedQueue[(String, String)]()
    val listener = new QueryExecutionListener {
      private def grab(qe: QueryExecution): Unit =
        collectWithSubqueries(qe.executedPlan) {
          case f: FileSourceScanExec
              if f.relation.location.rootPaths.exists(
                _.toString.contains("corpus")) =>
            scans.add((f.schema.fieldNames.mkString(","),
              f.metadata.getOrElse("PushedFilters", "")))
        }
      override def onSuccess(name: String, qe: QueryExecution,
          duration: Long): Unit = grab(qe)
      override def onFailure(name: String, qe: QueryExecution,
          error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val topk = try {
      val t = Similarity.indexedTopK(spark,
        emb.filter(col("vec_id") < 4), dir, k = 5, nprobe = 2)
      t.collect() // the final (re-rank) plan executes here
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline &&
          (scans.size() < 2 || scans.size() != last)) {
        last = scans.size()
        Thread.sleep(200)
      }
      t
    } finally spark.listenerManager.unregister(listener)
    val all = scans.toArray(Array.empty[(String, String)])
    val preRank = all.filter(s => s._1.contains("codes"))
    assert(preRank.nonEmpty, s"the codes scan must be observed: $all")
    assert(preRank.forall(!_._1.contains("embedding")),
      s"the pre-rank scan must never read the raw column: $preRank")
    // the re-rank plan is the returned frame: raw column read under a
    // pushed survivor-id filter, partition-pruned to the probed cells
    val rescore = collectWithSubqueries(topk.queryExecution.executedPlan) {
      case f: FileSourceScanExec
          if f.schema.fieldNames.contains("embedding") &&
            f.relation.location.rootPaths.exists(
              _.toString.contains("corpus")) => f
    }
    assert(rescore.nonEmpty, "the re-rank raw scan must exist")
    assert(rescore.forall(f =>
      f.metadata.getOrElse("PushedFilters", "").contains("vec_id")),
      s"survivor ids must push into the raw scan: " +
        s"${rescore.map(_.metadata.getOrElse("PushedFilters", ""))}")
    assert(rescore.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "cell"))),
      "the re-rank scan must stay partition-pruned to the probed cells")
  }

  test("pq trainFraction: the codebook comes from the deterministic " +
      "sample; the encode still covers everyone") {
    val dir = tmpDir("ivf-pq-tf").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2,
      codec = "pq", trainFraction = 0.5)
    // replayable-by-construction: a codebook trained at fraction 0.5
    // equals the codebook of an index BUILT on that same deterministic
    // sample (the pq training set is the sample's positive-norm rows
    // either way; the coarse centroids may differ — only the codebook
    // sidecars are compared)
    val dir2 = tmpDir("ivf-pq-tf2").toString
    Similarity.buildIvfIndex(
      graft.pipeline.Sampling.deterministicSample(emb, "vec_id", 0.5,
        "pqtrain"),
      dir2, kCells = kCells, iters = 2, codec = "pq")
    def cb(d: String): Set[(Int, Int, Seq[Double])] =
      spark.read.parquet(s"$d/codebook")
        .as[(Int, Int, Seq[Double])].collect().toSet
    assert(cb(dir) === cb(dir2),
      "train-on-sample must be replayable exactly")
    // ...but the corpus still encodes EVERY vector under that codebook
    val corpus = spark.read.parquet(s"$dir/corpus")
    assert(corpus.count() === emb.count())
    assert(corpus.filter(col("codes").isNull).count() ===
      emb.count() - spark.read.parquet(s"$dir/corpus")
        .filter(col("nrm") > 0).count(),
      "every positive-norm row must carry codes")
    assert(Similarity.indexedTopK(spark, emb.filter(col("vec_id") < 2),
      dir, k = 3, nprobe = 2).count() > 0)
  }

  test("candMultRecallCurve: recall is monotone in candMult and reaches " +
      "1.0 at pass-all width; a raw index is refused") {
    val dir = tmpDir("ivf-cmc").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2,
      codec = "sq8")
    val rows = Similarity.candMultRecallCurve(spark,
        emb.filter(col("vec_id") < 8), dir, k = 5, maxMult = 40, nprobe = 2)
      .orderBy("cand_mult").select("cand_mult", "recall")
      .as[(Int, Double)].collect()
    assert(rows.length === 40)
    // nested crk-prefix candidate sets ⇒ hits can only grow (a full-set
    // top-k member beaten by < k elements overall is beaten by < k in
    // any superset prefix too)
    assert(rows.sliding(2).forall(p => p(0)._2 <= p(1)._2 + 1e-9),
      s"recall must be monotone in candMult: ${rows.toSeq}")
    assert(rows.last._2 === 1.0,
      "a pass-all pre-rank IS the reference ranking")
    val rawDir = tmpDir("ivf-cmc-raw").toString
    Similarity.buildIvfIndex(emb, rawDir, kCells = kCells, iters = 2)
    val e = intercept[IllegalArgumentException] {
      Similarity.candMultRecallCurve(spark, emb.limit(2), rawDir,
        k = 5, maxMult = 2)
    }
    assert(e.getMessage.contains("QUANTIZED"))
  }

  test("codec guards: unknown codec, non-dividing pqM, shadowing attrCols " +
      "are refused; a pre-codec meta reads as a raw index") {
    intercept[IllegalArgumentException] {
      Similarity.buildIvfIndex(emb, tmpDir("ivf-bad").toString,
        kCells = 4, codec = "opq")
    }
    intercept[IllegalArgumentException] {
      Similarity.buildIvfIndex(emb, tmpDir("ivf-bad2").toString,
        kCells = 4, codec = "pq", pqM = 7) // 64 % 7 != 0
    }
    intercept[IllegalArgumentException] {
      Similarity.buildIvfIndex(emb, tmpDir("ivf-bad3").toString,
        kCells = 4, codec = "sq8", attrCols = Seq("nrm"))
    }
  }
}
