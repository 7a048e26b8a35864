package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Semantic, Similarity}
import graft.sim.WarehouseSim

/**
 * Centroid-assignment strategy parity: below the
 * [[Semantic.LiteralAssignMaxKey]] threshold assignment embeds
 * kCells×dim plan literals (fastest — pure scan); above it, it switches
 * to a broadcast join so the plan stays O(1) nodes at production index
 * sizes (kCells ≈ √N × dim 768+ would otherwise put 10⁷–10⁸ literals in
 * one expression tree). These pins certify the switch is SEMANTICS-FREE:
 * identical assignments, identical trained centroids, identical
 * persisted-index serves — and that the join path really broadcasts.
 */
class AssignStrategySpec extends TestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = WarehouseSim.read(spark, sfDir, "embeddings")

  /** Force every assignment through the broadcast-join strategy. */
  private def withJoinPath[T](f: => T): T = {
    spark.conf.set(Semantic.LiteralAssignMaxKey, "0")
    try f finally spark.conf.unset(Semantic.LiteralAssignMaxKey)
  }

  private def eDouble = emb.select(col("vec_id"),
    transform(col("embedding"), x => x.cast("double")).as("v"))

  test("assignCells: join strategy equals the literal strategy bit-for-bit") {
    val cents = Semantic.kmeansCentroids(emb, 8, 2)
    def assign(): Map[Long, Int] =
      Semantic.assignCells(eDouble, cents, "vec_id", "v", "cell")
        .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val viaLiteral = assign()
    val viaJoin = withJoinPath(assign())
    assert(viaJoin === viaLiteral)
  }

  test("kmeansCentroids trains identical centroids under either strategy") {
    def train() = Semantic.kmeansCentroids(emb, 8, 2)
      .map { case (c, v) => (c, v.toSeq) }
    assert(withJoinPath(train()) === train())
  }

  test("persisted index: build/extend/serve/curve under the join strategy " +
      "equals the literal index") {
    val dirL = tmpDir("asg-lit").toString
    val dirJ = tmpDir("asg-join").toString
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    val q = emb.filter(col("vec_id") < 8)
    def lifecycle(dir: String) = {
      Similarity.buildIvfIndex(base, dir, kCells = 8, iters = 2)
      Similarity.extendIvfIndex(fresh, dir)
      (Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = 2)
        .select("q_id", "c_id", "cos_sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet,
        Similarity.nprobeRecallCurve(spark, q, dir, k = 5, maxProbe = 3)
          .select("nprobe", "n_exact", "hits")
          .as[(Int, Long, Long)].collect().toSet)
    }
    val (topkL, curveL) = lifecycle(dirL)
    val (topkJ, curveJ) = withJoinPath(lifecycle(dirJ))
    assert(topkJ === topkL, "serve must not depend on the assign strategy")
    assert(curveJ === curveL, "the recall curve must not either")
    // the persisted layout itself is identical cell-for-cell
    def cells(dir: String): Map[Long, Int] =
      spark.read.parquet(s"$dir/corpus").select("vec_id", "cell")
        .as[(Long, Int)].collect().toMap
    assert(cells(dirJ) === cells(dirL),
      "build+extend must land every vector in the same cell")
  }

  test("join path: the centroid frame broadcasts; no sort-merge join appears") {
    val cents = Semantic.kmeansCentroids(emb, 8, 2)
    val cf = cents.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "cv")
    val assigned = Semantic.assignCellsByJoin(eDouble, cf, "vec_id", "v", "cell")
    assigned.collect()
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroids must broadcast into the assignment join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus side must never shuffle for assignment:\n$plan")
  }

  test("join-path serve still partition-prunes the corpus scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val helper = new org.apache.spark.sql.execution.adaptive
      .AdaptiveSparkPlanHelper {}
    val dir = tmpDir("asg-prune").toString
    Similarity.buildIvfIndex(emb, dir, kCells = 8, iters = 2)
    val topk = withJoinPath {
      val t = Similarity.indexedTopK(spark,
        emb.filter(col("vec_id") < 2), dir, k = 5, nprobe = 2)
      t.collect()
      t
    }
    val plan = topk.queryExecution.executedPlan
    val scan = helper.collectWithSubqueries(plan) {
        case f: FileSourceScanExec => f
      }.find(_.relation.location.rootPaths.exists(_.toString.contains("corpus")))
      .getOrElse(fail(s"no corpus scan in join-path plan:\n$plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"join-path serve must keep the literal cell partition filter: " +
        s"${scan.partitionFilters}")
    def parquetFiles(d: java.io.File): Int =
      if (d.isDirectory) d.listFiles().map(parquetFiles).sum
      else if (d.getName.endsWith(".parquet")) 1 else 0
    val filesRead = scan.metrics("numFiles").value
    val filesTotal = parquetFiles(new java.io.File(s"$dir/corpus"))
    assert(filesRead < filesTotal,
      s"join-path pruning must skip unprobed cells: $filesRead/$filesTotal")
  }

  test("assignWithIndex: join strategy matches the literal sidecar assignment") {
    val dir = tmpDir("asg-awi").toString
    Similarity.buildIvfIndex(emb, dir, kCells = 8, iters = 2)
    def assign(): Map[Long, Int] =
      Similarity.assignWithIndex(emb, dir)
        .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val viaLiteral = assign()
    assert(withJoinPath(assign()) === viaLiteral)
    // and both agree with the corpus the build persisted
    val persisted = spark.read.parquet(s"$dir/corpus")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(viaLiteral === persisted)
  }
}
