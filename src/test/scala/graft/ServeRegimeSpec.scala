package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sim.WarehouseSim

/**
 * Query-join regime parity for [[Similarity.indexedTopK]]: below
 * [[Similarity.ServeBroadcastMaxQueries]] query rows the query vectors
 * broadcast into the candidate join (the eval-serve shape IvfIndexSpec
 * pins); above it they shuffle-hash-join on `q_id` so a million-query
 * batch cannot blow the broadcast. These pins certify the switch is
 * SEMANTICS-FREE (identical top-k, filtered search included) and that
 * the shuffle regime really stops broadcasting the query vectors while
 * the probe frame stays broadcast.
 */
class ServeRegimeSpec extends TestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = WarehouseSim.read(spark, sfDir, "embeddings")

  private def withShuffleRegime[T](f: => T): T = {
    spark.conf.set(Similarity.ServeBroadcastMaxQueries, "0")
    try f finally spark.conf.unset(Similarity.ServeBroadcastMaxQueries)
  }

  test("shuffle-join serve equals broadcast serve, filtered search included") {
    val dir = tmpDir("serve-regime").toString
    Similarity.buildIvfIndex(emb, dir, kCells = 8, iters = 2,
      attrCols = Seq("label"))
    val q = emb.filter(col("vec_id") < 16)
    def run(where: Option[org.apache.spark.sql.Column]) =
      Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = 3, where = where)
        .select("q_id", "c_id", "cos_sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(withShuffleRegime(run(None)) === run(None),
      "both regimes must return the identical top-k")
    val pred = Some(col("label") <= 3)
    assert(withShuffleRegime(run(pred)) === run(pred),
      "parity must hold under the attr pre-filter too")
  }

  test("above the threshold the query vectors stop broadcasting; " +
      "the probe frame still does") {
    val dir = tmpDir("serve-regime2").toString
    Similarity.buildIvfIndex(emb, dir, kCells = 8, iters = 2)
    val q = emb.filter(col("vec_id") < 16)
    val topk = withShuffleRegime(
      Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = 3))
    assert(topk.count() > 0)
    val planStr = topk.queryExecution.executedPlan.toString
    assert(planStr.contains("ShuffledHashJoin"),
      s"the q_id join must shuffle above the threshold:\n$planStr")
    assert(planStr.contains("BroadcastHashJoin") ||
      planStr.contains("BroadcastExchange"),
      s"the skinny probe frame must stay broadcast:\n$planStr")
  }
}
