package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.pipeline.Similarity
import graft.sim.WarehouseSim

/**
 * Read-amplification pin for [[Similarity.deleteFromIvfIndex]]: the
 * survivor rewrite must READ exactly the touched `(batch, cell)`
 * partitions, not the cross product of touched batches × touched
 * cells. Round 12's single-pass filter (`batch IN Bs AND cell IN Cs`)
 * was correctness-safe (a semi-join kept untouched pairs unwritten)
 * but read up to |Bs|·|Cs| partitions; the per-batch passes keep the
 * scan O(touched pairs). Measured from the executed plans' own
 * `numFiles` metric via a QueryExecutionListener — the same counting
 * trick `ivfIndexStats` uses, applied to the delete's scans.
 */
class DeleteScanPruningSpec extends TestBase
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private val sfDir = "/root/testdata/sf0.001"

  test("deleteFromIvfIndex reads touched pairs, never the batch x cell " +
      "cross product") {
    import spark.implicits._
    val emb = WarehouseSim.read(spark, sfDir, "embeddings")
    val dir = tmpDir("ivf-delprune").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir,
      kCells = 8, iters = 2)
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 2 === 1), dir)
    val corpus = spark.read.parquet(s"$dir/corpus")
      .select(col("batch").cast("long").as("batch"), col("cell"),
        col("vec_id"))
      .as[(Long, Int, Long)].collect()
    // one victim in (batch 0, cell a) and one in (batch 1, cell b) with
    // a != b: the cross product is 4 pairs, the touched set is 2
    val b0 = corpus.filter(_._1 == 0L)
    val b1 = corpus.filter(_._1 == 1L)
    val cellA = b0.map(_._2).min
    val cellB = b1.map(_._2).filter(_ != cellA).max
    val v0 = b0.filter(_._2 == cellA).map(_._3).min
    val v1 = b1.filter(_._2 == cellB).map(_._3).min
    // cells must be populated on BOTH batches for the cross product to
    // differ from the touched set (sf0.001 spreads every cell over both)
    assert(b0.exists(_._2 == cellB) && b1.exists(_._2 == cellA),
      "fixture needs the cross-product pairs to exist on disk")

    val cellScans = new ConcurrentLinkedQueue[(String, Long)]()
    val listener = new QueryExecutionListener {
      private def grab(qe: QueryExecution): Unit =
        collectWithSubqueries(qe.executedPlan) {
          case f: FileSourceScanExec
              if f.partitionFilters.exists(_.references.exists(
                _.name == "cell")) =>
            cellScans.add((f.nodeName, f.metrics("numFiles").value))
        }
      override def onSuccess(name: String, qe: QueryExecution,
          duration: Long): Unit = grab(qe)
      override def onFailure(name: String, qe: QueryExecution,
          error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val n = Similarity.deleteFromIvfIndex(spark, dir,
        Seq(v0, v1).toDF("vec_id"))
      assert(n === 2L)
      // QueryExecutionListener delivery is async: wait until the four
      // expected pruned-scan events (count + write per touched batch)
      // arrive or the event queue goes quiet
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline &&
          (cellScans.size() < 4 || cellScans.size() != last)) {
        last = cellScans.size()
        Thread.sleep(200)
      }
    } finally spark.listenerManager.unregister(listener)

    // build wrote filesPerCell=1 ⇒ each touched pair is exactly one
    // file; the delete runs one survivor-count scan and one rewrite
    // scan per touched batch ⇒ 2 scans × 1 file = 2 files per batch,
    // 4 total. The round-12 cross-product filter read 8 (4 pairs × 2).
    val reads = cellScans.toArray(Array.empty[(String, Long)])
    assert(reads.nonEmpty, "the delete's pruned scans must be observed")
    assert(reads.forall(_._2 <= 1L),
      s"each per-batch pass must read only its own touched pair: $reads")
    val total = reads.map(_._2).sum
    assert(total <= 4L,
      s"files read must scale with touched pairs (4), not the cross " +
        s"product (8): $total from $reads")

    // and the delete itself behaved: victims gone, everything else kept
    val after = spark.read.parquet(s"$dir/corpus")
      .select("vec_id").as[Long].collect().toSet
    assert(!after.contains(v0) && !after.contains(v1))
    assert(after.size.toLong === emb.count() - 2)
  }
}
