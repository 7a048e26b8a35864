package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup
import graft.streaming.StreamingNearDedup

/** Continuous LSH dedup: pairs accumulated across micro-batches must
  * equal the one-shot batch LSH over the full corpus — each pair found
  * exactly once, when its later document arrives. */
class StreamingNearDedupSpec extends TestBase {

  private def corpus(ids: Range) = {
    import spark.implicits._
    // clusters of 2-3 near-identical docs spread across batches
    ids.map { i =>
      val cluster = i / 3
      val base = (1 to 50).map(j => s"c${cluster}w$j")
      val text =
        if (i % 3 == 0) base.mkString(" ")
        else base.updated(49, s"tail$i").mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("micro-batched pairs equal the one-shot batch LSH over the union") {
    val stateDir = tmpDir("near-dedup-state").toString + "/state"
    val all = corpus(0 until 24)
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("jaccard") >= 0.7).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // three "micro-batches" through the foreachBatch body
    val found = Seq(0 until 9, 9 until 16, 16 until 24).flatMap { r =>
      pairsOf(StreamingNearDedup.processBatch(
        spark, corpus(r), stateDir, minJaccard = 0.7))
    }
    val oneShot = pairsOf(Dedup.minhashLshPairs(all))
    assert(oneShot.nonEmpty, "fixture has no near-dup pairs")
    assert(found.toSet == oneShot,
      s"streamed=${found.toSet.toSeq.sorted} batch=${oneShot.toSeq.sorted}")
    // exactly once: no pair discovered in two different batches
    assert(found.size == found.toSet.size, "a pair was re-discovered")
  }

  test("band-partitioned state: same pairs, pruned reads") {
    val root = tmpDir("near-dedup-part").toString + "/state"
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("jaccard") >= 0.7).select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = corpus(0 until 24)
    val found = scala.collection.mutable.Set[(Long, Long)]()
    var n = 0
    Seq(0 until 9, 9 until 16, 16 until 24).foreach { r =>
      graft.streaming.StreamingNearDedup.runBatchPartitioned(
        spark, corpus(r), root, minJaccard = 0.7) { pairs =>
        val got = pairsOf(pairs)
        n += got.size
        found ++= got
      }
    }
    val oneShot = pairsOf(Dedup.minhashLshPairs(all))
    assert(found.toSet == oneShot && oneShot.nonEmpty)
    assert(n == found.size, "a pair was re-discovered")
    // pruning mechanism: the isin over the partition column must be
    // recognized as a PARTITION filter (listing-level pruning), and the
    // selected partition count must be a strict subset of the table's
    val oneDoc = corpus(0 until 1) // cluster 0: its band hashes exist in state
    val batchBands = graft.pipeline.Dedup.unpivotBands(
      graft.streaming.StreamingNearDedup.stateRows(oneDoc))
      .withColumn("band_pfx",
        org.apache.spark.sql.functions.pmod(xxhash64(col("band_hash")), lit(64L)))
    val pfx = batchBands.select("band_pfx").distinct()
      .collect().map(_.getLong(0)).toSeq
    val prunedDf = spark.read.parquet(s"$root/bands")
      .filter(col("band_pfx").isin(pfx: _*))
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    val scan = scanOf(prunedDf)
    assert(scan.partitionFilters.nonEmpty, "isin not planned as a partition filter")
    val totalParts = scanOf(spark.read.parquet(s"$root/bands"))
      .relation.location.inputFiles.length
    val selectedParts = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.files.size).sum
    assert(selectedParts > 0 && selectedParts < totalParts,
      s"pruned listing selected $selectedParts of $totalParts files")
  }

  test("the streaming query wires the loop end-to-end") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmpDir("near-dedup-stream")
    val (stateDir, pairsDir, ckpt) = (s"$base/state", s"$base/pairs", s"$base/ckpt")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingNearDedup.start(
      input.toDF().toDF("doc_id", "text"), stateDir, pairsDir, ckpt)
    try {
      val docs = corpus(0 until 12).as[(Long, String)].collect()
      input.addData(docs.take(6).toIndexedSeq)
      q.processAllAvailable()
      input.addData(docs.drop(6).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(pairsDir)
      .filter(col("jaccard") >= 0.7).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = Dedup.minhashLshPairs(corpus(0 until 12))
      .filter(col("jaccard") >= 0.7).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == oneShot && streamed.nonEmpty)
  }
}
