package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sim.WarehouseSim
import graft.streaming.StreamingIvfAdmit

/** Streaming IVF admission: micro-batches land exactly once (replayed
  * epochs replace their own batch partitions, never duplicate), the
  * served index equals brute force over everything admitted, and the
  * build's batch=0 stays untouched. */
class StreamingIvfAdmitSpec extends TestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("micro-batches admit exactly once; replayed epochs are no-ops") {
    implicit val sc = spark.sqlContext
    val emb = WarehouseSim.read(spark, sfDir, "embeddings")
    val dir = tmpDir("ivf-stream").toString
    val base = emb.filter(col("vec_id") % 3 === 0)
    Similarity.buildIvfIndex(base, dir, kCells = 8, iters = 2)
    val baseN = base.count()

    val feed = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val (b1, b2) = feed.splitAt(feed.length / 2)

    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch(StreamingIvfAdmit.sink(dir))
      .option("checkpointLocation", tmpDir("ivf-stream-ck").toString)
      .start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val corpus = spark.read.parquet(s"$dir/corpus")
    assert(corpus.count() === emb.count(),
      "base + both micro-batches must all serve")
    assert(corpus.filter(col("batch") === 0L).count() === baseN,
      "the build's batch=0 must stay untouched")

    // crash-replay twin: Structured Streaming re-invokes foreachBatch
    // with the SAME batchId after an uncommitted epoch — re-running
    // batch 1's admission must REPLACE its partitions, not append
    StreamingIvfAdmit.sink(dir)(b2.toIndexedSeq.toDF("vec_id", "embedding"), 1L)
    assert(spark.read.parquet(s"$dir/corpus").count() === emb.count(),
      "a replayed micro-batch must be a no-op on the row count")

    // the served union is first-class: full probe == whole-corpus brute
    val queries = emb.filter(col("vec_id") < 8)
    val full = Similarity.indexedTopK(spark, queries, dir, k = 5, nprobe = 8)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.bruteForceTopK(queries, emb, 5)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full === bf)
  }

  test("screenedSink: contaminated rows never enter the index; " +
      "clean rows admit; replay is a no-op") {
    implicit val sc = spark.sqlContext
    val emb = WarehouseSim.read(spark, sfDir, "embeddings")
    val dir = tmpDir("ivf-screened").toString
    val base = emb.filter(col("vec_id") % 3 === 0)
    Similarity.buildIvfIndex(base, dir, kCells = 8, iters = 2)

    // benchmark = a handful of held-out vectors; the feed contains
    // EXACT copies of them under fresh ids (cos 1.0 — planted leaks)
    // alongside genuinely clean rows
    val bench = emb.filter(col("vec_id") % 3 === 1 && col("vec_id") < 30)
    val leaks = bench.select((col("vec_id") + 5000000L).as("vec_id"),
        col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val clean = emb.filter(col("vec_id") % 3 === 2)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val feed = (leaks ++ clean).sortBy(_._1)
    val (b1, b2) = feed.splitAt(feed.length / 2)

    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch(StreamingIvfAdmit.screenedSink(dir, bench, tau = 0.999999))
      .option("checkpointLocation", tmpDir("ivf-screened-ck").toString)
      .start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(s"$dir/corpus")
      .select("vec_id").as[Long].collect().toSet
    val leakIds = leaks.map(_._1).toSet
    assert(leakIds.forall(!admitted.contains(_)),
      "a planted eval twin must never enter the index")
    assert(clean.map(_._1).toSet.subsetOf(admitted),
      "clean feed rows must all admit")
    assert(admitted.size ===
      (base.count().toInt + clean.length),
      "admitted = base + clean, nothing else")

    // replay twin: the gate is deterministic, so re-running an epoch
    // drops the same rows and replaces the same partitions
    StreamingIvfAdmit.screenedSink(dir, bench, tau = 0.999999)(
      b1.toIndexedSeq.toDF("vec_id", "embedding"), 0L)
    assert(spark.read.parquet(s"$dir/corpus").count().toInt ===
      base.count().toInt + clean.length,
      "a replayed screened epoch must be a no-op on the row count")
  }

  test("screenedSink snapshots the benchmark at construction: a mutated " +
      "benchmark source does not change a standing sink's screen") {
    val emb = WarehouseSim.read(spark, sfDir, "embeddings")
    val dir = tmpDir("ivf-snap").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 === 0), dir,
      kCells = 8, iters = 2)
    val benchPath = tmpDir("ivf-snap-bench").toString
    val bench = emb.filter(col("vec_id") % 3 === 1 && col("vec_id") < 30)
    bench.select("vec_id", "embedding").write
      .mode("overwrite").parquet(benchPath)
    val sinkFn = StreamingIvfAdmit.screenedSink(dir,
      spark.read.parquet(benchPath), tau = 0.999999)
    // EMPTY the benchmark source after construction: the standing sink
    // keeps screening against the construction-time snapshot (one
    // benchmark assignment per sink lifetime, not per epoch)
    bench.limit(0).select("vec_id", "embedding").write
      .mode("overwrite").parquet(benchPath)
    val leak = bench.limit(1)
      .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
    sinkFn(leak, 0L)
    val admitted = spark.read.parquet(s"$dir/corpus")
      .select("vec_id").as[Long].collect().toSet
    assert(admitted.forall(_ < 5000000L),
      "the standing sink must still screen with the snapshot benchmark")
    // a sink constructed AFTER the mutation sees the (now empty)
    // benchmark — the same epoch replayed through it admits the row,
    // proving the first sink's drop came from its snapshot
    StreamingIvfAdmit.screenedSink(dir,
      spark.read.parquet(benchPath), tau = 0.999999)(leak, 0L)
    val admitted2 = spark.read.parquet(s"$dir/corpus")
      .select("vec_id").as[Long].collect().toSet
    assert(admitted2.exists(_ >= 5000000L),
      "a fresh sink over the emptied benchmark screens nothing")
  }

  test("screenedSink refreshEvery: a benchmark row added mid-stream " +
      "starts screening at the next refresh boundary, not before") {
    val emb = WarehouseSim.read(spark, sfDir, "embeddings")
    val dir = tmpDir("ivf-refresh").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 === 0), dir,
      kCells = 8, iters = 2)
    val benchPath = tmpDir("ivf-refresh-bench").toString
    val benchRow = emb.filter(col("vec_id") % 3 === 1).limit(1)
      .select("vec_id", "embedding")
    // construction sees an EMPTY benchmark
    benchRow.limit(0).write.mode("overwrite").parquet(benchPath)
    val sinkFn = StreamingIvfAdmit.screenedSinkFrom(dir,
      () => spark.read.parquet(benchPath), tau = 0.999999,
      idCol = "vec_id", vecCol = "embedding", attrCols = Nil,
      refreshEvery = Some(2L))
    def leak(epoch: Long) = benchRow
      .select((col("vec_id") + 5000000L + epoch).as("vec_id"),
        col("embedding"))
    sinkFn(leak(0L), 0L) // admits: empty snapshot
    // the benchmark mutates under the running sink (refreshByPath is
    // the standard Spark contract for an in-place-overwritten file
    // source — without it ANY re-read hits the stale file listing)
    benchRow.write.mode("overwrite").parquet(benchPath)
    spark.catalog.refreshByPath(benchPath)
    sinkFn(leak(1L), 1L) // still admits: 1 % 2 != 0, old snapshot holds
    sinkFn(leak(2L), 2L) // refresh boundary: re-collected, now screened
    val base = benchRow.head().getLong(0) + 5000000L
    val admitted = spark.read.parquet(s"$dir/corpus")
      .select("vec_id").as[Long].collect().toSet
      .filter(_ >= 5000000L).map(_ - base)
    assert(admitted == Set(0L, 1L),
      s"epochs 0 and 1 admit, the boundary epoch screens; got $admitted")
  }

  test("streaming admission into a QUANTIZED index encodes each " +
      "micro-batch under the persisted codec; the union serves exactly") {
    implicit val sc = spark.sqlContext
    val emb = WarehouseSim.read(spark, sfDir, "embeddings")
    val dir = tmpDir("ivf-stream-q").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 === 0), dir,
      kCells = 8, iters = 2, codec = "sq8")
    val feed = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val (b1, b2) = feed.splitAt(feed.length / 2)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch(StreamingIvfAdmit.sink(dir))
      .option("checkpointLocation", tmpDir("ivf-stream-q-ck").toString)
      .start()
    try {
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val corpus = spark.read.parquet(s"$dir/corpus")
    assert(corpus.count() === emb.count())
    assert(corpus.filter(col("codes").isNull).count() === 0,
      "every admitted row must carry its codec codes")
    // full probe + pass-all pre-rank == brute force over the union:
    // streamed admissions are first-class quantized citizens
    val queries = emb.filter(col("vec_id") < 8)
    val full = Similarity.indexedTopK(spark, queries, dir, k = 5,
        nprobe = 8, candMult = 200)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.bruteForceTopK(queries, emb, 5)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full === bf)
  }

  test("extendIvfIndex auto-id takes the next free batch; id 0 is refused") {
    val emb = WarehouseSim.read(spark, sfDir, "embeddings")
    val dir = tmpDir("ivf-autoid").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0), dir,
      kCells = 8, iters = 2)
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 2 =!= 0), dir)
    val batches = spark.read.parquet(s"$dir/corpus")
      .select("batch").distinct().as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(batches.toSeq === Seq(0L, 1L), s"auto-id must take 1, got $batches")
    intercept[IllegalArgumentException] {
      Similarity.extendIvfIndex(emb.limit(1), dir, batchId = Some(0L))
    }
  }
}
