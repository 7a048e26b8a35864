package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, LshIndex}
import graft.streaming.StreamingLshAdmit

/**
 * Streaming LSH admission ([[StreamingLshAdmit]]): per-epoch pairs
 * equal the frame-based incremental LSH join over the union so far,
 * replayed epochs are no-ops for both the index and the pairs output,
 * mid-stream deletions never strand the sink (auto id derivation via
 * the shared [[graft.streaming.EpochIds]]), and stale epoch records
 * refuse loudly.
 */
class StreamingLshAdmitSpec extends TestBase {

  import spark.implicits._

  private def corpus(ids: Range): Seq[(Long, String)] = {
    val vocab = (0 until 20).map(i => s"w$i")
    ids.map { d0 =>
      val d = d0.toLong
      val base = (0 until 12).map(j => vocab((((d / 3) * 5 + j) % 20).toInt))
      (d, (if (d % 3 == 2) base :+ s"x${d % 7}" else base).mkString(" "))
    }
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("each epoch lands exactly the pairs touching it; replay is a " +
      "no-op; the pairs dir serves the union") {
    implicit val sc = spark.sqlContext
    val all = corpus(1 to 60)
    val dir = tmpDir("lsh-stream").toString
    val pairsDir = tmpDir("lsh-stream-pairs").toString
    LshIndex.build(all.filter(_._1 <= 40).toDF("doc_id", "text"), dir,
      buckets = 8)
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch(StreamingLshAdmit.sink(dir, pairsDir))
      .option("checkpointLocation", tmpDir("lsh-stream-ck").toString)
      .start()
    try {
      input.addData(all.filter(t => t._1 > 40 && t._1 <= 50))
      q.processAllAvailable()
      input.addData(all.filter(_._1 > 50))
      q.processAllAvailable()
    } finally q.stop()
    val allDf = all.toDF("doc_id", "text")
    val want1 = pairsOf(Dedup.minhashLshPairsIncremental(
      allDf.filter(col("doc_id") <= 50), id => id > 40 && id <= 50))
    val want2 = pairsOf(Dedup.minhashLshPairsIncremental(
      allDf, id => id > 50))
    val got = spark.read.parquet(pairsDir)
    assert(pairsOf(got.filter(col("batch") === 1L)) == want1)
    assert(pairsOf(got.filter(col("batch") === 2L)) == want2)
    assert(pairsOf(got) == want1 ++ want2, "the union view")
    // a replayed last epoch replaces, never duplicates
    StreamingLshAdmit.sink(dir, pairsDir)(
      all.filter(_._1 > 50).toDF("doc_id", "text"), 1L)
    assert(pairsOf(spark.read.parquet(pairsDir)) == want1 ++ want2)
    assert(spark.read.parquet(s"$dir/shingles")
      .groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }

  test("mid-stream deletion never strands the sink; a replayed epoch " +
      "screens deleted victims out; stale records refuse") {
    val all = corpus(1 to 60)
    val dir = tmpDir("lsh-auto").toString
    val pairs1 = tmpDir("lsh-auto-p1").toString
    LshIndex.build(all.filter(_._1 <= 40).toDF("doc_id", "text"), dir,
      buckets = 8)
    val sink1 = StreamingLshAdmit.sink(dir, pairs1)
    val epoch0 = all.filter(t => t._1 > 40 && t._1 <= 50)
      .toDF("doc_id", "text")
    sink1(epoch0, 0L) // "crashes" after this: checkpoint never commits
    // takedown spanning the build corpus AND the crashed epoch's batch
    assert(LshIndex.delete(spark, dir, Seq(4L, 43L).toDF("doc_id")) == 2L)
    sink1(epoch0, 0L) // Structured Streaming replays the epoch
    val sh = spark.read.parquet(s"$dir/shingles")
    assert(sh.filter(col("doc_id").isin(4L, 43L)).count() == 0,
      "replay must not resurrect deleted documents")
    assert(sh.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // the SAME stream's next epoch continues above the burn
    sink1(all.filter(_._1 > 50).toDF("doc_id", "text"), 1L)
    val bs = sh.sparkSession.read.parquet(s"$dir/shingles")
      .select("batch").distinct()
      .collect().map(_.get(0).toString.toLong).toSet
    assert(bs == Set(0L, 1L, 3L), s"got batches $bs")
    // a NEW generation reusing pairs1 refuses loudly
    val e = intercept[IllegalArgumentException] {
      StreamingLshAdmit.sink(dir, pairs1)(
        all.filter(_._1 > 50).toDF("doc_id", "text"), 0L)
    }
    assert(e.getMessage.contains("previous stream generation"))
  }

  test("a delete crashed mid-flight (redo log landed, mark not " +
      "advanced) never strands the sink: the fresh epoch skips the " +
      "pending burn and its record validates on retry") {
    val all = corpus(1 to 40)
    val dir = tmpDir("lsh-pend").toString
    val pairsDir = tmpDir("lsh-pend-p").toString
    LshIndex.build(all.filter(_._1 <= 30).toDF("doc_id", "text"), dir,
      buckets = 8)
    // simulate the crash: land a redo log at hwm+1 by hand, as
    // delete() does, without finishing
    val hwm = LshIndex.admittedHwm(spark, dir)
    graft.pipeline.Dedup.shingled(
        all.filter(_._1 == 7L).toDF("doc_id", "text"))
      .withColumn("batch", lit(hwm + 1)).repartition(1)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(s"$dir/deleted")
    val sink = StreamingLshAdmit.sink(dir, pairsDir)
    val epoch = all.filter(_._1 > 30).toDF("doc_id", "text")
    sink(epoch, 0L) // must skip the burned hwm+1, finish the delete
    assert(LshIndex.admittedHwm(spark, dir) == hwm + 2,
      "the epoch must finish the crashed delete and land above it")
    assert(spark.read.parquet(s"$dir/shingles")
      .filter(col("doc_id") === 7L).count() == 0)
    // Structured Streaming retries the epoch: its recorded id (above
    // the burn) validates and the replay is a no-op
    sink(epoch, 0L)
    assert(spark.read.parquet(s"$dir/shingles")
      .groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }
}
