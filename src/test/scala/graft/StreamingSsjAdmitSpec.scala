package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, SsjIndex}
import graft.streaming.StreamingSsjAdmit

/**
 * Streaming set-join admission ([[StreamingSsjAdmit]]): per-epoch
 * pairs equal the frame-based incremental join over the union so far,
 * replayed epochs are no-ops for both the index and the pairs output,
 * and the pairs directory serves the accumulated union.
 */
class StreamingSsjAdmitSpec extends TestBase {

  import spark.implicits._

  private def corpus(ids: Range): Seq[(Long, String)] = {
    val vocab = (0 until 40).map(i => s"w$i")
    ids.map { d0 =>
      val d = d0.toLong
      val n = 6 + (d % 5).toInt
      (d, (0 until n).map(j => vocab(((d * 7 + j * 11) % 40).toInt))
        .distinct.mkString(" "))
    }
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("each epoch lands exactly the pairs touching it; replay is a " +
      "no-op; the pairs dir serves the union") {
    implicit val sc = spark.sqlContext
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-stream").toString
    val pairsDir = tmpDir("ssj-stream-pairs").toString
    SsjIndex.build(all.filter(_._1 <= 40).toDF("doc_id", "text"), dir,
      tauMilli = 500, buckets = 8)
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch(StreamingSsjAdmit.sink(dir, pairsDir))
      .option("checkpointLocation", tmpDir("ssj-stream-ck").toString)
      .start()
    try {
      input.addData(all.filter(t => t._1 > 40 && t._1 <= 50))
      q.processAllAvailable()
      input.addData(all.filter(_._1 > 50))
      q.processAllAvailable()
    } finally q.stop()
    val allDf = all.toDF("doc_id", "text")
    val want1 = pairsOf(Dedup.setSimilarityJoinIncremental(
      allDf.filter(col("doc_id") <= 50), id => id > 40 && id <= 50, 500))
    val want2 = pairsOf(Dedup.setSimilarityJoinIncremental(
      allDf, id => id > 50, 500))
    val got = spark.read.parquet(pairsDir)
    assert(pairsOf(got.filter(col("batch") === 1L)) == want1,
      "epoch 0 pairs = increment 41..50 vs build corpus")
    assert(pairsOf(got.filter(col("batch") === 2L)) == want2,
      "epoch 1 pairs = increment 51..60 vs everything admitted before")
    assert(pairsOf(got) == want1 ++ want2, "the union view")
    // a replayed LAST epoch (what Structured Streaming actually
    // retries: the one uncommitted epoch; same id via its on-disk
    // record) replaces, never duplicates
    StreamingSsjAdmit.sink(dir, pairsDir)(
      all.filter(_._1 > 50).toDF("doc_id", "text"), 1L)
    assert(pairsOf(spark.read.parquet(pairsDir)) == want1 ++ want2)
    val dup = spark.read.parquet(s"$dir/docs")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dup == 0, "replayed admission must not duplicate documents")
  }

  test("auto id derivation: a mid-stream deletion never strands the " +
      "sink — the next epoch lands above the burn, and a fresh " +
      "checkpoint + fresh pairsDir continues with no offset math") {
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-auto").toString
    val pairs1 = tmpDir("ssj-auto-p1").toString
    SsjIndex.build(all.filter(_._1 <= 40).toDF("doc_id", "text"), dir,
      tauMilli = 500, buckets = 8)
    val sink1 = StreamingSsjAdmit.sink(dir, pairs1)
    sink1(all.filter(t => t._1 > 40 && t._1 <= 45).toDF("doc_id", "text"), 0L)
    // takedown mid-stream: burns id 2, advances the mark
    assert(SsjIndex.delete(spark, dir, Seq(3L, 7L).toDF("doc_id")) == 2L)
    // the SAME stream's next epoch continues — no refusal, no restart
    sink1(all.filter(t => t._1 > 45 && t._1 <= 50).toDF("doc_id", "text"), 1L)
    // a fresh checkpoint restarts epoch numbering at 0; with a fresh
    // pairsDir the sink self-paces past everything admitted so far
    val pairs2 = tmpDir("ssj-auto-p2").toString
    StreamingSsjAdmit.sink(dir, pairs2)(
      all.filter(_._1 > 50).toDF("doc_id", "text"), 0L)
    val bs = spark.read.parquet(s"$dir/docs").select("batch").distinct()
      .collect().map(_.get(0).toString.toLong).toSet
    assert(bs == Set(0L, 1L, 3L, 4L), s"got batches $bs")
    // ... and every admitted doc except the victims is served
    val served = spark.read.parquet(s"$dir/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(served == (1L to 60L).toSet -- Set(3L, 7L), s"got $served")
  }

  test("takedown/replay race: an epoch that crashed after admitting " +
      "is replayed AFTER a deletion — the replay screens the victims " +
      "out instead of resurrecting them") {
    val all = corpus(1 to 50)
    val dir = tmpDir("ssj-race").toString
    val pairsDir = tmpDir("ssj-race-p").toString
    SsjIndex.build(all.filter(_._1 <= 40).toDF("doc_id", "text"), dir,
      tauMilli = 500, buckets = 8)
    val sink = StreamingSsjAdmit.sink(dir, pairsDir)
    val epoch0 = all.filter(_._1 > 40).toDF("doc_id", "text")
    sink(epoch0, 0L) // "crashes" after this: checkpoint never commits
    // victims span the build corpus AND the crashed epoch's batch
    val victims = Seq(5L, 43L)
    assert(SsjIndex.delete(spark, dir, victims.toDF("doc_id")) == 2L)
    sink(epoch0, 0L) // Structured Streaming replays the epoch
    val docs = spark.read.parquet(s"$dir/docs")
    assert(docs.filter(col("doc_id").isin(victims: _*)).count() == 0,
      "replay must not resurrect deleted documents")
    assert(docs.groupBy("doc_id").count()
      .filter(col("count") > 1).count() == 0)
    // the running freq state equals a recount of the survivors
    val cum = spark.read.parquet(s"$dir/freq/cum=2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = all.filter(t => !victims.contains(t._1))
      .toDF("doc_id", "text")
      .select(explode(array_distinct(
        graft.pipeline.TextAnalysis.tokens(col("text")))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cum == full,
      "freq state must keep the deletion's subtraction through the replay")
    // and the victims never match a lookup
    val probe = SsjIndex.lookup(
      all.filter(t => victims.contains(t._1))
        .map(t => (t._1 + 1000L, t._2)).toDF("doc_id", "text"), dir)
    assert(probe.filter(col("doc_id").isin(victims: _*)).count() == 0)
  }

  test("a stale epoch-id record (pairsDir reused across stream " +
      "generations) is refused loudly instead of overwriting") {
    val all = corpus(1 to 50)
    val dir = tmpDir("ssj-stale").toString
    val pairsDir = tmpDir("ssj-stale-p").toString
    SsjIndex.build(all.filter(_._1 <= 30).toDF("doc_id", "text"), dir,
      tauMilli = 500, buckets = 8)
    val sink = StreamingSsjAdmit.sink(dir, pairsDir)
    sink(all.filter(t => t._1 > 30 && t._1 <= 35).toDF("doc_id", "text"), 0L)
    sink(all.filter(t => t._1 > 35 && t._1 <= 40).toDF("doc_id", "text"), 1L)
    // a NEW stream generation (fresh checkpoint, epoch numbering back
    // at 0) reusing the same pairsDir: its epoch 0 record points at an
    // id that cannot be a legitimate replay — refuse, don't overwrite
    val e = intercept[IllegalArgumentException] {
      StreamingSsjAdmit.sink(dir, pairsDir)(
        all.filter(_._1 > 40).toDF("doc_id", "text"), 0L)
    }
    assert(e.getMessage.contains("previous stream generation"))
    // the original admissions are intact
    assert(spark.read.parquet(s"$dir/docs")
      .filter(col("doc_id") > 40).count() == 0)
  }
}
