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
    // a replayed epoch (same id, same data) replaces, never duplicates
    StreamingSsjAdmit.sink(dir, pairsDir)(
      all.filter(t => t._1 > 40 && t._1 <= 50).toDF("doc_id", "text"), 0L)
    assert(pairsOf(spark.read.parquet(pairsDir)) == want1 ++ want2)
    val dup = spark.read.parquet(s"$dir/docs")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dup == 0, "replayed admission must not duplicate documents")
  }
}
