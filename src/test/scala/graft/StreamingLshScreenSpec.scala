package graft

import org.apache.spark.sql.functions._

import graft.pipeline.LshIndex
import graft.streaming.StreamingLshScreen

/**
 * Streaming text near-dup screen ([[StreamingLshScreen]]): survivors
 * equal the batch-mode lookup's complement, replayed epochs replace
 * their output, and a takedown on the index stops blocking — the
 * contamination-gate semantics on the text side.
 */
class StreamingLshScreenSpec extends TestBase {

  import spark.implicits._

  /** Like the LshIndexSpec corpus, but with step-7 windows over a
    * 40-token vocab so distinct groups stay below the screen's 0.8
    * Jaccard (the step-5 mod-20 form has period 4 — every stream
    * group would be an exact twin of a bench group and the screen
    * would block everything). */
  private def corpus(ids: Range) = {
    val vocab = (0 until 40).map(i => s"w$i")
    ids.map { d0 =>
      val d = d0.toLong
      val base = (0 until 12).map(j => vocab((((d / 3) * 7 + j) % 40).toInt))
      (d, (if (d % 3 == 2) base :+ s"x${d % 7}" else base).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("survivors equal the batch-mode complement; replay replaces; " +
      "a takedown stops blocking") {
    val all = corpus(1 to 45)
    val bench = all.filter(col("doc_id") <= 30) // the protected set
    val stream = all.filter(col("doc_id") > 30)
    val dir = tmpDir("lsh-screen").toString
    val outDir = tmpDir("lsh-screen-out").toString
    LshIndex.build(bench, dir, buckets = 8)
    val sink = StreamingLshScreen.sink(dir, outDir, minJaccard = 0.8)
    sink(stream, 0L)
    val survivors = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    val expectBlocked = LshIndex.lookup(stream, dir)
      .filter(col("jaccard") >= 0.8)
      .select("q_id").as[Long].collect().toSet
    assert(expectBlocked.nonEmpty, "fixture must block someone")
    assert(survivors == (31L to 45L).toSet -- expectBlocked)
    // replayed epoch replaces its partition — no duplicates
    sink(stream, 0L)
    assert(spark.read.parquet(outDir).groupBy("doc_id").count()
      .filter(col("count") > 1).count() == 0)
    // takedown: delete one blocked doc's protected twin — its
    // near-dups pass the screen from the next epoch on
    val victim = expectBlocked.min // doc v ~ near-dups bench doc(s)
    val twins = LshIndex.lookup(stream.filter(col("doc_id") === victim),
      dir).filter(col("jaccard") >= 0.8)
      .select("doc_id").as[Long].collect().toSet
    LshIndex.delete(spark, dir, twins.toSeq.toDF("doc_id"))
    sink(stream.filter(col("doc_id") === victim).toDF(), 1L)
    assert(spark.read.parquet(outDir)
      .filter(col("batch") === 1L)
      .select("doc_id").as[Long].collect().toSet == Set(victim),
      "after the takedown the previously blocked doc must pass")
  }
}
