package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, LshIndex}

/**
 * Persisted MinHash-LSH index ([[LshIndex]]): admission output equals
 * the frame-based [[Dedup.minhashLshPairsIncremental]] (same signature
 * arithmetic, same band-collision candidates, same shingle-Jaccard
 * verify), replay is idempotent under the high-water guard, lookups
 * are read-only and exclude query×query pairs, deletions take effect
 * immediately (band tombstones die in the verify) and recover from a
 * crash at any point after the redo log lands, and compact folds the
 * stores to batch=0 purging tombstones while preserving results.
 */
class LshIndexSpec extends TestBase {

  import spark.implicits._

  /** Groups of 3 consecutive ids share a 12-token base text (exact
    * duplicates — guaranteed band collisions); the third member of
    * each group appends one extra token (J ≈ 10/11 — a near-dup whose
    * banding is md5-deterministic on both compare sides). */
  private def corpus(ids: Range): DataFrame = {
    val vocab = (0 until 20).map(i => s"w$i")
    ids.map { d0 =>
      val d = d0.toLong
      val base = (0 until 12).map(j => vocab((((d / 3) * 5 + j) % 20).toInt))
      val words =
        if (d % 3 == 2) base :+ s"x${d % 7}" else base
      (d, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def pairsOf(df: DataFrame): Map[(Long, Long), Double] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("admission equals the frame-based incremental LSH join, " +
      "including increment-internal pairs") {
    val all = corpus(1 to 60)
    val old = all.filter(col("doc_id") <= 45)
    val inc = all.filter(col("doc_id") > 45)
    val dir = tmpDir("lsh-idx").toString
    LshIndex.build(old, dir, buckets = 8)
    val got = pairsOf(LshIndex.admit(inc, dir))
    val want = pairsOf(
      Dedup.minhashLshPairsIncremental(all, id => id > 45))
    assert(got == want,
      s"index admission diverged from the frame-based join:\n" +
        s"only-index=${got.keySet -- want.keySet} " +
        s"only-frame=${want.keySet -- got.keySet}")
    assert(want.keys.exists { case (a, b) => a > 45 && b > 45 },
      "fixture must exercise increment-internal pairs")
    assert(want.keys.exists { case (a, b) => a <= 45 && b > 45 },
      "fixture must exercise increment-vs-corpus pairs")
  }

  test("multi-batch: every batch equals the frame-based join over the " +
      "union so far") {
    val all = corpus(1 to 60)
    val dir = tmpDir("lsh-multi").toString
    LshIndex.build(all.filter(col("doc_id") <= 30), dir, buckets = 8)
    var admitted = 30L
    (1 to 3).foreach { b =>
      val lo = admitted
      val hi = admitted + 10L
      val inc = all.filter(col("doc_id") > lo && col("doc_id") <= hi)
      val got = pairsOf(LshIndex.admit(inc, dir))
      val want = pairsOf(Dedup.minhashLshPairsIncremental(
        all.filter(col("doc_id") <= hi), id => id > lo && id <= hi))
      assert(got == want, s"batch $b diverged: got=$got want=$want")
      admitted = hi
    }
  }

  test("replay idempotence and the high-water guard") {
    val all = corpus(1 to 40)
    val dir = tmpDir("lsh-replay").toString
    LshIndex.build(all.filter(col("doc_id") <= 30), dir, buckets = 8)
    val inc = all.filter(col("doc_id") > 30)
    val first = pairsOf(LshIndex.admit(inc, dir, batchId = Some(1L)))
    val e = intercept[IllegalArgumentException] {
      LshIndex.admit(inc, dir, batchId = Some(1L))
    }
    assert(e.getMessage.contains("high-water"))
    val again = pairsOf(
      LshIndex.admit(inc, dir, batchId = Some(1L), allowReplay = true))
    assert(again == first)
    val stored = spark.read.parquet(s"$dir/shingles")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(stored == 0, "replay must not duplicate stored documents")
    assert(LshIndex.admit(corpus(41 to 45), dir).collect() != null)
  }

  test("lookup is a read-only screen: equals the cross-side of the " +
      "frame-based join, reports no q×q pairs, advances no state") {
    val all = corpus(1 to 45)
    val old = all.filter(col("doc_id") <= 30)
    val q = all.filter(col("doc_id") > 30)
    val dir = tmpDir("lsh-lookup").toString
    LshIndex.build(old, dir, buckets = 8)
    val hwm0 = LshIndex.admittedHwm(spark, dir)
    val got = LshIndex.lookup(q, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // expected: frame-based incremental pairs with EXACTLY ONE query
    // endpoint, re-oriented to (q_id, corpus id)
    val want = pairsOf(Dedup.minhashLshPairsIncremental(all, id => id > 30))
      .collect {
        case ((a, b), j) if (a > 30) != (b > 30) =>
          (if (a > 30) (a, b) else (b, a)) -> j
      }.toMap
    assert(got == want,
      s"only-lookup=${got.keySet -- want.keySet} " +
        s"only-frame=${want.keySet -- got.keySet}")
    assert(LshIndex.admittedHwm(spark, dir) == hwm0,
      "lookup must not advance the admission mark")
    // a re-presented admitted document reports its J = 1 self-match
    val self = LshIndex.lookup(old.filter(col("doc_id") === 3), dir)
      .filter(col("q_id") === 3 && col("doc_id") === 3).collect()
    assert(self.length == 1 && self(0).getDouble(2) == 1.0)
  }

  test("delete: victims stop matching immediately (band tombstones " +
      "die in the verify); compact purges the tombstones") {
    val all = corpus(1 to 30)
    val dir = tmpDir("lsh-del").toString
    LshIndex.build(all, dir, buckets = 8)
    // doc 4 is an exact dup of doc 3 — present before deletion
    val q = corpus(3 to 3).select((col("doc_id") + 1000L).as("doc_id"),
      col("text"))
    assert(LshIndex.lookup(q, dir).filter(col("doc_id").isin(3L, 4L))
      .count() == 2)
    val n = LshIndex.delete(spark, dir, Seq(4L).toDF("doc_id"))
    assert(n == 1)
    val after = LshIndex.lookup(q, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(!after.contains(4L), "deleted victim still matches")
    assert(after.contains(3L), "survivor must keep matching")
    // the victim's band rows remain as tombstones until compact
    val tomb = spark.read.parquet(s"$dir/bands")
      .filter(col("doc_id") === 4L).count()
    assert(tomb > 0, "fixture expects band tombstones pre-compact")
    LshIndex.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/bands")
      .filter(col("doc_id") === 4L).count() == 0,
      "compact must purge deletion tombstones")
    // results unchanged by compaction
    val afterCompact = LshIndex.lookup(q, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(afterCompact == after)
    // deleting an absent id is a no-op
    assert(LshIndex.delete(spark, dir, Seq(4L).toDF("doc_id")) == 0L)
  }

  test("a deletion burns its id; a delete crashed after its redo log " +
      "landed is finished by the next admission") {
    val all = corpus(1 to 30)
    val dir = tmpDir("lsh-delcrash").toString
    LshIndex.build(all, dir, buckets = 8)
    LshIndex.delete(spark, dir, Seq(4L).toDF("doc_id"))
    // id 1 is burned — even a declared replay there is refused
    val e = intercept[IllegalArgumentException] {
      LshIndex.admit(corpus(31 to 33), dir, batchId = Some(1L),
        allowReplay = true)
    }
    assert(e.getMessage.contains("burned"))
    // simulate a crash: land a redo log at hwm+1 by hand, as delete()
    // does, but do not finish — the next admission must complete it
    val hwm = LshIndex.admittedHwm(spark, dir)
    Dedup.shingled(all.filter(col("doc_id") === 7L))
      .withColumn("batch", lit(hwm + 1)).repartition(1)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(s"$dir/deleted")
    LshIndex.admit(corpus(31 to 33), dir).count()
    assert(LshIndex.admittedHwm(spark, dir) == hwm + 2,
      "admission must finish the crashed delete, then land above it")
    assert(spark.read.parquet(s"$dir/shingles")
      .filter(col("doc_id") === 7L).count() == 0,
      "the crashed delete's victim must be gone")
  }

  test("compact folds the stores to batch=0, restarts the id " +
      "lifecycle, and preserves the admission contract") {
    val all = corpus(1 to 60)
    val dir = tmpDir("lsh-compact").toString
    LshIndex.build(all.filter(col("doc_id") <= 30), dir, buckets = 8)
    LshIndex.admit(all.filter(col("doc_id") > 30 && col("doc_id") <= 40),
      dir).count()
    LshIndex.admit(all.filter(col("doc_id") > 40 && col("doc_id") <= 50),
      dir).count()
    LshIndex.compact(spark, dir)
    val batches = spark.read.parquet(s"$dir/shingles")
      .select(col("batch").cast("long")).distinct()
      .as[Long].collect().toSet
    assert(batches == Set(0L), s"stores must fold to batch=0: $batches")
    assert(LshIndex.admittedHwm(spark, dir) == 0L)
    // post-compact admission == frame-based join over the full union
    val got = pairsOf(LshIndex.admit(all.filter(col("doc_id") > 50), dir))
    val want = pairsOf(
      Dedup.minhashLshPairsIncremental(all, id => id > 50))
    assert(got == want, s"post-compact admission diverged")
  }

  test("a compact killed mid-swap recovers: the staged replacement " +
      "promotes and ordinary operations refuse loudly until then") {
    val all = corpus(1 to 30)
    val dir = tmpDir("lsh-swapcrash").toString
    LshIndex.build(all, dir, buckets = 8)
    val before = LshIndex.lookup(corpus(31 to 33), dir).count()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window: mark deleted, live bands renamed aside with the
    // complete replacement still at .next (between the two renames)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/admit.hwm"), false)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/bands"),
      new org.apache.hadoop.fs.Path(s"$dir/bands.next"))
    val e = intercept[IllegalArgumentException] {
      LshIndex.admit(corpus(31 to 33), dir)
    }
    assert(e.getMessage.contains("high-water"))
    // re-running compact completes the job from a consistent state
    LshIndex.compact(spark, dir)
    assert(LshIndex.admittedHwm(spark, dir) == 0L)
    assert(LshIndex.lookup(corpus(31 to 33), dir).count() == before)
  }

  test("admit's returned pairs are PINNED: later admissions and " +
      "deletions cannot change an already-returned result") {
    val all = corpus(1 to 60)
    val dir = tmpDir("lsh-pin").toString
    LshIndex.build(all.filter(col("doc_id") <= 30), dir, buckets = 8)
    val p1 = LshIndex.admit(
      all.filter(col("doc_id") > 30 && col("doc_id") <= 40), dir)
    val first = pairsOf(p1)
    // mutate the store every way an operator can
    LshIndex.admit(all.filter(col("doc_id") > 40 && col("doc_id") <= 50),
      dir).count()
    LshIndex.delete(spark, dir, Seq(33L).toDF("doc_id"))
    LshIndex.compact(spark, dir)
    assert(pairsOf(p1) == first,
      "an already-returned admission result must be a fixed value — " +
        "recomputing against the mutated store changes the answer")
  }

  test("stats reports per-batch store shape") {
    val all = corpus(1 to 40)
    val dir = tmpDir("lsh-stats").toString
    LshIndex.build(all.filter(col("doc_id") <= 30), dir, buckets = 8)
    LshIndex.admit(all.filter(col("doc_id") > 30), dir).count()
    val st = LshIndex.stats(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(st.keySet == Set(0L, 1L))
    assert(st(0L)._1 == 30 && st(1L)._1 == 10)
    assert(st(0L)._2 == 60 && st(1L)._2 == 20,
      s"2 band rows per doc expected: $st")
  }
}
