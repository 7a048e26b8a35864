package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, SsjIndex}

/**
 * Persisted set-similarity-join index ([[SsjIndex]]): admission output
 * equals the frame-based incremental join (exactness is invariant to
 * the candidate order), the running (tok, tf) state folds exactly, the
 * frozen-order two-sided filter keeps the no-false-negative contract
 * across multiple batches, replay is idempotent, the high-water guard
 * refuses id reuse, and the admission's store reads prune to touched
 * hash-buckets (the per-batch-cost contract).
 */
class SsjIndexSpec extends TestBase
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def corpus(ids: Range): DataFrame = {
    val vocab = (0 until 40).map(i => s"w$i")
    ids.map { d0 =>
      val d = d0.toLong
      val n = 6 + (d % 5).toInt
      val words = (0 until n)
        .map(j => vocab(((d * 7 + j * 11) % 40).toInt)).distinct
      (d, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def pairsOf(df: DataFrame): Map[(Long, Long), Double] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("admission equals the frame-based incremental join, including " +
      "increment-internal pairs") {
    val all = corpus(1 to 60)
    val old = all.filter(col("doc_id") <= 45)
    val inc = all.filter(col("doc_id") > 45)
    val dir = tmpDir("ssj-idx").toString
    SsjIndex.build(old, dir, tauMilli = 500, buckets = 8)
    val got = pairsOf(SsjIndex.admit(inc, dir))
    val want = pairsOf(
      Dedup.setSimilarityJoinIncremental(all, id => id > 45, 500))
    assert(got == want,
      s"index admission diverged from the frame-based join:\n" +
        s"only-index=${got.keySet -- want.keySet} " +
        s"only-frame=${want.keySet -- got.keySet}")
    assert(want.keys.exists { case (a, b) => a > 45 && b > 45 },
      "fixture must exercise increment-internal pairs")
    assert(want.keys.exists { case (a, b) => a <= 45 && b > 45 },
      "fixture must exercise increment-vs-corpus pairs")
  }

  test("multi-batch: every batch exact vs brute force on the union " +
      "so far; running freq state equals a full recount") {
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-multi").toString
    SsjIndex.build(all.filter(col("doc_id") <= 30), dir,
      tauMilli = 500, buckets = 8)
    var admitted = 30L
    (1 to 3).foreach { b =>
      val lo = admitted
      val hi = admitted + 10L
      val inc = all.filter(col("doc_id") > lo && col("doc_id") <= hi)
      val got = pairsOf(SsjIndex.admit(inc, dir))
      val want = pairsOf(Dedup.setSimilarityJoinIncremental(
        all.filter(col("doc_id") <= hi), id => id > lo && id <= hi, 500))
      assert(got == want, s"batch $b diverged: got=$got want=$want")
      admitted = hi
    }
    // the folded (tok, tf) state after 3 admissions == a full recount
    val cum = spark.read.parquet(s"$dir/freq/cum=3")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = all
      .select(explode(array_distinct(
        graft.pipeline.TextAnalysis.tokens(col("text")))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cum == full, "running freq state must fold exactly")
  }

  test("tokens unseen at build time still pair (frozen order ranks " +
      "them tf=0, never drops them)") {
    val dir = tmpDir("ssj-unseen").toString
    SsjIndex.build(Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      dir, tauMilli = 600, buckets = 4)
    // both docs built entirely from post-build vocabulary
    val inc = Seq(
      (2L, "zeta eta theta iota"),
      (3L, "zeta eta theta kappa")).toDF("doc_id", "text")
    val got = pairsOf(SsjIndex.admit(inc, dir))
    assert(got.keySet == Set((2L, 3L)), s"got $got")
    assert(got((2L, 3L)) == 0.6)
  }

  test("replay idempotence and the high-water guard") {
    val all = corpus(1 to 40)
    val dir = tmpDir("ssj-replay").toString
    SsjIndex.build(all.filter(col("doc_id") <= 30), dir,
      tauMilli = 500, buckets = 8)
    val inc = all.filter(col("doc_id") > 30)
    val first = pairsOf(SsjIndex.admit(inc, dir, batchId = Some(1L)))
    // bare id reuse is refused loudly
    val e = intercept[IllegalArgumentException] {
      SsjIndex.admit(inc, dir, batchId = Some(1L))
    }
    assert(e.getMessage.contains("high-water"))
    // a declared replay returns the same pairs and leaves the store
    // serving one copy of the batch
    val again = pairsOf(
      SsjIndex.admit(inc, dir, batchId = Some(1L), allowReplay = true))
    assert(again == first)
    val stored = spark.read.parquet(s"$dir/docs")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(stored == 0, "replay must not duplicate stored documents")
    // ... and the next fresh admission proceeds above the mark
    assert(SsjIndex.admit(corpus(41 to 45), dir).collect() != null)
  }

  test("admit's returned pairs are PINNED: later admissions and " +
      "deletions cannot change an already-returned result") {
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-pin").toString
    SsjIndex.build(all.filter(col("doc_id") <= 30), dir,
      tauMilli = 500, buckets = 8)
    val p1 = SsjIndex.admit(
      all.filter(col("doc_id") > 30 && col("doc_id") <= 40), dir)
    val first = pairsOf(p1)
    SsjIndex.admit(all.filter(col("doc_id") > 40 && col("doc_id") <= 50),
      dir).count()
    SsjIndex.delete(spark, dir, Seq(33L).toDF("doc_id"))
    assert(pairsOf(p1) == first,
      "an already-returned admission result must be a fixed value — " +
        "recomputing against the mutated store changes the answer")
  }

  test("store reads prune to touched hash-buckets: a 1-doc admission " +
      "reads a strict subset of the prefix store's partitions") {
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-prune").toString
    SsjIndex.build(all, dir, tauMilli = 500, buckets = 16)
    // scanned-file counts from the executed plans' own numFiles metric
    // (the DeleteScanPruningSpec trick — inputFiles ignores pruning)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      collectWithSubqueries(df.queryExecution.executedPlan) {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val allFiles = scannedFiles(spark.read.parquet(s"$dir/prefix"))
    // a single doc's prefix tokens touch few of the 16 token buckets
    val one = Seq((1000L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val touched = one
      .select(explode(array_distinct(
        graft.pipeline.TextAnalysis.tokens(col("text")))).as("tok"))
      .select(pmod(xxhash64(col("tok")), lit(16L)).as("pb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(touched.size < 16,
      "fixture must not touch every bucket or the pin is vacuous")
    val pruned = scannedFiles(
      SsjIndex.storedPrefixes(spark, dir, 1L, touched))
    assert(pruned > 0 && pruned < allFiles,
      s"expected a strict subset of partitions: $pruned of $allFiles files")
  }

  test("rebuildPrefixes re-ranks under the running counts without " +
      "changing any answer; stats exposes the order drift") {
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-rebuild").toString
    SsjIndex.build(all.filter(col("doc_id") <= 20), dir,
      tauMilli = 500, buckets = 8)
    SsjIndex.admit(all.filter(col("doc_id") > 20 && col("doc_id") <= 50),
      dir).count()
    val drift0 = SsjIndex.stats(spark, dir)
      .filter(col("batch") === 0L).head().getAs[Long]("drift_milli")
    assert(drift0 > 0,
      "a 30-doc admission over a 20-doc build must drift some token mass")
    SsjIndex.rebuildPrefixes(spark, dir)
    val drift1 = SsjIndex.stats(spark, dir)
      .filter(col("batch") === 0L).head().getAs[Long]("drift_milli")
    assert(drift1 == 0, s"rebuild refreezes the order, got $drift1")
    // answers unchanged after the re-rank
    val inc = all.filter(col("doc_id") > 50)
    val got = pairsOf(SsjIndex.admit(inc, dir))
    val want = pairsOf(
      Dedup.setSimilarityJoinIncremental(all, id => id > 50, 500))
    assert(got == want)
  }

  test("lookup: read-only screen equals the cross-side of the " +
      "incremental join; self-matches report J = 1; nothing advances") {
    val old = corpus(1 to 50)
    val dir = tmpDir("ssj-lookup").toString
    SsjIndex.build(old, dir, tauMilli = 500, buckets = 8)
    // query docs with a DISJOINT id space (1000+), same text generator
    val q = corpus(46 to 60).select((col("doc_id") + 1000L).as("doc_id"),
      col("text"))
    val got = SsjIndex.lookup(q, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // expected: cross pairs of the frame-based incremental join over
    // the union (increment-internal pairs excluded — lookup is a
    // screen, not an admission)
    val want = pairsOf(Dedup.setSimilarityJoinIncremental(
        old.unionByName(q), id => id >= 1000L, 500))
      .filter { case ((a, b), _) => (a >= 1000L) != (b >= 1000L) }
      .map { case ((a, b), j) =>
        (if (a >= 1000L) (a, b) else (b, a)) -> j }
    assert(got == want,
      s"only-lookup=${got.keySet -- want.keySet} " +
        s"only-frame=${want.keySet -- got.keySet}")
    assert(want.nonEmpty, "fixture must produce cross matches")
    // an identical re-presented doc self-matches at J = 1
    val self = SsjIndex.lookup(old.filter(col("doc_id") === 7L), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(self.exists(t => t._1 == 7L && t._2 == 7L && t._3 == 1.0))
    // read-only: the mark did not move, no new batches landed
    val batches = spark.read.parquet(s"$dir/docs")
      .select("batch").distinct().count()
    assert(batches == 1, "lookup must not admit")
  }

  test("delete: victims stop matching immediately, the freq state " +
      "folds out exactly, emptied partitions drop, rebuild purges " +
      "tombstones, admission continues above the burned id") {
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-del").toString
    SsjIndex.build(all, dir, tauMilli = 500, buckets = 8)
    val preTombs = spark.read.parquet(s"$dir/prefix").count()
    // victims: every doc in one db bucket (forces an emptied-partition
    // drop) plus one doc from another bucket
    val bucketOf = all.select(col("doc_id"),
      pmod(xxhash64(col("doc_id")), lit(8L)).as("db"))
    val hot = bucketOf.filter(col("db") ===
        bucketOf.head().getLong(1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val extra = all.filter(!col("doc_id").isin(hot.toSeq: _*))
      .head().getLong(0)
    val victims = (hot + extra).toSeq
    val n = SsjIndex.delete(spark, dir,
      victims.toDF("doc_id"))
    assert(n == victims.size.toLong)
    // the emptied db partition is gone; no victim row survives
    val docsNow = spark.read.parquet(s"$dir/docs")
    assert(docsNow.filter(col("doc_id").isin(victims: _*)).count() == 0)
    // freq state == a full recount of the survivors
    val cum = spark.read.parquet(s"$dir/freq/cum=1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = all.filter(!col("doc_id").isin(victims: _*))
      .select(explode(array_distinct(
        graft.pipeline.TextAnalysis.tokens(col("text")))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cum == full, "deletion must fold counts out exactly")
    // victims never appear in a lookup, even with tombstoned prefixes
    val probe = SsjIndex.lookup(
      all.filter(col("doc_id") === extra)
        .select((col("doc_id") + 1000L).as("doc_id"), col("text")), dir)
    assert(probe.filter(col("doc_id").isin(victims: _*)).count() == 0)
    // rebuild purges the tombstoned prefix rows
    SsjIndex.rebuildPrefixes(spark, dir)
    assert(spark.read.parquet(s"$dir/prefix").count() < preTombs)
    assert(spark.read.parquet(s"$dir/prefix")
      .join(victims.toDF("doc_id"), Seq("doc_id"), "left_semi")
      .count() == 0)
    // the deletion burned id 1: the next admission lands as batch 2
    SsjIndex.admit(corpus(100 to 105), dir).count()
    val bs = spark.read.parquet(s"$dir/docs").select("batch").distinct()
      .collect().map(_.get(0).toString.toLong).toSet
    assert(bs.contains(2L) && !bs.contains(1L), s"got batches $bs")
  }

  test("a deletion burns its id: even a declared replay there is " +
      "refused; a non-contiguous id refuses with guidance; the feed " +
      "continues above the mark") {
    val all = corpus(1 to 40)
    val dir = tmpDir("ssj-burn").toString
    SsjIndex.build(all, dir, tauMilli = 500, buckets = 8)
    SsjIndex.delete(spark, dir,
      Seq(3L, 7L).toDF("doc_id")) // burns id 1
    val inc = corpus(50 to 55)
    val e1 = intercept[IllegalArgumentException] {
      SsjIndex.admit(inc, dir, batchId = Some(1L), allowReplay = true)
    }
    assert(e1.getMessage.contains("burned by a deletion"))
    val e2 = intercept[IllegalArgumentException] {
      SsjIndex.admit(inc, dir, batchId = Some(5L), allowReplay = true)
    }
    assert(e2.getMessage.contains("contiguous"))
    // the natural next id works, and the restarted-stream shape
    // (idOffset past the mark) lands the same way
    SsjIndex.admit(inc, dir).count()
    graft.streaming.StreamingSsjAdmit.sink(dir,
      tmpDir("ssj-burn-pairs").toString, idOffset = 3L)(
      corpus(60 to 62), 0L)
    val bs = spark.read.parquet(s"$dir/docs").select("batch").distinct()
      .collect().map(_.get(0).toString.toLong).toSet
    assert(bs == Set(0L, 2L, 3L), s"got $bs")
  }

  test("compact folds the stores to batch=0 with bounded files, " +
      "purges tombstones, and restarts admission above 0 with " +
      "answers unchanged") {
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-compact").toString
    SsjIndex.build(all.filter(col("doc_id") <= 30), dir,
      tauMilli = 500, buckets = 8)
    SsjIndex.admit(all.filter(col("doc_id") > 30 && col("doc_id") <= 40),
      dir).count()
    SsjIndex.admit(all.filter(col("doc_id") > 40 && col("doc_id") <= 50),
      dir).count()
    SsjIndex.delete(spark, dir, Seq(5L, 35L).toDF("doc_id"))
    val q = all.filter(col("doc_id") > 50)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val before = SsjIndex.lookup(q, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    SsjIndex.compact(spark, dir)
    // one batch, one file per touched bucket dir, tombstones gone
    val docsB = spark.read.parquet(s"$dir/docs").select("batch")
      .distinct().collect().map(_.get(0).toString.toLong).toSet
    assert(docsB == Set(0L), s"got batches $docsB")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val bucketDirs = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/prefix/batch=*/pb=*"))
    assert(bucketDirs.nonEmpty)
    bucketDirs.foreach { st =>
      val files = fs.listStatus(st.getPath)
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(files == 1, s"${st.getPath} holds $files files")
    }
    assert(spark.read.parquet(s"$dir/prefix")
      .filter(col("doc_id").isin(5L, 35L)).count() == 0,
      "compaction must purge deletion tombstones")
    // freq store pruned to the single folded state; burns voided
    val cums = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/freq"))
      .map(_.getPath.getName).toSet
    assert(cums == Set("cum=0"), s"got $cums")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/deleted")))
    // answers unchanged by the fold
    val after = SsjIndex.lookup(q, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == before)
    // admission restarts above 0 and stays exact vs the frame join
    val got = pairsOf(SsjIndex.admit(all.filter(col("doc_id") > 50), dir))
    val want = pairsOf(Dedup.setSimilarityJoinIncremental(
      all.filter(!col("doc_id").isin(5L, 35L)), id => id > 50, 500))
    assert(got == want,
      s"only-index=${got.keySet -- want.keySet} " +
        s"only-frame=${want.keySet -- got.keySet}")
    val bs2 = spark.read.parquet(s"$dir/docs").select("batch")
      .distinct().collect().map(_.get(0).toString.toLong).toSet
    assert(bs2 == Set(0L, 1L), s"got $bs2")
  }

  test("gcFreqState prunes superseded running-freq tables, keeps the " +
      "replay window, and admission/replay continue unharmed") {
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-gc").toString
    SsjIndex.build(all.filter(col("doc_id") <= 30), dir,
      tauMilli = 500, buckets = 8)
    (1 to 3).foreach { b =>
      SsjIndex.admit(all.filter(
        col("doc_id") > 20 + b * 10 && col("doc_id") <= 30 + b * 10),
        dir).count()
    }
    assert(SsjIndex.gcFreqState(spark, dir) == 2) // cum=0, cum=1
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val cums = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/freq"))
      .map(_.getPath.getName).toSet
    assert(cums == Set("cum=2", "cum=3"), s"got $cums")
    // the one-epoch replay window survives: replaying the LAST
    // admission (reads cum=2) still works and changes nothing
    val inc3 = all.filter(col("doc_id") > 50)
    SsjIndex.admit(inc3, dir, batchId = Some(3L), allowReplay = true)
      .count()
    assert(spark.read.parquet(s"$dir/docs")
      .groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // a fresh admission continues; an OLDER replay refuses loudly
    // (its fold input was pruned) instead of dying inside the read
    SsjIndex.admit(corpus(100 to 105), dir).count()
    val e = intercept[IllegalArgumentException] {
      SsjIndex.admit(all.filter(col("doc_id") > 40 && col("doc_id") <= 50),
        dir, batchId = Some(2L), allowReplay = true)
    }
    assert(e.getMessage.contains("gcFreqState"))
  }

  test("a delete crashed at any point after its redo log landed is " +
      "finished by the next call — the freq state never folds from " +
      "stale input, the mark never stays below the burn") {
    val all = corpus(1 to 40)
    val dir = tmpDir("ssj-del-crash").toString
    SsjIndex.build(all, dir, tauMilli = 500, buckets = 8)
    // simulate the crash window: the redo log (dir/deleted/batch=1)
    // exists but NOTHING else ran — hand-land the sidecar exactly as
    // delete() would, then "crash"
    val victims = Seq(4L, 9L)
    val sets = all.filter(col("doc_id").isin(victims: _*))
      .select(col("doc_id"),
        sort_array(array_distinct(
          graft.pipeline.TextAnalysis.tokens(col("text")))).as("toks"))
    sets.withColumn("batch", lit(1L)).repartition(1)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(s"$dir/deleted")
    // a SECOND delete finishes the crashed one first, then runs its own
    val n = SsjIndex.delete(spark, dir, Seq(12L).toDF("doc_id"))
    assert(n == 1L)
    val docs = spark.read.parquet(s"$dir/docs")
    assert(docs.filter(col("doc_id").isin(4L, 9L, 12L)).count() == 0,
      "both deletions must be applied")
    // two burns on the books, mark at 2, freq = exact survivor recount
    val cum = spark.read.parquet(s"$dir/freq/cum=2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = all.filter(!col("doc_id").isin(4L, 9L, 12L))
      .select(explode(array_distinct(
        graft.pipeline.TextAnalysis.tokens(col("text")))).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cum == full)
    SsjIndex.admit(corpus(50 to 55), dir).count()
    val bs = spark.read.parquet(s"$dir/docs").select("batch").distinct()
      .collect().map(_.get(0).toString.toLong).toSet
    assert(bs == Set(0L, 3L), s"got $bs")
  }

  test("maintenance crash windows refuse loudly, never miss silently: " +
      "a rebuild killed between its two swaps leaves an index that " +
      "refuses ordinary ops until the rebuild re-runs") {
    val all = corpus(1 to 60)
    val dir = tmpDir("ssj-crash").toString
    SsjIndex.build(all.filter(col("doc_id") <= 20), dir,
      tauMilli = 500, buckets = 8)
    SsjIndex.admit(all.filter(col("doc_id") > 20 && col("doc_id") <= 50),
      dir).count()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    // hand-build the exact mid-rebuild crash state: both replacements
    // staged, the mark invalidated, the ORDER swap done, the PREFIX
    // swap not — the mixed-order window that would silently lose
    // recall if it were ever served
    spark.read.parquet(s"$dir/freq/cum=1").write.parquet(s"$dir/order.next")
    assert(fs.rename(p("order"), p("order.old")))
    assert(fs.rename(p("order.next"), p("order")))
    fs.delete(p("order.old"), true)
    fs.delete(p("admit.hwm"), false)
    val e1 = intercept[IllegalArgumentException] {
      SsjIndex.admit(all.filter(col("doc_id") > 50), dir)
    }
    assert(e1.getMessage.contains("high-water"))
    val e2 = intercept[IllegalArgumentException] {
      SsjIndex.lookup(corpus(55 to 60), dir)
    }
    assert(e2.getMessage.contains("high-water"))
    // re-running the rebuild completes it; answers are exact again
    SsjIndex.rebuildPrefixes(spark, dir)
    val got = pairsOf(SsjIndex.admit(all.filter(col("doc_id") > 50), dir))
    val want = pairsOf(
      Dedup.setSimilarityJoinIncremental(all, id => id > 50, 500))
    assert(got == want)
  }

  test("a compact killed mid-swap recovers: the aside/staging pair is " +
      "promoted by the next index call and answers are unchanged") {
    val all = corpus(1 to 50)
    val dir = tmpDir("ssj-cswap").toString
    SsjIndex.build(all.filter(col("doc_id") <= 40), dir,
      tauMilli = 500, buckets = 8)
    SsjIndex.admit(all.filter(col("doc_id") > 40), dir).count()
    val q = corpus(30 to 35).select((col("doc_id") + 1000L).as("doc_id"),
      col("text"))
    val before = SsjIndex.lookup(q, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    // hand-build the docs-store mid-swap crash: a complete folded
    // replacement staged, live renamed ASIDE, promote never ran
    spark.read.parquet(s"$dir/docs").withColumn("b2", lit(0L))
      .withColumn("db2", pmod(xxhash64(col("doc_id")), lit(8L)))
      .drop("batch", "db")
      .withColumnRenamed("b2", "batch").withColumnRenamed("db2", "db")
      .repartition(col("db"))
      .write.partitionBy("batch", "db").parquet(s"$dir/docs.next")
    assert(fs.rename(p("docs"), p("docs.old")))
    // next call recovers the swap and serves the folded store
    val after = SsjIndex.lookup(q, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == before)
    assert(!fs.exists(p("docs.old")) && !fs.exists(p("docs.next")))
    val bs = spark.read.parquet(s"$dir/docs").select("batch").distinct()
      .collect().map(_.get(0).toString.toLong).toSet
    assert(bs == Set(0L), "the promoted store is the folded one")
  }
}
