package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sim.WarehouseSim

/**
 * Plan + layout pins for the persisted build-once/query-many IVF index
 * ([[Similarity.buildIvfIndex]] / [[Similarity.indexedTopK]]):
 *
 *  - the index layout round-trips: k-row centroid sidecar, corpus
 *    partitioned by cell, nothing lost;
 *  - the QUERY plan contains NO aggregate of any kind — training never
 *    leaks into the serve path;
 *  - the corpus scan carries a literal partition filter on `cell` and
 *    demonstrably reads FEWER files than live in the index (pruning is
 *    real, not just syntactic);
 *  - all joins broadcast (probe frame + query vectors) — the corpus is
 *    scanned, never shuffled.
 */
class IvfIndexSpec extends TestBase
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private val sfDir = "/root/testdata/sf0.001"
  private val kCells = 8

  private lazy val emb = WarehouseSim.read(spark, sfDir, "embeddings")
  private lazy val idxDir: String = {
    val d = tmpDir("ivf-index").toString
    Similarity.buildIvfIndex(emb, d, kCells = kCells, iters = 2)
    d
  }

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

  test("index layout round-trips: k-row sidecar, cell-partitioned corpus") {
    val cents = spark.read.parquet(s"$idxDir/centroids")
    assert(cents.count() == kCells)
    assert(cents.columns.sorted.toSeq == Seq("cell", "cv"))
    val corpus = spark.read.parquet(s"$idxDir/corpus")
    assert(corpus.columns.sorted.toSeq ==
      Seq("batch", "cell", "embedding", "vec_id"))
    assert(corpus.count() == emb.count(), "no rows may be lost in the build")
    val cells = corpus.select("cell").distinct().count()
    assert(cells > 1 && cells <= kCells,
      s"corpus cells must come from the $kCells trained centroids, got $cells")
  }

  test("query plan: no aggregates, pruned partition filter, broadcast-only joins") {
    // 2 queries x nprobe 2 probe at most 4 of the 8 cells — pruning must
    // be visible both in the plan and in the files-read metric
    val topk = Similarity.indexedTopK(spark, emb.filter(col("vec_id") < 2),
      idxDir, k = 5, nprobe = 2)
    val rows = topk.collect()
    assert(rows.nonEmpty, "query must return results")
    // AdaptiveSparkPlanHelper.collect descends through AQE query stages;
    // post-execution the toString carries the final plan
    val plan = topk.queryExecution.executedPlan
    val planStr = plan.toString

    assert(!planStr.contains("Aggregate"),
      s"the serve path must contain no (Hash/Sort/Object)Aggregate — " +
        s"training leaked into the query plan:\n$planStr")
    assert(!planStr.contains("SortMergeJoin") &&
      !planStr.contains("ShuffledHashJoin"),
      s"probe and query joins must broadcast — the corpus may not " +
        s"shuffle:\n$planStr")

    val scans = collectWithSubqueries(plan) { case f: FileSourceScanExec => f }
    val corpusScan = scans
      .find(_.relation.location.rootPaths.exists(_.toString.contains("corpus")))
      .getOrElse(fail(s"no corpus file scan among ${scans.size} scans " +
        s"in plan:\n$planStr"))
    assert(corpusScan.partitionFilters.exists(_.references.exists(
        _.name == "cell")),
      s"corpus scan must carry a literal cell partition filter, got " +
        s"${corpusScan.partitionFilters}")
    val filesRead = corpusScan.metrics("numFiles").value
    val filesTotal = parquetFiles(s"$idxDir/corpus")
    assert(filesRead < filesTotal,
      s"pruning must skip unprobed cells: read $filesRead of $filesTotal")
  }

  test("extendIvfIndex admits a new batch by assignment only; the union serves") {
    import spark.implicits._
    val dir = tmpDir("ivf-extend").toString
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    Similarity.buildIvfIndex(base, dir, kCells = kCells, iters = 2)
    val cellsBefore = spark.read.parquet(s"$dir/centroids")
      .select("cell", "cv").as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    Similarity.extendIvfIndex(fresh, dir)
    // centroids untouched — admission is assignment, never retraining
    val cellsAfter = spark.read.parquet(s"$dir/centroids")
      .select("cell", "cv").as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(cellsAfter === cellsBefore, "extend must not touch the sidecar")
    val corpus = spark.read.parquet(s"$dir/corpus")
    assert(corpus.count() === emb.count(), "union must serve all rows")
    // every admitted row sits in its nearest trained cell
    val centArr = cellsBefore.map { case (c, v) => (c, v.toArray) }
    val want = graft.pipeline.Semantic.assignTo(fresh, centArr)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toMap
    val got = corpus.join(fresh.select("vec_id"), "vec_id")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(got === want, "admitted rows must land in their nearest cell")
    // serving the extended index with full probe equals brute force over
    // the WHOLE corpus — the extension is first-class at query time
    val q = emb.filter(col("vec_id") < 8)
    val full = Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = kCells)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.bruteForceTopK(q, emb, 5)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full === bf)
  }

  test("filtered search: pre-filter semantics, predicate pushed to the scan") {
    import spark.implicits._
    val dir = tmpDir("ivf-filter").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2,
      attrCols = Seq("label"))
    val q = emb.filter(col("vec_id") < 8)
    // a comparison predicate: pushable to parquet (a `% 2` form would
    // filter correctly but stay in the Spark filter node)
    val pred = col("label") <= 3
    // full probe + predicate == brute force over ONLY the matching
    // candidates: every returned row satisfies the filter and ranks are
    // dense within the filtered set (pre-filter, not post-filter)
    val got = Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = kCells,
        where = Some(pred))
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(q, emb.filter(pred), 5)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got === want, "filtered full-probe must equal brute force over " +
      "the filtered candidates")
    // the predicate reaches the parquet scan as a pushed filter
    val topk = Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = 2,
      where = Some(pred))
    topk.collect()
    val scan = collectWithSubqueries(topk.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }.find(_.relation.location.rootPaths.exists(_.toString.contains("corpus")))
      .getOrElse(fail("no corpus scan"))
    assert(scan.metadata("PushedFilters").contains("label"),
      s"label predicate must push to the scan: ${scan.metadata("PushedFilters")}")
  }

  test("ivfIndexStats: one row per trained cell, balance sums to k") {
    import spark.implicits._
    val stats = Similarity.ivfIndexStats(spark, idxDir)
      .select("cell", "n_vectors", "balance")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(stats.length === kCells, "one row per trained cell, always")
    assert(stats.map(_._2).sum === emb.count(),
      "cell populations must partition the corpus")
    // balance = n * k / total, so it averages exactly 1 over the cells
    val meanBal = stats.map(_._3).sum / kCells
    assert(math.abs(meanBal - 1.0) < 1e-4,
      s"balance factors must average 1.0, got $meanBal")
    // after an extension the report reflects the union
    val dir2 = tmpDir("ivf-stats2").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0), dir2,
      kCells = kCells, iters = 2)
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 5 === 0), dir2)
    val total2 = Similarity.ivfIndexStats(spark, dir2)
      .agg(org.apache.spark.sql.functions.sum("n_vectors"))
      .head().getLong(0)
    assert(total2 === emb.count(), "stats must cover admitted batches")
  }

  test("compactIvfIndex folds admissions into batch=0 with bounded files") {
    import spark.implicits._
    val dir = tmpDir("ivf-compact").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 === 0), dir,
      kCells = kCells, iters = 2)
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 1), dir)
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 2), dir)
    val beforeRows = spark.read.parquet(s"$dir/corpus")
      .select("vec_id", "cell").as[(Long, Int)].collect().toSet
    val filesBefore = parquetFiles(s"$dir/corpus")

    Similarity.compactIvfIndex(spark, dir, filesPerCell = 1)

    val after = spark.read.parquet(s"$dir/corpus")
    assert(after.select("vec_id", "cell").as[(Long, Int)].collect().toSet
      === beforeRows, "compaction must not move, drop, or re-cell any row")
    assert(after.select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
      === Seq(0L), "everything folds into batch=0")
    val filesAfter = parquetFiles(s"$dir/corpus")
    assert(filesAfter <= kCells && filesAfter < filesBefore,
      s"files must shrink to <= 1/cell: $filesBefore -> $filesAfter")
    assert(!new java.io.File(s"$dir/corpus.compacting").exists(),
      "staging dir must be swapped away")
    // admission restarts above the compacted base
    Similarity.extendIvfIndex(emb.limit(3), dir)
    assert(spark.read.parquet(s"$dir/corpus")
      .filter(col("batch") === 1L).count() === 3)
  }

  test("meta sidecar records the index's self-description at build") {
    import spark.implicits._
    val meta = spark.read.parquet(s"$idxDir/meta")
      .select("dim", "k_cells", "attr_cols")
      .as[(Int, Int, Seq[String])].head()
    assert(meta === ((64, kCells, Seq.empty[String])),
      "meta must carry the trained dim, cell count, and payload columns")
  }

  test("wrong-dim vectors fail LOUDLY on admission and on serve") {
    import spark.implicits._
    // a truncated vector would zip_with-null-pad into an arbitrary cell
    // without the guard — the silent-corruption channel the meta sidecar
    // closes
    val short = Seq((999999L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val eAdmit = intercept[Exception] {
      Similarity.extendIvfIndex(short, idxDir, batchId = Some(77L))
    }
    assert(eAdmit.getMessage.contains("dim must be 64"),
      s"admission must name the dim mismatch: ${eAdmit.getMessage}")
    val eServe = intercept[Exception] {
      Similarity.indexedTopK(spark, short, idxDir, k = 3).collect()
    }
    assert(eServe.getMessage.contains("dim must be 64"),
      s"serve must name the dim mismatch: ${eServe.getMessage}")
    // no partial admission may have landed
    assert(spark.read.parquet(s"$idxDir/corpus")
      .filter(col("batch") === 77L).count() === 0,
      "a refused admission must not leave rows behind")
  }

  test("mismatched attrCols extension is refused before any write") {
    val dir = tmpDir("ivf-attrguard").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2,
      attrCols = Seq("label"))
    val e = intercept[IllegalArgumentException] {
      Similarity.extendIvfIndex(emb.limit(3), dir) // missing label payload
    }
    assert(e.getMessage.contains("attrCols"),
      s"the schema-drift refusal must name attrCols: ${e.getMessage}")
  }

  test("n_files tracks admissions and compaction returns it to <= filesPerCell") {
    import spark.implicits._
    val dir = tmpDir("ivf-nfiles").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 === 0), dir,
      kCells = kCells, iters = 2)
    def stats(): Map[Int, (Long, Long)] =
      Similarity.ivfIndexStats(spark, dir)
        .select("cell", "n_vectors", "n_files")
        .as[(Int, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val s0 = stats()
    assert(s0.values.forall { case (n, f) => f === (if (n > 0) 1L else 0L) },
      s"the sharded build writes exactly one file per non-empty cell: $s0")
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 1), dir)
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 2), dir)
    val s1 = stats()
    assert(s1.exists { case (_, (_, f)) => f > 1L },
      s"admitted batches must raise per-cell file counts: $s1")
    Similarity.compactIvfIndex(spark, dir, filesPerCell = 1)
    val s2 = stats()
    assert(s2.values.forall(_._2 <= 1L),
      s"compaction must return n_files to <= filesPerCell: $s2")
    assert(s2.values.map(_._1).sum === emb.count(),
      "compaction must not lose rows")
  }

  test("every compaction-swap crash state auto-recovers on the next call") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    def fsOf(p: org.apache.hadoop.fs.Path) = p.getFileSystem(conf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def build(dir: String): Set[Long] = {
      Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2)
      emb.select("vec_id").as[Long].collect().toSet
    }
    def served(dir: String): Set[Long] =
      spark.read.parquet(s"$dir/corpus").select("vec_id")
        .as[Long].collect().toSet

    // crash DURING the staging write: live intact, stale partial staging
    val d1 = tmpDir("ivf-crash1").toString
    val all1 = build(d1)
    val fs1 = fsOf(p(d1))
    fs1.mkdirs(p(s"$d1/corpus.compacting")) // garbage from a dead attempt
    Similarity.compactIvfIndex(spark, d1, filesPerCell = 1)
    assert(served(d1) === all1, "stale staging must be overwritten")
    assert(!fs1.exists(p(s"$d1/corpus.compacting")) &&
      !fs1.exists(p(s"$d1/corpus.old")))

    // crash BETWEEN rename-aside and promote: no live, complete staging
    // (+ the aside) — the next READER must auto-promote and serve
    val d2 = tmpDir("ivf-crash2").toString
    val all2 = build(d2)
    val fs2 = fsOf(p(d2))
    // simulate: the compacted staging is the (complete) live corpus
    // copied aside; live moved to corpus.old exactly as step 1 does
    org.apache.hadoop.fs.FileUtil.copy(fs2, p(s"$d2/corpus"),
      fs2, p(s"$d2/corpus.compacting"), false, conf)
    assert(fs2.rename(p(s"$d2/corpus"), p(s"$d2/corpus.old")))
    val topk = Similarity.indexedTopK(spark,
      emb.filter(col("vec_id") < 2), d2, k = 3, nprobe = 2)
    assert(topk.count() > 0, "a reader must serve through the crash state")
    assert(served(d2) === all2, "promotion must lose nothing")
    assert(!fs2.exists(p(s"$d2/corpus.compacting")) &&
      !fs2.exists(p(s"$d2/corpus.old")), "recovery must clean both dirs")

    // crash BEFORE the final delete: live + stale corpus.old
    val d3 = tmpDir("ivf-crash3").toString
    val all3 = build(d3)
    val fs3 = fsOf(p(d3))
    org.apache.hadoop.fs.FileUtil.copy(fs3, p(s"$d3/corpus"),
      fs3, p(s"$d3/corpus.old"), false, conf)
    assert(Similarity.ivfIndexStats(spark, d3)
      .agg(sum("n_vectors")).head().getLong(0) === all3.size.toLong)
    assert(!fs3.exists(p(s"$d3/corpus.old")),
      "the stale aside must be dropped by the next index call")
  }

  test("deleteFromIvfIndex rewrites only touched partitions; " +
      "emptied cells vanish; untouched files stay byte-identical") {
    import spark.implicits._
    val dir = tmpDir("ivf-delete").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 =!= 2), dir,
      kCells = kCells, iters = 2)
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 2), dir)
    val before = spark.read.parquet(s"$dir/corpus")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    // victim set: every id of ONE whole cell (the emptied-partition
    // case) + half the ids of a second cell + ids that do not exist;
    // a third cell stays untouched to pin physical no-rewrite
    val byCell = before.groupBy(_._2).map { case (c, m) =>
      c -> m.keys.toSeq.sorted }
    val cells = byCell.keys.toSeq.sorted
    assert(cells.size >= 3, s"fixture needs >= 3 populated cells: $cells")
    val cellGone = cells(0)
    val wholeCell = byCell(cellGone).toSet
    val spread = byCell(cells(1)).zipWithIndex
      .collect { case (id, i) if i % 2 == 0 => id }.toSet
    val victims = wholeCell ++ spread
    val untouchedCell = cells(2)
    def filesOf(cell: Int): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(s"${f.getPath}:${f.lastModified()}:${f.length()}")
      new java.io.File(s"$dir/corpus").listFiles().toSeq
        .filter(_.isDirectory) // skip _SUCCESS etc.
        .flatMap(b => b.listFiles().toSeq.filter(_.getName == s"cell=$cell"))
        .flatMap(walk).toSet
    }
    val untouchedFiles = filesOf(untouchedCell)

    val delFrame = (victims ++ Set(999999901L, 999999902L)).toSeq
      .toDF("vec_id")
    val n = Similarity.deleteFromIvfIndex(spark, dir, delFrame)
    assert(n === victims.size.toLong,
      "the return value counts exactly the rows actually deleted")
    val after = spark.read.parquet(s"$dir/corpus")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(after === before -- victims,
      "survivors keep their cells; victims are gone")
    assert(!new java.io.File(s"$dir/corpus")
      .listFiles().exists(b => new java.io.File(b, s"cell=$cellGone").exists()),
      "a fully-emptied cell's directories must be dropped, not left stale")
    assert(filesOf(untouchedCell) === untouchedFiles,
      "untouched partitions must stay physically identical (no rewrite)")
    // the serve path sees exactly the remaining corpus
    val q = emb.filter(col("vec_id") < 8)
    val got = Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = kCells)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val remaining = emb.join(after.keys.toSeq.toDF("vec_id"), "vec_id")
    val want = Similarity.bruteForceTopK(q, remaining, 5)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got === want, "full-probe serve == brute force over survivors")
    // idempotent: the same retraction again deletes nothing
    assert(Similarity.deleteFromIvfIndex(spark, dir, delFrame) === 0L)
    assert(Similarity.ivfIndexStats(spark, dir)
      .agg(sum("n_vectors")).head().getLong(0) === after.size.toLong)
  }

  test("trainFraction: centroids come from the deterministic sample, " +
      "the assignment still covers everyone") {
    import spark.implicits._
    val dir = tmpDir("ivf-trainfrac").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2,
      trainFraction = 0.5)
    // the sidecar equals training on the sample directly — nothing else
    val sample = graft.pipeline.Sampling
      .deterministicSample(emb, "vec_id", 0.5, "ivftrain")
    val want = graft.pipeline.Semantic
      .kmeansCentroids(sample, kCells, 2)
      .map { case (c, v) => (c, v.toSeq) }.toMap
    val got = spark.read.parquet(s"$dir/centroids")
      .select("cell", "cv").as[(Int, Seq[Double])].collect().toMap
    assert(got === want, "train-on-sample must be replayable exactly")
    // ...but the corpus still carries EVERY vector, sample or not
    assert(spark.read.parquet(s"$dir/corpus").count() === emb.count())
    assert(Similarity.indexedTopK(spark, emb.filter(col("vec_id") < 2),
      dir, k = 3, nprobe = 2).count() > 0)
    intercept[IllegalArgumentException] {
      Similarity.buildIvfIndex(emb, dir, kCells = kCells,
        trainFraction = 0.0)
    }
  }

  test("full lifecycle composition: build -> extend -> delete -> compact " +
      "-> extend -> serve equals brute force over the surviving set") {
    import spark.implicits._
    val dir = tmpDir("ivf-lifecycle").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 === 0), dir,
      kCells = kCells, iters = 2)
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 1), dir)
    val n1 = Similarity.deleteFromIvfIndex(spark, dir,
      emb.filter(col("vec_id") % 7 === 0).select("vec_id"))
    assert(n1 > 0, "the fixture must delete something")
    Similarity.compactIvfIndex(spark, dir, filesPerCell = 1)
    // post-compaction admission continues above batch=0, deletion holes
    // and all
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 2), dir)
    val surviving = emb.filter(
      (col("vec_id") % 3 =!= 2 && col("vec_id") % 7 =!= 0) ||
        col("vec_id") % 3 === 2)
    assert(spark.read.parquet(s"$dir/corpus").count() === surviving.count(),
      "every stage must compose without losing or resurrecting rows")
    val q = emb.filter(col("vec_id") < 8)
    val got = Similarity.indexedTopK(spark, q, dir, k = 5, nprobe = kCells)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(q, surviving, 5)
      .select("q_id", "c_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got === want,
      "the composed lifecycle must serve exactly the surviving corpus")
    // stats stays coherent across the whole chain
    val stats = Similarity.ivfIndexStats(spark, dir)
    assert(stats.agg(sum("n_vectors")).head().getLong(0) === surviving.count())
  }

  test("admission high-water guard: a fresh-checkpoint restart is refused " +
      "loudly; an asserted replay replaces; a retracted id is never reused") {
    import spark.implicits._
    val dir = tmpDir("ivf-hwm").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 === 0), dir,
      kCells = kCells, iters = 2)
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 1), dir,
      batchId = Some(1L))
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 2), dir,
      batchId = Some(2L))
    val before = spark.read.parquet(s"$dir/corpus")
      .filter(col("batch") === 1L).select("vec_id").as[Long].collect().toSet
    // a NEW stream restarted from a FRESH checkpoint re-presents batch
    // id 1 — without the guard this silently overwrote the earlier
    // admission (round-12 verdict's silent-data-loss channel)
    val e = intercept[IllegalArgumentException] {
      Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 0)
        .limit(5), dir, batchId = Some(1L))
    }
    assert(e.getMessage.contains("high-water"),
      s"the refusal must name the mark: ${e.getMessage}")
    assert(spark.read.parquet(s"$dir/corpus").filter(col("batch") === 1L)
      .select("vec_id").as[Long].collect().toSet === before,
      "a refused admission must not have touched batch 1")
    // the SAME admission, ASSERTED as a replay, replaces its own
    // partitions — the idempotent-retry feature survives the guard
    Similarity.extendIvfIndex(emb.filter(col("vec_id") % 3 === 1), dir,
      batchId = Some(1L), allowReplay = true)
    assert(spark.read.parquet(s"$dir/corpus").count() === emb.count())
    // retract batch 2 wholesale: even with its directories gone, the id
    // stays burned — the next auto-id admission takes 3, never 2
    Similarity.deleteFromIvfIndex(spark, dir,
      emb.filter(col("vec_id") % 3 === 2).select("vec_id"))
    Similarity.extendIvfIndex(
      emb.filter(col("vec_id") % 3 === 2).limit(3), dir)
    val batches = spark.read.parquet(s"$dir/corpus")
      .select(col("batch").cast("long")).distinct().as[Long]
      .collect().sorted.toSeq
    assert(batches.contains(3L) && !batches.contains(2L),
      s"auto-id must continue above the retracted id: $batches")
  }

  test("NULL embeddings fail loudly on admission and on serve") {
    import spark.implicits._
    val nullRow = Seq((888888L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val eAdmit = intercept[Exception] {
      Similarity.extendIvfIndex(nullRow, idxDir, batchId = Some(88L))
    }
    assert(eAdmit.getMessage.contains("got NULL"),
      s"admission must name the null vector: ${eAdmit.getMessage}")
    val eServe = intercept[Exception] {
      Similarity.indexedTopK(spark, nullRow, idxDir, k = 3).collect()
    }
    assert(eServe.getMessage.contains("got NULL"),
      s"serve must name the null vector: ${eServe.getMessage}")
    assert(spark.read.parquet(s"$idxDir/corpus")
      .filter(col("batch") === 88L).count() === 0,
      "a refused admission must not leave rows behind")
  }

  test("a truncated centroid sidecar is refused loudly on BOTH strategies") {
    val dir = tmpDir("ivf-truncated").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2)
    val sch = spark.read.parquet(s"$dir/centroids").schema
    val keep = spark.read.parquet(s"$dir/centroids").limit(3).collect()
    spark.createDataFrame(java.util.Arrays.asList(keep: _*), sch)
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids")
    def boom(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException] { f }
      assert(e.getMessage.contains("holds 3 cells"),
        s"the refusal must name the truncation: ${e.getMessage}")
    }
    val q = emb.filter(col("vec_id") < 2)
    boom(Similarity.indexedTopK(spark, q, dir, k = 3))
    boom(Similarity.assignWithIndex(q, dir))
    // the join path used to crossJoin the corrupt sidecar and silently
    // assign/admit/return NOTHING — now both strategies share the guard
    spark.conf.set(graft.pipeline.Semantic.LiteralAssignMaxKey, "0")
    try {
      boom(Similarity.indexedTopK(spark, q, dir, k = 3))
      boom(Similarity.assignWithIndex(q, dir))
      boom(Similarity.extendIvfIndex(q, dir))
      boom(Similarity.nprobeRecallCurve(spark, q, dir, k = 3, maxProbe = 2))
    } finally spark.conf.unset(graft.pipeline.Semantic.LiteralAssignMaxKey)
  }

  test("a rebuild clears a stale compaction staging dir — no rebuild crash " +
      "state can promote it") {
    val dir = tmpDir("ivf-restale").toString
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // park a stale PARTIAL staging from a dead compaction attempt; if a
    // rebuild left it and crashed after dropping the live corpus,
    // recoverCorpus would promote garbage under the new sidecars
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$dir/corpus.compacting/batch=0/cell=0"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/corpus.old"))
    Similarity.buildIvfIndex(emb, dir, kCells = kCells, iters = 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/corpus.compacting")),
      "the rebuild must drop the stale staging dir")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/corpus.old")),
      "the rebuild must drop the stale aside dir")
    assert(spark.read.parquet(s"$dir/corpus").count() === emb.count())
  }

  test("indexedTopK refuses a missing index and a non-positive nprobe") {
    intercept[IllegalArgumentException] {
      Similarity.indexedTopK(spark, emb, idxDir, k = 5, nprobe = 0)
    }
    // an empty-sidecar dir is a build bug, refused loudly
    val bogus = tmpDir("ivf-none").toString
    spark.read.parquet(s"$idxDir/centroids").limit(0)
      .write.mode("overwrite").parquet(s"$bogus/centroids")
    intercept[IllegalArgumentException] {
      Similarity.indexedTopK(spark, emb, bogus, k = 5)
    }
  }
}
