package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Train/eval decontamination: find corpus documents that share n-gram
 * shingles with a benchmark/eval set, so they can be dropped before
 * training (leaked eval items are the classic way training corpora
 * contaminate benchmark scores).
 *
 * Shape: an inverted-index equi-join on the shingle — corpus shingles ×
 * benchmark shingles meet only where the SAME shingle occurs on both
 * sides, then per-(corpus doc, bench doc) counts are thresholded. The
 * benchmark side is tiny (eval sets are thousands of docs, the corpus is
 * billions), so the join is effectively a semi-probe of the corpus
 * shingle stream against a small build side.
 *
 * Skew guard (`maxDf`): boilerplate shingles ("in this paper we")
 * appearing in a large fraction of the corpus would fan the join out
 * quadratically AND produce meaningless matches. Dropping shingles with
 * corpus document-frequency above `maxDf` bounds any shingle's join
 * fan-out at `maxDf`·|bench-side occurrences| and is standard
 * decontamination practice — matching is evidence only when the shared
 * shingle is RARE.
 */
object Decontamination {

  /**
   * Overlap report: one row per (doc_id, bench_id) pair sharing at least
   * `minShared` distinct surviving shingles, with the matched-shingle
   * count and the fraction of the benchmark doc's shingles matched.
   *
   * Corpus and benchmark are treated as INDEPENDENT datasets: equal ids
   * on the two sides are a coincidence of id assignment, not identity,
   * so same-id pairs are reported like any other (both sides being
   * sequentially numbered from 1 is the common case, and suppressing
   * those pairs would hide genuine contamination). Only when the
   * benchmark rows are literally a subset of the corpus — same id space,
   * same rows — set `benchIsCorpusSubset = true` to drop the trivial
   * doc-matches-itself pairs.
   */
  def overlaps(corpus: DataFrame, benchmark: DataFrame, minShared: Int,
      maxDf: Option[Int] = None, w: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      benchIsCorpusSubset: Boolean = false): DataFrame = {
    val cs = Dedup.shingled(corpus, idCol, textCol, w)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
    val bsFull = Dedup.shingled(benchmark, idCol, textCol, w)
      .select(col("doc_id").as("bench_id"), col("shingles"))
    val bs = bsFull
      .select(col("bench_id"), size(col("shingles")).as("n_bench"),
        explode(col("shingles")).as("s"))
    // document-frequency prune on the CORPUS side (the skew source);
    // shingles are distinct per doc, so count(*) = document frequency
    val csPruned = maxDf match {
      case None => cs
      case Some(cap) =>
        val rare = cs.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("s")
        cs.join(rare, "s")
    }
    val joined = csPruned.join(bs, "s")
    val paired =
      if (benchIsCorpusSubset) joined.filter(col("doc_id") =!= col("bench_id"))
      else joined
    paired
      .groupBy("doc_id", "bench_id", "n_bench")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"), col("bench_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_bench").cast("double"), 6)
          .as("bench_frac"))
  }

  /**
   * [[overlaps]] with a Bloom pre-filter on the corpus shingle stream —
   * the 100-TB path. Rationale: the benchmark side is small in DOCS but
   * large in DISTINCT SHINGLES (10k docs × ~1k shingles = 10⁷ strings —
   * gigabytes as a broadcast hash table, megabytes as a Bloom filter at
   * 1% fpp). Pre-filtering corpus shingles through the Bloom keeps the
   * corpus side scan-speed and un-shuffled; the document-frequency prune
   * and the exact inverted-index join then run over the tiny survivor
   * stream (true matches + fpp·|corpus| false positives).
   *
   * Result-identical to [[overlaps]]: Bloom filters have no false
   * negatives, a surviving shingle keeps ALL its corpus occurrences (so
   * its document frequency is unchanged), and false positives die in the
   * exact join. DeconSpec asserts the equality.
   */
  def overlapsBloom(corpus: DataFrame, benchmark: DataFrame, minShared: Int,
      maxDf: Option[Int] = None, w: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      fpp: Double = 0.01,
      benchIsCorpusSubset: Boolean = false): DataFrame = {
    // build the filter over xxhash64(s) LONGS so the corpus-side probe can
    // be Spark's native BloomFilterMightContain (codegen'd, no per-row
    // boxing) instead of a Scala UDF — the probe hashes with the same
    // xxhash64 and tests the long (see BloomProbe's build/probe contract)
    val benchHashes = Dedup.shingled(benchmark, idCol, textCol, w)
      .select(explode(col("shingles")).as("s")).distinct()
      .select(xxhash64(col("s")).as("h"))
    val expected = math.max(1L, benchHashes.count())
    val bloom = benchHashes.stat.bloomFilter("h", expected, fpp)
    val cs = Dedup.shingled(corpus, idCol, textCol, w)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .filter(graft.functions.BloomProbe.mightContain(
        corpus.sparkSession, bloom, col("s")))
    val bs = Dedup.shingled(benchmark, idCol, textCol, w)
      .select(col("doc_id").as("bench_id"), size(col("shingles")).as("n_bench"),
        explode(col("shingles")).as("s"))
    val csPruned = maxDf match {
      case None => cs
      case Some(cap) =>
        // df over survivors only — a Bloom-passing shingle keeps every
        // one of its corpus occurrences, so this equals its global df
        val rare = cs.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("s")
        cs.join(rare, "s")
    }
    val joined = csPruned.join(bs, "s")
    val paired =
      if (benchIsCorpusSubset) joined.filter(col("doc_id") =!= col("bench_id"))
      else joined
    paired
      .groupBy("doc_id", "bench_id", "n_bench")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"), col("bench_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_bench").cast("double"), 6)
          .as("bench_frac"))
  }

  /**
   * Span-level decontamination — the surgical alternative to dropping
   * whole documents: every corpus token covered by a w-token window
   * whose exact sequence also occurs in the benchmark is cut, and the
   * survivors reassemble in order. One row per corpus doc:
   * (doc_id, n_tokens, n_removed, text_clean). A mostly-clean document
   * keeps its clean text instead of being lost to one leaked sentence.
   *
   * `maxDf` prunes corpus-frequent windows before matching, exactly like
   * [[overlaps]]: a boilerplate window shared with the benchmark is not
   * leak evidence, and masking it would shred ordinary text. Frequency
   * is DOCUMENT frequency (distinct docs containing the window), so one
   * degenerate document repeating a leaked span cannot push that span
   * over the cap and exempt it from masking corpus-wide.
   *
   * Scale shape: both window streams project to md5 keys at the scan;
   * the benchmark window set is small and distinct (AQE broadcasts it),
   * the df prune is a map-side-combined count, and the rewrite joins on
   * (doc_id, position) — see [[Boilerplate.dropCovered]].
   */
  def maskSpans(corpus: DataFrame, benchmark: DataFrame, w: Int = 3,
      maxDf: Option[Int] = None,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ct = corpus.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val bt = benchmark.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val cw = Boilerplate.tokenWindows(ct, w, "doc_id", "toks")
    val bw = Boilerplate.tokenWindows(bt, w, "doc_id", "toks")
      .select("wh").distinct()
    val cwPruned = maxDf match {
      case None => cw
      case Some(cap) =>
        val rare = cw.groupBy("wh")
          .agg(count_distinct(col("doc_id")).as("df"))
          .filter(col("df") <= cap).select("wh")
        cw.join(rare, "wh")
    }
    val hits = cwPruned.join(bw, "wh").select("doc_id", "i")
    Boilerplate.dropCovered(ct, hits, w, "doc_id", "toks")
  }

  /** The corpus with every document overlapping the benchmark removed —
    * the actual decontamination step (left-anti on the report). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, minShared: Int,
      maxDf: Option[Int] = None, w: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      benchIsCorpusSubset: Boolean = false): DataFrame = {
    val contaminated = overlaps(corpus, benchmark, minShared, maxDf, w,
      idCol, textCol, benchIsCorpusSubset)
      .select(col("doc_id").as(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /**
   * SEMANTIC decontamination — the paraphrase-contamination screen the
   * n-gram paths structurally cannot catch (a reworded eval item shares
   * no shingle with its source): one row per (corpus doc, benchmark
   * doc) whose embeddings sit in the same coarse cell with cosine ≥
   * `tau`. Run it alongside [[overlaps]]: n-grams catch verbatim and
   * near-verbatim leaks, embeddings catch rewrites.
   *
   * Shape: the benchmark side is tiny (eval sets, not corpora), so it
   * BROADCASTS into a same-cell equi-join — the corpus is scanned once,
   * never shuffled (the [[Semantic.semanticDedup]] candidate bound,
   * cross-frame). Cosines round to 1e-6 before thresholding (the
   * family's engine-portable float discipline). Zero-norm vectors carry
   * no direction and are dropped on both sides.
   */
  def semanticOverlaps(corpusEmb: DataFrame, benchEmb: DataFrame,
      tau: Double, idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    def prep(df: DataFrame, outId: String, v: String, n: String) =
      df.select(col(idCol).as(outId), col(cellCol).as("cell"),
          transform(col(vecCol), x => x.cast("double")).as(v))
        .withColumn(n, Similarity.norm(col(v)))
        .filter(col(n) > 0)
    val c = prep(corpusEmb, "corpus_id", "c_v", "c_nrm")
    val b = prep(benchEmb, "bench_id", "b_v", "b_nrm")
    c.join(broadcast(b), "cell")
      .select(col("corpus_id"), col("bench_id"),
        round(Similarity.dot(col("c_v"), col("b_v")) /
          (col("c_nrm") * col("b_nrm")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
  }

  /**
   * [[semanticOverlaps]] composed with a PERSISTED IVF index
   * ([[Similarity.buildIvfIndex]]) — the screen-against-index shape a
   * production deployment actually runs: the corpus side is the index's
   * own cell-partitioned corpus (already assigned at build/admission
   * time — no re-clustering, no caller-supplied cell column), and the
   * benchmark side is assigned against the SAME trained sidecar
   * ([[Similarity.assignWithIndex]], dim-validated). Same-cell
   * broadcast equi-join + rounded cosine threshold, exactly the
   * [[semanticOverlaps]] contract.
   *
   * Scale shape: the indexed corpus is scanned once and never shuffled;
   * the benchmark (eval sets, tiny) broadcasts; the one-time clustering
   * cost lives in the index build every other query already amortizes.
   */
  def semanticOverlapsIndexed(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, benchEmb: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    Similarity.recoverCorpus(spark, indexDir)
    val c = spark.read.parquet(s"$indexDir/corpus")
      .select(col("vec_id").as("corpus_id"), col("cell"),
        transform(col("embedding"), x => x.cast("double")).as("c_v"))
      .withColumn("c_nrm", Similarity.norm(col("c_v")))
      .filter(col("c_nrm") > 0)
    val b = Similarity.assignWithIndex(benchEmb, indexDir, idCol, vecCol)
      .select(col(idCol).as("bench_id"), col("cell"),
        transform(col(vecCol), x => x.cast("double")).as("b_v"))
      .withColumn("b_nrm", Similarity.norm(col("b_v")))
      .filter(col("b_nrm") > 0)
    c.join(broadcast(b), "cell")
      .select(col("corpus_id"), col("bench_id"),
        round(Similarity.dot(col("c_v"), col("b_v")) /
          (col("c_nrm") * col("b_nrm")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
  }

  /** Eval-hygiene composition: assign deterministic splits
    * ([[Sampling.assignSplit]]), then strip training docs that leak
    * into the held-out split. Returns `(doc_id, split)` — the train
    * rows post-decontamination, other splits untouched. One shared
    * implementation backs the `pipe_split_decon` oracle query and the
    * scale probe, so the two can't drift. */
  def splitAndStrip(docs: DataFrame, fractions: Seq[(String, Double)],
      trainSplit: String = "train", benchSplit: String = "test",
      minShared: Int = 3, maxDf: Option[Int] = None,
      idCol: String = "doc_id", textCol: String = "text",
      salt: String = "split"): DataFrame = {
    val split = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("text"),
      Sampling.assignSplit(col(idCol), fractions, salt).as("split"))
    val train = split.filter(col("split") === trainSplit)
    val bench = split.filter(col("split") === benchSplit)
    val leaks = overlaps(train, bench, minShared, maxDf)
    train.join(leaks.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("split"))
      .unionByName(split.filter(col("split") =!= trainSplit)
        .select(col("doc_id"), col("split")))
  }
}
