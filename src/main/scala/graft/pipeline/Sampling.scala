package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / corpus-mixing operators for training-data
 * pipelines.
 *
 * Everything here derives the keep/drop decision from a *content-stable
 * hash of the row id*, never from `rand()` or `DataFrame.sample`:
 *  - re-runs, task retries, and partition re-splits produce the SAME
 *    sample (at 100 TB a speculative re-execution of one task must not
 *    change the corpus);
 *  - the decision is a pure column expression evaluated at scan speed —
 *    a sampling pass over the corpus is filter-pushdown-friendly and
 *    never shuffles;
 *  - two engines (Spark and the DuckDB oracle) agree bit-for-bit, so the
 *    sampled corpus itself is hash-verified, not just its size.
 *
 * The hash is the first 32 bits of md5("salt:id") — uniform enough for
 * rate control, cheap, and mirrorable in any engine with md5. 32 bits
 * (not 16) so the resolution is ~2.3e-10: a token-budget mix of a few
 * million tokens against a 100-TB stratum still computes a non-zero
 * keep threshold instead of silently dropping the stratum.
 */
object Sampling {

  /** Size of the hash space: thresholds live in [0, 2^32]. */
  val HashSpace: Long = 1L << 32

  /** Uniform 32-bit hash in [0, 2^32): integer value of the first eight
    * hex digits of md5("salt:id"). */
  def hash32(id: Column, salt: String): Column =
    hash32Str(id.cast("string"), salt)

  /** Threshold in [0, 2^32] such that `hash32 < threshold` keeps ~rate.
    * Refuses a positive rate that rounds to threshold 0 (below hash
    * resolution) — that would silently drop the stratum entirely. */
  def rateThreshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val t = math.round(rate * HashSpace.toDouble)
    require(rate == 0.0 || t > 0,
      s"rate $rate is below the 32-bit hash resolution (${1.0 / HashSpace}); " +
        "the stratum would be dropped entirely")
    t
  }

  /**
   * Deterministic Bernoulli sample: keep a row iff its id-hash falls
   * below `rate`. Changing `salt` draws an independent sample; keeping it
   * fixed makes samples *nested* (rate 0.1 ⊂ rate 0.2 — handy for scaling
   *-law corpus ladders).
   */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double,
      salt: String = "samp"): DataFrame =
    df.filter(hash32(col(idCol), salt) < lit(rateThreshold(rate)))

  /**
   * Train/validation/test split assignment as a column — disjoint and
   * exhaustive by construction (adjacent half-open hash ranges). Fractions
   * must sum to ≤ 1; any remainder falls into the last split.
   */
  def assignSplit(id: Column, fractions: Seq[(String, Double)],
      salt: String = "split"): Column = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to <= 1")
    val h = hash32(id, salt)
    val bounds = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(rateThreshold)
    // last split absorbs the tail so the assignment is total
    fractions.init.zip(bounds).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), bound), rest) => when(h < lit(bound), lit(name)).otherwise(rest)
    }
  }

  /**
   * Weighted corpus mix: per-stratum keep rates (e.g. up/down-weighting
   * sources when composing a training mix). A stratum absent from
   * `weights` gets `defaultRate`. One scan, no shuffle: the per-row rate
   * is a CASE over the stratum column.
   */
  def weightedMix(df: DataFrame, stratumCol: String,
      weights: Map[String, Double], defaultRate: Double = 1.0,
      idCol: String = "doc_id", salt: String = "mix"): DataFrame =
    df.filter(hash32(col(idCol), salt) <
      mixThreshold(stratumCol, weights, defaultRate))

  private def mixThreshold(stratumCol: String, weights: Map[String, Double],
      defaultRate: Double): Column =
    weights.toSeq.sortBy(_._1)
      .foldRight(lit(rateThreshold(defaultRate)): Column) {
        case ((stratum, rate), rest) =>
          when(col(stratumCol) === lit(stratum), lit(rateThreshold(rate)))
            .otherwise(rest)
      }

  /**
   * Mix audit report — the readout a mix config review needs BEFORE a
   * multi-day training run: per stratum, the corpus volume (docs,
   * tokens), the configured keep rate, and the exact volume the
   * deterministic mix will keep (`kept_*` — not an estimate: the same
   * hash decides both this report and [[weightedMix]]'s filter).
   * One scan + a #strata-row aggregate.
   */
  def mixReport(df: DataFrame, stratumCol: String,
      weights: Map[String, Double], defaultRate: Double = 1.0,
      idCol: String = "doc_id", textCol: String = "text",
      salt: String = "mix"): DataFrame = {
    val rate = weights.toSeq.sortBy(_._1)
      .foldRight(lit(defaultRate): Column) {
        case ((stratum, r), rest) =>
          when(col("stratum") === lit(stratum), lit(r)).otherwise(rest)
      }
    df.select(col(stratumCol).as("stratum"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_toks"),
        (hash32(col(idCol), salt) <
          mixThreshold(stratumCol, weights, defaultRate))
          .cast("long").as("keep"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        sum("keep").as("kept_docs"),
        sum(when(col("keep") === 1, col("n_toks")).otherwise(0L))
          .as("kept_tokens"))
      .withColumn("rate", rate)
      .withColumn("realized_rate",
        round(col("kept_docs").cast("double") / col("n_docs"), 6))
  }

  /**
   * Token-budget corpus mix: training mixes are specified in TOKENS per
   * source, not documents. Computes each stratum's token total (one small
   * aggregate — #strata rows to the driver), derives the keep rate
   * `min(1, budget/total)`, and applies the same deterministic hash
   * filter as [[weightedMix]]. A stratum absent from `budgets` is kept
   * whole. Expected sampled tokens ≈ budget (Bernoulli on docs, so the
   * realized total varies by ±O(√docs·meanTokens)); exact-cut packing
   * afterwards is [[Packing]]'s job.
   */
  def tokenBudgetMix(df: DataFrame, stratumCol: String, tokenCol: String,
      budgets: Map[String, Long], idCol: String = "doc_id",
      salt: String = "tokmix"): DataFrame = {
    val totals = df.groupBy(col(stratumCol)).agg(sum(col(tokenCol)).as("t"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"tokenBudgetMix: null $stratumCol values present — filter or " +
            "bucket them before mixing")
        require(!r.isNullAt(1),
          s"tokenBudgetMix: stratum '${r.getString(0)}' has no non-null " +
            s"$tokenCol values, so no keep rate can be derived")
        r.getString(0) -> r.getLong(1)
      }.toMap
    val rates = budgets.flatMap { case (stratum, budget) =>
      totals.get(stratum).map { total =>
        stratum -> math.min(1.0, budget.toDouble / math.max(1L, total))
      }
    }
    weightedMix(df, stratumCol, rates, defaultRate = 1.0, idCol, salt)
  }

  /**
   * Temperature-controlled corpus mix (the mT5 / XLM-R recipe): sampling
   * probability per stratum ∝ its token share raised to `alpha` (< 1
   * flattens the distribution toward small strata, 1 = proportional),
   * scaled to an overall `budgetTokens` target. Per-stratum keep rate:
   *
   *   p_s  = n_s^alpha / Σ_t n_t^alpha
   *   rate = min(1, budget · p_s / n_s),  rounded to 1e-12
   *
   * The rounding quantizes away cross-engine float drift (pow/Σ order)
   * so the derived hash thresholds are engine-stable. One #strata-row
   * aggregate, then the same shuffle-free hash filter as [[weightedMix]].
   */
  def temperatureMix(df: DataFrame, stratumCol: String, tokenCol: String,
      alpha: Double, budgetTokens: Long, idCol: String = "doc_id",
      salt: String = "tempmix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val totals = df.groupBy(col(stratumCol)).agg(sum(col(tokenCol)).as("t"))
      .collect().map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"temperatureMix: null $stratumCol/$tokenCol totals")
        r.getString(0) -> r.getLong(1).toDouble
      }.sortBy(_._1)
    val norm = totals.map { case (_, n) => math.pow(n, alpha) }.sum
    val rates = totals.map { case (s, n) =>
      val rate = math.min(1.0, budgetTokens.toDouble *
        (math.pow(n, alpha) / norm) / n)
      s -> BigDecimal(rate).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
    weightedMix(df, stratumCol, rates, defaultRate = 1.0, idCol, salt)
  }

  /**
   * Exact-size stratified sample: the `n` rows with the smallest id-hash
   * per stratum (hash-ordered so the choice is uniform AND deterministic;
   * id tie-break for hash collisions). One shuffle on the stratum column.
   *
   * At scale prefer [[deterministicSample]] / [[weightedMix]] (shuffle-
   * free) unless exact per-stratum counts are required; a skewed stratum
   * here is one window partition — cap input first if a stratum can
   * exceed executor memory.
   */
  def stratifiedSample(df: DataFrame, stratumCol: String, n: Int,
      idCol: String = "doc_id", salt: String = "strat"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hash32(col(idCol), salt), col(idCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .drop("rn")
  }

  /**
   * [[stratifiedSample]]'s skew-proof twin: the same selection rule
   * (n smallest id-hashes per stratum, id tie-break — bit-identical
   * output, SamplingSpec pins it) computed with the bounded-heap
   * aggregate [[graft.functions.TopKAgg]] instead of a row_number
   * window. Each map task reduces its slice to ≤n candidates per
   * stratum BEFORE the shuffle and no per-stratum sort ever runs, so
   * a skewed stratum costs O(n) state instead of one giant window
   * partition — this removes the "cap input first" caveat on the
   * window form. Selection uses `bottomk` (smallest values, natural
   * ascending struct ordering), so the (hash, id) struct is passed
   * AS-IS: the id tie-break works for any orderable id type — string
   * doc_ids included — with no negation (which would silently break
   * non-numeric ids and overflow at Long.MinValue). Ids are recovered
   * from the payload and joined back for the full rows (requires
   * unique `idCol`, the corpus invariant).
   */
  def stratifiedSampleAgg(df: DataFrame, stratumCol: String, n: Int,
      idCol: String = "doc_id", salt: String = "strat"): DataFrame = {
    val ids = df
      .select(col(stratumCol).as("_st"), col(idCol).as("_id"))
      .groupBy("_st")
      .agg(graft.functions.TopKAgg.bottomk(df.sparkSession,
        struct(hash32(col("_id"), salt).as("h"), col("_id").as("id")),
        n).as("keep"))
      .select(explode(col("keep")).as("t"))
      .select(col("t.id").as(idCol))
    df.join(ids, idCol)
  }

  /** Uniform 32-bit hash of an arbitrary string column (same
    * construction as [[hash32]], which hashes a row ID). */
  def hash32Str(s: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), s)), 1, 8), 16, 10)
      .cast("long")

  /**
   * DSIR-style importance weights (Xie et al., "Data Selection for
   * Language Models via Importance Resampling"): score every corpus
   * document by how much more likely its hashed n-gram features are
   * under a TARGET distribution (e.g. curated high-quality text) than
   * under the raw corpus. Selecting the top-weight documents (or
   * sampling proportionally) tilts a web-scale corpus toward the target
   * domain without training a classifier.
   *
   * Features are unigrams and bigrams hashed into `buckets` buckets —
   * the dimensionality cap is what makes the model estimable from a
   * small target set AND keeps both distributions a bounded aggregate.
   * Bucket probabilities are add-one smoothed (`(c+1)/(N+B)`), so
   * buckets unseen in the target contribute a finite negative weight
   * instead of -∞. Per-bucket log-ratios are quantized to integer
   * micro-nats once, making per-document sums exact integer math in any
   * partial-aggregation order (the [[TextAnalysis.unigramNll]]
   * discipline).
   *
   * Output: one row per corpus doc — (doc_id, n_feat, logw_micro_sum,
   * avg_logw); a doc with no features reports n_feat=0 and weight 0.
   * `avg_logw` (mean per feature) is the usual ranking key: the raw sum
   * favors long documents.
   *
   * Scale shape: two word-count-shaped bucket aggregates (map-side
   * combine — hot buckets collapse per task), one join of the corpus
   * feature stream against the ≤`buckets`-row ratio table (broadcast),
   * one doc-keyed sum. The two scalar totals ride along as literals.
   */
  /** DSIR selection — the resampling step over [[dsirWeights]]: keep the
    * `n` documents with the highest per-feature average importance
    * weight (ties broken by doc_id). Output: (doc_id, avg_logw, rank).
    *
    * Scale shape: `orderBy().limit(n)` plans as TakeOrderedAndProject —
    * each partition keeps its local top-n and only n-row heaps merge on
    * the driver; no global sort, no single-partition window. The rank
    * column is a window over the ALREADY-SELECTED n rows. */
  def dsirSelect(corpus: DataFrame, target: DataFrame, n: Int,
      buckets: Int = 8192, salt: String = "dsir", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val top = dsirWeights(corpus, target, buckets, salt, idCol, textCol)
      .orderBy(col("avg_logw").desc, col("doc_id")).limit(n)
    val w = Window.orderBy(col("avg_logw").desc, col("doc_id"))
    top.select(col("doc_id"), col("avg_logw"))
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  def dsirWeights(corpus: DataFrame, target: DataFrame, buckets: Int = 8192,
      salt: String = "dsir", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def feats(df: DataFrame): DataFrame = {
      val toks = col("toks")
      df.select(col(idCol).as("doc_id"),
          TextAnalysis.tokens(col(textCol)).as("toks"))
        .select(col("doc_id"), explode(concat(toks,
          when(size(toks) >= 2,
            transform(sequence(lit(1), size(toks) - 1),
              i => concat_ws(" ", element_at(toks, i),
                element_at(toks, i + 1))))
            .otherwise(array().cast("array<string>")))).as("f"))
        .select(col("doc_id"),
          pmod(hash32Str(col("f"), salt), lit(buckets.toLong)).as("b"))
    }
    // the corpus feature stream is read by THREE consumers (bucket
    // histogram → ratio, the same histogram's total, the per-doc fold)
    // and the tokenize+bigram+hash pipeline underneath is the expensive
    // part — checkpoint it once (measured r15: unpersisted it re-ran
    // ~4× per call); bucket histograms are ≤ `buckets` rows, cut so the
    // total and the ratio read materialized leaves
    val cf = graft.pipeline.Lineage.cut(feats(Dedup.spread(corpus, col(idCol))))
    val cr = graft.pipeline.Lineage.cut(
      cf.groupBy("b").agg(count(lit(1)).as("cr")))
    val ct = graft.pipeline.Lineage.cut(
      feats(target).groupBy("b").agg(count(lit(1)).as("ct")))
    val totR = cr.agg(coalesce(sum(col("cr")), lit(0L))).head().getLong(0)
    val totT = ct.agg(coalesce(sum(col("ct")), lit(0L))).head().getLong(0)
    // log-ratio per bucket present in the CORPUS (absent buckets have no
    // occurrences to score); smoothing keeps target-unseen buckets finite
    val ratio = cr.join(ct, Seq("b"), "left_outer")
      .select(col("b"),
        round(log(
          ((coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
            lit((totT + buckets).toDouble)) /
            ((col("cr") + 1L).cast("double") /
              lit((totR + buckets).toDouble))) * 1e6)
          .cast("long").as("lw_micro"))
    val perDoc = cf.join(ratio, "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feat"),
        sum(col("lw_micro")).as("logw_micro_sum"))
    corpus.select(col(idCol).as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"),
        coalesce(col("logw_micro_sum"), lit(0L)).as("logw_micro_sum"),
        when(coalesce(col("n_feat"), lit(0L)) > 0,
          round(col("logw_micro_sum").cast("double") /
            (col("n_feat").cast("double") * 1e6), 6))
          .otherwise(lit(0.0)).as("avg_logw"))
  }

  /**
   * Cluster-balanced sampling: keep each document with probability
   * 1/|its near-dup cluster|, so every distinct content cluster
   * contributes ~1 document in expectation REGARDLESS of how many times
   * the content was crawled — the unbiased alternative to hard dedup
   * (keep-one-per-cluster deletes the duplication signal entirely;
   * uniform sampling over-represents heavily duplicated content by its
   * duplication factor).
   *
   * The keep decision is exact integer math — `hash32(id) ·
   * cluster_size < 2^32` — so it is deterministic, coordination-free
   * (no per-cluster shuffle to pick a winner), retry/replay-stable, and
   * replayable in the oracle. Singletons satisfy it trivially: never
   * near-duplicated content is always kept.
   *
   * Scale shape: CC output is pair-graph-sized; membership is one
   * id-keyed left join (docs never enter the CC iteration); sizes are a
   * cluster-keyed count; the filter is scan-speed. `hash·size` fits a
   * long for any cluster smaller than 2^31 docs.
   */
  def clusterBalancedSample(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", salt: String = "cbal"): DataFrame =
    clusterBalancedSampleFromLabels(docs,
      Dedup.connectedComponents(pairs), idCol, salt)

  /** [[clusterBalancedSample]] from an existing `(doc_id, cluster_id)`
    * labeling — the production shape: sampling reads the persisted
    * cluster state instead of re-running CC per draw. Identical output
    * by construction (the pairs overload delegates here). */
  def clusterBalancedSampleFromLabels(docs: DataFrame, clus: DataFrame,
      idCol: String = "doc_id", salt: String = "cbal"): DataFrame = {
    val mem = docs.select(col(idCol).as("doc_id"))
      .join(clus, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val siz = mem.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    mem.join(siz, "cluster_id")
      .filter(hash32(col("doc_id"), salt) * col("cluster_size") < lit(HashSpace))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }

  /** Per-source row for the UniMax fold. */
  final case class SrcTokens(src: String, n_tokens: Long)
  /** One UniMax allocation (epochs derived as a column afterwards so the
    * rounding is the SQL round both engines share, not JVM rint). */
  final case class UnimaxAlloc(source: String, n_tokens: Long, alloc_tokens: Long)

  /**
   * UniMax mixture budget allocation (Chung et al. 2023, "UniMax: Fairer
   * and More Effective Language Sampling for Large-Scale Multilingual
   * Pretraining"): split a total token `budget` across sources as evenly
   * as possible, capping every source at `maxEpochs` passes over its own
   * data. Water-filling over sources ASCENDING by size: each source
   * takes `min(n_tokens · maxEpochs, budgetLeft div sourcesLeft)`, and
   * whatever a small source cannot absorb redistributes to the larger
   * ones that follow. The integer-division variant keeps the whole fold
   * in exact BIGINT arithmetic, so the DuckDB oracle replays it
   * bit-for-bit with a recursive CTE (the same discipline as
   * [[Packing.packGreedy]]).
   *
   * Output: one row per source — `(source, n_tokens, alloc_tokens,
   * epochs)` with `epochs = alloc/n_tokens` rounded to 6. Feed
   * `alloc_tokens` into [[tokenBudgetMix]] to materialize the mix.
   *
   * Scale shape: the corpus-scale work is ONE word-count-shaped token
   * aggregate; the fold itself runs over |sources| rows inside a single
   * sorted group — buffered, but bounded by the source count (tens to
   * thousands), never by the corpus.
   */
  /**
   * Quality-weighted sampling — the soft filter between a hard quality
   * gate (loses all mid-quality diversity) and uniform sampling (keeps
   * junk at full rate): each document's keep probability IS its
   * composite quality score ([[TextAnalysis.withQuality]], in [0, 1]),
   * floored at `minRate` so no stratum disappears entirely — the
   * FineWeb-style "sample by quality, don't guillotine" recipe.
   *
   * The rate is the score quantized to 2 decimals (101 possible
   * thresholds — quantization makes the keep decision replayable and
   * keeps threshold arithmetic exact), the decision the usual
   * [[hash32]] compare: deterministic, coordination-free, retry-stable,
   * and nested across reruns like every sampler here.
   *
   * Scale shape: scoring is scan-speed column math, the decision is a
   * per-row filter — zero shuffle, zero driver state.
   */
  def qualityWeightedSample(docs: DataFrame, minRate: Double = 0.05,
      salt: String = "qsamp", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minRate > 0.0 && minRate <= 1.0,
      s"minRate must be in (0,1], got $minRate")
    TextAnalysis.withQuality(docs, textCol)
      .withColumn("rate",
        greatest(round(col("quality_score"), 2), lit(minRate)))
      .filter(hash32(col(idCol), salt) <
        round(col("rate") * lit(HashSpace.toDouble)).cast("long"))
      .select(col(idCol).as("doc_id"), col("quality_score"), col("rate"))
  }

  /**
   * DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
   * Optimizing Data Mixtures Speeds Up Language Model Pretraining") —
   * the exponential-tilting step of the Group-DRO update applied to
   * measured per-domain excess loss. DoReMi proper alternates proxy
   * training with multiplicative weight updates; against FIXED loss
   * tables the repeated multiplicative update telescopes into a single
   * exponential tilt, which is what this operator computes in-engine:
   *
   *   excess_d = max(0, nll_proxy(d) − nll_ref(d))   (per-event nats)
   *   w_d ∝ share_d · exp(η · excess_d)
   *   w   ← (1−c)·w/Σw + c/|D|                       (uniform smoothing)
   *
   * The proxy is the corpus [[TextAnalysis.unigramNll]], the reference
   * the stronger interpolated [[TextAnalysis.bigramNll]] — domains
   * where the weak model underperforms the strong one most (the
   * "learnable headroom") are upweighted from their baseline token
   * share; domains both models find equally (un)predictable keep it.
   *
   * Output: (source, n_tokens, share, uni_nll, bi_nll, excess, weight).
   *
   * Cross-engine determinism: per-type NLLs are integer micro-nats
   * (order-proof sums); every derived ratio — per-domain means, share,
   * the exp tilt, the final weight — is quantized to 1e-6 at each step
   * so the DuckDB oracle reproduces the fold to the last digit.
   *
   * Scale shape: both LM scorings are word-count-shaped aggregates; the
   * rollup is |sources| rows, and the windows that normalize
   * share/tilt run over that tiny frame — never the corpus.
   */
  def domainReweight(docs: DataFrame, eta: Double = 5.0,
      smoothing: Double = 0.1, lambda: Double = 0.9,
      srcCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(eta >= 0.0, s"eta must be >= 0, got $eta")
    require(smoothing >= 0.0 && smoothing <= 1.0,
      s"smoothing must be in [0,1], got $smoothing")
    val uni = TextAnalysis.unigramNll(docs, idCol, textCol)
      .select(col("doc_id"), col("n_tok"),
        col("nll_micro_sum").as("uni_sum"))
    val bi = TextAnalysis.bigramNll(docs, lambda, idCol, textCol)
      .select(col("doc_id"), col("n_bigrams"),
        col("nll_micro_sum").as("bi_sum"))
    val w = Window.partitionBy(lit(1)) // |sources| rows — bounded
    docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"))
      .join(uni, "doc_id").join(bi, "doc_id")
      .groupBy("source")
      .agg(sum(col("n_tok")).as("n_tokens"),
        sum(col("uni_sum")).as("uni_micro"),
        sum(col("n_bigrams")).as("n_bi"),
        sum(col("bi_sum")).as("bi_micro"))
      .withColumn("uni_nll", round(col("uni_micro").cast("double") /
        (col("n_tokens").cast("double") * 1e6), 6))
      .withColumn("bi_nll", when(col("n_bi") > 0,
        round(col("bi_micro").cast("double") /
          (col("n_bi").cast("double") * 1e6), 6)).otherwise(lit(0.0)))
      .withColumn("excess",
        round(greatest(col("uni_nll") - col("bi_nll"), lit(0.0)), 6))
      .withColumn("share", round(col("n_tokens").cast("double") /
        sum(col("n_tokens").cast("double")).over(w), 6))
      .withColumn("tilt",
        round(col("share") * exp(lit(eta) * col("excess")), 6))
      .withColumn("weight", round(
        lit(1.0 - smoothing) * col("tilt") / sum(col("tilt")).over(w) +
          lit(smoothing) / count(lit(1)).over(w).cast("double"), 6))
      .select(col("source"), col("n_tokens"), col("share"),
        col("uni_nll"), col("bi_nll"), col("excess"), col("weight"))
  }

  def unimaxAllocation(docs: DataFrame, budget: Long, maxEpochs: Long,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val spark = docs.sparkSession
    import spark.implicits._
    val perSrc = docs.select(col(srcCol).as("src"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tok"))
      .groupBy("src").agg(sum("n_tok").as("n_tokens"))
      .as[SrcTokens]
    perSrc.groupByKey(_ => true)
      .flatMapSortedGroups(col("n_tokens"), col("src")) { (_, it) =>
        val rows = it.toIndexedSeq // bounded by |sources|, not the corpus
        var left = budget
        var remaining = rows.size
        rows.iterator.map { r =>
          val quota = left / remaining
          val alloc = math.min(r.n_tokens * maxEpochs, quota)
          left -= alloc
          remaining -= 1
          UnimaxAlloc(r.src, r.n_tokens, alloc)
        }
      }
      .toDF()
      .withColumn("epochs",
        round(col("alloc_tokens").cast("double") /
          col("n_tokens").cast("double"), 6))
  }

  /**
   * SoftDedup duplicate down-weighting (He et al. 2024, "SoftDedup: an
   * Efficient Data Reweighting Method for Speeding Up Language Model
   * Pre-training") — instead of DROPPING duplicates the way
   * [[Dedup.exact]] keeps one row per fingerprint, every member of a
   * duplicate group survives with sampling probability c^(−alpha)
   * (c = the group's corpus-wide occurrence count), so the group's
   * expected surviving volume is c^(1−alpha) copies: alpha=1 is soft
   * exact-dedup (one expected copy, but WHICH copy is spread over the
   * group — source diversity survives), alpha<1 leaves duplicated
   * content partially over-represented, alpha>1 actively punishes it.
   *
   * The keep decision is the engine's deterministic hash discipline
   * (hash32(doc_id) < round(weight·2^32)) so reruns and partial
   * re-processing agree row-by-row; the weight is 1e-6-quantized
   * BEFORE thresholding so the oracle can never disagree on a rounding
   * boundary. Output (kept rows only): (doc_id, dup_count, weight).
   *
   * Scale shape: one fingerprint-keyed count (the exact-dedup shuffle,
   * map-side combined), one fingerprint join back (the dup-group side
   * is count-sized, AQE broadcasts it), then a scan-speed hash filter.
   * No windows, no driver state.
   */
  def softDedupSample(docs: DataFrame, alpha: Double = 1.0,
      salt: String = "softdedup", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    softDedupWeights(docs, alpha, salt, idCol, textCol)
      .filter(col("kept")).drop("kept")

  /** [[softDedupSample]] with the decision exposed instead of applied:
    * every row survives, carrying (doc_id, dup_count, weight, kept) —
    * the shape funnel reports and composed curation chains consume. */
  def softDedupWeights(docs: DataFrame, alpha: Double = 1.0,
      salt: String = "softdedup", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(alpha >= 0.0, s"alpha must be non-negative, got $alpha")
    val fp = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fpr"))
    val counts = fp.groupBy("fpr").agg(count(lit(1)).as("dup_count"))
    fp.join(counts, "fpr")
      .select(col("doc_id"), col("dup_count"),
        round(pow(col("dup_count").cast("double"), lit(-alpha)), 6)
          .as("weight"))
      .withColumn("kept", hash32(col("doc_id"), salt) <
        round(col("weight") * lit(HashSpace.toDouble)).cast("long"))
  }

  /**
   * Token-budget data selection: keep the highest-quality documents
   * whose token counts fit a global budget — "give me the best B
   * tokens" — WITHOUT a global sort. The naive formulation (order all
   * docs by quality, running-sum tokens, cut at B) is a single-
   * partition window over the corpus; this is the scalable two-phase
   * equivalent:
   *
   *   1. value-quantize quality into `buckets` levels (pure column
   *      math — quality is a bounded [0,1] score, so no rank pass and
   *      no bounds broadcast needed);
   *   2. one bucket-keyed aggregate -> per-bucket token sums, then a
   *      BUCKETS-sized window computes each bucket's tokens-above;
   *      every bucket strictly above the crossing point keeps ALL its
   *      docs, every bucket below drops — scan-speed verdicts for
   *      (buckets-1)/buckets of the corpus;
   *   3. only the single BOUNDARY bucket (~1/buckets of the data)
   *      runs the exact (quality desc, id) running-sum cut for the
   *      remaining budget.
   *
   * Whole-doc granularity (no partial documents); deterministic
   * (quality ties inside the boundary bucket break by id). The oracle
   * replays all three phases with the identical quantization.
   */
  def tokenBudgetSelect(scored: DataFrame, budget: Long, buckets: Int = 1024,
      idCol: String = "doc_id", qCol: String = "quality",
      tokCol: String = "n_tokens"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(buckets > 0, "buckets must be positive")
    val d = scored.withColumn("bkt",
      least(floor(col(qCol) * buckets).cast("long"), lit(buckets - 1L)))
    // per-bucket token sums to the driver: ≤ `buckets` rows (a bounded
    // parameter, the centroid-collect discipline). Inlining the bucket
    // verdicts as plan literals keeps the corpus at exactly TWO scans —
    // the whole-keep isin filter and the boundary window. (The bucket
    // predicate is computed from the quality column, so it filters
    // in-stage, not via parquet pushdown. A pure-DataFrame formulation
    // re-executed the bucket-stats lineage once per consumer: four
    // corpus scans, plan-audited.)
    val perBucket = d.groupBy("bkt").agg(sum(col(tokCol)).as("btoks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(-_._1)
    var above = 0L
    val fullKeepBuckets = Seq.newBuilder[Long]
    var cut: Option[(Long, Long)] = None // (bucket, remaining budget)
    perBucket.foreach { case (b, toks) =>
      if (above + toks < budget) fullKeepBuckets += b
      else if (above < budget && cut.isEmpty) cut = Some((b, budget - above))
      above += toks
    }
    val whole = fullKeepBuckets.result()
    val keptWhole =
      if (whole.isEmpty) d.filter(lit(false))
      else d.filter(col("bkt").isin(whole: _*))
    // boundary bucket: exact running-sum cut over ~corpus/buckets rows
    val wIn = Window.orderBy(col(qCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBoundary = cut match {
      case Some((b, rem)) =>
        d.filter(col("bkt") === b)
          .withColumn("cum", sum(col(tokCol)).over(wIn))
          .filter(col("cum") <= rem)
          .drop("cum")
      case None => d.filter(lit(false))
    }
    keptWhole.unionByName(keptBoundary)
  }

  /**
   * Information-gain selection: score each document by how much
   * left-context helps predict it — mean unigram NLL minus mean
   * interpolated-bigram NLL ([[TextAnalysis.unigramNll]] /
   * [[TextAnalysis.bigramNll]], both individually oracle-certified).
   * Structured prose has high gain (context is predictive); shuffled or
   * keyword-stuffed text has near-zero gain even when its unigram
   * perplexity looks normal — which is exactly the spam class a pure
   * perplexity filter misses. `selected` keeps documents at or above
   * `thr` nats of gain.
   *
   * Both scorers are corpus-self-trained scans + vocab-keyed joins; the
   * composition adds one doc-keyed join. All means are micro-quantized
   * sums divided once, and the gain is a difference of the two rounded
   * means, so the select decision is bit-stable across engines.
   */
  def infoGainSelect(docs: DataFrame, lambda: Double = 0.9,
      thr: Double = 0.5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val u = TextAnalysis.unigramNll(docs, idCol, textCol)
      .select(col("doc_id"), col("n_tok"), col("mean_nll").as("mean_unll"))
    val b = TextAnalysis.bigramNll(docs, lambda, idCol, textCol)
      .select(col("doc_id"), col("n_bigrams"),
        col("mean_nll").as("mean_bnll"))
    u.join(b, "doc_id")
      .select(col("doc_id"), col("n_tok"), col("n_bigrams"),
        col("mean_unll"), col("mean_bnll"),
        when(col("n_bigrams") > 0,
          round(col("mean_unll") - col("mean_bnll"), 6))
          .otherwise(lit(0.0)).as("info_gain"))
      .withColumn("selected",
        col("n_bigrams") > 0 && col("info_gain") >= thr)
  }

  /**
   * Composed lexical screen: the per-language curation funnel of three
   * independent verdicts — the median/MAD length fence
   * ([[CorpusReport.qualityOutlierReport]]'s rule), the token-entropy
   * floor ([[TextAnalysis.tokenEntropy]]), and the information-gain
   * floor ([[infoGainSelect]]) — with per-flag counts and the kept
   * rate. The COMPOSITION is what gets certified: the oracle replays
   * all three stages over the same corpus and the funnel must
   * hash-match, the same discipline as `pipe_quality_chain`.
   *
   * Scale shape: entropy is a scan fold; the fences are two grouped
   * percentiles + a |langs|-row broadcast; the gain join is doc-keyed;
   * output is |langs| rows.
   */
  def lexicalScreen(docs: DataFrame, z: Double = 3.0,
      entropyFloor: Double = 2.0, gainFloor: Double = 0.02,
      langCol: String = "lang"): DataFrame = {
    val ent = TextAnalysis.tokenEntropy(docs, carryCols = Seq(langCol))
      .select(col("doc_id"), col(langCol).as("lang"),
        col("n_tok").cast("double").as("nt"), col("entropy"))
    val gain = infoGainSelect(docs).select(col("doc_id"), col("info_gain"))
    val med = ent.groupBy("lang").agg(expr("percentile(nt, 0.5)").as("med_nt"))
    val mad = ent.join(broadcast(med), "lang")
      .select(col("lang"), abs(col("nt") - col("med_nt")).as("dev"))
      .groupBy("lang").agg(expr("percentile(dev, 0.5)").as("mad_nt"))
    val bounds = med.join(mad, "lang")
    ent.join(broadcast(bounds), "lang").join(gain, "doc_id")
      .select(col("lang"),
        (col("nt") < col("med_nt") - lit(z) * col("mad_nt") ||
          col("nt") > col("med_nt") + lit(z) * col("mad_nt"))
          .cast("long").as("f_len"),
        (col("entropy") < entropyFloor).cast("long").as("f_ent"),
        (col("info_gain") < gainFloor).cast("long").as("f_gain"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("f_len")).as("n_len_outlier"),
        sum(col("f_ent")).as("n_low_entropy"),
        sum(col("f_gain")).as("n_low_gain"),
        sum(when(col("f_len") + col("f_ent") + col("f_gain") === 0, 1L)
          .otherwise(0L)).as("n_kept"))
      .withColumn("kept_frac",
        round(col("n_kept").cast("double") / col("n_docs").cast("double"), 6))
  }

  /**
   * Reciprocal-rank-fusion selection (Cormack et al. 2009): rank the
   * corpus independently under two quality signals — the heuristic
   * quality score ([[TextAnalysis.withQuality]], higher = better) and
   * the unigram-LM negative log-likelihood ([[TextAnalysis.unigramNll]],
   * lower = more fluent) — and keep the `n` documents with the best
   * fused score `Σ 1/(k0 + rank)`. RRF needs no score calibration
   * between the signals, which is why it is the standard way to combine
   * a classifier with a perplexity filter.
   *
   * Exact GLOBAL ranks at scale: both rankings go through
   * [[graft.operators.GlobalRank.withGlobalRank]] (range shuffle + a
   * per-partition-count zip), never a single-partition window. The
   * final top-n is a TakeOrdered (per-partition heaps), not a global
   * sort. Cross-engine float story: each rank's RRF term is quantized
   * to integer nanos (`round(1e9/(k0+r))`) before the sum, so the
   * selection threshold is integer-exact in both engines.
   */
  /**
   * Exact global-percentile quality gate: keep the top `p` FRACTION of
   * the corpus by quality score — the budget form of selection when the
   * budget is relative ("best 20%") rather than absolute (use
   * TakeOrdered top-n for that). Hash-rate sampling can't express this
   * (it keeps a random p, not the best p); an exact quantile cut needs
   * the true rank, which [[graft.operators.GlobalRank]] provides
   * without a single-partition window. The count and the ceil'd cutoff
   * are exact integers, so the kept SET is deterministic and
   * engine-identical (quality ties broken by doc_id inside the rank).
   *
   * Scale shape: one counting aggregate + one GlobalRank job (range
   * shuffle, one Long per partition on the driver) + a scan filter.
   */
  def percentileGate(docs: DataFrame, p: Double = 0.2): DataFrame = {
    require(p > 0.0 && p <= 1.0, s"p must be in (0, 1], got $p")
    val q = TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("quality_score"))
    val n = q.count()
    val cutoff = math.ceil(p * n).toLong
    graft.operators.GlobalRank
      .withGlobalRank(q, Seq(col("quality_score").desc, col("doc_id")),
        "q_rank")
      .filter(col("q_rank") <= cutoff)
      .select(col("doc_id"), col("quality_score"), col("q_rank"),
        round(col("q_rank").cast("double") / n.toDouble, 6).as("pct_rank"))
  }

  def rrfFusionSelect(docs: DataFrame, n: Int = 100, k0: Int = 60): DataFrame = {
    require(n > 0 && k0 > 0, s"need n > 0, k0 > 0; got $n, $k0")
    val q = TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("quality_score"))
    val fluency = TextAnalysis.unigramNll(docs)
      .select(col("doc_id"), col("mean_nll"))
    val rq = graft.operators.GlobalRank
      .withGlobalRank(q, Seq(col("quality_score").desc, col("doc_id")),
        "r_quality")
      .select("doc_id", "r_quality")
    val rn = graft.operators.GlobalRank
      .withGlobalRank(fluency, Seq(col("mean_nll").asc, col("doc_id")),
        "r_nll")
      .select("doc_id", "r_nll")
    rq.join(rn, "doc_id")
      .withColumn("rrf_nano",
        (round(lit(1e9) / (lit(k0) + col("r_quality"))) +
          round(lit(1e9) / (lit(k0) + col("r_nll")))).cast("long"))
      .withColumn("rrf", round(col("rrf_nano").cast("double") / 1e9, 6))
      .orderBy(col("rrf_nano").desc, col("doc_id"))
      .limit(n)
  }

  /**
   * Sequential Poisson sampling (Ohlsson 1998) — a fixed-size sample
   * with inclusion probability ~proportional to a weight column (the
   * order-sampling family's workhorse; Saavedra showed it within
   * O(1/n) of strict PPS): per row, priority = w / u with u a
   * deterministic uniform in (0, 1] from the salted id hash; keep the
   * global top-n priorities. Rows with non-positive weight can never
   * be drawn and are excluded up front.
   *
   * Determinism across engines with NO transcendental math — the
   * reason this beats the A-RES formulation (u^(1/w) needs pow, whose
   * last-ulp behavior differs by libm): u = (hash32 + 1) / 2^32 is
   * EXACT (the numerator is an exact integer double, the divisor a
   * power of two), so w / u is one IEEE division with identical
   * operands in both engines — identical priorities, identical order,
   * id tie-break. Reported as floor milli-units (`priority_milli`)
   * for the same reason [[Similarity.mmrRerank]] reports micro-units.
   *
   * Scale shape: one scan computing a pure column expression, then a
   * global top-n (`TakeOrderedAndProject`: per-partition top-n, n-row
   * driver merge) — no shuffle, no sort of the corpus. Re-runs, task
   * retries, and appends that do not touch the top-n leave the sample
   * IDENTICAL — the [[deterministicSample]] story with weights.
   */
  def sequentialPoissonSample(df: DataFrame, idCol: String,
      weightCol: String, n: Int, salt: String = "sps"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val u = (hash32(col(idCol), salt).cast("double") + lit(1.0)) /
      lit(HashSpace.toDouble)
    val pri = col(weightCol).cast("double") / u
    val top = df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol), pri.as("__pri"))
      .orderBy(col("__pri").desc, col(idCol))
      .limit(n)
    // rank over the ALREADY-SELECTED n rows (dsirSelect discipline)
    val w = Window.orderBy(col("__pri").desc, col(idCol))
    top.withColumn("rank", row_number().over(w))
      .select(col(idCol), col(weightCol),
        floor(col("__pri") * 1e3).cast("long").as("priority_milli"),
        col("rank"))
  }

  /**
   * Distributed skyline (Pareto frontier) over maximize-all numeric
   * dims — multi-criteria data selection without collapsing criteria
   * into one weighted score (quality vs length vs freshness: keep
   * everything no other row beats on ALL axes): a row is in the
   * skyline iff no other row is ≥ on every dim and > on at least one.
   * Rows with a NULL in any dim are excluded up front (three-valued
   * dominance would silently make them immortal).
   *
   * Scale shape (the sample-prune two-phase of the distributed-skyline
   * literature): phase 1 broadcasts `pruners` hash-chosen rows
   * (deterministic: lowest salted id-hash, id tie-break) and drops
   * everything they dominate in ONE nested-loop-filter scan — for
   * independent-ish dims a handful of strong pruners eliminates almost
   * everything, and any point dominated by ANY point is provably not
   * in the skyline, so pruning never loses a result. Phase 2 computes
   * the exact skyline of the survivors by a self anti-join (broadcast
   * nested loop — correct for any d). The contract is that SURVIVORS
   * fit a broadcast: true when dims are not pathologically
   * anti-correlated (skyline size ~O(ln^(d-1) n)); an adversarial
   * corpus where most rows are Pareto-optimal has no sub-quadratic
   * answer in ANY engine.
   */
  def skyline(df: DataFrame, dims: Seq[String], idCol: String,
      pruners: Int = 1024, salt: String = "sky"): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one dim")
    require(pruners > 0, s"pruners must be positive, got $pruners")
    val base = df.select((idCol +: dims).map(col): _*)
      .filter(dims.map(col(_).isNotNull).reduce(_ && _))
    def dominates(pfx: String): Column = {
      val ge = dims.map(d => col(s"$pfx$d") >= col(d)).reduce(_ && _)
      val gt = dims.map(d => col(s"$pfx$d") > col(d)).reduce(_ || _)
      ge && gt
    }
    val pr = base
      .orderBy(hash32(col(idCol), salt), col(idCol)).limit(pruners)
      .select(dims.map(d => col(d).as(s"__p_$d")): _*)
    val survivors = base.join(broadcast(pr), dominates("__p_"), "left_anti")
    val other = survivors.select(dims.map(d => col(d).as(s"__o_$d")): _*)
    survivors.join(broadcast(other), dominates("__o_"), "left_anti")
  }
}
