package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering: a logistic-regression classifier over
 * hashed bag-of-token features, trained distributed with deterministic
 * full-batch gradient descent — the "train a linear quality filter
 * against a reference corpus" stage of CCNet/GPT-3-style pipelines
 * (Wenzek et al. 2020, arXiv:1911.00359 §4.4; Brown et al. 2020
 * appendix A), re-expressed Spark-first. fastText's trick of hashing
 * tokens into a fixed-width weight vector (Joulin et al. 2016,
 * arXiv:1607.01759) keeps the model a bounded table regardless of
 * vocabulary, so the training loop has the k-means shape
 * ([[Semantic.kmeansAssign]]): driver holds the (dims+1)-element model,
 * every iteration is one join-aggregate pass over the corpus.
 *
 * Spark shape, designed for the 100-TB case:
 *  - **featurization is a pure scan**, checkpointed ONCE as narrow
 *    `(doc_id, y, bucket)` instance rows (~24 B/token): tokens hash
 *    into `dims` buckets with the engine-wide 32-bit md5 hash
 *    ([[Sampling.hash32Str]]); the bias rides as pseudo-bucket −1, so
 *    the logit, the gradient, and the update treat it as just another
 *    feature;
 *  - **every iteration is the SAME physical plan** fed new weight data:
 *    per-doc logit as a pure PROJECTION over the checkpointed
 *    (doc_id, y, buckets) rows (a LONG fold — exact in any order, no
 *    join, no shuffle) → residuals ⋈ instances → per-bucket gradient
 *    (≤ dims+1 rows). The weight table rides as ONE array-typed
 *    literal, which codegen emits as a references[] slot — identical
 *    generated source across iterations, so whole-stage codegen
 *    compiles once and is cache-hit for the rest of the loop (a
 *    PER-ELEMENT literal array inlines the values into the source and
 *    recompiles per iteration — that variant spent 20 of its 25 s in
 *    janino);
 *  - the residual join broadcasts the per-doc residual frame
 *    explicitly (doc-count rows — eval-sized at any corpus scale once
 *    training runs on the deterministic sample), so the instance frame
 *    is never exchanged: its only shuffle is the map-side-combined
 *    ≤ dims+1-row gradient aggregate.
 *
 * Cross-engine determinism (the oracle replays training in DuckDB):
 *  - weights and momentum velocities live in INTEGER micro-units (the
 *    unigram-NLL micro-nat trick) so the per-document logit is exact
 *    integer arithmetic in any engine — no float-summation-order drift
 *    in the hot loop;
 *  - the only float reductions are the per-bucket residual-gradient
 *    sums, whose engine-order drift (~1e-13) is quantized away by
 *    rounding velocity and weight updates to one micro-unit
 *    (half-away-from-zero in both engines);
 *  - scores are emitted rounded to 1e-6 and thresholds compare against
 *    the rounded value, so downstream gates see identical verdicts.
 *
 * Training uses heavy-ball momentum (fixed β) — it reaches the plateau
 * of plain GD in a third of the iterations, and each saved iteration
 * is a saved corpus pass.
 *
 * The default label — `lang = 'en'` — is a deterministic stand-in for
 * the real-world "positive = reference corpus, negative = crawl"
 * labeling; callers supply their own `labelCol` for that.
 */
object Classifier {

  private val featSalt = "feat"

  /** A trained hashed-feature LR model: weights and bias in integer
    * micro-units. Small enough to serialize anywhere (dims longs);
    * apply with [[score]] — train once on the reference batch, score
    * any batch OR stream. */
  final case class LrModel(dims: Int, weightsMu: Array[Long], biasMu: Long)

  /** (doc_id, y, js): binary label + the hashed bucket of every
    * alphanumeric token INSTANCE (not distinct) — so the logit is
    * Σ w[j]·tf(j) and the exploded gradient weighs each bucket by its
    * count: term-frequency features, which carry the signal when the
    * corpus shares a vocabulary and classes differ in token RATES
    * (exactly the stopword-rate signal language/quality filters use). */
  private def featurize(docs: DataFrame, dims: Int, labelCol: Column,
      idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), labelCol.cast("int").as("y"),
      featBuckets(col(textCol), dims).as("js"))

  /** Hashed bucket per alphanumeric token instance. NULL text coalesces
    * to the empty feature set — the doc stays in the corpus (bias-only),
    * matching the oracle's LEFT JOIN + empty-list semantics; without the
    * coalesce, explode(null) would silently drop the row. */
  private def featBuckets(text: Column, dims: Int): Column =
    coalesce(
      transform(
        filter(TextAnalysis.tokens(text), t => t.rlike("^[a-z0-9]+$")),
        t => Sampling.hash32Str(t, featSalt) % dims),
      array().cast("array<bigint>"))

  /** DuckDB `round()` — half away from zero (Scala's Math.round rounds
    * half toward +∞, which would diverge on exact-.5 negatives). */
  private def roundHalfAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  private def sigmoid(zMu: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-(zMu.cast("double") / lit(1e6))))

  /** Train and return the model itself — for callers that train on a
    * labeled reference batch once and [[score]] other data (including
    * streams) against it. */
  def trainLr(docs: DataFrame, dims: Int = 256, iters: Int = 8,
      lr: Double = 0.02, beta: Double = 0.9,
      labelCol: Column = col("lang") === "en",
      idCol: String = "doc_id", textCol: String = "text"): LrModel = {
    val (model, _) = train(docs, dims, iters, lr, beta, labelCol,
      idCol, textCol)
    model
  }

  /**
   * Apply a trained model: `(doc_id, score, pred)`. A pure projection —
   * the logit is a fold over the document's hashed buckets against the
   * model as an array LITERAL (one fixed model → one compiled plan, no
   * join, no shuffle), so it runs at scan speed and is legal in a
   * streaming query's append mode: train on the reference batch, score
   * the ingest feed live.
   */
  def score(docs: DataFrame, model: LrModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s = scoreExpr(model, textCol)
    docs.select(col(idCol).as("doc_id"), s.as("score"),
      (s >= 0.5).cast("int").as("pred"))
  }

  /** The rounded sigmoid score of one document under a fixed model —
    * model weights as an array literal, so the whole thing is a scan-
    * speed projection. */
  private def scoreExpr(model: LrModel, textCol: String): Column = {
    val wArr = array(model.weightsMu.map(lit).toIndexedSeq: _*)
    val zMu = lit(model.biasMu) + aggregate(
      featBuckets(col(textCol), model.dims),
      lit(0L), (acc, j) => acc + element_at(wArr, j.cast("int") + lit(1)))
    round(sigmoid(zMu), 6)
  }

  /**
   * The 100-TB training recipe: [[trainLr]] is `iters` full passes over
   * the corpus, so at real scale training data must be a SAMPLE — a
   * hash-stable [[Sampling.deterministicSample]] slice (same documents
   * on every run, every cluster, any partitioning), not a `.sample()`
   * whose selection drifts with the RNG seed and split layout. The
   * model trains on the slice (iters × sampleRate corpus-scans), then
   * scores the FULL corpus at scan speed with the weights as plan
   * literals. Output matches [[lrScores]]: `(doc_id, label, score,
   * pred)` over every document.
   *
   * Quality parity vs full-corpus training is measured, not assumed:
   * the `t_classifier_sampled` eval row (SCALE.md round 7) compares the
   * two confusion tables at the gate's operating threshold on sf0.1.
   */
  def lrScoresSampled(docs: DataFrame, sampleRate: Double,
      dims: Int = 256, iters: Int = 8,
      lr: Double = 0.02, beta: Double = 0.9,
      labelCol: Column = col("lang") === "en",
      idCol: String = "doc_id", textCol: String = "text",
      salt: String = "ctrain"): DataFrame = {
    require(sampleRate > 0 && sampleRate <= 1,
      s"sampleRate must be in (0, 1], got $sampleRate")
    // spreadInput = false: the training slice is sample-sized by
    // construction — the spread exchange costs more than the one-core
    // featurize it parallelizes (and plan stats cannot see through the
    // sample's filter to gate it automatically)
    val (model, _) = train(
      Sampling.deterministicSample(docs, idCol, sampleRate, salt),
      dims, iters, lr, beta, labelCol, idCol, textCol,
      spreadInput = false)
    val s = scoreExpr(model, textCol)
    docs.select(col(idCol).as("doc_id"), labelCol.cast("int").as("label"),
      s.as("score"), (s >= 0.5).cast("int").as("pred"))
  }

  /** `iters` momentum-GD steps from the all-zeros model. Returns the
    * model and the scored logit frame `(doc_id, y, zmu)` under the
    * FINAL weights. */
  private def train(docs: DataFrame, dims: Int, iters: Int, lr: Double,
      beta: Double, labelCol: Column, idCol: String, textCol: String,
      spreadInput: Boolean = true)
      : (LrModel, DataFrame) = {
    require(dims > 0 && iters >= 0 && lr > 0 && beta >= 0 && beta < 1,
      s"need dims > 0, iters >= 0, lr > 0, 0 <= beta < 1; " +
        s"got $dims, $iters, $lr, $beta")
    val spark = docs.sparkSession
    import spark.implicits._

    // one row per document with its hashed-bucket array (narrow — the
    // loop re-reads these, never the text), checkpointed once.
    // Lifetime = the returned frame's reference (materializeGate
    // discipline). spreadInput = false for increment/sample-sized
    // inputs, where the exchange costs more than the one-core
    // featurize it parallelizes (measured r15: t_classifier_sampled
    // 1.52 → 2.06 s from spreading a 500-doc sample).
    val src = if (spreadInput) Dedup.spread(docs, col(idCol)) else docs
    val exA = featurize(src, dims, labelCol, idCol, textCol)
      .select(col("doc_id"), col("y"),
        concat(col("js"), array(lit(-1L))).as("js"))
      .transform(Lineage.cut)
    val nLong = exA.count()
    val n = nLong.toDouble
    require(n > 0, "empty corpus")
    // The gradient loop's per-task work is a fold + explode over
    // checkpointed rows — trivially cheap per row, so a session-width
    // stage over a small corpus is pure scheduler overhead (the family
    // measured ~2× FASTER at 8 cores than 32 on the r15 driver's c8
    // bench). Scale the loop's source to rows-per-task rather than a
    // constant width: a corpus large enough to need every checkpoint
    // partition keeps them all (coalesce only ever narrows).
    val rowsPerTask = spark.conf
      .get("graft.classifier.gradRowsPerTask", "4096").toLong
    val ckptParts = exA.rdd.getNumPartitions
    val loopParts = math.max(1L, math.min(ckptParts.toLong,
      (nLong + rowsPerTask - 1) / rowsPerTask)).toInt
    val gradSrc = if (loopParts < ckptParts) exA.coalesce(loopParts) else exA

    // model + velocity in micro-units; index 0 = bias (bucket −1)
    val w = Array.fill(dims + 1)(0L)
    val v = Array.fill(dims + 1)(0L)
    // the per-iteration logit: exact LONG sum of weights over the doc's
    // instances (bias included via j = −1), folded over the bucket
    // array as a pure projection (the scoreExpr shape) — where the
    // previous broadcast-join + groupBy(doc_id) shuffled the full
    // instance frame once per iteration. The weight table rides as ONE
    // array-typed literal (`typedLit`), which codegen emits as a
    // references[] slot — the generated source is identical across
    // iterations, so whole-stage codegen compiles ONCE (a per-element
    // `array(lit…)` tree would inline 257 values into the source and
    // recompile every iteration — the janino trap the broadcast-join
    // design note warned about). Long addition is commutative-exact,
    // so the zmu values are bit-identical to the old grouped sum.
    def zmuCol: Column = {
      val wArr = typedLit(w.toSeq)
      aggregate(col("js"), lit(0L),
        (acc, j) => acc + element_at(wArr, j.cast("int") + lit(2)))
    }
    def logits: DataFrame =
      exA.select(col("doc_id"), col("y"), zmuCol.as("zmu"))

    for (_ <- 1 to iters) {
      // FUSED gradient pass: the residual is computed per document in a
      // projection and the bucket array exploded in the projection above
      // the partial aggregate — one job per iteration, no broadcast
      // build, no join, and nothing doc-count-sized ever leaves the
      // executors (the previous broadcast(resid) hard-capped the corpus
      // at the 8 GB broadcast limit). The residual expression is the old
      // one verbatim and rows stream in the same order; only the
      // partial-sum partition grouping moves (coalesce above), which the
      // 1e-6 micro-unit rounding of the update absorbs — verified
      // bit-identical against the DuckDB oracle at sf0.001/sf0.01.
      val grads = gradSrc
        .select(col("js"),
          (sigmoid(zmuCol) - col("y").cast("double")).as("r"))
        .select(col("r"), explode(col("js")).as("j"))
        .groupBy("j").agg(sum("r").as("s")).collect()
      grads.foreach { row =>
        // a null sum = every doc touching this bucket has a null label;
        // skipping matches the oracle's coalesce(g.s, 0) → no update
        if (!row.isNullAt(1)) {
          val i = row.getLong(0).toInt + 1
          v(i) = roundHalfAway(beta * v(i) + row.getDouble(1) / n * 1e6)
          w(i) -= roundHalfAway(lr * v(i))
        }
      }
    }
    (LrModel(dims, w.drop(1), w(0)), logits)
  }

  /**
   * Train and score: `(doc_id, label, score, pred)` with `score` the
   * sigmoid rounded to 1e-6 and `pred` thresholded at 0.5 on the
   * ROUNDED score (so any engine computing the same rounded score
   * reaches the same verdict).
   */
  def lrScores(docs: DataFrame, dims: Int = 256, iters: Int = 8,
      lr: Double = 0.02, beta: Double = 0.9,
      labelCol: Column = col("lang") === "en",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (_, scored) =
      train(docs, dims, iters, lr, beta, labelCol, idCol, textCol)
    val score = round(sigmoid(col("zmu")), 6)
    scored.select(col("doc_id"), col("y").as("label"), score.as("score"),
      (score >= 0.5).cast("int").as("pred"))
  }

  /**
   * Threshold sweep over the trained scores: per threshold t ∈
   * {0.1 … 0.9}, the confusion counts and precision/recall/F1 against
   * the training labels — the calibration readout that picks the
   * operating point for a quality gate. F1 derives from the ROUNDED
   * precision/recall so both engines agree bit-for-bit.
   */
  def lrEval(docs: DataFrame, dims: Int = 256, iters: Int = 8,
      lr: Double = 0.02, beta: Double = 0.9,
      labelCol: Column = col("lang") === "en",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scores = lrScores(docs, dims, iters, lr, beta,
      labelCol, idCol, textCol)
    val conf = scores
      .select(col("label"), col("score"),
        explode(array((1 to 9).map(t => lit(t / 10.0)): _*)).as("thr"))
      .groupBy("thr").agg(
        sum(when(col("score") >= col("thr") && col("label") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("thr") && col("label") === 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("score") < col("thr") && col("label") === 1, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("score") < col("thr") && col("label") === 0, 1L)
          .otherwise(0L)).as("tn"))
    val prec = when(col("tp") + col("fp") > 0,
      round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
    val rec = when(col("tp") + col("fn") > 0,
      round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
    conf
      .withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1",
        when(col("precision").isNotNull && col("recall").isNotNull &&
            col("precision") + col("recall") > 0,
          round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6)))
      .orderBy("thr")
  }

  /**
   * Reliability (calibration) buckets over the trained scores — the
   * diagram behind "is score 0.8 actually right 80% of the time?",
   * which [[lrEval]]'s threshold sweep cannot answer: per decile
   * bucket of the predicted score, the count, positive count, mean
   * predicted score, observed positive rate, and their gap (the
   * per-bucket term of expected calibration error; ECE is the
   * n-weighted mean of `gap`).
   *
   * Determinism: scores are already 6-dp-quantized, so each becomes an
   * EXACT integer of micro-units and per-bucket sums are exact integer
   * math in any partial-aggregation order; each reported mean divides
   * two exact numbers once (the [[TextAnalysis.unigramNll]]
   * discipline). One groupBy over `buckets` rows of state.
   */
  def lrCalibration(docs: DataFrame, dims: Int = 256, iters: Int = 8,
      lr: Double = 0.02, beta: Double = 0.9,
      labelCol: Column = col("lang") === "en",
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 10): DataFrame = {
    val scores = lrScores(docs, dims, iters, lr, beta,
      labelCol, idCol, textCol)
    scores
      .select(col("label"),
        least(floor(col("score") * buckets).cast("int"),
          lit(buckets - 1)).as("bucket"),
        round(col("score") * 1e6).cast("long").as("smicro"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("label")).as("pos"),
        sum(col("smicro")).as("ssm"))
      .select(col("bucket"), col("n"), col("pos"),
        round(col("ssm").cast("double") / 1e6 / col("n"), 6)
          .as("mean_score"),
        round(col("pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(abs(col("ssm").cast("double") / 1e6 / col("n")
          - col("pos").cast("double") / col("n")), 6).as("gap"))
  }
}
