package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`).
 *
 * Brute-force cosine top-k is the correctness baseline; the IVF-bucketed
 * variant is the scale path: with a coarse-quantizer cell per vector, each
 * query only joins its own cell — candidate volume drops by the cell count
 * and the join is a shuffle-friendly equi-join on the cell id. At 100 TB
 * the cell assignment comes from a k-means pass; the test data carries it
 * as `label`.
 */
object Similarity {

  /** Cosine similarity of two double arrays as a pure column expression:
    * sequential fold in index order, so the result is bit-identical to the
    * DuckDB oracle's fold and safe to round-and-compare. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sequential-fold dot product (index order ⇒ deterministic fp). */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** sqrt(v·v) — precompute once per vector; cos = dot/(norm_a*norm_b). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  private def asDouble(vecCol: Column): Column =
    transform(vecCol, x => x.cast("double"))

  /**
   * Brute-force top-k: every query against every candidate, ranked per
   * query by (rounded cosine desc, id). The rounding (6 places) makes the
   * ranking deterministic across engines; id breaks exact ties.
   */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
    val c = candidates.select(col(idCol).as("c_id"), asDouble(col(vecCol)).as("c_v"))
      .withColumn("c_nrm", norm(col("c_v")))
    val scored = q.crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic Rademacher hyperplane component: ±1 from an integer
    * mix of (table, bit, dim) — no RNG state, no broadcast side data,
    * identical across executors and runs. `private[graft]` so the
    * DuckDB oracle builder can inline the SAME plane literals into its
    * replay SQL (the planes are plan-time constants, not data). */
  private[graft] def planeSign(table: Int, bit: Int, d: Int): Double = {
    var z = table.toLong * 0x9E3779B97F4A7C15L +
      bit.toLong * 0xBF58476D1CE4E5B9L + d.toLong * 0x94D049BB133111EBL
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^= (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** Bucket id for one hash table: `bits` sign bits of Rademacher
    * projections, packed into one long. The hyperplanes are LITERAL
    * arrays (driver-built, dim known from the data), so the per-row work
    * is pure codegen'd arithmetic — no per-component hashing. */
  def rhpBucket(v: Column, dim: Int, bits: Int, table: Int): Column =
    (0 until bits).map { b =>
      val plane = array((0 until dim).map(d => lit(planeSign(table, b, d))): _*)
      when(aggregate(zip_with(v, plane, (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x) >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * Multi-table random-hyperplane LSH top-k (the second scale path beside
   * IVF): `tables` independent hash tables of `bits` sign bits each; a
   * candidate qualifies when it shares ANY table's bucket with the query —
   * the same banding recall-amplification the MinHash path uses. A single
   * table is uselessly lossy at realistic angles (P[all bits agree] =
   * (1−θ/π)^bits ≈ 2% for θ=60°, bits=8 — measured ~0 recall on the test
   * embeddings); with L tables recall is 1−(1−p)^L. Candidate generation
   * stays an equi-join on (table, bucket); only ids and one long shuffle,
   * vectors join back for scoring.
   */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      bits: Int = 6, tables: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // dim probe: hyperplanes are literals, so the vector width must be
    // known up front (one tiny driver job on a LIMIT-1 scan). An empty
    // candidates frame (or null first vector) falls back to dim 1 — the
    // bucket join is empty either way, and the result must be an empty
    // frame with the right schema, not a head()-on-nothing crash.
    val dim = candidates.select(size(asDouble(col(vecCol))).as("d"))
      .filter(col("d") > 0).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(1)
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
    val c = candidates.select(col(idCol).as("c_id"), asDouble(col(vecCol)).as("c_v"))
      .withColumn("c_nrm", norm(col("c_v")))
    // all table buckets in ONE projection + posexplode: a union of
    // `tables` branches would re-scan and re-decode the vector column per
    // branch; this computes every bucket in a single pass over each side
    def buckets(df: DataFrame, id: String, v: String) =
      df.select(col(id), posexplode(array(
        (0 until tables).map(t => rhpBucket(col(v), dim, bits, t)): _*)))
        .toDF(id, "tbl", "bucket")
    val cand = buckets(q, "q_id", "q_v")
      .join(buckets(c, "c_id", "c_v"), Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))
      .distinct()
    val scored = cand
      .join(q, "q_id")
      .join(c, "c_id")
      .select(col("q_id"), col("c_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * IVF + SQ8 top-k — FAISS's `IVF,SQ8` shape: within each coarse cell,
   * candidates are pre-ranked by the integer dot product of scalar-
   * quantized (8-bit) vectors, and only the top `candMult*k` survivors
   * are rescored with the exact cosine. At 100 TB this is the bandwidth
   * play: the quantized corpus is 4× smaller than float32 (dim bytes per
   * vector), the pre-rank is pure integer math, and the expensive
   * double-precision cosine runs on `candMult*k` rows per query instead
   * of the whole cell.
   *
   * Quantization is symmetric int8 over the L2-NORMALIZED vector
   * (`round(v_j/‖v‖ · 127)`, clamped to ±127): components live in
   * [-1, 1], so no codebook is needed — no corpus aggregate, no
   * broadcast, no driver state — and the integer dot is directly
   * proportional to cosine (a per-dim affine codebook over RAW vectors
   * is NOT: unequal dim scales distort the ranking — measured recall
   * 0.48 vs 1.0 here). Everything is deterministic IEEE + integer math
   * with id tie-breaks, so the DuckDB oracle replays the whole pipeline,
   * quantization loss and all.
   */
  def sq8TopK(queries: DataFrame, candidates: DataFrame, k: Int,
      candMult: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    def quant(v: Column, nrm: Column): Column =
      transform(v, x =>
        greatest(least(round(x / nrm * 127).cast("long"), lit(127L)),
          lit(-127L)))
    def intDot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0L), (acc, v) => acc + v)

    // zero-norm guard: an all-zero embedding would quantize to NaN
    // (round(NaN) casts to 0) and rank on NaN cosines, where engine NaN
    // orderings diverge — such vectors carry no direction, so drop them
    // on both sides (the oracle applies the same `nrm > 0` predicate)
    val q = queries.select(col(idCol).as("q_id"), col(cellCol).as("cell"),
        asDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
      .filter(col("q_nrm") > 0)
      .withColumn("q_qv", quant(col("q_v"), col("q_nrm")))
    val c = candidates.select(col(idCol).as("c_id"), col(cellCol).as("cell"),
        asDouble(col(vecCol)).as("c_v"))
      .withColumn("c_nrm", norm(col("c_v")))
      .filter(col("c_nrm") > 0)
      .withColumn("c_qv", quant(col("c_v"), col("c_nrm")))
    val cw = Window.partitionBy("q_id")
      .orderBy(col("idot").desc, col("c_id"))
    val cand = q.join(c, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("idot", intDot(col("q_qv"), col("c_qv")))
      .withColumn("crk", row_number().over(cw))
      .filter(col("crk") <= candMult * k)
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    cand.select(col("q_id"), col("cell"), col("c_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * IVF-bucketed top-k: queries only search their own coarse cell.
   * Candidate generation is an equi-join on the cell id.
   */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(cellCol).as("cell"),
      asDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
    val c = candidates.select(col(idCol).as("c_id"), col(cellCol).as("cell"),
      asDouble(col(vecCol)).as("c_v"))
      .withColumn("c_nrm", norm(col("c_v")))
    val scored = q.join(c, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("cell"), col("c_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * IVF multi-probe top-k — [[ivfTopK]]'s recall knob: each query
   * searches its `nprobe` NEAREST cells (by distance to the cell
   * centroid) instead of only its own, catching true neighbors that sit
   * just across a Voronoi boundary — the standard IVF recall/cost
   * trade (Faiss `nprobe`). Candidate volume scales linearly in
   * `nprobe`; the join stays a cell-id equi-join.
   *
   * Centroids are the per-cell coordinate means rounded to 1e-6 (the
   * k-means re-center discipline), so the whole pipeline — centroid
   * computation, probe selection (distance ties broken by cell id),
   * scoring, ranking — is deterministic and replayed end-to-end by the
   * DuckDB oracle. With `nprobe >=` the number of cells this EQUALS
   * brute force (pinned in CrossCheckSpec), which is the exactness
   * argument for the probe path: it only ever prunes, never reorders.
   *
   * At 100 TB: centroids are a tiny aggregate (cells × dim), broadcast
   * to rank probes per query; the candidate join shuffles only
   * (cell, ids) pairs. Zero-norm candidates are dropped on both sides
   * (no direction ⇒ NaN cosine, engine-divergent ordering).
   */
  def ivfTopKMultiProbe(queries: DataFrame, candidates: DataFrame, k: Int,
      nprobe: Int = 2, idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
      .filter(col("q_nrm") > 0)
    val c = candidates.select(col(idCol).as("c_id"), col(cellCol).as("cell"),
        asDouble(col(vecCol)).as("c_v"))
      .withColumn("c_nrm", norm(col("c_v")))
      .filter(col("c_nrm") > 0)
    // per-cell centroid: coordinate means rounded to 1e-6 (deterministic
    // across engines). cells × dim is bounded (the k-means centroid
    // discipline), so the table is collected once and inlined as plan
    // literals — probe ranking is then a scan-speed projection, no join
    val cents = c.select(col("cell"), posexplode(col("c_v")))
      .groupBy("cell", "pos").agg(round(avg("col"), 6).as("mv"))
      .groupBy("cell")
      .agg(map_from_arrays(collect_list("pos"), collect_list("mv")).as("byPos"))
      .select(col("cell"),
        transform(sequence(lit(0), size(col("byPos")) - 1),
          i => element_at(col("byPos"), i)).as("cv"))
      .collect()
    if (cents.isEmpty)
      // no candidates with positive norm: empty result, right schema
      return q.filter(lit(false))
        .select(col("q_id"), col("q_id").as("c_id"),
          lit(0.0).as("cos_sim"), lit(1).as("rank"))
    def sqd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    // nprobe nearest cells per query: array_sort over (distance, cell)
    // structs sorts by distance with cell as the deterministic tie-break
    val distStructs = array(cents.map { r =>
      val cellLit = lit(r.get(0))
      val cvLit = array(r.getSeq[Double](1).map(lit).toIndexedSeq: _*)
      struct(round(sqd(col("q_v"), cvLit), 6).as("cd"), cellLit.as("cell"))
    }.toIndexedSeq: _*)
    val probes = q
      .select(col("q_id"),
        explode(slice(array_sort(distStructs), 1, nprobe)).as("p"))
      .select(col("q_id"), col("p.cell").as("cell"))
    val scored = probes
      .join(c, "cell")
      .join(q, "q_id")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Contrastive training-pair mining for embedding-model fine-tuning
   * (the SimCSE/DPR data-prep step): for every anchor with at least one
   * semantic positive, emit its best positive and its hardest negative.
   *
   *  - candidates: same IVF cell — the bounded candidate generator
   *    shared with [[Dedup.embeddingNearDups]] and SemDeDup; never a
   *    cross join;
   *  - positive: highest-cosine candidate with `cos_sim >= posLo`
   *    (exact dups should already be removed upstream);
   *  - hard negative: highest-cosine candidate BELOW `posLo` — the
   *    near-miss contrastive losses learn most from (easy random
   *    negatives are free at training time; hard ones must be mined).
   *
   * Determinism: cosines are rounded to 6 decimals BEFORE ranking, ties
   * break by candidate id. Output `(anchor_id, pos_id, pos_sim, neg_id,
   * neg_sim)`, one row per anchor having both sides.
   *
   * Scale shape: one same-cell equi-join bounds candidates by Σ|cell|²,
   * two row_number windows partitioned by anchor pick winners, the
   * final join is anchor-keyed. Nothing is collected to the driver.
   */
  def minePairs(embeddings: DataFrame, posLo: Double = 0.3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    val e = embeddings.select(col(idCol).as("vec_id"),
        col(cellCol).as("cell"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("nrm") > 0) // zero-norm guard, as in sq8TopK
    val cand = e.as("a").join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor_id"), col("b.vec_id").as("cand_id"),
        round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("cos_sim").desc, col("cand_id"))
    def top1(df: DataFrame, idName: String, simName: String) =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("anchor_id"), col("cand_id").as(idName),
          col("cos_sim").as(simName))
    top1(cand.filter(col("cos_sim") >= posLo), "pos_id", "pos_sim")
      .join(top1(cand.filter(col("cos_sim") < posLo), "neg_id", "neg_sim"),
        "anchor_id")
  }

  /**
   * IVF-PQ top-k — the Faiss-default scale recipe (Jégou et al. 2011,
   * "Product Quantization for Nearest Neighbor Search"): split the
   * vector into `m` subspaces, learn a tiny `ks`-centroid codebook per
   * subspace (Lloyd's, same deterministic discipline as
   * [[Semantic.kmeansAssign]]: lowest-id init, sequential-fold
   * distances, 1e-6-quantized re-centers), encode every vector as `m`
   * codes, and answer queries by asymmetric distance (ADC): per query,
   * a LUT of query-subvector→centroid distances turns candidate
   * distance into `m` table lookups — no full vectors touched until
   * the exact rescore of the `candMult·k` ADC survivors.
   *
   * Why this is THE 100-TB ANN shape: the corpus is represented by
   * `m` bytes/vector (64× compression at dim 64/float32), the
   * candidate scan streams codes not vectors, and training cost is
   * bounded by `m·ks·subDim` — independent of corpus size (train on a
   * [[Sampling.deterministicSample]] at real scale).
   *
   * Spark shape: subvector instance rows are checkpointed ONCE;
   * codebooks live as broadcast DATA so every Lloyd's iteration (and
   * the encode pass) reuses one compiled plan — the literal-codebook
   * variant would recompile codegen per iteration (measured on the
   * classifier: 20 of 25 s in janino). ADC is a broadcast join of the
   * tiny LUT against code rows, grouped to an exact integer micro-unit
   * sum (engine-order-proof), pre-ranked per query within the IVF
   * cell, then exactly rescored — the sq8 pattern, one quantization
   * level deeper.
   */
  /** One (s, subv) struct per subspace of `vec` — the PQ split shared
    * by training, encoding, and the query-side ADC LUT. */
  private[pipeline] def pqSubCol(vec: Column, m: Int, subDim: Int): Column =
    explode(array((0 until m).map(s =>
      struct(lit(s).as("s"),
        slice(vec, s * subDim + 1, subDim).as("subv"))): _*))

  /** `(vec_id, s, subv)` — one row per subvector of `vecs` (a
    * `(vec_id, v)` frame), checkpointed ONCE so every training
    * iteration and the encode pass reuse one compiled plan. */
  private[pipeline] def pqSubFrame(vecs: DataFrame, m: Int,
      subDim: Int): DataFrame =
    // spread before the checkpoint: the slice-explode and every
    // training pass over the checkpointed rows otherwise inherit the
    // single-row-group scan's ONE partition (no-op at scale)
    Dedup.spread(vecs, col("vec_id"))
      .select(col("vec_id"), pqSubCol(col("v"), m, subDim).as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.subv").as("subv"))
      .transform(Lineage.cut)

  private def pqSqd(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Nearest codebook entry per (vector, subspace) — `(vec_id, s, cid)`:
    * min over the broadcast codebook of (distance, cid) structs,
    * deterministic, cid breaks exact-tie distances. */
  private[pipeline] def pqAssignFrame(sub: DataFrame,
      cents: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val spark = sub.sparkSession
    import spark.implicits._
    sub.join(broadcast(cents.toDF("s", "cid", "cv")), "s")
      .groupBy("vec_id", "s")
      .agg(min(struct(pqSqd(col("subv"), col("cv")).as("d"),
        col("cid").as("cid"))).as("b"))
      .select(col("vec_id"), col("s"), col("b.cid").as("cid"))
  }

  /** [[pqAssignFrame]]'s assignment rule as a pure per-row COLUMN: the
    * codebook rides as ONE nested typed literal (a codegen references[]
    * slot — the source compiles once even as the values change across
    * Lloyd's iterations), entries of the row's subspace are scanned by
    * `array_min` over (distance, cid) structs. Distance is [[pqSqd]]
    * verbatim and the struct min is the same (d, cid) lexicographic
    * rule, so the chosen cid is bit-identical to the join shape — with
    * no broadcast build, no join, and no group-back exchange. */
  private def pqNearestCidCol(subv: Column, sCol: Column,
      cents: Seq[(Int, Int, Seq[Double])]): Column = {
    val maxS = cents.map(_._1).max
    val bySub: Seq[Seq[(Int, Seq[Double])]] = (0 to maxS).map(s =>
      cents.filter(_._1 == s).sortBy(_._2).map(t => (t._2, t._3)))
    val cbLit = typedLit(bySub)
    array_min(transform(element_at(cbLit, sCol + lit(1)), e =>
      struct(pqSqd(subv, e.getField("_2")).as("d"),
        e.getField("_1").as("cid"))))
      .getField("cid")
  }

  /** Per-subspace PQ codebooks under the deterministic Lloyd's
    * discipline (lowest-vec_id init with cid = id rank, broadcast
    * codebook DATA so every iteration reuses one compiled plan,
    * 1e-6-quantized re-centers) — extracted from the inline [[pqTopK]]
    * so the persisted index (`buildIvfIndex(codec = "pq")`) trains the
    * IDENTICAL codebook the inline operator and the DuckDB replay do.
    * `all` must be positive-norm `(vec_id, v)` rows; `sub` its
    * [[pqSubFrame]]. A cid whose cluster empties drops out (standard
    * collect-recenter Lloyd's) — codes only ever reference surviving
    * entries. */
  private[pipeline] def pqTrainOnSub(all: DataFrame, sub: DataFrame,
      ks: Int, iters: Int, m: Int): Seq[(Int, Int, Seq[Double])] = {
    // init: every vec_id contributes exactly m sub rows, so the ks
    // lowest ids' subvectors are the first ks·m rows of (vec_id, s)
    // order — ONE collect fuses the old id-scan + filtered-sub-scan
    // pair of jobs (`all` stays a parameter only for its row identity;
    // sub derives from it)
    val initRows = sub.orderBy("vec_id", "s").limit(ks * m).collect()
    val cidOf = initRows.map(_.getLong(0)).distinct.sorted
      .zipWithIndex.toMap
    var cents: Seq[(Int, Int, Seq[Double])] = initRows.map { r =>
      (r.getInt(1), cidOf(r.getLong(0)), r.getSeq[Double](2).toSeq)
    }.toSeq
    if (cents.isEmpty) return cents
    val subDim = cents.head._3.length
    for (_ <- 1 to iters) {
      // FUSED Lloyd's step: nearest-cid as a per-row expression over
      // the nested codebook literal, then ONE groupBy with subDim
      // parallel avg columns — one exchange per iteration where the
      // join shape paid four (broadcast build, assign group-back,
      // join-back to sub, posexplode double groupBy). The avg is
      // rounded to 1e-6 so the re-center is summation-order-proof.
      val avgs = (0 until subDim).map(i =>
        round(avg(element_at(col("subv"), i + 1)), 6).as(s"m$i"))
      cents = sub
        .groupBy(col("s"),
          pqNearestCidCol(col("subv"), col("s"), cents).as("cid"))
        .agg(avgs.head, avgs.tail: _*)
        .collect().map { r =>
          (r.getInt(0), r.getInt(1),
            Seq.tabulate(subDim)(i => r.getDouble(i + 2)))
        }.toSeq.sortBy(t => (t._1, t._2))
    }
    cents
  }

  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      m: Int = 8, ks: Int = 16, iters: Int = 2, candMult: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCol: String = "label"): DataFrame = {
    require(m > 0 && ks > 0 && iters >= 0 && candMult > 0,
      s"need positive m/ks/candMult, iters >= 0; got $m, $ks, $iters, $candMult")
    val spark = candidates.sparkSession
    import spark.implicits._

    val all = candidates.select(col(idCol).as("vec_id"),
        col(cellCol).as("cell"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("nrm") > 0) // zero-norm guard, as in sq8TopK
    val dimRow = all.select(size(col("v"))).take(1)
    require(dimRow.nonEmpty,
      "pqTopK: no candidates with positive norm — nothing to index")
    val dim = dimRow.head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m = $m")
    val subDim = dim / m

    def sqd(a: Column, b: Column): Column = pqSqd(a, b)

    // (vec_id, s, subv) — one row per subvector, reused by every
    // training iteration and the encode pass
    val sub = pqSubFrame(all.select(col("vec_id"), col("v")), m, subDim)
    val cents = pqTrainOnSub(all, sub, ks, iters, m)
    val ctDF: DataFrame = cents.toDF("s", "cid", "cv")

    // encode under the final codebook; carry the IVF cell for routing
    val codes = pqAssignFrame(sub, cents)
      .join(all.select(col("vec_id"), col("cell")), "vec_id")
      .select(col("vec_id").as("c_id"), col("cell"), col("s"), col("cid"))

    val q = queries.select(col(idCol).as("q_id"), col(cellCol).as("q_cell"),
        asDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
      .filter(col("q_nrm") > 0)
    // per-query ADC lookup table in integer micro-units: exact BIGINT
    // sums downstream, immune to engine float-summation order
    val lut = q.select(col("q_id"), col("q_cell"),
        pqSubCol(col("q_v"), m, subDim).as("e"))
      .select(col("q_id"), col("q_cell"), col("e.s").as("s"),
        col("e.subv").as("subv"))
      .join(broadcast(ctDF), "s")
      .select(col("q_id"), col("q_cell"), col("s"), col("cid"),
        round(sqd(col("subv"), col("cv")) * 1e6).cast("long").as("ld"))

    val adist = codes.join(broadcast(lut), Seq("s", "cid"))
      .filter(col("q_cell") === col("cell") && col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id")
      .agg(min(col("q_cell")).as("cell"), sum("ld").as("ad"))
    val cw = Window.partitionBy("q_id").orderBy(col("ad").asc, col("c_id"))
    val cand = adist.withColumn("crk", row_number().over(cw))
      .filter(col("crk") <= candMult * k)

    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    cand
      .join(q.select(col("q_id"), col("q_v"), col("q_nrm")), "q_id")
      .join(all.select(col("vec_id").as("c_id"), col("v").as("c_v"),
        col("nrm").as("c_nrm")), "c_id")
      .select(col("q_id"), col("cell"), col("c_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Table-id offset for the JL projection's Rademacher rows — disjoint
    * from the LSH hyperplane family's (table, bit) domain so the two
    * deterministic sign families never alias. */
  private[graft] val RpTableBase = 1000

  /** One ±1 Rademacher projection row, shared with the DuckDB oracle
    * builder (inlined as SQL literals, like the LSH planes). */
  private[graft] def rpSign(j: Int, d: Int): Double =
    planeSign(RpTableBase + j, 0, d)

  /**
   * IVF + JL random-projection top-k — the third member of the
   * compressed-candidate family (SQ8 = 8-bit ints, PQ = m codebook
   * bytes, RP = `rDim` Rademacher sums; Achlioptas 2003,
   * "Database-friendly random projections"). Within each coarse cell,
   * candidates are pre-ranked by the reduced-space inner product of
   * `rDim`-dimensional sketches (dim/rDim× smaller than the raw
   * vectors), and only the top `candMult·k` survivors are rescored
   * with the exact cosine. Johnson–Lindenstrauss says the sketch inner
   * product concentrates around the true one, so the pre-rank keeps
   * true neighbors with high probability — CrossCheckSpec holds the
   * recall floor, and `candMult`/`rDim` are the recall knobs (measured
   * on the test embeddings, recall vs cell-exact IVF: rDim 16 is 0.675
   * at candMult 4, 0.95 at 8, 1.0 at 12; rDim 32 reaches 1.0 at
   * candMult 8 — the defaults take 4× compression at candMult 8).
   *
   * The projection matrix is the deterministic [[rpSign]] Rademacher
   * family — plan-time ±1 literals, no RNG state, no broadcast — so
   * sketching is codegen'd arithmetic and the DuckDB oracle inlines
   * the SAME literals and replays sketch, pre-rank, and rescore
   * end-to-end. Sketch entries are rounded to 1e-6 before the sketch
   * dot so both engines fold identical doubles in identical order.
   *
   * At 100 TB: sketches are computed at the scan (or persisted as a
   * `rDim`-float sidecar column), the candidate join stays a cell-id
   * equi-join, and the full-width vectors are touched only for
   * `candMult·k` rows per query.
   */
  def rpTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      rDim: Int = 16, candMult: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding", cellCol: String = "label"): DataFrame = {
    // dim probe (one LIMIT-1 driver job), as in lshTopK
    val dim = candidates.select(size(asDouble(col(vecCol))).as("d"))
      .filter(col("d") > 0).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(1)
    def sketch(v: Column): Column = array((0 until rDim).map { j =>
      val plane = array((0 until dim).map(d => lit(rpSign(j, d))): _*)
      round(dot(v, plane), 6)
    }: _*)
    val q = queries.select(col(idCol).as("q_id"), col(cellCol).as("cell"),
        asDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
      .filter(col("q_nrm") > 0) // zero-norm guard, as in sq8TopK
      .withColumn("q_r", sketch(col("q_v")))
    val c = candidates.select(col(idCol).as("c_id"), col(cellCol).as("cell"),
        asDouble(col(vecCol)).as("c_v"))
      .withColumn("c_nrm", norm(col("c_v")))
      .filter(col("c_nrm") > 0)
      .withColumn("c_r", sketch(col("c_v")))
    val cw = Window.partitionBy("q_id").orderBy(col("rsim").desc, col("c_id"))
    val cand = q.join(c, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("rsim",
        round(dot(col("q_r"), col("c_r")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("crk", row_number().over(cw))
      .filter(col("crk") <= candMult * k)
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    cand.select(col("q_id"), col("cell"), col("c_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Binary (1-bit sign) sketch ANN — the fourth compressed-candidate
   * family member after SQ8, PQ, and JL/RP: each vector reduces to ONE
   * 64-bit word of coordinate signs (`v[d] > 0`; zero counts negative,
   * deterministically), candidates pre-rank by HAMMING distance of the
   * sketches (`bit_count(xor)` — two codegen'd instructions per pair,
   * the cheapest compare in the family; sign-bit Hamming estimates
   * angular distance, Charikar 2002's SRP-LSH with coordinate planes),
   * and only the top `candMult·k` survivors pay the exact cosine.
   * Exactness argument shared with multi-probe: the pre-rank only
   * PRUNES — with `candMult·k` ≥ cell size it equals the cell-exact
   * IVF ranking (CrossCheckSpec pins it); `candMult` is the recall
   * knob.
   *
   * At 100 TB: the sketch is ⌈dim/64⌉ longs riding the scan (or a
   * sidecar column — 64× smaller than fp64 vectors, 8× smaller than
   * SQ8), the candidate join stays a cell-id equi-join, and full-width
   * vectors are touched for `candMult·k` rows per query. dim ≤ 64
   * stays the ONE-long fast path (Hamming = two codegen'd
   * instructions); wider vectors pack into an `array<long>` word per
   * 64 dims with the Hamming folded across words — bit-identical to
   * the positional sign-disagreement count the DuckDB replay computes,
   * since packing is a bijection on sign patterns.
   */
  def binaryTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      candMult: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding", cellCol: String = "label"): DataFrame = {
    val dim = candidates.select(size(asDouble(col(vecCol))).as("d"))
      .filter(col("d") > 0).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(1)
    val nWords = (dim + 63) / 64
    def word(v: Column, w: Int): Column =
      (w * 64 until math.min(dim, w * 64 + 64)).map(d =>
        when(element_at(v, d + 1) > 0, lit(1L << (d - w * 64)))
          .otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_))
    def sketch(v: Column): Column =
      if (nWords == 1) word(v, 0)
      else array((0 until nWords).map(word(v, _)): _*)
    def hamming(a: Column, b: Column): Column =
      if (nWords == 1) bit_count(a.bitwiseXOR(b))
      else aggregate(zip_with(a, b,
          (x, y) => bit_count(x.bitwiseXOR(y)).cast("int")),
        lit(0), (acc, x) => acc + x)
    val q = queries.select(col(idCol).as("q_id"), col(cellCol).as("cell"),
        asDouble(col(vecCol)).as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
      .filter(col("q_nrm") > 0) // zero-norm guard, as in sq8TopK
      .withColumn("q_sk", sketch(col("q_v")))
    val c = candidates.select(col(idCol).as("c_id"), col(cellCol).as("cell"),
        asDouble(col(vecCol)).as("c_v"))
      .withColumn("c_nrm", norm(col("c_v")))
      .filter(col("c_nrm") > 0)
      .withColumn("c_sk", sketch(col("c_v")))
    val cw = Window.partitionBy("q_id").orderBy(col("ham"), col("c_id"))
    val cand = q.join(c, "cell")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("ham", hamming(col("q_sk"), col("c_sk")))
      .withColumn("crk", row_number().over(cw))
      .filter(col("crk") <= candMult * k)
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    cand.select(col("q_id"), col("cell"), col("c_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** The persisted index's self-description, written at build time and
    * validated on every admission and serve — the guard against the two
    * silent-corruption channels a schemaless index has: a wrong-dim
    * vector (zip_with null-pads ⇒ null distances ⇒ arbitrary cell) and
    * a wrong-attrCols admission (per-batch parquet schema drift). */
  private case class IvfMeta(dim: Int, kCells: Int, attrCols: Seq[String],
      codec: String, pqM: Int, pqKs: Int)

  /** The storage codecs [[buildIvfIndex]] accepts: raw float64 vectors
    * only ("none"), symmetric-int8 scalar quantization ("sq8", dim
    * bytes/vector of codes), or product quantization ("pq", m shorts/
    * vector + an m×ks codebook sidecar). */
  private[pipeline] val IvfCodecs = Seq("none", "sq8", "pq", "pqr")

  private def writeIvfMeta(spark: SparkSession, dir: String,
      meta: IvfMeta): Unit = {
    import spark.implicits._
    Seq((meta.dim, meta.kCells, meta.attrCols, meta.codec, meta.pqM,
        meta.pqKs))
      .toDF("dim", "k_cells", "attr_cols", "codec", "pq_m", "pq_ks")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Sidecar read cache: (dir → (file stamp, value)). A serve re-reads
    * the meta/centroid sidecars on every call — each a parquet listing
    * + a 1-to-k-row scan job; the stamp (part-file names, lengths,
    * modification times) invalidates on ANY rewrite (rebuild, re-codec),
    * so a cached value is always the live sidecar's content. Values are
    * k×dim-bounded driver objects — the same budget the literal-assign
    * path already collects per call. */
  private val sidecarCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, AnyRef)]()

  /** Bounded insert: the cache is keyed by index dir, so a long-lived
    * JVM cycling through many index dirs (tests, multi-tenant serving)
    * must not grow it without limit — clear-and-restart is fine, the
    * entries are one cheap re-read each. */
  private def sidecarCachePut(key: String, v: (String, AnyRef)): Unit = {
    if (sidecarCache.size() >= 512) sidecarCache.clear()
    sidecarCache.put(key, v)
  }

  /** The value is cached only when the sidecar's directory listing is
    * UNCHANGED across the read — a rewrite racing the read can
    * otherwise pair the old stamp with the new content and serve it
    * until the next rewrite. */
  private def sidecarPutIfStable(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, key: String, stampBefore: String,
      v: AnyRef): Unit =
    if (sidecarStamp(fs, p) == stampBefore)
      sidecarCachePut(key, (stampBefore, v))

  private def sidecarStamp(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String =
    fs.listStatus(p).map(f =>
      s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .sorted.mkString(",")

  private def readIvfMeta(spark: SparkSession, dir: String): IvfMeta = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no index meta sidecar at $dir/meta — buildIvfIndex writes it; " +
        "an index from before the meta sidecar must be rebuilt")
    val stamp = sidecarStamp(fs, p)
    val key = s"meta:$dir"
    val hit = sidecarCache.get(key)
    if (hit != null && hit._1 == stamp) return hit._2.asInstanceOf[IvfMeta]
    val df = spark.read.parquet(p.toString)
    val r = df.head()
    // Spark hands array columns back as a mutable ArraySeq — copy to an
    // immutable Seq before it leaves this scope. A pre-codec meta (no
    // codec column) is a raw-vector index.
    val hasCodec = df.columns.contains("codec")
    val meta = IvfMeta(r.getAs[Int]("dim"), r.getAs[Int]("k_cells"),
      r.getAs[scala.collection.Seq[String]]("attr_cols").toSeq,
      if (hasCodec) r.getAs[String]("codec") else "none",
      if (hasCodec) r.getAs[Int]("pq_m") else 0,
      if (hasCodec) r.getAs[Int]("pq_ks") else 0)
    require(meta.dim > 0 && meta.kCells > 0 &&
        IvfCodecs.contains(meta.codec),
      s"corrupt index meta at $dir/meta: $meta")
    sidecarPutIfStable(fs, p, key, stamp, meta)
    meta
  }

  /** The trained PQ codebook sidecar of a `codec="pq"` index —
    * `(s, cid, cv)` rows, m×ks×subDim doubles, driver-bounded by the
    * same argument as the centroid sidecar. Validated on every read:
    * every subspace must hold at least one surviving entry. */
  private def readPqCodebook(spark: SparkSession, dir: String,
      m: Int, op: String): Seq[(Int, Int, Seq[Double])] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/codebook")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$op: no PQ codebook sidecar at $p — buildIvfIndex(codec = \"pq\") " +
        "writes it; the index is corrupt or not a pq index")
    val rows = spark.read.parquet(p.toString)
      .select(col("s"), col("cid"), col("cv")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq)).toSeq
    require(rows.map(_._1).distinct.size == m,
      s"$op: PQ codebook at $p covers ${rows.map(_._1).distinct.size} of " +
        s"$m subspaces — truncated/corrupt sidecar; rebuild the index")
    rows
  }

  /** Loud per-row dimension guard: a vector whose length differs from
    * the index's trained dim fails the JOB instead of null-padding its
    * way into an arbitrary cell. Rides the scan — no extra pass. NULL
    * vectors fail too: `size(null)` is null, so a bare `size =!= dim`
    * evaluates to null (treated false) and a null embedding would slide
    * through into null distances and an arbitrary `min(struct)` cell —
    * the exact channel this guard exists to close. */
  private def dimChecked(v: Column, dim: Int, op: String): Column =
    when(v.isNull || size(v) =!= dim, raise_error(concat(
      lit(s"$op: embedding dim must be $dim (the index's trained dim), got "),
      coalesce(size(v).cast("string"), lit("NULL"))))).otherwise(v)

  /** Read + validate the trained-centroid sidecar ONCE, BEFORE the
    * literal/join strategy branch. The literal path always collected
    * the sidecar and refused an empty one; the join path used to
    * crossJoin whatever was there — a truncated or empty sidecar would
    * silently admit nothing / assign nothing / return empty top-k.
    * Validating the row count against the meta sidecar's `k_cells`
    * makes BOTH strategies fail loudly on the same corrupt state (the
    * count is one job over the one-file k-row sidecar — noise next to
    * any index operation). */
  private def readCentroidFrame(spark: SparkSession, dir: String,
      kCells: Int, op: String): DataFrame = {
    import spark.implicits._
    // collect the k×dim sidecar once and serve it as a LOCAL relation:
    // the row-count validation rides the same single job (the previous
    // count-then-collect shape paid two), every downstream use —
    // broadcast build, probe-literal collect — reads driver memory
    // instead of re-scanning the parquet, and the stamp cache skips
    // even that job on the steady serve path (invalidated by rewrite)
    val p = new org.apache.hadoop.fs.Path(s"$dir/centroids")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = if (fs.exists(p)) sidecarStamp(fs, p) else ""
    val key = s"centroids:$dir"
    val hit = sidecarCache.get(key)
    val rows =
      if (hit != null && hit._1 == stamp && stamp.nonEmpty)
        hit._2.asInstanceOf[Array[(Int, Seq[Double])]]
      else {
        val r = spark.read.parquet(s"$dir/centroids")
          .select(col("cell"), col("cv")).collect()
          .map(row => (row.getInt(0), row.getSeq[Double](1).toSeq))
        if (stamp.nonEmpty) sidecarPutIfStable(fs, p, key, stamp, r)
        r
      }
    require(rows.length == kCells,
      s"$op: centroid sidecar at $dir/centroids holds ${rows.length} " +
        s"cells but the meta sidecar says $kCells — truncated/corrupt " +
        "sidecar; rebuild the index")
    rows.toSeq.toDF("cell", "cv")
  }

  /** Auto-recovery for an interrupted [[compactIvfIndex]] swap, run by
    * every reader and writer of `dir/corpus`: the live corpus only
    * moves aside ([[compactIvfIndex]]'s rename to `corpus.old`) AFTER
    * the staging write completed, so live-missing + staging-present
    * means staging IS the complete compacted corpus — promote it; a
    * leftover `corpus.old` beside a live corpus is a crash between the
    * promote and the final delete — drop it. Every crash point in the
    * swap lands in one of these two states. */
  private[pipeline] def recoverCorpus(spark: SparkSession,
      dir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$dir/corpus")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(s"$dir/corpus.compacting")
    val old = new org.apache.hadoop.fs.Path(s"$dir/corpus.old")
    if (!fs.exists(live) && fs.exists(staging)) {
      // a concurrent reader may win the promote race — losing the
      // rename is fine as long as SOMEONE put a live corpus in place
      val renamed = fs.rename(staging, live)
      require(renamed || fs.exists(live),
        s"compaction recovery failed: could not promote $staging to $live")
    }
    if (fs.exists(live) && fs.exists(old)) fs.delete(old, true)
  }

  /** Session conf key bounding [[indexedTopK]]'s broadcast-query serve
    * regime: a query frame with MORE rows than this switches the final
    * candidate join from `broadcast(q)` to a shuffle hash join on
    * `q_id` — the same two-regime discipline the centroid assignment
    * applies via [[Semantic.LiteralAssignMaxKey]]. The default (2¹⁶)
    * keeps eval-sized query sets on the broadcast plan (corpus never
    * shuffled — IvfIndexSpec pins it) while a million-query batch stops
    * blowing the broadcast: above the threshold the CANDIDATES shuffle
    * on q_id instead (they were already window-shuffled on q_id for the
    * ranking, so the join adds no new exchange of the corpus side's
    * vectors beyond that ranking shuffle). The probe frame stays
    * broadcast in both regimes — queries × nprobe SKINNY rows (two ints
    * a row), broadcastable far past the point the full query vectors
    * are not. ServeRegimeSpec pins identical top-k on both shapes. */
  val ServeBroadcastMaxQueries = "graft.serve.broadcastMaxQueries"

  private def admitHwmPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/admit.hwm")

  /** The admission HIGH-WATER MARK: the largest batch id ever admitted
    * into this index. This is what lets [[extendIvfIndex]] tell a
    * legitimate replay (a crashed-job retry, a streaming epoch re-run)
    * from a NEW stream restarted off a FRESH checkpoint: both present
    * an id at or below the mark, but only the former may overwrite —
    * the caller asserts which by `allowReplay`. The mark survives
    * batch DELETION (a retracted batch's id must never be reused — a
    * directory listing alone would hand it out again), and it lives in
    * its own one-line sidecar rather than inside `dir/meta`: meta is
    * read by every concurrent serve/assign call and stays IMMUTABLE
    * after build, so readers never race a per-epoch rewrite; the mark
    * is touched only by the index's single writer. Published via
    * write-tmp + rename (atomic on HDFS/local); if the file is absent
    * (a pre-mark index, or the delete→rename crash window) the mark
    * falls back to the largest batch directory on disk — conservative,
    * and self-healed by the next admission. */
  private[pipeline] def readAdmitHwm(spark: SparkSession, dir: String): Long = {
    val p = admitHwmPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      require(s.nonEmpty && s.forall(_.isDigit),
        s"corrupt admission high-water sidecar at $p: '$s' — delete the " +
          "file to fall back to the on-disk batch listing")
      s.toLong
    } else {
      val corpus = new org.apache.hadoop.fs.Path(s"$dir/corpus")
      if (!fs.exists(corpus)) 0L
      else fs.listStatus(corpus).map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
        .foldLeft(0L)(math.max)
    }
  }

  private def writeAdmitHwm(spark: SparkSession, dir: String,
      v: Long): Unit = {
    val p = admitHwmPath(dir)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/admit.hwm.tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p),
      s"could not publish the admission high-water mark to $p")
  }

  /** Reset the mark — a retrain ([[buildIvfIndex]]) or a fold-to-
    * batch-0 ([[compactIvfIndex]]) restarts admission ids above 0. */
  private def clearAdmitHwm(spark: SparkSession, dir: String): Unit = {
    val fs = admitHwmPath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(admitHwmPath(dir), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/admit.hwm.tmp"), false)
  }

  /** Attach the codec's storage columns to an assigned frame carrying
    * the double-array `__vd`:
    *
    *  - `nrm`   — the vector's norm, stored so the quantized serve can
    *    drop zero-norm candidates and rescore cosines WITHOUT touching
    *    the raw column outside the survivor set;
    *  - `codes` — "sq8": `array<tinyint>` of `round(v/‖v‖·127)` clamped
    *    to ±127 (the [[sq8TopK]] quantizer — codebook-free because
    *    components of the normalized vector live in [-1, 1]); "pq":
    *    `array<smallint>` of per-subspace codebook ids. Zero-norm rows
    *    store null codes (no direction ⇒ never a candidate).
    *
    * When `train` is true (the build) the PQ codebook is trained on the
    * frame's positive-norm vectors ([[pqTrainOnSub]] — the inline
    * [[pqTopK]] discipline, so the DuckDB replay carries over) and
    * written to `dir/codebook`; on admission the PERSISTED codebook
    * encodes the batch — admission never retrains, codes stay
    * comparable across batches. `trainFraction < 1` trains the
    * codebook on the same [[Sampling.deterministicSample]] recipe the
    * coarse centroids use (codebook quality converges long before the
    * full corpus is seen — the Faiss guidance, one level down) while
    * the ENCODE still covers every vector. */
  private def encodeForCodec(spark: SparkSession, dir: String,
      df: DataFrame, codec: String, dim: Int, m: Int, ks: Int,
      iters: Int, train: Boolean, trainFraction: Double,
      centFrame: () => DataFrame): DataFrame = codec match {
    case "none" => df
    case "sq8" =>
      df.withColumn("nrm", norm(col("__vd")))
        .withColumn("codes", when(col("nrm") > 0,
          transform(col("__vd"), x =>
            greatest(least(round(x / col("nrm") * 127).cast("long"),
              lit(127L)), lit(-127L)).cast("byte"))))
    case "pq" =>
      encodePqLike(spark, dir, df, dim, m, ks, iters, train,
        trainFraction, residual = false, centFrame = null)
    case "pqr" =>
      encodePqLike(spark, dir, df, dim, m, ks, iters, train,
        trainFraction, residual = true, centFrame = centFrame())
  }

  /** The PQ/PQR encode shared body: `residual = true` quantizes the
    * COARSE RESIDUAL `v − centroid[cell]` instead of the raw vector —
    * the actual Faiss IVFPQ recipe: residuals center near 0, so the ks
    * codebook entries spend their resolution on the within-cell
    * displacement rather than re-describing the coarse geometry the
    * cell id already carries (markedly better ADC fidelity at the same
    * code budget). The centroid subtraction is a k-row broadcast
    * equi-join on the already-assigned `cell` — no threshold, no
    * group-back. Zero-RAW-norm rows store null codes either way (the
    * family's no-direction contract). */
  private def encodePqLike(spark: SparkSession, dir: String,
      df: DataFrame, dim: Int, m: Int, ks: Int, iters: Int,
      train: Boolean, trainFraction: Double, residual: Boolean,
      centFrame: DataFrame): DataFrame = {
    val subDim = dim / m
    val src =
      if (!residual) df.withColumn("__ev", col("__vd"))
      else df.join(broadcast(centFrame.select(col("cell"),
          asDouble(col("cv")).as("__cv"))), "cell")
        .withColumn("__ev", zip_with(col("__vd"), col("__cv"),
          (x, y) => x - y))
        .drop("__cv")
    val pos = src.withColumn("__n", norm(col("__vd")))
      .filter(col("__n") > 0)
      .select(col("vec_id"), col("__ev").as("v"))
    lazy val subAll = pqSubFrame(pos, m, subDim) // checkpointed once
    val cb =
      if (train) {
        // train-on-sample shares the encode's sub frame only at
        // full fraction; a sampled chain builds its own (smaller)
        // one and the encode never touches it
        val (trainPos, trainSub) =
          if (trainFraction >= 1.0) (pos, subAll)
          else {
            val tp = Sampling.deterministicSample(pos, "vec_id",
              trainFraction, "pqtrain")
            (tp, pqSubFrame(tp, m, subDim))
          }
        val trained = pqTrainOnSub(trainPos, trainSub, ks, iters, m)
        import spark.implicits._
        trained.toDF("s", "cid", "cv").repartition(1)
          .write.mode("overwrite").parquet(s"$dir/codebook")
        trained
      } else readPqCodebook(spark, dir, m, "extendIvfIndex")
    val withN = src.withColumn("nrm", norm(col("__vd")))
    val out = if (Semantic.useLiteralAssign(spark, (m * ks).toLong,
        subDim.toLong)) {
      // encode as a PURE scan expression (codebook literals — the
      // m·ks·subDim = dim·ks plan-size bound, same janino threshold
      // as everywhere): per subspace, min(struct(d, cid)).cid — the
      // IDENTICAL (distance, lower-cid) rule pqAssignFrame applies,
      // so the two strategies are bit-equal (QuantizedIndexSpec pins
      // it). Saves the encode's two shuffles (assign group-back +
      // codes join) — on a 100 TB build that is a full-corpus
      // shuffle avoided; training above already collected the same
      // codebook, so this adds no driver state
      val codeExpr = array((0 until m).map { s =>
        val ent = cb.filter(_._1 == s)
        array_min(array(ent.map { case (_, cid, cv) =>
          struct(pqSqd(slice(col("__ev"), s * subDim + 1, subDim),
            array(cv.map(lit): _*)).as("d"), lit(cid).as("cid"))
        }: _*)).getField("cid").cast("short")
      }: _*)
      withN.withColumn("codes", when(col("nrm") > 0, codeExpr))
    } else {
      // above the threshold: broadcast-join assignment (the training
      // shape) + one group-back — the plan stays O(1) nodes
      val codes = pqAssignFrame(subAll, cb)
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("s"), col("cid"))))
          .as("__sc"))
        .select(col("vec_id"),
          transform(col("__sc"), e => e.getField("cid").cast("short"))
            .as("codes"))
      withN.join(codes, Seq("vec_id"), "left_outer")
    }
    out.drop("__ev")
  }

  /** The corpus write discipline shared by build, admission, and
    * compaction: ≤ `filesPerCell` files per (batch, cell) directory,
    * file membership a pure function of the data (cell + an xxhash64
    * shard of the id) — never of input partitioning. This bounds the
    * small-files tax a probe query pays per probed cell, and makes the
    * per-cell file count a deterministic, oracle-replayable quantity. */
  private def shardForWrite(df: DataFrame, kCells: Int,
      filesPerCell: Int): DataFrame =
    df.repartition(math.max(1, kCells * filesPerCell), col("cell"),
      pmod(xxhash64(col("vec_id")), lit(filesPerCell.toLong)))

  /** Per-query probe ranking of EVERY index cell via a broadcast join —
    * the large-kCells twin of the literal `distStructs` path in
    * [[indexedTopK]]/[[nprobeRecallCurve]]: `(q_id, prk, cell)` with
    * `prk` ranked by (1e-6-rounded squared distance, cell). The window
    * shuffles only the QUERY side (queries × kCells skinny rows) —
    * the corpus is untouched. */
  private def probeRanksByJoin(q: DataFrame, centFrame: DataFrame): DataFrame = {
    def sqd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy("q_id").orderBy(col("cd"), col("cell"))
    q.crossJoin(broadcast(centFrame.select(col("cell"),
        asDouble(col("cv")).as("__cv"))))
      .select(col("q_id"), col("cell"),
        round(sqd(col("q_v"), col("__cv")), 6).as("cd"))
      .withColumn("prk", row_number().over(w))
      .select("q_id", "prk", "cell")
  }

  /** Per-query probe frame `(q_id, cell)` — each query's `nprobe`
    * nearest trained cells (1e-6-rounded distance, cell tie-break):
    * sidecar-literal structs below the [[Semantic.LiteralAssignMaxKey]]
    * threshold, [[probeRanksByJoin]] above it. Shared by the serve
    * path and the tuning curves. `q` must carry `(q_id, q_v)`. */
  private def probeFrame(spark: SparkSession, dir: String, meta: IvfMeta,
      q: DataFrame, nprobe: Int, op: String): DataFrame = {
    def sqd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val cf = readCentroidFrame(spark, dir, meta.kCells, op)
    if (Semantic.useLiteralAssign(spark, meta.kCells.toLong,
        meta.dim.toLong)) {
      val cents = cf.collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      val distStructs = array(cents.map { case (cell, cv) =>
        struct(round(sqd(col("q_v"), array(cv.map(lit): _*)), 6).as("cd"),
          lit(cell).as("cell"))
      }: _*)
      q.select(col("q_id"),
          explode(slice(array_sort(distStructs), 1, nprobe)).as("p"))
        .select(col("q_id"), col("p.cell").as("cell"))
    } else probeRanksByJoin(q, cf)
      .filter(col("prk") <= nprobe).select("q_id", "cell")
  }

  /** m ADC table lookups per candidate: `lut` is the per-query (pq) or
    * per-(query, cell) (pqr) array-of-arrays of micro-unit distances,
    * `codes` the candidate's stored ids — a pure fold, no aggregate. */
  private def adcFold(lut: Column, codes: Column, m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
      (acc, s) => acc + element_at(
        element_at(lut, (s + lit(1)).cast("int")),
        element_at(codes, (s + lit(1)).cast("int")).cast("int") + 1))

  /** `(q_id, c_id, __ps)` — the quantized PRE-RANK score of every
    * (probing query, candidate) pair over the codes column (HIGHER is
    * better: sq8 = the exact int8 dot; pq/pqr = negated ADC micro-unit
    * distance). `cQ` must carry `(c_id, cell, c_nrm, codes)` of the
    * probed cells; shared by the quantized serve ([[indexedTopK]]) and
    * the [[candMultRecallCurve]] tuning table. Strategy notes live on
    * the serve — this is the extracted shape, unchanged. */
  private def quantPrerank(spark: SparkSession, dir: String,
      meta: IvfMeta, q: DataFrame, probes: DataFrame, cQ: DataFrame,
      qJoin: DataFrame => DataFrame,
      evalShape: Boolean = true): DataFrame = (meta.codec match {
    case "sq8" =>
      // symmetric-int8 integer dot, DESC — the sq8TopK pre-rank on
      // stored codes; the query side quantizes at plan time. Stored
      // tinyint codes widen to long INSIDE the fold (byte×byte would
      // overflow at ±127²)
      val qq = q.select(col("q_id"), transform(col("q_v"), x =>
        greatest(least(round(x / col("q_nrm") * 127).cast("long"),
          lit(127L)), lit(-127L))).as("__qq"))
      cQ.join(broadcast(probes), "cell")
        .join(qJoin(qq), "q_id")
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("__ps", aggregate(
          zip_with(col("__qq"), col("codes"), (p, v) => p * v.cast("long")),
          lit(0L), (acc, x) => acc + x))
    case "pq" =>
      // ADC in integer micro-units (the pqTopK discipline): below the
      // literal threshold the per-query LUT is a pure plan expression
      // over the codebook literals (m·ks·subDim = dim·ks doubles — the
      // same janino bound the centroid literals obey) and the
      // candidate cost is m table lookups; above it, the inline
      // explode-join-aggregate shape takes over (skinny code rows,
      // corpus scan still pruned and unshuffled)
      val subDim = meta.dim / meta.pqM
      val cb = readPqCodebook(spark, dir, meta.pqM, "quantPrerank")
      if (Semantic.useLiteralAssign(spark, (meta.pqM * meta.pqKs).toLong,
          subDim.toLong)) {
        val maxCid = cb.map(_._2).max
        val lutExpr = array((0 until meta.pqM).map { s =>
          val ent = cb.filter(_._1 == s).map(e => e._2 -> e._3).toMap
          array((0 to maxCid).map { cid =>
            ent.get(cid) match {
              case Some(cv) => round(pqSqd(
                  slice(col("q_v"), s * subDim + 1, subDim),
                  array(cv.map(lit): _*)) * 1e6).cast("long")
              case None => lit(0L) // dropped cid: codes never point here
            }
          }: _*)
        }: _*)
        val qq = q.select(col("q_id"), lutExpr.as("__lut"))
        cQ.join(broadcast(probes), "cell")
          .join(qJoin(qq), "q_id")
          .filter(col("q_id") =!= col("c_id"))
          .withColumn("__ps",
            -adcFold(col("__lut"), col("codes"), meta.pqM))
      } else {
        import spark.implicits._
        val cbDF = cb.toDF("s", "cid", "cv")
        val lut = q.select(col("q_id"),
            pqSubCol(col("q_v"), meta.pqM, subDim).as("e"))
          .select(col("q_id"), col("e.s").as("s"), col("e.subv").as("subv"))
          .join(broadcast(cbDF), "s")
          .select(col("q_id"), col("s"), col("cid"),
            round(pqSqd(col("subv"), col("cv")) * 1e6).cast("long")
              .as("ld"))
        cQ.select(col("c_id"), col("cell"), posexplode(col("codes")))
          .select(col("c_id"), col("cell"), col("pos").as("s"),
            col("col").cast("int").as("cid"))
          .join(broadcast(probes), "cell")
          .filter(col("q_id") =!= col("c_id"))
          .join(broadcast(lut), Seq("q_id", "s", "cid"))
          .groupBy("q_id", "c_id").agg((-sum("ld")).as("__ps"))
      }
    case "pqr" =>
      // RESIDUAL ADC (the Faiss IVFPQ serve): the LUT is per
      // (query, probed cell) — distances from the query's coarse
      // residual IN THAT CELL to the codebook entries, matching codes
      // that quantized candidates in their own cell's residual space.
      // Centroids join as broadcast DATA on the probe frame (a k-row
      // equi-join on the already-chosen cell — no plan-size term, no
      // threshold); the codebook enters as literals below the
      // threshold, as broadcast rows above it. LUT volume is
      // queries × nprobe × m×ks — nprobe× the pq LUT, the price of
      // residual fidelity.
      val subDim = meta.dim / meta.pqM
      val cb = readPqCodebook(spark, dir, meta.pqM, "quantPrerank")
      val cf = readCentroidFrame(spark, dir, meta.kCells, "quantPrerank")
        .select(col("cell"), asDouble(col("cv")).as("__cv"))
      val withRq = probes
        .join(qJoin(q.select(col("q_id"), col("q_v"))), "q_id")
        .join(broadcast(cf), "cell")
        .withColumn("__rq",
          zip_with(col("q_v"), col("__cv"), (x, y) => x - y))
      if (evalShape && Semantic.useLiteralAssign(spark,
          (meta.pqM * meta.pqKs).toLong, subDim.toLong)) {
        val maxCid = cb.map(_._2).max
        val lutExpr = array((0 until meta.pqM).map { s =>
          val ent = cb.filter(_._1 == s).map(e => e._2 -> e._3).toMap
          array((0 to maxCid).map { cid =>
            ent.get(cid) match {
              case Some(cv) => round(pqSqd(
                  slice(col("__rq"), s * subDim + 1, subDim),
                  array(cv.map(lit): _*)) * 1e6).cast("long")
              case None => lit(0L) // dropped cid: codes never point here
            }
          }: _*)
        }: _*)
        val pl = withRq.select(col("q_id"), col("cell"),
          lutExpr.as("__lut"))
        cQ.join(broadcast(pl), "cell")
          .filter(col("q_id") =!= col("c_id"))
          .withColumn("__ps",
            -adcFold(col("__lut"), col("codes"), meta.pqM))
      } else {
        import spark.implicits._
        val cbDF = cb.toDF("s", "cid", "cv")
        // lut rows exist only for (query, probed cell) pairs, so the
        // (cell, s, cid) join IS the probe routing — no separate
        // probes join on the candidate side
        val lut = withRq.select(col("q_id"), col("cell"),
            pqSubCol(col("__rq"), meta.pqM, subDim).as("e"))
          .select(col("q_id"), col("cell"), col("e.s").as("s"),
            col("e.subv").as("subv"))
          .join(broadcast(cbDF), "s")
          .select(col("q_id"), col("cell"), col("s"), col("cid"),
            round(pqSqd(col("subv"), col("cv")) * 1e6).cast("long")
              .as("ld"))
        val lutJ = if (evalShape) broadcast(lut) else lut
        cQ.select(col("c_id"), col("cell"), posexplode(col("codes")))
          .select(col("c_id"), col("cell"), col("pos").as("s"),
            col("col").cast("int").as("cid"))
          .join(lutJ, Seq("cell", "s", "cid"))
          .filter(col("q_id") =!= col("c_id"))
          .groupBy("q_id", "c_id").agg((-sum("ld")).as("__ps"))
      }
  }).select("q_id", "c_id", "__ps")

  /**
   * Assign arbitrary vectors against a PERSISTED index's trained
   * centroid sidecar — the composition point that lets the rest of the
   * engine speak the index's cell language: the drift monitor keys its
   * states by the index's cells ([[indexCellState]] vs a live feed
   * assigned here), and semantic decontamination screens a benchmark
   * against the indexed corpus cell-for-cell
   * ([[Decontamination.semanticOverlapsIndexed]]). Appends `cell` to
   * `df`; dim is validated per row against the meta sidecar. `idCol`
   * must be unique (join-path group-back key above the literal
   * threshold).
   */
  def assignWithIndex(df: DataFrame, dir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    val meta = readIvfMeta(spark, dir)
    val withVd = df.withColumn("__vd",
      dimChecked(asDouble(col(vecCol)), meta.dim, "assignWithIndex"))
    val cf = readCentroidFrame(spark, dir, meta.kCells, "assignWithIndex")
    val assigned =
      if (Semantic.useLiteralAssign(spark, meta.kCells.toLong, meta.dim.toLong)) {
        val cents = cf.collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1).toSeq
        withVd.withColumn("cell", Semantic.nearestCell(col("__vd"), cents))
      } else Semantic.assignCellsByJoin(withVd, cf, idCol, "__vd", "cell")
    assigned.drop("__vd")
  }

  /** Mergeable per-cell centroid state ([[Semantic.cellState]]) of the
    * index's OWN corpus, keyed by the index's cells — the reference
    * side of the "has the live feed drifted off the indexed snapshot?"
    * monitor ([[graft.streaming.StreamingCellDrift]] composes this with
    * a stream assigned via [[assignWithIndex]]). */
  def indexCellState(spark: SparkSession, dir: String): DataFrame = {
    recoverCorpus(spark, dir)
    Semantic.cellState(spark.read.parquet(s"$dir/corpus"),
      vecCol = "embedding", cellCol = "cell")
  }

  /**
   * Build a PERSISTED IVF index — the build-once half of the
   * build-once/query-many shape every production ANN deployment has
   * (Faiss `index_factory` + `write_index`): train `kCells` coarse
   * centroids with the deterministic Lloyd's discipline
   * ([[Semantic.kmeansCentroids]]: lowest-id init, sequential-fold
   * distances, 1e-6-quantized re-centers), tag every corpus vector with
   * its nearest cell in ONE scan (no join back on id), and write
   *
   *  - `dir/centroids` — the k×dim trained-centroid sidecar
   *    `(cell, cv)`, one tiny file;
   *  - `dir/meta`      — the index's self-description
   *    `(dim, k_cells, attr_cols)`: admissions and serves validate
   *    against it LOUDLY (a wrong-dim vector or a wrong-attrCols batch
   *    fails the job instead of silently corrupting the corpus);
   *  - `dir/corpus`    — `(vec_id, embedding)` PARTITIONED BY
   *    `(batch, cell)`: the build is `batch=0`, each [[extendIvfIndex]]
   *    admission gets its own batch partition (which is what makes
   *    admission retries idempotent — see there), and a query that
   *    probes `nprobe` cells reads exactly those cell directories
   *    across batches and nothing else (partition-pruned scan). Every
   *    write uses the sharded discipline (≤ `filesPerCell` files per
   *    cell directory, membership a pure function of the data), so
   *    per-cell file counts stay bounded and [[ivfIndexStats]] can
   *    report them deterministically.
   *
   * Vector ids must be UNIQUE — the index is keyed by them (above the
   * [[Semantic.LiteralAssignMaxKey]] threshold the assignment
   * group-back also relies on it).
   *
   * A rebuild overwrites the WHOLE corpus path (static overwrite):
   * retraining resets the index, prior admissions included — re-admit
   * from the source of record after a retrain.
   *
   * Why this exists: the inline `sim_topk_*` operators re-derive their
   * cell structure per run, which is wrong by the query count at
   * production — an index is trained once per corpus snapshot and then
   * serves thousands of [[indexedTopK]] calls. Training cost is one
   * Lloyd's chain over the TRAINING SET: `trainFraction < 1` trains on
   * a [[Sampling.deterministicSample]] of the corpus (the standard
   * 100-TB recipe — centroid quality converges long before the full
   * corpus is seen, Faiss's own train-on-sample guidance) while the
   * assignment pass still tags EVERY corpus vector; the partitioned
   * write is the one-time shuffle every later query amortizes.
   */
  /** @param attrCols extra payload columns stored WITH each vector —
    *   the metadata a filtered search ([[indexedTopK]]'s `where`)
    *   predicates on. Stored columnar in the cell partitions, so a
    *   predicate reaches the parquet scan as a pushed filter.
    * @param codec quantized storage for the serve path — "none" (raw
    *   float64 only), "sq8" (dim bytes/vector), or "pq" (pqM shorts/
    *   vector + codebook sidecar). The raw vectors are ALWAYS stored
    *   alongside the codes in the same cell-partitioned parquet:
    *   parquet's columnar layout IS the raw-vector sidecar — the
    *   quantized serve's ADC/pre-rank scan reads only
    *   `(vec_id, cell, nrm, codes)` (8× less probed-cell I/O under sq8,
    *   ~30× under pq at dim 64 — the gap widens with dim), and the raw
    *   column's pages are touched only by the exact re-rank's
    *   survivor-id-pushed scan. Keeping ONE corpus (not a second
    *   dataset) means delete/compact/extend/drift/decon carry codes and
    *   raw together with zero extra crash-consistency machinery.
    * @param pqM,pqKs,pqIters codec="pq" knobs: subspace count (must
    *   divide dim), codebook entries per subspace (≤ 32767 — codes
    *   store as smallint), Lloyd's iterations. */
  def buildIvfIndex(corpus: DataFrame, dir: String, kCells: Int,
      iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding", attrCols: Seq[String] = Nil,
      filesPerCell: Int = 1, trainFraction: Double = 1.0,
      codec: String = "none", pqM: Int = 8, pqKs: Int = 16,
      pqIters: Int = 2, radii: Boolean = true): Unit = {
    require(kCells > 0 && iters >= 0 && filesPerCell > 0,
      s"need kCells > 0, iters >= 0, filesPerCell > 0; " +
        s"got $kCells, $iters, $filesPerCell")
    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    require(IvfCodecs.contains(codec),
      s"unknown codec '$codec' — one of ${IvfCodecs.mkString("/")}")
    require(!codec.startsWith("pq") ||
        (pqM > 0 && pqKs > 0 && pqKs <= 32767 && pqIters >= 0),
      s"need pqM > 0, 0 < pqKs <= 32767, pqIters >= 0; " +
        s"got $pqM, $pqKs, $pqIters")
    require(!attrCols.exists(Seq("nrm", "codes").contains),
      "attrCols must not shadow the codec storage columns nrm/codes")
    val spark = corpus.sparkSession
    import spark.implicits._
    // a REBUILD must leave no promotable stale staging behind:
    // recoverCorpus's invariant (live missing + staging present ⇒
    // staging is a COMPLETE compacted corpus) holds only for
    // compaction's own crash points. If an earlier interrupted
    // compaction parked a (possibly partial) corpus.compacting here and
    // THIS rebuild crashes after its overwrite dropped the live dir,
    // the next reader would auto-promote that stale staging under the
    // NEW sidecars — silently served, cells mismatched. Drop both
    // aside dirs up front so no rebuild crash state is promotable; the
    // admission high-water mark resets with the retrain.
    locally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/corpus.compacting"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/corpus.old"), true)
      // same argument for the radii fold's aside dirs (the live radii
      // dir itself is rewritten below)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/radii.next"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/radii.old"), true)
    }
    clearAdmitHwm(spark, dir)
    // deterministic training sample (replayable — no RNG state): the
    // Lloyd's chain sees the sample, the assignment pass sees everyone
    val trainSet =
      if (trainFraction >= 1.0) corpus
      else Sampling.deterministicSample(corpus, idCol, trainFraction,
        "ivftrain")
    val cents = Semantic.kmeansCentroids(trainSet, kCells, iters, idCol, vecCol)
    // dim comes off the k-means init collect (the centroids) — one
    // fewer driver action than the dedicated limit(1) scan; the scan
    // fallback only runs when the training sample came up empty
    val dim =
      if (cents.nonEmpty) cents.head._2.length
      else {
        val dimRow = corpus.select(size(col(vecCol))).limit(1).collect()
        require(dimRow.nonEmpty, "buildIvfIndex on an empty corpus")
        dimRow(0).getInt(0)
      }
    require(dim > 0, s"buildIvfIndex: zero-length embedding in $vecCol")
    require(!codec.startsWith("pq") || dim % pqM == 0,
      s"dim $dim not divisible by pqM = $pqM")
    def centFrame = cents.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cell", "cv")
    centFrame
      .repartition(1) // k×dim rows — one sidecar file, read whole
      .write.mode("overwrite").parquet(s"$dir/centroids")
    writeIvfMeta(spark, dir, IvfMeta(dim, cents.size, attrCols, codec,
      if (codec.startsWith("pq")) pqM else 0,
      if (codec.startsWith("pq")) pqKs else 0))
    if (!codec.startsWith("pq")) { // no stale codebook survives a re-codec build
      val cbp = new org.apache.hadoop.fs.Path(s"$dir/codebook")
      cbp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(cbp, true)
    }
    // spread before the per-row assign/encode chain: the cell
    // assignment, codec encode, radii aggregate, and the corpus write's
    // map side all hang off this frame, and a single-row-group corpus
    // otherwise runs them on ONE task (no-op at scale)
    val tagged = Dedup.spread(
      corpus.select(col(idCol).as("vec_id") +:
        dimChecked(col(vecCol), dim, "buildIvfIndex").as("embedding") +:
        attrCols.map(col): _*), col("vec_id"))
      .withColumn("__vd", asDouble(col("embedding")))
    val assigned = Semantic
      .assignCells(tagged, cents, "vec_id", "__vd", "cell")
    val encoded = encodeForCodec(spark, dir, assigned, codec, dim,
      pqM, pqKs, pqIters, train = true, trainFraction = trainFraction,
      centFrame = () => centFrame).drop("__vd")
    // radii BEFORE corpus (see writeRadii's ordering note). radii=false
    // skips the maintenance pass (~a third of the build cost) for
    // deployments that never exact-serve — the sidecar is DELETED so
    // the serve's coverage check refuses loudly instead of reading a
    // stale one; backfillIvfRadii re-derives it later in one pass.
    if (radii)
      writeRadii(spark, dir, assigned, centFrame, batch = 0L,
        dynamic = false)
    else {
      val rp = new org.apache.hadoop.fs.Path(s"$dir/radii")
      rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(rp, true)
    }
    shardForWrite(encoded.withColumn("batch", lit(0L)), cents.size,
        filesPerCell)
      .write.mode("overwrite").partitionBy("batch", "cell")
      .parquet(s"$dir/corpus")
  }

  /**
   * Incremental index ADMISSION — the append half of the persisted-index
   * lifecycle: assign a NEW batch of vectors against the index's
   * already-trained centroid sidecar (a pure literal-centroid scan, the
   * [[Semantic.assignTo]] shape) and land them under their OWN
   * `batch=<id>` partition. No retraining, no rewrite of existing
   * batches, batch cost linear in the batch — the production admission
   * path between periodic re-trains (centroid drift is re-measured at
   * re-train time, the standard IVF operations trade). [[indexedTopK]]
   * serves the union immediately.
   *
   * EXACTLY-ONCE BY LAYOUT: the write is a DYNAMIC partition overwrite
   * scoped to `batch=<id>`, so re-running the same admission (a crashed
   * job retried, a replayed streaming micro-batch —
   * [[graft.streaming.StreamingIvfAdmit]]) REPLACES its own partitions
   * instead of appending duplicates. `batchId = None` takes the next id
   * above the admission high-water mark (one driver-side read, no data
   * scan); idempotent retries must pass the id explicitly AND
   * `allowReplay = true`.
   *
   * NON-MONOTONIC ADMISSION GUARD: an explicit id at or below the
   * high-water mark ([[readAdmitHwm]]) is REFUSED unless
   * `allowReplay = true`. A legitimate retry and a NEW stream restarted
   * from a fresh checkpoint look identical from here (both re-present
   * batch id 1..N); without the guard the latter silently OVERWRITES
   * earlier admissions — the exactly-once layout turned into a data-
   * loss channel. [[graft.streaming.StreamingIvfAdmit]] passes
   * `allowReplay = true` because Structured Streaming's checkpoint IS
   * the proof its re-presented ids are replays of the same epochs; a
   * bare caller re-using an id must assert the same knowingly.
   */
  def extendIvfIndex(newVectors: DataFrame, dir: String,
      batchId: Option[Long] = None, idCol: String = "vec_id",
      vecCol: String = "embedding", attrCols: Seq[String] = Nil,
      filesPerCell: Int = 1, allowReplay: Boolean = false,
      radii: Boolean = true): Unit = {
    require(filesPerCell > 0, s"filesPerCell must be positive, got $filesPerCell")
    val spark = newVectors.sparkSession
    recoverCorpus(spark, dir)
    val meta = readIvfMeta(spark, dir)
    // LOUD schema validation against the build: a batch with different
    // payload columns would land per-batch parquet schema drift in the
    // corpus; a wrong-dim vector is caught per row by dimChecked below
    require(meta.attrCols == attrCols,
      s"extendIvfIndex: attrCols $attrCols do not match the index's " +
        s"${meta.attrCols} — admit with the build's attrCols or rebuild")
    val corpusPath = new org.apache.hadoop.fs.Path(s"$dir/corpus")
    val hwm = readAdmitHwm(spark, dir)
    val id = batchId.getOrElse {
      val fs = corpusPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      require(fs.exists(corpusPath),
        s"extendIvfIndex: no corpus at $dir — buildIvfIndex first")
      val existing = fs.listStatus(corpusPath).map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
      require(existing.nonEmpty,
        s"extendIvfIndex: no batch partitions under $corpusPath — " +
          "not a buildIvfIndex layout")
      // max over BOTH the listing and the mark: a fully-retracted
      // newest batch leaves no directory, but its id stays burned
      math.max(existing.max, hwm) + 1L
    }
    require(id > 0, s"batch ids above 0 are admissions; 0 is the build ($id)")
    require(allowReplay || id > hwm,
      s"extendIvfIndex: batch id $id is not above the admission " +
        s"high-water mark $hwm. An id at or below the mark is either a " +
        "legitimate retry/streaming replay (pass allowReplay = true) or " +
        "a NEW stream restarted from a FRESH checkpoint about to " +
        "silently overwrite earlier admissions — refusing. Resume the " +
        "original checkpoint, or rebuild the index.")
    val base = newVectors.select(col(idCol).as("vec_id") +:
        dimChecked(col(vecCol), meta.dim, "extendIvfIndex").as("embedding") +:
        attrCols.map(col): _*)
      .withColumn("__vd", asDouble(col("embedding")))
    // assignment strategy by the kCells×dim threshold: literal scan
    // (collect the sidecar) below, broadcast join (no collect) above
    val cf = readCentroidFrame(spark, dir, meta.kCells, "extendIvfIndex")
    val assigned = if (Semantic.useLiteralAssign(spark,
        meta.kCells.toLong, meta.dim.toLong)) {
      val cents = cf.collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1).toSeq
      base.withColumn("cell", Semantic.nearestCell(col("__vd"), cents))
    } else Semantic.assignCellsByJoin(base, cf, "vec_id", "__vd", "cell")
    // a quantized index encodes the batch under the PERSISTED codebook
    // (admission never retrains — codes stay comparable across batches)
    val encoded = encodeForCodec(spark, dir, assigned, meta.codec,
      meta.dim, meta.pqM, meta.pqKs, 0, train = false,
      trainFraction = 1.0, centFrame = () => cf).drop("__vd")
    // radii for THIS batch, BEFORE the corpus write (writeRadii's
    // ordering note) and under the same dynamic-overwrite idempotency.
    // A legacy index (no radii sidecar) stays radii-less — writing one
    // batch's rows would break the superset invariant the exact serve
    // reads nonempty cells from; backfillIvfRadii upgrades it whole.
    // radii=false skips the batch's radii rows: the sidecar then no
    // longer covers this batch and the exact serve's coverage check
    // refuses loudly until backfillIvfRadii — never a silent gap
    if (radii) locally {
      recoverRadii(spark, dir)
      val rp = new org.apache.hadoop.fs.Path(s"$dir/radii")
      if (rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(rp))
        writeRadii(spark, dir, assigned, cf, batch = id, dynamic = true)
    }
    shardForWrite(encoded.withColumn("batch", lit(id)), meta.kCells,
        filesPerCell)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "cell").parquet(s"$dir/corpus")
    // publish the mark AFTER the data landed: a crash in between leaves
    // the mark low, which only ever widens what a replay may rewrite —
    // never narrows it (the safe direction)
    if (id > hwm) writeAdmitHwm(spark, dir, id)
  }

  /**
   * Targeted DELETION from a persisted index — the retraction half of
   * the lifecycle (takedown requests, right-to-be-forgotten, bad-batch
   * rollback): rewrite ONLY the `(batch, cell)` partitions that contain
   * the ids, leaving every other partition's files physically untouched
   * (spec-pinned). No tombstones, no merge-on-read tax for the serve
   * path — the index stays a plain partition-pruned parquet layout.
   *
   * Shape: the retraction set broadcasts into one corpus join to find
   * its partitions (driver state bounded by the retraction batch, never
   * the corpus); survivors of exactly those partitions rewrite via
   * batch-scoped DYNAMIC partition overwrite. Dynamic overwrite writes
   * nothing for a partition with zero survivors, so fully-emptied
   * partitions get an explicit directory drop afterwards — without it
   * the old files would silently survive, which is the classic
   * dynamic-overwrite deletion pitfall.
   *
   * Idempotent and crash-tolerant: re-running the same deletion finds
   * the victims already gone (returns 0); a crash mid-rewrite leaves
   * some partitions done and some not, and the re-run finishes exactly
   * the remainder. Same single-writer contract as admission.
   *
   * @return the number of index rows deleted.
   */
  def deleteFromIvfIndex(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String = "vec_id"): Long = {
    recoverCorpus(spark, dir)
    readIvfMeta(spark, dir) // loud not-an-index refusal; dim is irrelevant
    val del = ids.select(col(idCol).as("vec_id")).distinct()
    val corpus = spark.read.parquet(s"$dir/corpus")
    val touched = corpus.join(broadcast(del), "vec_id")
      .groupBy(col("batch").cast("long").as("batch"), col("cell"))
      .agg(count(lit(1)).as("n_del")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    if (touched.isEmpty) return 0L
    val nDeleted = touched.values.sum
    // ONE survivor pass PER TOUCHED BATCH, pruned to THAT batch's own
    // cell list: rounds 12's single pass filtered on
    // `batch IN (touched batches) AND cell IN (touched cells)` — the
    // CROSS PRODUCT — so a retraction spread over B batches × C distinct
    // cells read up to B·C partitions while rewriting only the touched
    // pairs. Per-batch passes read exactly the touched pairs (each
    // pass's plan stays O(|that batch's cells|) InSet literals — never
    // an OR-chain over pairs, which would be the literal-centroid
    // plan-blowup class), at the cost of one write job per touched
    // batch — bounded by the retraction, not the corpus.
    // DeleteScanPruningSpec pins files-read == touched pairs.
    val fs = new org.apache.hadoop.fs.Path(s"$dir/corpus")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byBatch = touched.keys.toSeq.groupBy(_._1)
      .map { case (b, ps) => b -> ps.map(_._2).distinct.sorted }
    for ((b, cellsOfB) <- byBatch.toSeq.sortBy(_._1)) {
      val keep = corpus
        .filter(col("batch").cast("long") === b &&
          col("cell").isin(cellsOfB.map(Int.box): _*))
        .join(broadcast(del), Seq("vec_id"), "left_anti")
      // dynamic overwrite writes NOTHING for a fully-emptied partition,
      // so those get an explicit directory drop (the classic
      // dynamic-overwrite deletion pitfall); survivors are counted on
      // the same pruned scan the write reads
      val survivors = keep
        .groupBy(col("cell")).agg(count(lit(1))).collect()
        .map(_.getInt(0)).toSet
      keep.repartition(math.max(1, cellsOfB.size), col("cell"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "cell").parquet(s"$dir/corpus")
      for (c <- cellsOfB if !survivors.contains(c)) {
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$dir/corpus/batch=$b/cell=$c"), true)
      }
    }
    nDeleted
  }

  /**
   * Index COMPACTION — the maintenance half of streaming admission:
   * thousands of micro-batch admissions each add `batch=<id>/cell=*`
   * files, and the small-files tax grows with every one (a probe query
   * opens every admitted file of its probed cells). Compaction folds
   * all batches back into a single `batch=0` with `filesPerCell`
   * output files per cell — one read + one cell-partitioned write,
   * after which admission ids restart above 0.
   *
   * CRASH-SAFE by staging + rename-aside swap: the compacted corpus is
   * written to a `corpus.compacting` sibling first; only after that
   * write completes does the three-step swap run — rename live to
   * `corpus.old`, rename staging into place, delete `corpus.old`. A
   * complete corpus exists on disk at EVERY crash point, and every
   * crash state is auto-recovered by the next reader or writer
   * ([[recoverCorpus]]): mid-write ⇒ live untouched (stale staging is
   * overwritten by the next attempt); between the renames ⇒ staging is
   * complete and gets promoted; before the final delete ⇒ the stale
   * `corpus.old` is dropped. Run it when [[ivfIndexStats]]'s `n_files`
   * says so, from the ONE owner of the index (pause admission for the
   * swap window — same single-writer contract the admission stream
   * already has).
   */
  def compactIvfIndex(spark: SparkSession, dir: String,
      filesPerCell: Int = 1): Unit = {
    require(filesPerCell > 0, s"filesPerCell must be positive, got $filesPerCell")
    recoverCorpus(spark, dir) // finish any interrupted predecessor swap
    val meta = readIvfMeta(spark, dir)
    // fold the radii sidecar to batch 0 BEFORE the corpus swap: the
    // fold is invariant (membership does not change — max over rows is
    // identical before and after), so any crash point leaves valid
    // bounds; doing it first means a post-compaction admission reusing
    // batch id 1 can never dynamic-overwrite radii rows that still
    // cover live vectors folded into corpus batch 0. Same rename-aside
    // swap as the corpus ([[recoverRadii]] finishes any crash state).
    locally {
      recoverRadii(spark, dir)
      val rLive = new org.apache.hadoop.fs.Path(s"$dir/radii")
      val rfs = rLive.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (rfs.exists(rLive)) {
        val rNext = new org.apache.hadoop.fs.Path(s"$dir/radii.next")
        val rOld = new org.apache.hadoop.fs.Path(s"$dir/radii.old")
        spark.read.parquet(rLive.toString)
          .groupBy("cell").agg(
            max(when(col("radius").isNull, 1).otherwise(0)).as("__hn"),
            max(col("radius")).as("__mx"))
          .select(col("cell"),
            when(col("__hn") === 0, col("__mx")).as("radius"))
          .withColumn("batch", lit(0L)).repartition(1)
          .write.mode("overwrite").partitionBy("batch")
          .parquet(rNext.toString)
        require(rfs.rename(rLive, rOld),
          s"radii fold swap failed: could not rename $rLive aside to $rOld")
        require(rfs.rename(rNext, rLive),
          s"radii fold swap failed: could not promote $rNext to $rLive")
        rfs.delete(rOld, true)
      }
    }
    val staging = new org.apache.hadoop.fs.Path(s"$dir/corpus.compacting")
    val live = new org.apache.hadoop.fs.Path(s"$dir/corpus")
    val old = new org.apache.hadoop.fs.Path(s"$dir/corpus.old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    shardForWrite(
        spark.read.parquet(live.toString).withColumn("batch", lit(0L)),
        meta.kCells, filesPerCell)
      .write.mode("overwrite").partitionBy("batch", "cell")
      .parquet(staging.toString)
    // the swap: a complete corpus exists at every step — live moves
    // ASIDE (never deleted first), staging promotes, the aside drops
    require(fs.rename(live, old),
      s"compaction swap failed: could not rename $live aside to $old")
    require(fs.rename(staging, live),
      s"compaction swap failed: could not promote $staging to $live " +
        s"($old holds the pre-compaction corpus; recoverCorpus will " +
        "promote the staging dir on the next index call)")
    fs.delete(old, true)
    // everything folded into batch=0 ⇒ admission ids restart above 0.
    // The compaction pause window (the documented single-writer
    // contract) is what makes this reset safe: no in-flight admission
    // can race it.
    clearAdmitHwm(spark, dir)
  }

  /**
   * Index health report — the operational "retrain yet?" signal the
   * build/extend/serve lifecycle reads (Faiss's imbalance_factor): per
   * cell, the vector count and its balance factor (count ÷ ideal equal
   * share). Admission ([[extendIvfIndex]]) never moves old vectors, so
   * cells drift as the data distribution does; a hot cell (balance ≫ 1)
   * makes every query probing it pay that cell's full scan — the signal
   * to re-run [[buildIvfIndex]]. Output one row per TRAINED cell
   * (empty cells included at zero — invisible-cell starvation is a
   * report finding, not a missing row).
   *
   * `n_files` is the COMPACTION trigger: every [[extendIvfIndex]]
   * admission adds up to `filesPerCell` files to each cell it touches,
   * and a probe query opens every file of its probed cells — when
   * per-cell file counts creep past the read-amplification budget, run
   * [[compactIvfIndex]] (which returns them to ≤ `filesPerCell`).
   * Counted from the scan's own `_metadata.file_path` — no second
   * listing, and only files actually serving rows count.
   *
   * Scale shape: one cell-keyed count over the corpus (map-side
   * partial) + a broadcast join against the k-row sidecar; the balance
   * window runs over k rows, never the corpus.
   */
  def ivfIndexStats(spark: SparkSession, dir: String): DataFrame = {
    recoverCorpus(spark, dir)
    val cents = spark.read.parquet(s"$dir/centroids").select(col("cell"))
    val counts = spark.read.parquet(s"$dir/corpus")
      .select(col("cell"), col("_metadata.file_path").as("__f"))
      .groupBy("cell").agg(count(lit(1)).as("n_vectors"),
        countDistinct(col("__f")).as("n_files"))
    val all = Window.partitionBy()
    cents.join(counts, Seq("cell"), "left_outer")
      .select(col("cell"),
        coalesce(col("n_vectors"), lit(0L)).as("n_vectors"),
        coalesce(col("n_files"), lit(0L)).as("n_files"))
      .withColumn("balance",
        round(col("n_vectors").cast("double") *
          count(lit(1)).over(all).cast("double") /
          sum(col("n_vectors")).over(all).cast("double"), 6))
  }

  /**
   * Serve top-k from a [[buildIvfIndex]] directory WITHOUT retraining —
   * the query-many half. Per query: rank the sidecar centroids by
   * squared distance (rounded to 1e-6, cell tie-break — the
   * [[ivfTopKMultiProbe]] probe rule), read ONLY the probed cells'
   * partitions from `dir/corpus`, and exact-cosine-rank the candidates.
   *
   * The query plan contains no aggregate at all: centroids arrive as
   * plan literals from the tiny sidecar (k×dim doubles), the probed
   * cell set becomes a LITERAL partition filter on the corpus scan
   * (bounded by `kCells` values, usually `queries × nprobe`), and both
   * the probe frame and the query vectors broadcast into the candidate
   * join — the corpus is never shuffled, only scanned where the index
   * says to look. IvfIndexSpec pins all three properties (no
   * HashAggregate, pruned `PartitionFilters`, broadcast-only joins).
   * Above the [[Semantic.LiteralAssignMaxKey]] threshold the probe
   * ranking switches from sidecar literals to a broadcast join + window
   * over the QUERY side (queries × kCells skinny rows — the corpus scan
   * stays pruned and shuffle-free either way); AssignStrategySpec pins
   * identical results on both shapes. Above [[ServeBroadcastMaxQueries]]
   * query ROWS the query-vector join likewise switches from broadcast
   * to a shuffle hash join on `q_id` (the probe frame stays broadcast
   * in both regimes — skinny); ServeRegimeSpec pins parity.
   *
   * Exactness: with `nprobe >= kCells` this EQUALS brute force on the
   * positive-norm corpus (CrossCheckSpec) — pruning is the only
   * approximation. Zero-norm vectors are dropped on both sides (no
   * direction ⇒ NaN cosine), as everywhere in this family.
   *
   * `where` is PRE-FILTER metadata search (the filtered-ANN shape every
   * vector store exposes): the predicate — over [[buildIvfIndex]]
   * `attrCols` payload columns — applies BEFORE scoring, so all k
   * results satisfy it (post-filtering a top-k would silently return
   * fewer than k). Simple predicates reach the parquet scan as pushed
   * filters; within the probed cells the filtered search stays exact.
   */
  /** @param candMult quantized-index pre-rank width: under
    *   `codec="sq8"/"pq"` the ADC/integer pre-rank keeps `candMult·k`
    *   survivors per query for the exact re-rank (the recall knob of
    *   the inline [[sq8TopK]]/[[pqTopK]], applied to the persisted
    *   serve). Ignored by a raw (`codec="none"`) index. */
  def indexedTopK(spark: SparkSession, queries: DataFrame, dir: String,
      k: Int, nprobe: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding", where: Option[Column] = None,
      candMult: Int = 4): DataFrame = {
    require(nprobe > 0, s"nprobe must be positive, got $nprobe")
    require(candMult > 0, s"candMult must be positive, got $candMult")
    recoverCorpus(spark, dir)
    val meta = readIvfMeta(spark, dir)
    val q = queries.select(col(idCol).as("q_id"),
        dimChecked(asDouble(col(vecCol)), meta.dim, "indexedTopK").as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
      .filter(col("q_nrm") > 0)
    val probes = probeFrame(spark, dir, meta, q, nprobe, "indexedTopK")
    // the probed cell set as LITERALS: ≤ kCells ints collected once, so
    // the corpus scan partition-prunes to exactly the probed directories
    val probedCells = probes.select("cell").distinct().collect()
      .map(_.getInt(0)).sorted
    val corpus0 = spark.read.parquet(s"$dir/corpus")
      .filter(col("cell").isin(probedCells.map(Int.box): _*))
    val corpusF = where.fold(corpus0)(corpus0.filter)
    // query-join regime by query count: broadcast(q) below the
    // threshold (the eval-serve shape — corpus never shuffled), shuffle
    // hash join on q_id above it (a huge query batch must not blow the
    // broadcast; the candidates shuffle on q_id anyway for the ranking
    // window, so the regime costs no extra corpus exchange). The count
    // is column-pruned over the RAW query frame — one tiny job, same
    // class as the probed-cells collect
    val maxQ = spark.conf.getOption(ServeBroadcastMaxQueries)
      .map(_.toLong).getOrElse(1L << 16)
    val evalShape = queries.count() <= maxQ
    def qJoin(df: DataFrame): DataFrame =
      if (evalShape) broadcast(df) else df.hint("shuffle_hash")
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))

    if (meta.codec == "none") {
      val c = corpusF
        .select(col("vec_id").as("c_id"), col("cell"),
          asDouble(col("embedding")).as("c_v"))
        .withColumn("c_nrm", norm(col("c_v")))
        .filter(col("c_nrm") > 0)
      val scored = c.join(broadcast(probes), "cell")
        .join(qJoin(q), "q_id")
        .filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"),
          round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
            .as("cos_sim"))
      return scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }

    // ---- quantized serve (codec = "sq8" / "pq") -------------------------
    // Pre-rank over the CODES column of the probed cells, exact-cosine
    // re-rank of the candMult·k survivors from the raw column. Parquet's
    // columnar layout is the raw-vector "sidecar": the pre-rank scan's
    // ReadSchema is (vec_id, nrm, codes) — never the raw vectors
    // (IvfIndexSpec pins it) — which is the 8× (sq8) to ~dim/m·8× (pq)
    // probed-cell I/O cut the codec exists for; the raw column is read
    // back only for the survivors.
    val cQ = corpusF
      .select(col("vec_id").as("c_id"), col("cell"),
        col("nrm").as("c_nrm"), col("codes"))
      .filter(col("c_nrm") > 0 && col("codes").isNotNull)
    val pre = quantPrerank(spark, dir, meta, q, probes, cQ, qJoin,
      evalShape)
    val cw = Window.partitionBy("q_id").orderBy(col("__ps").desc, col("c_id"))
    val cand = pre.withColumn("__crk", row_number().over(cw))
      .filter(col("__crk") <= candMult * k)
      .select("q_id", "c_id")

    def rawOf(filter0: Column): DataFrame =
      spark.read.parquet(s"$dir/corpus").filter(filter0)
        .select(col("vec_id").as("c_id"),
          asDouble(col("embedding")).as("c_v"), col("nrm").as("c_nrm"))
    val probedPred = col("cell").isin(probedCells.map(Int.box): _*)
    val scored = if (evalShape) {
      // the Faiss `refine` shape: survivor pairs are eval-bounded
      // (queries × candMult·k), so collect them and push the id set
      // INTO the raw scan — the raw column is read at row-group/page
      // granularity for the survivors only, never for whole probed
      // cells. (Above the query threshold this would not be
      // driver-bounded: the re-rank falls back to a lazy join against
      // the probed cells' raw pages — still pruned to probed cells.)
      val surv = cand.collect()
      if (surv.isEmpty)
        return q.filter(lit(false))
          .select(col("q_id"), col("q_id").as("c_id"),
            lit(0.0).as("cos_sim"), lit(1).as("rank"))
      val pairs = spark.createDataFrame(
        java.util.Arrays.asList(surv: _*), cand.schema)
      val survIds = surv.map(_.get(1)).distinct.toSeq
      broadcast(pairs)
        .join(broadcast(q), "q_id")
        .join(broadcast(rawOf(probedPred &&
          col("vec_id").isin(survIds: _*))), "c_id")
        .select(col("q_id"), col("c_id"),
          round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
            .as("cos_sim"))
    } else {
      cand.join(qJoin(q), "q_id")
        .join(rawOf(probedPred), "c_id")
        .select(col("q_id"), col("c_id"),
          round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
            .as("cos_sim"))
    }
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * nprobe tuning curve over a [[buildIvfIndex]] directory — the table
   * read before choosing the index's recall/cost knob (the
   * `dedup_lsh_tuning` discipline, applied to the serve path): for each
   * `nprobe` in 1..`maxProbe`, the micro-averaged recall of
   * nprobe-probed top-k against the FULL-PROBE ranking (the index's own
   * exact answer — pruning is its only approximation, so full probe is
   * the correct reference).
   *
   * ONE scoring pass: every (query, candidate) pair is scored once with
   * the candidate cell's probe rank attached; each curve point is then
   * a filter (`prk <= n`) + rank + overlap count over that cached frame
   * — maxProbe windows over an already-bounded candidate set, not
   * maxProbe corpus scans. Output one row per nprobe:
   * `(nprobe, n_exact, hits, recall)`.
   */
  def nprobeRecallCurve(spark: SparkSession, queries: DataFrame,
      dir: String, k: Int, maxProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && maxProbe > 0,
      s"need positive k/maxProbe, got $k/$maxProbe")
    recoverCorpus(spark, dir)
    val meta = readIvfMeta(spark, dir)
    val q = queries.select(col(idCol).as("q_id"),
        dimChecked(asDouble(col(vecCol)), meta.dim,
          "nprobeRecallCurve").as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
      .filter(col("q_nrm") > 0)
    def sqd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    // probe rank of EVERY cell per query (not just the top-nprobe) —
    // sidecar literals below the threshold, broadcast join above
    val cf = readCentroidFrame(spark, dir, meta.kCells, "nprobeRecallCurve")
    val probeRanks = if (Semantic.useLiteralAssign(spark,
        meta.kCells.toLong, meta.dim.toLong)) {
      val cents = cf.collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      val rankStructs = array(cents.map { case (cell, cv) =>
        struct(round(sqd(col("q_v"), array(cv.map(lit): _*)), 6).as("cd"),
          lit(cell).as("cell"))
      }: _*)
      q.select(col("q_id"), posexplode(array_sort(rankStructs)))
        .select(col("q_id"), (col("pos") + 1).as("prk"),
          col("col.cell").as("cell"))
    } else probeRanksByJoin(q, cf)
    val c = spark.read.parquet(s"$dir/corpus")
      .select(col("vec_id").as("c_id"), col("cell"),
        asDouble(col("embedding")).as("c_v"))
      .withColumn("c_nrm", norm(col("c_v")))
      .filter(col("c_nrm") > 0)
    val scored = c.join(broadcast(probeRanks), "cell")
      .join(broadcast(q), "q_id")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("prk"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
    // CHECKPOINTED, not merely cached: every curve point re-references
    // this frame, and a cached-but-lineaged plan re-embeds the whole
    // probe/score subtree per branch — the maxProbe-way union's plan
    // carried ~90 Exchange nodes (r15 measurement), each an AQE-
    // scheduled stage. The cut collapses every branch to a leaf read.
    val cached = Lineage.cut(scored)
    def topk(n: Int): DataFrame = {
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("c_id"))
      cached.filter(col("prk") <= n)
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("q_id"), col("c_id"))
    }
    // the reference ranking is itself re-referenced by every curve
    // point — same cut argument
    val full = Lineage.cut(topk(meta.kCells))
    // the reference count stays IN the frame (1-row aggregate
    // cross-joined) — no driver-side count embedding a literal
    val nEx = full.agg(count(lit(1)).as("n_exact"))
    (1 to maxProbe).map { n =>
      topk(n).join(full, Seq("q_id", "c_id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(nEx)
        .select(lit(n).as("nprobe"), col("n_exact"), col("hits"),
          round(col("hits").cast("double") / col("n_exact").cast("double"),
            6).as("recall"))
    }.reduce(_.unionAll(_))
  }

  /**
   * candMult tuning curve over a QUANTIZED index — the codec twin of
   * [[nprobeRecallCurve]]: for each candMult in 1..`maxMult`, the
   * micro-averaged recall of the ADC/integer-preranked,
   * candMult·k-truncated top-k against the PASS-ALL ranking (pre-rank
   * kept wide enough to pass every probed candidate — the quantized
   * serve's own exact answer within the probed cells; pre-rank
   * truncation is the codec's only approximation, so pass-all is the
   * correct reference). Read this table before choosing the serve's
   * `candMult` knob — with [[nprobeRecallCurve]] it spans the index's
   * two recall/cost axes.
   *
   * ONE scoring pass: each (query, candidate) pair within the probed
   * cells is scored once with BOTH its pre-rank position (`crk`) and
   * the exact cosine attached; each curve point is a filter
   * (`crk <= candMult·k`) + rank + overlap count over the cached
   * frame. Raw vectors of the probed cells are read once — this is
   * the offline eval harness, not the serve path. Output one row per
   * candMult: `(cand_mult, n_exact, hits, recall)`.
   */
  def candMultRecallCurve(spark: SparkSession, queries: DataFrame,
      dir: String, k: Int, maxMult: Int, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && maxMult > 0 && nprobe > 0,
      s"need positive k/maxMult/nprobe, got $k/$maxMult/$nprobe")
    recoverCorpus(spark, dir)
    val meta = readIvfMeta(spark, dir)
    require(meta.codec != "none",
      "candMultRecallCurve tunes a QUANTIZED index's pre-rank width — " +
        "a raw (codec=none) index has no pre-rank to tune")
    val q = queries.select(col(idCol).as("q_id"),
        dimChecked(asDouble(col(vecCol)), meta.dim,
          "candMultRecallCurve").as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
      .filter(col("q_nrm") > 0)
    val probes = probeFrame(spark, dir, meta, q, nprobe,
      "candMultRecallCurve")
    val probedCells = probes.select("cell").distinct().collect()
      .map(_.getInt(0)).sorted
    val corpusP = spark.read.parquet(s"$dir/corpus")
      .filter(col("cell").isin(probedCells.map(Int.box): _*))
    val cQ = corpusP.select(col("vec_id").as("c_id"), col("cell"),
        col("nrm").as("c_nrm"), col("codes"))
      .filter(col("c_nrm") > 0 && col("codes").isNotNull)
    val pre = quantPrerank(spark, dir, meta, q, probes, cQ, broadcast)
    val cw = Window.partitionBy("q_id").orderBy(col("__ps").desc, col("c_id"))
    val raw = corpusP.select(col("vec_id").as("c_id"),
        asDouble(col("embedding")).as("c_v"), col("nrm").as("c_nrm"))
      .filter(col("c_nrm") > 0)
    val scored = pre.withColumn("crk", row_number().over(cw))
      .join(broadcast(q), "q_id")
      .join(raw, "c_id")
      .select(col("q_id"), col("c_id"), col("crk"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
    // checkpointed, not merely cached — the nprobeRecallCurve argument:
    // the maxMult-way union re-embedded this subtree per branch (~129
    // Exchange nodes in the r15 before-plan); the cut collapses every
    // branch to a leaf read
    val cached = Lineage.cut(scored)
    def topk(mult: Option[Int]): DataFrame = {
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("c_id"))
      mult.fold(cached)(mm => cached.filter(col("crk") <= mm * k))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("q_id"), col("c_id"))
    }
    val full = Lineage.cut(topk(None))
    // the reference count stays IN the frame (1-row aggregate
    // cross-joined) — no driver-side count embedding a literal
    val nEx = full.agg(count(lit(1)).as("n_exact"))
    (1 to maxMult).map { mm =>
      topk(Some(mm)).join(full, Seq("q_id", "c_id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(nEx)
        .select(lit(mm).as("cand_mult"), col("n_exact"), col("hits"),
          round(col("hits").cast("double") / col("n_exact").cast("double"),
            6).as("recall"))
    }.reduce(_.unionAll(_))
  }

  /**
   * ANN recall report — the evaluation harness every approximate index
   * ships with: per (method, query), how many of the exact top-k the
   * approximate method returned. Takes the EXACT top-k frame and the
   * approximate frames as inputs (each `(q_id, c_id)`-shaped, produced
   * by the methods above), so it composes over any subset of the
   * family without recomputing anything.
   *
   * Output: one row per (method, q_id) — `n_exact`, `hits`,
   * `recall = hits / n_exact` — including zero-hit rows (the universe
   * is methods × exact query ids, not just matching pairs).
   *
   * Scale shape: one (q_id, c_id) equi-join per method over k-row-per-
   * query frames — output is methods × queries rows no matter the
   * corpus size. The expensive part is producing the exact baseline;
   * at 100 TB that runs on a [[graft.pipeline.Sampling
   * .deterministicSample]] of queries (the standard recall-eval
   * protocol), never the full corpus.
   */
  def recallReport(exact: DataFrame,
      approx: Seq[(String, DataFrame)]): DataFrame = {
    val ex = exact.select(col("q_id"), col("c_id"))
    val nEx = ex.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
    approx.map { case (name, df) =>
      val hits = df.select(col("q_id"), col("c_id"))
        .join(ex, Seq("q_id", "c_id"))
        .groupBy("q_id").agg(count(lit(1)).as("hits"))
      nEx.join(hits, Seq("q_id"), "left_outer")
        .select(lit(name).as("method"), col("q_id"), col("n_exact"),
          coalesce(col("hits"), lit(0L)).as("hits"))
    }.reduce(_.unionAll(_))
      .withColumn("recall",
        round(col("hits").cast("double") / col("n_exact").cast("double"), 6))
  }

  /**
   * Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998) —
   * the standard diversity/relevance trade for retrieval and for
   * diverse training-example selection: from each query's candidate
   * pool, greedily pick k items maximizing
   * `λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)` — the first pick is
   * pure relevance (empty selected set ⇒ diversity term 0), every
   * later pick is penalized by its worst redundancy against what's
   * already chosen. λ=1 degenerates to the input ranking; λ→0 picks
   * near-orthogonal items.
   *
   * Greedy is inherently sequential in k, but ONLY in k: each step is
   * one (anti-join + max-over-selected + top-1-per-query) round over
   * per-query candidate pools, all queries advancing in parallel — k
   * is a small constant (3–20) while queries × pool is the data axis,
   * so the k-deep plan is the right scale shape. The pairwise-cosine
   * frame is computed ONCE (Σ_q pool² skinny rows — pools are top-C
   * outputs, C bounded by construction) and every step reuses it.
   *
   * Determinism: `rel` arrives rounded from the upstream retrieval,
   * pair cosines use the sequential-fold dot (bit-identical to the
   * DuckDB twin), and SELECTION orders by the RAW score double (same
   * operand doubles + same op order ⇒ identical IEEE results in both
   * engines), ties on c_id — the greedy trajectory is
   * engine-independent, so the oracle replays it step by step. The
   * REPORTED score is micro-units via floor (`mmr_micro`), NOT
   * round(_, 6): λ·(a 6-decimal rel) lands on 1e-6 midpoints
   * systematically, where Spark's round (HALF_UP on the double's
   * shortest decimal repr) and DuckDB's (on the binary value)
   * disagree; floor acts on the identical binary value in both.
   *
   * @param candidates per-query pools `(q_id, c_id, rel)` — any top-C
   *   retrieval output (brute force, [[indexedTopK]], fused)
   * @param vectors id → embedding for every candidate id (zero-norm
   *   ids are dropped — no direction, no diversity penalty definable)
   */
  def mmrRerank(candidates: DataFrame, vectors: DataFrame, k: Int,
      lambda: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0, 1], got $lambda")
    val v = vectors.select(col(idCol).as("c_id"),
        asDouble(col(vecCol)).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .filter(col("__n") > 0)
    val cand = candidates.select(col("q_id"), col("c_id"),
      col("rel").cast("double").as("rel"))
    // the pool frame is referenced by every greedy round (pool +
    // pairs, each twice per round) — unpersisted, the CANDIDATE
    // RETRIEVAL plan underneath would re-execute per reference
    // (measured 3x on an indexed-serve pool). CHECKPOINTED, not merely
    // cached: a cached-but-lineaged pool re-embeds the retrieval
    // subtree in every round's plan — the k-round selection's final
    // plan carried ~438 Exchange nodes (r15 before-plan), each an
    // AQE-scheduled stage; the cut collapses every reference to a
    // leaf read.
    val cv = Lineage.cut(cand.join(v, "c_id"))
    // pairwise candidate cosines within each query's pool, both
    // directions (max-over-selected reads sim(candidate, selected))
    val pairs = Lineage.cut(
      cv.select(col("q_id"), col("c_id"), col("__v"), col("__n"))
        .join(cv.select(col("q_id"), col("c_id").as("__o_id"),
          col("__v").as("__ov"), col("__n").as("__on")), "q_id")
        .filter(col("c_id") =!= col("__o_id"))
        .select(col("q_id"), col("c_id"), col("__o_id"),
          (dot(col("__v"), col("__ov")) / (col("__n") * col("__on")))
            .as("__sim")))
    val pool = cv.select("q_id", "c_id", "rel")

    def top1(df: DataFrame, rank: Int): DataFrame = {
      val w = Window.partitionBy("q_id")
        .orderBy(col("__raw").desc, col("c_id"))
      df.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("q_id"), col("c_id"),
          floor(col("__raw") * 1e6).cast("long").as("mmr_micro"),
          lit(rank).as("rank"))
    }

    // rank 1: pure relevance (diversity term is an empty max = 0).
    // Round-keyed CUTS: each round reads the previous selection twice
    // (penalty source + anti-join) — checkpointing (vs the previous
    // persist) keeps each round's plan a constant-size tree over leaf
    // reads instead of the full greedy history
    var result = Lineage.cut(top1(
      pool.withColumn("__raw", lit(lambda) * col("rel")), 1))
    for (i <- 2 to k) {
      val maxSim = pairs
        .join(result.select(col("q_id"), col("c_id").as("__o_id")),
          Seq("q_id", "__o_id"))
        .groupBy("q_id", "c_id").agg(max(col("__sim")).as("__ms"))
      val scored = pool
        .join(result.select("q_id", "c_id"), Seq("q_id", "c_id"),
          "left_anti")
        .join(maxSim, Seq("q_id", "c_id"), "left_outer")
        .withColumn("__raw", lit(lambda) * col("rel") -
          lit(1.0 - lambda) * coalesce(col("__ms"), lit(0.0)))
      result = Lineage.cut(result.unionByName(top1(scored, i)))
    }
    result
  }

  // ===================== exact serve (radius-bounded) =====================

  /** Pruning slack on the cosine bound comparison — one order of
    * magnitude above the 1e-6 ranking quantum, so a pruned candidate
    * can never round into a rank-k tie it would then win by id. */
  private val ExactServeSlack = 1e-5

  /** Crash recovery for the radii fold swap ([[compactIvfIndex]]),
    * mirroring [[recoverCorpus]]'s discipline: the live radii dir only
    * moves aside AFTER the folded `radii.next` write completed, so
    * live-missing + next-present means the fold is complete — promote
    * it; live-present + next-present is a fold that never started its
    * swap (possibly a partial write) — drop the staging, the next
    * compaction refolds; a leftover `radii.old` beside a live dir is a
    * crash between promote and final delete — drop it. */
  private def recoverRadii(spark: SparkSession, dir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$dir/radii")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = new org.apache.hadoop.fs.Path(s"$dir/radii.next")
    val old = new org.apache.hadoop.fs.Path(s"$dir/radii.old")
    if (!fs.exists(live) && fs.exists(next))
      require(fs.rename(next, live),
        s"radii swap recovery failed: could not promote $next to $live")
    else if (fs.exists(live) && fs.exists(next)) fs.delete(next, true)
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live),
        s"radii swap recovery failed: could not restore $old to $live")
    else if (fs.exists(live) && fs.exists(old)) fs.delete(old, true)
  }

  /** Per-key cell radii in NORMALIZED space: for each group (`keys`
    * must include `cell`), the max over its positive-norm members p of
    * ‖p̂ − ĉ‖ where ĉ is the cell's trained-centroid DIRECTION. NULL
    * radius when the centroid has zero norm (no direction ⇒ the cell
    * is unprunable). `members` must carry `keys` + `__vd`. Zero-norm
    * members are excluded — the serve path drops them too (no
    * direction ⇒ NaN cosine), so the bound only needs to cover the
    * vectors a serve can return. */
  private def radiiFor(members: DataFrame, centFrame: DataFrame,
      keys: Seq[String]): DataFrame = {
    val ncents = centFrame.select(col("cell"), asDouble(col("cv")).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
      .select(col("cell"), when(col("__cn") > 0,
        transform(col("__cv"), x => x / col("__cn"))).as("__nc"))
    members.withColumn("__pn", norm(col("__vd")))
      .filter(col("__pn") > 0)
      .join(broadcast(ncents), "cell")
      .select(keys.map(col) :+ when(col("__nc").isNotNull,
        sqrt(aggregate(zip_with(
            transform(col("__vd"), x => x / col("__pn")), col("__nc"),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))).as("__rd"): _*)
      // max ignores NULLs but an unprunable cell is NULL for ALL its
      // rows (ĉ is cell-constant), so the group max is NULL exactly
      // when the cell has no direction — the encoding we want
      .groupBy(keys.map(col): _*).agg(max(col("__rd")).as("radius"))
  }

  /** Write the radii sidecar rows of ONE batch — called by
    * [[buildIvfIndex]] (static, batch 0) and [[extendIvfIndex]]
    * (dynamic overwrite of its own batch partition, the same
    * idempotent-replay discipline as the corpus write). Always BEFORE
    * the corpus write: a crash in between leaves radii rows for
    * vectors that never landed — a harmless superset — while the
    * reverse order would leave corpus vectors invisible to the exact
    * serve's nonempty-cell set (silently wrong results). */
  private def writeRadii(spark: SparkSession, dir: String,
      assigned: DataFrame, centFrame: DataFrame, batch: Long,
      dynamic: Boolean): Unit = {
    val r = radiiFor(assigned.select(col("cell"), col("__vd")), centFrame,
        Seq("cell"))
      .withColumn("batch", lit(batch))
      .repartition(1) // ≤ kCells rows per batch — one tiny file
    val w = r.write.mode("overwrite")
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .partitionBy("batch").parquet(s"$dir/radii")
  }

  /** The folded per-cell radii frame for the exact serve: max over
    * batch rows, NULL-dominant (any unprunable batch row makes the
    * cell unprunable). ≤ kCells × batches rows in, ≤ kCells out —
    * sidecar-class work. Refuses loudly when the sidecar is absent
    * (an index built before the radii feature): [[backfillIvfRadii]]
    * derives it in one corpus pass. */
  private def readRadiiFrame(spark: SparkSession, dir: String,
      op: String): DataFrame = {
    recoverRadii(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/radii")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$op: no radii sidecar at $p — this index predates the exact " +
        "serve. Run backfillIvfRadii(spark, dir) once (one corpus " +
        "pass), or rebuild the index.")
    spark.read.parquet(p.toString)
      .groupBy("cell").agg(
        max(when(col("radius").isNull, 1).otherwise(0)).as("__hn"),
        max(col("radius")).as("__mx"))
      .select(col("cell"), when(col("__hn") === 0, col("__mx")).as("radius"))
  }

  /** Derive the radii sidecar of an EXISTING index in one corpus pass —
    * the upgrade path for a [[buildIvfIndex]] directory from before the
    * radii feature (new builds and admissions maintain it in lockstep).
    * Groups by the corpus's own `(batch, cell)` partitions so later
    * [[extendIvfIndex]] replays overwrite exactly their own rows. */
  def backfillIvfRadii(spark: SparkSession, dir: String): Unit = {
    recoverCorpus(spark, dir)
    recoverRadii(spark, dir)
    val meta = readIvfMeta(spark, dir)
    val cf = readCentroidFrame(spark, dir, meta.kCells, "backfillIvfRadii")
    val members = spark.read.parquet(s"$dir/corpus")
      .select(col("batch"), col("cell"),
        asDouble(col("embedding")).as("__vd"))
    radiiFor(members, cf, Seq("batch", "cell"))
      .repartition(1)
      .write.mode("overwrite").partitionBy("batch").parquet(s"$dir/radii")
  }

  /**
   * EXACT top-k from a [[buildIvfIndex]] directory — certified equal to
   * [[bruteForceTopK]] over the (optionally `where`-filtered)
   * positive-norm corpus, while reading only the cells that can
   * mathematically hold a top-k member. Pruning with a PROOF, not a
   * recall knob: where [[indexedTopK]] trades recall for probes, this
   * serve's probe set is data-dependent and its answer is always the
   * brute-force answer (the DuckDB oracle for it IS plain brute force).
   *
   * The bound is the triangle inequality in normalized space. Cosine
   * relates to Euclidean distance on unit vectors by
   * cos(q,p) = 1 − ‖q̂−p̂‖²/2, and for any member p of cell c with
   * radius r_c = max ‖p̂−ĉ‖ (maintained per batch in the `dir/radii`
   * sidecar): ‖q̂−p̂‖ ≥ ‖q̂−ĉ‖ − r_c. So the best cosine cell c can
   * offer is 1 − max(0, ‖q̂−ĉ‖ − r_c)²/2; if that is below the kth-best
   * cosine already in hand — from exactly scoring each query's
   * `seedProbe` nearest cells first — the cell cannot contribute and
   * its partitions are never read. The comparison carries
   * [[ExactServeSlack]] (1e-5, an order above the 1e-6 ranking
   * quantum), so rounding can never promote a pruned candidate into a
   * rank-k tie it would win by id.
   *
   * Two partition-pruned corpus scans (seed cells, then the selected
   * union — the seed scan re-executes once for the literal-cell
   * collect, bounded by seedProbe cells per query), zero corpus
   * shuffles, broadcast-only joins below [[ServeBroadcastMaxQueries]];
   * the per-(query, cell) bound evaluation is queries × kCells skinny
   * rows against the broadcast radii+centroid sidecars — never the
   * corpus. How much is pruned is the data's clusteredness: tight
   * cells with distant queries prune to near-seedProbe; adversarially
   * overlapping cells degrade gracefully toward a full probe, never
   * past brute force over the probed cells.
   *
   * `where` composes exactly: the kth-best bound comes from filtered
   * candidates (weaker ⇒ less pruning, still safe) and cell radii over
   * ALL members upper-bound any filtered subset — the result equals
   * brute force over the filtered corpus.
   *
   * Maintenance invariant (the readers rely on it): radii rows are a
   * SUPERSET of the nonempty (batch, cell) pairs and each radius upper-
   * bounds its members. Build/extend write radii BEFORE corpus rows;
   * deletion only shrinks cells (stale rows stay conservative);
   * compaction folds radii to batch 0 BEFORE the corpus swap so a
   * post-compaction admission can never dynamic-overwrite rows that
   * still cover live batch-0 vectors.
   */
  def exactIndexedTopK(spark: SparkSession, queries: DataFrame,
      dir: String, k: Int, seedProbe: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding", where: Option[Column] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(seedProbe > 0, s"seedProbe must be positive, got $seedProbe")
    recoverCorpus(spark, dir)
    val meta = readIvfMeta(spark, dir)
    val q = queries.select(col(idCol).as("q_id"),
        dimChecked(asDouble(col(vecCol)), meta.dim, "exactIndexedTopK")
          .as("q_v"))
      .withColumn("q_nrm", norm(col("q_v")))
      .filter(col("q_nrm") > 0)
    val maxQ = spark.conf.getOption(ServeBroadcastMaxQueries)
      .map(_.toLong).getOrElse(1L << 16)
    val evalShape = queries.count() <= maxQ
    def qJoin(df: DataFrame): DataFrame =
      if (evalShape) broadcast(df) else df.hint("shuffle_hash")

    // exact UNROUNDED cosine of every (query, candidate) pair in the
    // probed cells — shared by the seed bound and the final ranking
    def scoreCells(probes: DataFrame): DataFrame = {
      val cells = probes.select("cell").distinct().collect()
        .map(_.getInt(0)).sorted
      if (cells.isEmpty)
        return q.filter(lit(false)).select(col("q_id"),
          col("q_id").as("c_id"), lit(0.0).as("__cos"))
      val corpus0 = spark.read.parquet(s"$dir/corpus")
        .filter(col("cell").isin(cells.map(Int.box): _*))
      val corpusF = where.fold(corpus0)(corpus0.filter)
      val c = corpusF.select(col("vec_id").as("c_id"), col("cell"),
          asDouble(col("embedding")).as("c_v"))
        .withColumn("c_nrm", norm(col("c_v")))
        .filter(col("c_nrm") > 0)
      c.join(broadcast(probes), "cell")
        .join(qJoin(q), "q_id")
        .filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"),
          (dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")))
            .as("__cos"))
    }

    // phase 1: the kth-best cosine from the seed cells (the existing
    // probe rule — rounded centroid distance, cell tie-break). A query
    // with fewer than k seed candidates gets no bound row and falls
    // back to "probe every nonempty cell" via the -2 coalesce (cosine
    // is bounded below by -1).
    val seed = probeFrame(spark, dir, meta, q, seedProbe, "exactIndexedTopK")
    val kthW = Window.partitionBy("q_id")
      .orderBy(col("__cos").desc, col("c_id"))
    val bounds = scoreCells(seed)
      .withColumn("__rk", row_number().over(kthW))
      .filter(col("__rk") === k)
      .select(col("q_id"), col("__cos").as("__ub"))

    // phase 2: per (query, nonempty cell) the best cosine the cell can
    // offer; keep cells that can beat the bound. Unprunable cells (no
    // centroid direction, or a pre-fold NULL radius) always pass.
    val rad = readRadiiFrame(spark, dir, "exactIndexedTopK")
    // COVERAGE check: radii must cover every corpus batch. A
    // radii=false admission, a crash between the radii and corpus
    // writes, or a hand-dropped partition would otherwise leave whole
    // batches invisible to the bound's nonempty-cell set — silently
    // wrong answers. Two directory listings, loud refusal.
    locally {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def batches(p: String): Set[String] =
        fs.listStatus(new org.apache.hadoop.fs.Path(p))
          .map(_.getPath.getName).filter(_.startsWith("batch=")).toSet
      val missing = batches(s"$dir/corpus") -- batches(s"$dir/radii")
      require(missing.isEmpty,
        s"exactIndexedTopK: radii sidecar at $dir/radii does not cover " +
          s"corpus ${missing.toSeq.sorted.mkString(", ")} — run " +
          "backfillIvfRadii(spark, dir) (one corpus pass) or rebuild")
    }
    val cf = readCentroidFrame(spark, dir, meta.kCells, "exactIndexedTopK")
    val ncents = cf.select(col("cell"), asDouble(col("cv")).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
      .select(col("cell"), when(col("__cn") > 0,
        transform(col("__cv"), x => x / col("__cn"))).as("__nc"))
    val cellMeta = rad.join(ncents, Seq("cell"), "left_outer")
    val qb = q.join(bounds, Seq("q_id"), "left_outer")
      .select(col("q_id"),
        transform(col("q_v"), x => x / col("q_nrm")).as("__qn"),
        coalesce(col("__ub"), lit(-2.0)).as("__ub"))
    val selected = qb.crossJoin(broadcast(cellMeta))
      .withColumn("__lbc",
        when(col("radius").isNull || col("__nc").isNull, lit(1.0))
          .otherwise(lit(1.0) - pow(greatest(lit(0.0),
            sqrt(aggregate(zip_with(col("__qn"), col("__nc"),
                (a, b) => (a - b) * (a - b)),
              lit(0.0), (acc, x) => acc + x)) - col("radius")), 2) / 2))
      .filter(col("__lbc") >= col("__ub") - lit(ExactServeSlack))
      .select("q_id", "cell")
    // the seed cells re-select themselves by the bound argument (they
    // hold the kth candidate), but union them anyway — airtight against
    // any fp disagreement between the probe rule and the bound math.
    // distinct is REQUIRED: a duplicate (q, cell) pair would duplicate
    // candidates under row_number
    val probes2lazy = selected.union(seed).distinct()
    // under the eval shape, MATERIALIZE the selected probes once:
    // scoreCells collects the cell literals (executing seed scan +
    // bound evaluation) and the final plan would otherwise re-execute
    // that whole phase inside broadcast(probes) — one wasted corpus
    // scan per serve. The pair set is queries × selected cells —
    // driver-bounded exactly when the query broadcast is
    val probes2 = if (evalShape) {
      val rows = probes2lazy.collect()
      if (rows.isEmpty) probes2lazy
      else spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), probes2lazy.schema)
    } else probes2lazy

    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    scoreCells(probes2)
      .select(col("q_id"), col("c_id"), round(col("__cos"), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
