package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /**
   * Random-hyperplane LSH bucket id: k sign bits of hyperplane
   * projections, packed into one long. Hyperplane component signs are
   * deterministic — parity of `xxhash64(bit, dim)` — so no side data to
   * broadcast and identical assignment across runs/executors; everything
   * stays inside codegen'd column expressions.
   */
  def rhpBucket(v: Column, k: Int = 12): Column = {
    val bits = transform(sequence(lit(0), lit(k - 1)), i =>
      when(aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, d) =>
          x * when(pmod(xxhash64(i, d), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x) >= 0, lit(1L)).otherwise(lit(0L)))
    aggregate(
      zip_with(bits, sequence(lit(0), lit(k - 1)),
        (b, i) => b * pow(lit(2.0), i.cast("double")).cast("long")),
      lit(0L), (acc, x) => acc + x)
  }

  /**
   * LSH-bucketed top-k (the second scale path beside IVF): queries only
   * search their random-hyperplane bucket — an equi-join on the bucket id,
   * no trained quantizer needed. Recall/latency trades on k: more bits ⇒
   * smaller buckets ⇒ fewer candidates but more near-neighbors split
   * across buckets (production uses multi-probe or banding like the
   * MinHash path).
   */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      bits: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_v"))
      .withColumn("bucket", rhpBucket(col("q_v"), bits))
      .withColumn("q_nrm", norm(col("q_v")))
    val c = candidates.select(col(idCol).as("c_id"), asDouble(col(vecCol)).as("c_v"))
      .withColumn("bucket", rhpBucket(col("c_v"), bits))
      .withColumn("c_nrm", norm(col("c_v")))
    val scored = q.join(c, "bucket")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("bucket"), col("c_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
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
}
