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
