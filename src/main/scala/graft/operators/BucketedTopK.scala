package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hierarchical exact top-k: take top-k per (group, hash-bucket) first,
 * then a final window over the ≤ buckets·k survivors per group — so no
 * partition ever sorts a whole (mostly unique) key table. Exact under
 * the given total order: any global top-k row is top-k in its own
 * bucket. Shared by `t_top_ngrams`, `t_pmi_collocations`, and
 * `t_burstiness` (one tie-break convention, one bucket count).
 */
object BucketedTopK {

  /** Append a dense 1-based `rank` (int) within each `partitionCols`
    * group under `order`, keeping only rows with rank ≤ k. `bucketKey`
    * must be a deterministic per-row expression (it only spreads the
    * pre-rank; correctness needs determinism, not uniformity). */
  def rank(df: DataFrame, partitionCols: Seq[Column], order: Seq[Column],
      bucketKey: Column, k: Int, buckets: Int = 64): DataFrame = {
    require(k > 0 && buckets > 0, s"need k > 0, buckets > 0; got $k, $buckets")
    val wFinal = Window.partitionBy(partitionCols: _*).orderBy(order: _*)
    df
      .withColumn("_btk", pmod(xxhash64(bucketKey), lit(buckets)))
      .withColumn("_rk0", row_number().over(Window
        .partitionBy(partitionCols :+ col("_btk"): _*).orderBy(order: _*)))
      .filter(col("_rk0") <= k)
      .withColumn("rank", row_number().over(wFinal).cast("int"))
      .filter(col("rank") <= k)
      .drop("_btk", "_rk0")
  }
}
