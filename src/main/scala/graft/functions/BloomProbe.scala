package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Column bridge to Spark's native [[BloomFilterMightContain]] expression —
 * the same codegen'd membership probe Spark's own runtime row-level
 * filters use. A driver-built [[BloomFilter]] is serialized once into a
 * binary literal; the probe side hashes the value with `xxhash64` (seed
 * 42, matching the `functions.xxhash64` used to BUILD the filter) and
 * tests the long directly — no per-row boxing, no codegen fence.
 *
 * Contract: the filter must have been built over `xxhash64(value)` LONGS
 * (e.g. `df.select(xxhash64(col("s")).as("h")).stat.bloomFilter("h", n,
 * fpp)` — integral columns insert via `putLong`, the exact counterpart of
 * this probe's `mightContainLong`). A filter built over raw STRINGS uses
 * a different insert hash and would produce false negatives here.
 */
object BloomProbe {

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val os = new ByteArrayOutputStream()
    bloom.writeTo(os)
    os.toByteArray
  }

  /** Register `graft_bloom_might_contain` in the session registry
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(bloomBytes, value) =>
          BloomFilterMightContain(bloomBytes, new XxHash64(Seq(value)))
        case _ => throw new IllegalArgumentException(
          "graft_bloom_might_contain(bloom_bytes, value)")
      },
      "built-in")

  /** Predicate column: does `bloom` (built over `xxhash64(value)` longs)
    * possibly contain `value`? */
  def mightContain(spark: SparkSession, bloom: BloomFilter,
      value: Column): Column = {
    register(spark)
    call_function("graft_bloom_might_contain", lit(serialize(bloom)), value)
  }
}
