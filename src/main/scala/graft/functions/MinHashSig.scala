package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Native MinHash signature: k seeded xxhash64 min-hashes over an array of
 * shingles, computed in ONE pass per row with full whole-stage codegen.
 *
 * This is the scale path for MinHash dedup: the md5-string formulation
 * ([[graft.pipeline.Dedup.minhashSignatures]], kept for oracle parity)
 * costs an explode + a k-aggregate shuffle and allocates a 32-hex string
 * per (shingle, seed); this expression is row-local — no shuffle, no
 * per-hash allocation, 8-byte hashes — so signatures stream out at scan
 * speed over 100 TB of documents.
 *
 * Semantics: element j of the result is min over shingles of
 * xxhash64(shingle, seed=j); empty array ⇒ Long.MaxValue sentinels.
 */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 128, s"k must be in [1,128], got $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = MinHashSig.compute(arr, k)
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val minsTerm = ctx.freshName("mins")
      s"""
         |long[] $minsTerm = graft.functions.MinHashSig.compute($c, $k);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($minsTerm);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Hot loop shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var j = 0
      while (j < k) {
        val h = XXH64.hashUTF8String(s, j.toLong)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    mins
  }

  /** Register `minhash_sig` in a session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(e) => MinHashSig(e, 8)
        case Seq(e, Literal(v: Int, _)) => MinHashSig(e, v)
        case _ => throw new IllegalArgumentException(
          "minhash_sig(array<string>[, k])")
      },
      "built-in")

  /** Column API: `minhash_sig(shingles, 8)` (registers on first use). */
  def apply(spark: SparkSession, shingles: Column, k: Int): Column = {
    register(spark)
    call_function("minhash_sig", shingles, lit(k))
  }
}
