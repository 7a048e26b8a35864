package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/**
 * Native |A ∩ B| for two SORTED distinct string arrays: a two-pointer
 * merge with zero allocation, fully whole-stage-codegen'd.
 *
 * This is the hot inner operation of pairwise Jaccard verification
 * (`Dedup.ngramJaccardPairs` — the most expensive query in the suite):
 * Spark's `array_intersect` builds a hash set PER JOINED PAIR (per-call
 * allocation + hashing of every element), while sorting each document's
 * token set once in the projection amortizes over all its pairs and the
 * per-pair merge just walks both arrays comparing bytes.
 *
 * Precondition: both inputs sorted ascending (e.g. `sort_array`) with
 * distinct elements — the caller's projection guarantees it.
 */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count expects two array<string>, got $other")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Hot loop shared by interpreted eval and generated code. Null elements
    * are skipped by the merge wherever they appear (the function registry
    * exposes this to arbitrary SQL, so an unsorted input with a null after
    * a non-null must not NPE), and a null on BOTH sides counts as one
    * intersection — matching `array_intersect` on distinct arrays. The
    * count is only meaningful for sorted distinct inputs (the documented
    * precondition); for unsorted inputs it degrades to a wrong-but-safe
    * number, never a crash. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    var aNull = false
    var bNull = false
    while (i < na && j < nb) {
      if (a.isNullAt(i)) { aNull = true; i += 1 }
      else if (b.isNullAt(j)) { bNull = true; j += 1 }
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    while (i < na && !aNull) { if (a.isNullAt(i)) aNull = true; i += 1 }
    while (j < nb && !bNull) { if (b.isNullAt(j)) bNull = true; j += 1 }
    if (aNull && bNull) c += 1
    c
  }

  /** Register `sorted_intersect_count` in the function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => SortedIntersectCount(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_count(array<string>, array<string>)")
      },
      "built-in")

  /** Column API (registers on first use). */
  def apply(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("sorted_intersect_count", a, b)
  }
}
