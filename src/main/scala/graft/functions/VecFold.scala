package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Native sequential vector folds over `array<double>` pairs — the hot
 * inner loops of every similarity operator (cosine top-k, IVF/LSH/SQ8
 * rescore, embedding near-dup, SemDeDup, k-means assignment).
 *
 * The declarative form `aggregate(zip_with(x, y, (p,q) => p*q), 0.0,
 * (acc,v) => acc+v)` is deliberately kept in the operator code (it is
 * the readable spec, and its left-to-right fold order is the documented
 * cross-engine contract) — but Catalyst evaluates higher-order-function
 * lambdas interpreted, boxing every element and allocating a zipped
 * array per row pair. These expressions compute the SAME IEEE-754
 * operation sequence (acc starts at +0.0; `acc += a[i]*b[i]` in index
 * order) in one primitive loop with zero allocation, inside whole-stage
 * codegen. [[graft.VecFoldRewrite]] rewrites the canonical HOF tree to
 * these automatically, so results are bit-identical by construction and
 * the DuckDB oracles keep hash-matching.
 *
 * Null semantics mirror the HOF exactly: a null input array, arrays of
 * different lengths (zip_with pads with null), or any null element all
 * yield NULL.
 */
trait VecFoldExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<double>, got $other")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Static helper method name on [[VecFold]] computing this fold. */
  protected def foldMethod: String

  protected def fold(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (VecFold.invalid(x, y)) null else fold(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if (graft.functions.VecFold.invalid($a, $b)) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.VecFold.$foldMethod($a, $b);
      |}
      |""".stripMargin)
}

/** Σ x_i·y_i — dot product, sequential fold in index order. */
case class VecDot(left: Expression, right: Expression)
    extends VecFoldExpression {
  override def prettyName: String = "vec_dot"
  override protected def foldMethod: String = "dot"
  override protected def fold(a: ArrayData, b: ArrayData): Double =
    VecFold.dot(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ x_i·y_i over `array<bigint>` — the integer pre-rank dot of the SQ8
  * quantized ANN path. Arithmetic is exact (`Math.multiplyExact` /
  * `addExact`), mirroring the ANSI-mode HOF it replaces: identical
  * results everywhere in the non-overflow domain and an error (not a
  * silent wrap) on overflow. [[graft.VecFoldRewrite]] therefore only
  * rewrites ANSI-mode long folds to this. */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot_long expects two array<bigint>, got $other")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (VecFold.invalid(x, y)) null else VecFold.dotLong(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if (graft.functions.VecFold.invalid($a, $b)) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.VecFold.dotLong($a, $b);
      |}
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

/** Σ (x_i−y_i)² — squared euclidean distance, sequential fold. */
case class VecSqDist(left: Expression, right: Expression)
    extends VecFoldExpression {
  override def prettyName: String = "vec_sq_dist"
  override protected def foldMethod: String = "sqDist"
  override protected def fold(a: ArrayData, b: ArrayData): Double =
    VecFold.sqDist(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDist =
    copy(left = newLeft, right = newRight)
}

object VecFold {

  /** True when the HOF form would yield NULL: length mismatch (zip_with
    * pads the shorter side with nulls) or any null element. */
  def invalid(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n) return true
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Valid-input dot product; op sequence identical to the HOF fold. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Valid-input integer dot; exact (ANSI) arithmetic. Overflow throws a
    * SparkArithmeticException of the same ARITHMETIC_OVERFLOW error class
    * as the ANSI HOF fold it replaces. Not bit-identical on the error
    * path: the HOF evaluates all zip_with products before folding, while
    * this loop interleaves multiply/add per index, so WHICH op overflows
    * first can differ, and the bridged error carries no query context —
    * same class, possibly different failing op/message detail. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    try {
      while (i < n) {
        acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
        i += 1
      }
    } catch {
      case _: ArithmeticException =>
        throw org.apache.spark.sql.graft.SparkErrorBridge
          .arithmeticOverflow("long overflow")
    }
    acc
  }

  /** Valid-input squared distance; op sequence identical to the HOF fold
    * `acc + (x-y)*(x-y)`. */
  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Register `vec_dot` / `vec_sq_dist` in the function registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => VecDot(a, b)
        case _ => throw new IllegalArgumentException(
          "vec_dot(array<double>, array<double>)")
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sq_dist",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => VecSqDist(a, b)
        case _ => throw new IllegalArgumentException(
          "vec_sq_dist(array<double>, array<double>)")
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_long",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => VecDotLong(a, b)
        case _ => throw new IllegalArgumentException(
          "vec_dot_long(array<bigint>, array<bigint>)")
      },
      "built-in")
  }
}
