package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Expression, ExpressionInfo, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.{MinHashSig, SortedIntersectCount}

/**
 * Optimizer rule: `size(array_intersect(x, y))` where BOTH sides are
 * `sort_array(array_distinct(_))` (ascending) rewrites to the native
 * two-pointer [[SortedIntersectCount]] — users writing the canonical
 * sorted-distinct intersection count in plain Spark get the
 * zero-allocation codegen path (measured 2.5× on pairwise Jaccard)
 * without knowing the expression exists.
 *
 * Soundness: the rewrite requires provably sorted AND distinct inputs —
 * `array_intersect` dedups its output, so on inputs with duplicates the
 * merge-count would disagree; `SortArray(ArrayDistinct(_), asc=true)`
 * is exactly the evidence needed. `legacySizeOfNull` must be false
 * (default): the merge returns null for a null side, matching modern
 * `size`, not the legacy -1.
 */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  private def sortedDistinctStrings(e: Expression): Boolean = e match {
    case SortArray(ArrayDistinct(c), Literal(true, _)) =>
      c.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ArrayIntersect(a, b), false)
          if sortedDistinctStrings(a) && sortedDistinctStrings(b) =>
        val _ = s
        SortedIntersectCount(a, b)
    }
}

/**
 * Session extensions registering graft's native expressions for SQL use:
 *
 * {{{
 * SparkSession.builder().withExtensions(new GraftExtensions)...
 * spark.sql("SELECT minhash_sig(shingles, 8) FROM docs")
 * }}}
 *
 * (Existing sessions can call `MinHashSig.register(spark)` instead.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => IntersectCountRewrite)
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => MinHashSig(c, 8)
        case Seq(c, Literal(v: Int, _)) => MinHashSig(c, v)
        case _ => throw new IllegalArgumentException(
          "minhash_sig(array<string>[, k])")
      }))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => SortedIntersectCount(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_count(array<string>, array<string>)")
      }))
  }
}

object GraftExtensions {
  /** Install into an EXISTING session (extensions classes only apply at
    * session construction): appends the optimizer rule via the
    * `experimental` hook and registers the native functions. Idempotent. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(IntersectCountRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntersectCountRewrite
    MinHashSig.register(spark)
    SortedIntersectCount.register(spark)
  }

  /** Remove the installed rule (test isolation). */
  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == IntersectCountRewrite)
}
