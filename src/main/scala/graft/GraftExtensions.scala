package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, ArrayDistinct, ArrayIntersect, Cast, EvalMode, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, RegExpExtractAll, Size, SortArray, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType}

import graft.functions.{MinHashSig, SortedIntersectCount, VecDot, VecDotLong, VecSqDist}

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
 * Optimizer rule: the canonical sequential vector folds
 * `aggregate(zip_with(x, y, (p,q) => p*q), 0.0, (acc,v) => acc+v)` and
 * its squared-distance sibling `(p-q)*(p-q)` rewrite to the native
 * [[graft.functions.VecDot]] / [[graft.functions.VecSqDist]] — one
 * primitive loop in whole-stage codegen instead of an interpreted
 * lambda fold with per-row boxing and a zipped intermediate array.
 *
 * Soundness: the natives execute the IDENTICAL IEEE-754 op sequence
 * (acc starts +0.0, index-order accumulate) and reproduce the HOF's
 * null semantics (null array / length mismatch / null element → NULL),
 * so results are bit-identical — the oracle hash-matches are untouched.
 * The guard requires the exact canonical shape: both arrays
 * `array<double>`, zero literal +0.0, merge lambda `acc + v` over its
 * own variables, identity finish lambda.
 */
object VecFoldRewrite extends Rule[LogicalPlan] {
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // double folds: zero +0.0, both arrays array<double>
      case agg @ ArrayAggregate(
          ZipWith(x, y,
            LambdaFunction(body,
              Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _)),
          Literal(zero: Double, DoubleType),
          LambdaFunction(Add(accRef, vRef, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(finRef, Seq(fin: NamedLambdaVariable), _))
          if java.lang.Double.doubleToLongBits(zero) == 0L &&
            isVar(accRef, acc) && isVar(vRef, v) && isVar(finRef, fin) &&
            isDoubleArray(x) && isDoubleArray(y) =>
        body match {
          case Multiply(pRef, qRef, _) if isVar(pRef, p) && isVar(qRef, q) =>
            VecDot(x, y)
          case Multiply(Subtract(p1, q1, _), Subtract(p2, q2, _), _)
              if isVar(p1, p) && isVar(q1, q) &&
                isVar(p2, p) && isVar(q2, q) =>
            VecSqDist(x, y)
          case _ => agg
        }
      // long fold: ANSI mode only — VecDotLong's exact arithmetic mirrors
      // the ANSI overflow error, not legacy wraparound. (The third field
      // of Multiply/Add is a NumericEvalContext in Spark 4.1, so the mode
      // is guarded via the evalMode accessor, not a constructor pattern.)
      case agg @ ArrayAggregate(
          ZipWith(x, y,
            LambdaFunction(mul @ Multiply(pRef, qRef, _),
              Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(add @ Add(accRef, vRef, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(finRef, Seq(fin: NamedLambdaVariable), _))
          if mul.evalMode == EvalMode.ANSI && add.evalMode == EvalMode.ANSI &&
            isVar(pRef, p) && isVar(qRef, q) &&
            isVar(accRef, acc) && isVar(vRef, v) && isVar(finRef, fin) &&
            isLongArray(x) && isLongArray(y) =>
        val _ = agg
        VecDotLong(x, y)
    }
}

/**
 * Cost-based optimizer rule: a blocklist-shaped regex count —
 * `size(regexp_extract_all(text, '\b(p1|p2|…)\b', 1))` over a LITERAL
 * word-boundary alternation of plain phrases — rewrites to the native
 * Aho–Corasick [[graft.functions.MultiMatch]] when the list is large
 * enough to matter (≥ [[BlocklistRewrite.minAlternatives]]
 * alternatives). Small lists stay on the regex path (cheap enough,
 * and the plan stays vanilla); users with curation-scale lists get
 * the O(text)-per-row automaton without knowing it exists — the
 * [[IntersectCountRewrite]] philosophy applied to text screening.
 *
 * Soundness: the rewrite fires only when the pattern is EXACTLY the
 * canonical shape with regex-literal phrases (letters/digits/spaces —
 * no metacharacters), distinct and prefix-free. Under prefix-freedom,
 * leftmost-first (java.util.regex) and leftmost-longest (RE2)
 * alternation agree, and MultiMatch's leftmost-START non-overlapping
 * boundary-anchored scan reproduces `Matcher.find` exactly —
 * including suffix-nested phrase pairs like "click here"/"here"
 * (MultiMatchSpec pins bit-equality on suffix, nested, and randomized
 * fixtures). `legacySizeOfNull` must be false so a null text maps to
 * null on both paths.
 */
object BlocklistRewrite extends Rule[LogicalPlan] {
  val minAlternatives = 16

  private val shape = """^\\b\(([^()\\]+)\)\\b$""".r

  private[graft] def phrasesOf(pattern: String): Option[Seq[String]] =
    pattern match {
      case shape(alts) =>
        val ps = alts.split("\\|", -1).toSeq
        // word-char edges required: a space-edged phrase inverts \b
        // semantics vs the scanner (regex \b(join )\b matches "a join b";
        // the AC boundary check would not) — such patterns stay on the
        // regex path instead of being silently rewritten
        val literal = ps.forall(p => p.nonEmpty &&
          p.forall(c => (c.isLetterOrDigit && c < 128) || c == ' ') &&
          graft.functions.MultiMatch.isWordEdged(p))
        val prefixFree = ps.sorted.sliding(2).forall {
          case Seq(a, b) => !b.startsWith(a)
          case _ => true
        }
        if (literal && ps.distinct == ps && prefixFree) Some(ps) else None
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(RegExpExtractAll(subject,
            Literal(pat: org.apache.spark.unsafe.types.UTF8String, StringType),
            Literal(1, IntegerType)), false) =>
        phrasesOf(pat.toString) match {
          case Some(ps) if ps.size >= minAlternatives =>
            // size() is INT; preserve the expression's resolved type
            // (the count is bounded by text length, the cast never
            // truncates)
            Cast(graft.functions.MultiMatch(subject, ps), IntegerType)
          case _ => s
        }
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
    e.injectOptimizerRule(_ => VecFoldRewrite)
    e.injectOptimizerRule(_ => BlocklistRewrite)
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => VecDot(a, b)
        case _ => throw new IllegalArgumentException(
          "vec_dot(array<double>, array<double>)")
      }))
    e.injectFunction((
      FunctionIdentifier("vec_sq_dist"),
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_sq_dist"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => VecSqDist(a, b)
        case _ => throw new IllegalArgumentException(
          "vec_sq_dist(array<double>, array<double>)")
      }))
    e.injectFunction((
      FunctionIdentifier("vec_dot_long"),
      new ExpressionInfo(classOf[VecDotLong].getName, "vec_dot_long"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => VecDotLong(a, b)
        case _ => throw new IllegalArgumentException(
          "vec_dot_long(array<bigint>, array<bigint>)")
      }))
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
    if (!spark.experimental.extraOptimizations.contains(VecFoldRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecFoldRewrite
    if (!spark.experimental.extraOptimizations.contains(BlocklistRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BlocklistRewrite
    MinHashSig.register(spark)
    SortedIntersectCount.register(spark)
    graft.functions.VecFold.register(spark)
  }

  /** Remove the installed rules (test isolation). */
  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(r => r == IntersectCountRewrite || r == VecFoldRewrite ||
          r == BlocklistRewrite)
}
