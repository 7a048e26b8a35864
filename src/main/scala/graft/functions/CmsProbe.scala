package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Point query against a Count-Min sketch (Cormode & Muthukrishnan 2005)
 * built by Spark's own `count_min_sketch` aggregate over LONG keys: the
 * estimate for a key, with the CMS one-sided guarantee
 * `estimate >= true count` (always; the `eps`/`confidence` parameters
 * only bound the OVERcount). That guarantee is what makes the sketch a
 * sound pre-shuffle pruner: `estimate < T` proves `count < T`, so a
 * map-side `cms_estimate(k) >= T` filter can never drop a key that a
 * downstream exact `HAVING count >= T` would keep — the composed result
 * stays provably exact while the shuffle shrinks from every key TYPE to
 * the estimated-heavy subset (the 100-TB win: frequency thresholds over
 * corpora whose key vocabulary dwarfs memory).
 *
 * The sketch rides the plan as a binary literal (driver size
 * `depth·width·8B` — e.g. eps 1e-3, conf 0.999 ⇒ ~112 KB) and is
 * deserialized ONCE per executor via the expression's transient lazy;
 * the per-row probe is `depth` array reads, fully whole-stage-codegen'd
 * through [[CmsEstimateLong]]'s `doGenCode`.
 *
 * Contract: build and probe over the SAME key representation. The
 * engine's convention is `xxhash64(value)` longs on both sides (the
 * [[BloomProbe]] discipline) — a hash collision merges two keys' counts,
 * which only INFLATES estimates, so the one-sided guarantee survives
 * hashing.
 */
object CmsProbe {

  def serialize(cms: CountMinSketch): Array[Byte] = cms.toByteArray

  def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)

  /** Register `graft_cms_estimate(value_long, sketch_bytes)` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_estimate",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(value, bytes) => CmsEstimateLong(value, bytes)
        case _ => throw new IllegalArgumentException(
          "graft_cms_estimate(value_long, sketch_bytes)")
      },
      "built-in")

  /** Estimated count of `value` (a LONG key) in a driver-held sketch. */
  def estimate(spark: SparkSession, cms: CountMinSketch,
      value: Column): Column = {
    register(spark)
    call_function("graft_cms_estimate", value, lit(serialize(cms)))
  }
}

/** `estimateCount` of a long key against a serialized [[CountMinSketch]]
  * (the sketch child must be a foldable binary — it is evaluated once at
  * first use, not per row). */
case class CmsEstimateLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_cms_estimate: sketch bytes must be foldable (a literal)")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cms_estimate expects (bigint, binary), got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "graft_cms_estimate: sketch bytes are null")
    CountMinSketch.readFrom(bytes)
  }

  override def nullSafeEval(value: Any, bytesIgnored: Any): Any =
    sketch.estimateCount(java.lang.Long.valueOf(value.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val sk = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $sk.estimateCount(java.lang.Long.valueOf($v));")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateLong =
    copy(left = newLeft, right = newRight)
}
