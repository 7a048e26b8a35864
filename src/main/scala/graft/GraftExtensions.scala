package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.MinHashSig

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
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => MinHashSig(c, 8)
        case Seq(c, Literal(v: Int, _)) => MinHashSig(c, v)
        case _ => throw new IllegalArgumentException(
          "minhash_sig(array<string>[, k])")
      }))
  }
}
