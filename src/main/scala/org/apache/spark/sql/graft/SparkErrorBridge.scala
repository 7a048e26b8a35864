package org.apache.spark.sql.graft

import org.apache.spark.sql.errors.QueryExecutionErrors

/**
 * Minimal bridge into Spark's `private[sql]` error factories, so graft's
 * native expressions can throw the EXACT error objects (error class,
 * SQLSTATE, message template) that the built-in ANSI operators they
 * replace would throw. Lives in the `org.apache.spark.sql` namespace for
 * visibility only — the standard pattern for Spark-extension libraries;
 * nothing here subclasses or patches Spark internals.
 */
object SparkErrorBridge {

  /** The ANSI ARITHMETIC_OVERFLOW error (SparkArithmeticException), as
    * thrown by built-in ANSI Add/Multiply on long overflow. */
  def arithmeticOverflow(message: String): ArithmeticException =
    QueryExecutionErrors.arithmeticOverflowError(message)
}
