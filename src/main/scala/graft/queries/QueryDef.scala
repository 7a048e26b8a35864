package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-query in the engine's surface: a Spark implementation plus
  * (where SQL-expressible) an equivalent DuckDB oracle query. */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
