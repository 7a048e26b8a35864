package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Exact global ordering primitives that never collapse to one
 * partition. `Window.orderBy(...)` with no partition key — the obvious
 * way to write a corpus-wide rank or prefix sum — plans a
 * SinglePartition exchange: every row funnels through one task, which
 * is the canonical 100-TB cliff. These helpers keep the same exact
 * semantics with a range-shuffle instead:
 *
 *  1. `repartitionByRange` on the order key (sampled range boundaries,
 *     so skewed keys still spread; equal keys co-locate, which is why
 *     callers must pass a TOTAL order — include a unique tie-break
 *     column, or ranks among ties would be partition-placement
 *     dependent);
 *  2. sort within each partition (a local sort, no further exchange);
 *  3. a tiny counting job over the sorted shuffle output (one Long per
 *     partition, reusing the shuffle files — this is exactly how
 *     `RDD.zipWithIndex` works) to turn per-partition positions into
 *     global ones.
 *
 * The result is two scans of the shuffled data and driver state of one
 * Long per partition, at any scale. The rows come back through an RDD
 * map (off codegen) for the zip itself — the price of an exact global
 * index; downstream operators resume codegen from the new frame.
 */
object GlobalRank {

  /** Append `rankCol` = exact 1-based global row number under `order`
    * (which must be a total order for a deterministic result). */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
      rankCol: String = "global_rank", partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "withGlobalRank needs at least one order column")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Append `outCol` = exact inclusive running total of `valueCol`
    * (must be numeric; summed as Long) under `order` — the scalable
    * twin of `sum(x) OVER (ORDER BY ...)`. Exclusive prefix = outCol -
    * valueCol on the result. */
  def withRunningTotal(df: DataFrame, order: Seq[Column], valueCol: String,
      outCol: String = "running_total", partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "withRunningTotal needs at least one order column")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val valueIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    // One Long per partition to the driver; the shuffle files produced
    // for `rdd` are reused by the second job, so the input is read once.
    val partSums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += rowLong(r, valueIdx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        acc += rowLong(r, valueIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(out, schema)
  }

  private def rowLong(r: Row, i: Int): Long =
    if (r.isNullAt(i)) 0L
    else r.get(i) match {
      case l: Long => l
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"running-total column must be numeric, got ${other.getClass}")
    }
}
