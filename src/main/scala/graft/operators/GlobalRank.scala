package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{col, lit, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StructField, StructType}

/**
 * Exact global ordering primitives that never collapse to one
 * partition. `Window.orderBy(...)` with no partition key — the obvious
 * way to write a corpus-wide rank or prefix sum — plans a
 * SinglePartition exchange: every row funnels through one task, which
 * is the canonical 100-TB cliff. These helpers keep the same exact
 * semantics with a range-shuffle instead:
 *
 *  1. `repartitionByRange` on the order key (sampled range boundaries,
 *     so skewed keys still spread; equal keys co-locate);
 *  2. sort within each partition (a local sort, no further exchange);
 *  3. a tiny counting job over the sorted shuffle output (one Long per
 *     partition, reusing the shuffle files — this is exactly how
 *     `RDD.zipWithIndex` works) to turn per-partition positions into
 *     global ones.
 *
 * TIES ARE SAFE: the order need not be total. A deterministic row-hash
 * tie-break (`xxhash64` over every hashable input column) is appended
 * to the sort key internally, so rows that tie on the caller's order
 * still land in one reproducible sequence — across runs, partition
 * counts, AND task retries (a retried task re-sorts fetched rows whose
 * arrival order changed; without the tie-break, tied rows could swap
 * places and per-row ranks/totals would silently differ). Rows
 * identical in EVERY hashed column hash equal and stay
 * interchangeable, which is multiset-deterministic — the only kind of
 * determinism such rows admit. Two caveats, both narrow:
 * map-typed columns are EXCLUDED from the hash (Spark's hash
 * expressions reject MapType — map element order is undefined, so a
 * map has no canonical hash), so rows differing only in a map payload
 * stay interchangeable among themselves; and two distinct rows that
 * tie on the order key AND collide in xxhash64 (astronomically rare)
 * remain placement-nondeterministic. GlobalRankSpec pins rank and
 * total stability on a heavily tied order column, map payloads
 * included.
 *
 * The result is two scans of the shuffled data and driver state of one
 * Long per partition, at any scale. The rows come back through an RDD
 * map (off codegen) for the zip itself — the price of an exact global
 * index; downstream operators resume codegen from the new frame.
 */
object GlobalRank {

  private val TieBreak = "_gr_tiebreak"

  /** Spark's hash expressions reject MapType anywhere in the type
    * (undefined element order ⇒ no canonical hash), so map-carrying
    * columns must stay out of the tie-break hash. */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _ => true
  }

  /** Input extended with the deterministic row-hash tie-break, plus the
    * extended order. The tie-break column is always LAST in the frame,
    * so output rows drop it positionally. */
  private def withTieBreak(df: DataFrame,
      order: Seq[Column]): (DataFrame, Seq[Column]) = {
    require(!df.columns.contains(TieBreak),
      s"input must not already carry a $TieBreak column")
    val hashCols = df.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
    // an all-map frame has nothing hashable: a constant keeps the plan
    // valid and the caller's order as the only (multiset) determinism
    val tie = if (hashCols.nonEmpty) xxhash64(hashCols: _*) else lit(0L)
    val hashed = df.withColumn(TieBreak, tie)
    (hashed, order :+ col(TieBreak))
  }

  /** Append `rankCol` = exact 1-based global row number under `order`
    * (ties resolved by the deterministic row-hash tie-break). */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
      rankCol: String = "global_rank", partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "withGlobalRank needs at least one order column")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val (hashed, fullOrder) = withTieBreak(df, order)
    val sorted = hashed.repartitionByRange(n, fullOrder: _*)
      .sortWithinPartitions(fullOrder: _*)
    val schema = StructType(df.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      // drop the trailing tie-break, append the rank
      Row.fromSeq(row.toSeq.init :+ (idx + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Append `outCol` = exact inclusive running total of `valueCol`
    * (must be numeric; summed as Long) under `order` — the scalable
    * twin of `sum(x) OVER (ORDER BY ...)`, tie-stable like
    * [[withGlobalRank]]. Exclusive prefix = outCol - valueCol on the
    * result. */
  def withRunningTotal(df: DataFrame, order: Seq[Column], valueCol: String,
      outCol: String = "running_total", partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "withRunningTotal needs at least one order column")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val (hashed, fullOrder) = withTieBreak(df, order)
    val sorted = hashed.repartitionByRange(n, fullOrder: _*)
      .sortWithinPartitions(fullOrder: _*)
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
    val schema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        acc += rowLong(r, valueIdx)
        Row.fromSeq(r.toSeq.init :+ acc)
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
