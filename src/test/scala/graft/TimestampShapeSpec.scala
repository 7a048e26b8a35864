package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the ingestion contract (WarehouseSim.normalizeTimestamps): every
  * `ts`-consuming query must return identical results no matter which
  * physical timestamp shape the parquet writer chose for the events table.
  * The test-data generator has already switched shapes once mid-build
  * (TIMESTAMP(NANOS) → timestamp[us] tz=None, round 7→8), so all three
  * shapes a warehouse realistically serves are written and replayed:
  *
  *  - epoch-nanos long (what `nanosAsLong` surfaces for TIMESTAMP(NANOS))
  *  - timestamp[us] tz=None → Spark TIMESTAMP_NTZ (pandas/arrow default)
  *  - timestamp[us] adjusted-to-UTC → Spark TIMESTAMP
  */
class TimestampShapeSpec extends TestBase {

  private val tsQueries =
    Seq("w1_running_agg", "w2_sessionize", "st2_offset_buckets",
      "a10_job_lag", "j5_latest_wins")

  test("ts-consuming queries are invariant across parquet timestamp shapes") {
    // canonical events frame: whatever shape the driver currently writes,
    // normalized to session-zone TIMESTAMP
    val canon = graft.sim.WarehouseSim
      .read(spark, "/root/testdata/sf0.001", "events")

    val shapes: Seq[(String, DataFrame)] = Seq(
      "ns_long" -> canon.withColumn("ts", expr("unix_micros(ts) * 1000L")),
      "us_ntz"  -> canon.withColumn("ts", col("ts").cast("timestamp_ntz")),
      "us_ltz"  -> canon)

    val dirs = shapes.map { case (shape, df) =>
      val dir = tmpDir(s"ts-shape-$shape")
      df.write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
      shape -> dir.toString
    }

    for (q <- tsQueries) {
      val results = dirs.map { case (shape, dir) =>
        shape -> SparkEntry.queries(q)(spark, dir)
          .collect().map(_.toString).sorted.toSeq
      }
      val (refShape, refRows) = results.head
      assert(refRows.nonEmpty, s"$q returned no rows on $refShape")
      for ((shape, rows) <- results.tail)
        assert(rows == refRows,
          s"$q differs between $refShape and $shape " +
            s"(${refRows.size} vs ${rows.size} rows)")
    }
  }
}
