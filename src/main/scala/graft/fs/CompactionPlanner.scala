package graft.fs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Small-files compaction planning: assign each file in a directory to a
 * target-sized merge bin. The reference sizes its copy jobs with the
 * same arithmetic in reverse (1 mapper per 256 MB / per 100 files,
 * `utils/common/DistCpWrapper.java:150-154`); this is the write-side
 * twin — "which files should one OPTIMIZE task rewrite together" — the
 * op a 100-TB warehouse runs continuously against ingest's small-file
 * debris.
 *
 * Binning rule: contiguous fill in listing order — running size BEFORE
 * each file, integer-divided by the target. Deliberately NOT
 * first-fit-decreasing: FFD packs ~2% tighter but needs mutable
 * bin-state (driver loop or UDAF); contiguous fill is ONE keyed window
 * over the manifest, each bin is a contiguous range of the listing
 * (compaction tasks read sequentially named inputs), and the
 * assignment is a pure function of the manifest — idempotent across
 * planner restarts, SQL-replayable for the oracle. Oversized files
 * (> target) occupy their own bin by construction.
 *
 * Scale shape: one hash shuffle + sort per directory key (the window),
 * the same cost class as any per-key ordering; no driver state, no
 * collect. Dirs are the natural parallelism unit and skew-split under
 * AQE.
 */
object CompactionPlanner {

  /** Per-file bin assignment: adds `bin` (0-based within dir). */
  def plan(files: DataFrame, targetBytes: Long,
      dirCol: String = "dir", nameCol: String = "rel_path",
      sizeCol: String = "size"): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy(dirCol).orderBy(nameCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("_before", coalesce(sum(sizeCol).over(w), lit(0L)))
      .withColumn("bin", expr(s"_before div $targetBytes"))
      .drop("_before")
  }

  /** Per-bin rollup: the actual task list (bins with n_files > 1 are
    * merge work; singleton bins are already right-sized). */
  def planSummary(files: DataFrame, targetBytes: Long,
      dirCol: String = "dir", nameCol: String = "rel_path",
      sizeCol: String = "size"): DataFrame =
    plan(files, targetBytes, dirCol, nameCol, sizeCol)
      .groupBy(dirCol, "bin")
      .agg(count(lit(1)).as("n_files"), sum(sizeCol).as("bytes"),
        min(nameCol).as("first_file"), max(nameCol).as("last_file"))
}
