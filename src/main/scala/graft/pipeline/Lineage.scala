package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Lineage cuts for iterative operators (connected components, BPE
 * learning, gradient descent) and plan fences.
 *
 * Default: `localCheckpoint` — executor-local block storage, no extra
 * I/O, correct on a healthy cluster. With `spark.graft.checkpointDir`
 * set (runtime conf), a RELIABLE `Dataset.checkpoint` against that
 * directory instead: executor loss then recomputes from the shared
 * store rather than invalidating the executor-local checkpoint and
 * killing a multi-hour 100-TB job mid-iteration — the failure mode
 * `localCheckpoint` cannot survive (a lost executor loses its blocks,
 * and the truncated lineage means Spark cannot rebuild them).
 *
 * The frames cut here are pair-graph- or vocabulary-sized (orders of
 * magnitude below the corpus), so the per-round reliable write is
 * cheap relative to the joins around it. The checkpoint directory is
 * job-scoped: Spark does not delete checkpoint files on session stop —
 * clean it up after the run, or set
 * `spark.cleaner.referenceTracking.cleanCheckpoints=true`.
 */
object Lineage {

  // The dir we last passed to setCheckpointDir, per SparkContext.
  // getCheckpointDir cannot be compared against the conf value: Spark
  // stores a FULLY QUALIFIED fresh UUID subdir (file:/dir/<uuid>), so a
  // bare startsWith never matches and every cut would re-run
  // setCheckpointDir — one fs.mkdirs round trip and a new scattered
  // UUID directory per iteration round.
  private val lastSet =
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.SparkContext, String]()

  /** Cut lineage eagerly: reliable checkpoint when
    * `spark.graft.checkpointDir` is set, else `localCheckpoint`. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir")
        .filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (lastSet.get(sc) != dir) {
          sc.setCheckpointDir(dir)
          lastSet.put(sc, dir)
        }
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(true)
    }
  }
}
