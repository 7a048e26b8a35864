package graft

import org.apache.spark.sql.functions._

import graft.incremental.StateStore
import graft.model.{JobState, JobStatus}
import graft.observability.Metrics

/** Counters via observe + listener, job-lag metric from the state table. */
class ObservabilitySpec extends TestBase {

  test("observe counters flow through the listener") {
    import spark.implicits._
    val collector = Metrics.install(spark)
    val df = Seq((1L, 100L), (2L, 250L), (3L, 0L)).toDF("id", "bytes")
    Metrics.observeCounters(df, "copy_metrics", Some("bytes")).collect()
    // QueryExecutionListener fires asynchronously
    val deadline = System.currentTimeMillis() + 10000
    while (!collector.metrics.contains("copy_metrics") &&
           System.currentTimeMillis() < deadline) Thread.sleep(50)
    val m = collector.metrics("copy_metrics")
    assert(m("rows") == 3L && m("bytes") == 350L, s"got $m")
  }

  test("job lag from the state table + alert buckets") {
    val dir = tmpDir("lag-state")
    val state = new StateStore(spark, dir.toUri.toString + "jobs")
    val now = 1700000000000L
    state.append(Seq(
      JobState(1, now - 4000_000L, "COPY_TABLE", JobStatus.Pending,
        "db", "t1", Seq.empty, None, None, None, Map.empty),
      JobState(2, now - 1000_000L, "COPY_TABLE", JobStatus.Successful,
        "db", "t2", Seq.empty, None, None, None, Map.empty)))
    // oldest non-terminal job is 4000s old
    assert(Metrics.jobLagSeconds(state, now).contains(4000L))
    assert(Metrics.lagBucket(4000L) == 2) // past 1800 and 3600
    assert(Metrics.lagBucket(100L) == 0)
    // once it completes, no lag
    state.appendStatus(Seq(state.restoreRunnable().head), JobStatus.Successful)
    assert(Metrics.jobLagSeconds(state, now).isEmpty)
  }
}
