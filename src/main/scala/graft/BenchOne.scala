package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main: run one query N times and print per-iteration
  * seconds (separates plan cost from JVM warmup noise).
  * Usage: BenchOne <queryName> [iters] [--explain] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1 && !args(1).startsWith("--")) args(1).toInt else 3
    val explain = args.contains("--explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.create(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
    spark.sparkContext.setLogLevel("ERROR")
    if (name == "--probe") {
      import org.apache.spark.sql.functions._
      val docs = graft.sim.WarehouseSim.read(spark, sfDir, "documents")
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
      val sh = graft.pipeline.Dedup.shingled(docs)
      time("shingled.count")(sh.count())
      time("shingled.agg(sum size)")(
        sh.agg(sum(size(col("shingles")))).head().getLong(0))
      val ex = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
      time("explode.count")(ex.count())
      val shp = sh.persist()
      shp.count()
      time("explode-over-persisted")(
        shp.select(col("doc_id"), explode(col("shingles")).as("s")).count())
      shp.unpersist()
      ex.explain("formatted")
      time("explode+1md5")(ex.select(md5(concat(lit("1:"), col("s"))).as("h"))
        .agg(count(col("h"))).head().getLong(0))
      time("explode+8md5 groupBy")(
        graft.pipeline.Dedup.minhashSignatures(docs).count())
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    // per-iteration job/stage counters: tiny-SF queries are dominated by
    // fixed per-job cost, so the job count is the first profiling signal
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val traceJobs = sys.env.contains("SPARK_GRAFT_TRACE_JOBS")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(j.stageInfos.size)
          if (traceJobs) jobStart.put(j.jobId, System.nanoTime())
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (traceJobs) Option(jobStart.remove(j.jobId)).foreach { t0 =>
            println(f"  job ${j.jobId}%4d: ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
          }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = if (traceJobs) {
          val i = s.stageInfo
          val ms = i.taskMetrics
          if (i.completionTime.isDefined && i.submissionTime.isDefined) {
            val wall = i.completionTime.get - i.submissionTime.get
            if (wall > 500)
              println(f"    stage ${i.stageId}%4d: ${wall}%6d ms, " +
                f"${i.numTasks}%4d tasks, " +
                f"run ${ms.executorRunTime}%7d ms, " +
                f"cpu ${ms.executorCpuTime / 1000000}%7d ms  " +
                i.name.take(60))
          }
        }
      })
    (1 to iters).foreach { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val cc = if (name == "dedup_clusters")
        s" cc_rounds=${graft.pipeline.Dedup.lastCcRounds}" else ""
      println(f"iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows, " +
        f"${jobs.get} jobs, ${stages.get} stages)$cc")
    }
    spark.stop()
  }
}
