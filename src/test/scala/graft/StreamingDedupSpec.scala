package graft

import graft.streaming.{KeptDoc, StreamDoc, StreamingDedup}

/** Streaming exact dedup: first occurrence wins within and across
  * micro-batches; duplicates never re-emit; state survives batch
  * boundaries. */
class StreamingDedupSpec extends TestBase {

  test("first-seen-wins dedup across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamDoc]
    val qName = s"dedup_${System.nanoTime()}"
    val q = StreamingDedup.firstSeen(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName(qName)
      .start()
    try {
      // batch 1: fp1 appears twice in one batch — min doc_id kept
      input.addData(StreamDoc(7, "fp1"), StreamDoc(3, "fp1"), StreamDoc(5, "fp2"))
      q.processAllAvailable()
      assert(spark.table(qName).as[KeptDoc].collect().toSet ==
        Set(KeptDoc("fp1", 3), KeptDoc("fp2", 5)))

      // batch 2: a cross-batch duplicate of fp1 (even with a SMALLER id)
      // emits nothing — the first batch's keeper stands; fp3 is new
      input.addData(StreamDoc(1, "fp1"), StreamDoc(9, "fp3"))
      q.processAllAvailable()
      assert(spark.table(qName).as[KeptDoc].collect().toSet ==
        Set(KeptDoc("fp1", 3), KeptDoc("fp2", 5), KeptDoc("fp3", 9)))
    } finally q.stop()
  }

  test("native dropDuplicatesWithinWatermark bounds state like the TTL form") {
    // coverage of Spark's own event-time dedup next to the custom
    // flatMapGroupsWithState paths: in-watermark duplicates drop; a
    // duplicate arriving after the watermark expired its key's state
    // re-emits — the same trade StreamingDedup's processing-time TTL
    // documents
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val qName = s"ddww_${System.nanoTime()}"
    val q = input.toDF().toDF("fp", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      .select("fp", "us")
      .writeStream.outputMode("append").format("memory").queryName(qName)
      .start()
    def rows() = spark.table(qName).as[(String, Long)].collect().toSeq
    try {
      input.addData(("a", 0L), ("a", 1000L), ("b", 5L))
      q.processAllAvailable()
      assert(rows().map(_._1).sorted == Seq("a", "b"),
        s"in-batch duplicate must drop: ${rows()}")
      // duplicate inside the watermark window: dropped
      input.addData(("a", 2000L))
      q.processAllAvailable()
      assert(rows().count(_._1 == "a") == 1)
      // advance event time far beyond watermark + gap; the expired key
      // re-admits (bounded state, the documented trade)
      input.addData(("c", 100L * 3600000000L))
      q.processAllAvailable()
      input.addData(("a", 100L * 3600000000L + 5L))
      q.processAllAvailable()
      assert(rows().count(_._1 == "a") == 2,
        s"expired key must re-admit: ${rows()}")
    } finally q.stop()
  }

  test("streaming URL dedup: canonical URL as the fingerprint matches " +
      "the batch keeper set") {
    // composition, one code path both modes: canonicalizeUrl is plain
    // column math, so the streaming crawl-feed dedup is just
    // StreamingDedup.firstSeen keyed on the canonical form — pin that
    // a single batch reproduces batch urlDedup's keeper set exactly,
    // and that a cross-batch recrawl variant of a seen page emits
    // nothing even when its URL string differs
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val urls = Seq(
      (10L, "HTTP://WWW.Example.com:80/a/"),
      (11L, "http://example.com/a?utm_source=x"),
      (12L, "http://example.com/b?y=2&x=1"),
      (13L, "http://example.com/b?x=1&y=2#frag"))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val qName = s"urldedup_${System.nanoTime()}"
    val q = input.toDF().toDF("doc_id", "url")
      .select(col("doc_id"),
        graft.pipeline.Dedup.canonicalizeUrl(col("url")).as("fingerprint"))
      .as[StreamDoc]
      .transform(StreamingDedup.firstSeen(_))
      .writeStream.outputMode("append").format("memory").queryName(qName)
      .start()
    try {
      input.addData(urls: _*)
      q.processAllAvailable()
      val streamed = spark.table(qName).as[KeptDoc].collect()
        .map(k => (k.fingerprint, k.keep_doc_id)).toSet
      val batch = graft.pipeline.Dedup
        .urlDedup(urls.toDF("doc_id", "url"))
        .select("canonical_url", "keeper_id").distinct()
        .as[(String, Long)].collect().toSet
      assert(streamed === batch,
        s"stream/batch keeper divergence: $streamed vs $batch")
      // recrawl of a seen page under yet another URL spelling: silent
      input.addData((99L, "http://example.com/a/"))
      q.processAllAvailable()
      assert(spark.table(qName).count() === 2)
    } finally q.stop()
  }
}
