package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming exact dedup: first-seen-wins over a content fingerprint, the
 * incremental twin of [[graft.pipeline.Dedup.exact]] — a continuously
 * arriving corpus (crawl feed) is deduped as it lands instead of by
 * nightly re-aggregation of the whole table.
 *
 * Per-fingerprint state is one long (the kept doc id), keyed by the
 * fingerprint — exactly the state Spark's own
 * `dropDuplicatesWithinWatermark` would hold, but emitting the KEEPER
 * mapping (fingerprint → keep_doc_id) rather than just passing first rows
 * through, so downstream joins can rewrite references to dropped
 * duplicates. Within a micro-batch the minimum doc_id wins (deterministic
 * under batch-internal disorder); across batches the earlier batch wins.
 *
 * Unbounded streams: state is O(distinct fingerprints). `ttlMs` arms a
 * processing-time timeout that drops a fingerprint's state after quiet
 * time — bounding state like `dropDuplicatesWithinWatermark`'s watermark
 * does, at the same cost (a duplicate arriving after the TTL is treated
 * as new).
 */
final case class StreamDoc(doc_id: Long, fingerprint: String)
final case class KeptDoc(fingerprint: String, keep_doc_id: Long)

object StreamingDedup {

  def firstSeen(docs: Dataset[StreamDoc],
      ttlMs: Option[Long] = None): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.groupByKey(_.fingerprint)
      .flatMapGroupsWithState[Long, KeptDoc](
        OutputMode.Append(), timeoutConf) {
        (fp: String, it: Iterator[StreamDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // later duplicates: consume, emit nothing, refresh the TTL
            ttlMs.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else {
            val keep = it.map(_.doc_id).min
            state.update(keep)
            ttlMs.foreach(state.setTimeoutDuration)
            Iterator.single(KeptDoc(fp, keep))
          }
      }
  }
}
