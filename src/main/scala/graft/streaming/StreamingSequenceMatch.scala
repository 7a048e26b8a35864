package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming twin of [[graft.operators.SequenceMatch]]: per-key
 * CEP-style funnel detection with custom state
 * (`flatMapGroupsWithState`). State per key is the list of PARTIAL
 * matches still inside the sequence window; each arriving event
 * advances every partial waiting on its step type (strictly-later,
 * earliest-completion — processing in event-time order makes "the
 * first arriving qualifying event" and "the minimum" the same thing,
 * so streamed completions equal the batch matcher when events arrive
 * in time order, the stream's own definition of order;
 * StreamingSequenceMatchSpec pins parity including funnels spanning
 * micro-batches).
 *
 * State is bounded by construction: a partial whose anchor is older
 * than `withinSeconds` behind the newest event of its key is pruned on
 * arrival (it can never complete), so a key holds at most its events
 * inside one sequence window. A production deployment adds a
 * processing-time idle flush exactly like [[StatefulSessionize]]'s
 * `idleFlushMs` — pruning here happens on the key's next event.
 */
final case class SeqEvent(
    user_id: Long, ts_us: Long, event_type: String, event_id: Long)
final case class SeqPartial(id0: Long, ts: List[Long])
final case class SeqMatchState(partials: List[SeqPartial])
final case class SeqMatch(user_id: Long, id0: Long, ts: Seq[Long])

object StreamingSequenceMatch {

  def apply(events: Dataset[SeqEvent], steps: Seq[String],
      withinSeconds: Long): Dataset[SeqMatch] = {
    require(steps.size >= 2, s"a sequence needs >= 2 steps, got $steps")
    require(steps.distinct == steps, s"step types must be distinct: $steps")
    require(withinSeconds > 0, "withinSeconds must be positive")
    val withinUs = withinSeconds * 1000000L
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.size
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqMatchState, SeqMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[SeqEvent], state: GroupState[SeqMatchState]) =>
          // a micro-batch delivers a group's events unordered: sort
          // locally (bounded by one key's events in one batch)
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var parts = state.getOption.map(_.partials).getOrElse(Nil)
          var out = List.empty[SeqMatch]
          for (e <- sorted) {
            parts = parts.filter(p => e.ts_us - p.ts.head <= withinUs)
            stepIdx.get(e.event_type) match {
              case Some(0) =>
                parts ::= SeqPartial(e.event_id, List(e.ts_us))
              case Some(si) =>
                val (advance, keep) = parts.partition(p =>
                  p.ts.length == si && p.ts.last < e.ts_us)
                val advanced = advance.map(p => p.copy(ts = p.ts :+ e.ts_us))
                val (done, pending) = advanced.partition(_.ts.length == k)
                out = done.map(p => SeqMatch(user, p.id0, p.ts)) ::: out
                parts = keep ::: pending
              case None => // not a step type: ignore
            }
          }
          state.update(SeqMatchState(parts))
          out.reverseIterator
      }
  }
}
