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
 * Step types may REPEAT (`view → view → purchase`) — the same contract
 * as the batch matcher: an event advances every partial whose next
 * step has its type, and also anchors a new partial when the type is
 * `steps.head`. The strictly-later rule (`t_prev < t`) keeps one event
 * from filling two slots of the same partial.
 *
 * LATE DATA IS NEVER SILENT: state tracks the maximum event time each
 * key has processed, and an event arriving in a later micro-batch with
 * `ts_us` BELOW that high-water mark cannot be sequenced correctly
 * anymore (its position in every window sweep has already been
 * decided). Such events are dropped and REPORTED — one output row per
 * drop with `late = true`, carrying the event's id and timestamp — so
 * an out-of-order stream either matches the batch output on what it
 * processed or says exactly what it skipped
 * (StreamingSequenceMatchSpec pins both). Equal-to-the-mark
 * timestamps still process: strict-later matching makes them
 * order-insensitive. A deployment that prefers completeness over
 * latency puts a reorder buffer in front (event-time watermark +
 * sort), turning the drop rows into a monitoring signal that the
 * buffer is sized right.
 *
 * State is bounded by construction: a partial whose anchor is older
 * than `withinSeconds` behind the newest event of its key is pruned on
 * arrival (it can never complete), so a key holds at most its events
 * inside one sequence window plus two longs. `idleFlushMs` adds the
 * [[StatefulSessionize]] processing-time idle flush on top: the state
 * of a key that goes quiet is DISCARDED after the timeout (partials
 * are incomplete funnels — there is nothing correct to emit), so state
 * size tracks the live key set instead of every key ever seen. The
 * flush also forgets the key's late-data high-water mark, so size
 * `idleFlushMs` well above the stream's maximum expected lateness.
 *
 * UPGRADE NOTE — state schema: `SeqMatchState` gained `maxTs` (and the
 * output `SeqMatch` gained `late`) when late-data reporting landed; a
 * query resuming from a checkpoint written by the earlier schema will
 * fail or misdecode its state. Restart such a query from a FRESH
 * checkpoint (and replay the source from the last committed offsets) —
 * the same single-stream upgrade caveat as the rest of this package's
 * stateful operators.
 */
final case class SeqEvent(
    user_id: Long, ts_us: Long, event_type: String, event_id: Long)
final case class SeqPartial(id0: Long, ts: List[Long])
final case class SeqMatchState(partials: List[SeqPartial], maxTs: Long)
/** A completed funnel (`late = false`, `ts` = one timestamp per step)
  * or a loud late-drop notice (`late = true`, `id0`/`ts` = the dropped
  * event's id and single timestamp). */
final case class SeqMatch(
    user_id: Long, id0: Long, ts: Seq[Long], late: Boolean = false)

object StreamingSequenceMatch {

  /** @param idleFlushMs when set, a processing-time timeout DISCARDS
    *   the state (partials + high-water mark) of keys that go quiet —
    *   see the class doc for sizing. Opt-in because
    *   ProcessingTimeTimeout makes the engine run no-data micro-batches
    *   continuously (the [[StatefulSessionize]] caveat):
    *   `processAllAvailable` never settles, so deployments using it
    *   drive the query by trigger. */
  def apply(events: Dataset[SeqEvent], steps: Seq[String],
      withinSeconds: Long, idleFlushMs: Option[Long] = None): Dataset[SeqMatch] = {
    require(steps.size >= 2, s"a sequence needs >= 2 steps, got $steps")
    require(withinSeconds > 0, "withinSeconds must be positive")
    val withinUs = withinSeconds * 1000000L
    // a type may own several step positions (repeated steps); highest
    // position first so an event meets each partial at most once (the
    // strict t_prev < t rule already guarantees it, this keeps the
    // traversal obviously single-pass)
    val positions: Map[String, List[Int]] =
      steps.zipWithIndex.groupBy(_._1).map { case (t, ps) =>
        t -> ps.map(_._2).sorted.reverse.toList
      }
    val k = steps.size
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleFlushMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqMatchState, SeqMatch](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[SeqEvent], state: GroupState[SeqMatchState]) =>
          if (state.hasTimedOut) {
            // idle flush: partials are incomplete funnels — nothing
            // correct to emit, just free the key's state row
            state.remove()
            Iterator.empty
          } else {
          // a micro-batch delivers a group's events unordered: sort
          // locally (bounded by one key's events in one batch)
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val st = state.getOption.getOrElse(SeqMatchState(Nil, Long.MinValue))
          // below the key's high-water mark = arrived after later events
          // were already sequenced: report, never silently mis-sequence
          val (lateEvs, inOrder) = sorted.partition(_.ts_us < st.maxTs)
          var parts = st.partials
          var out = lateEvs.map(e =>
            SeqMatch(user, e.event_id, List(e.ts_us), late = true)).toList
          for (e <- inOrder) {
            parts = parts.filter(p => e.ts_us - p.ts.head <= withinUs)
            for (si <- positions.getOrElse(e.event_type, Nil)) {
              if (si == 0) {
                parts ::= SeqPartial(e.event_id, List(e.ts_us))
              } else {
                val (advance, keep) = parts.partition(p =>
                  p.ts.length == si && p.ts.last < e.ts_us)
                val advanced = advance.map(p => p.copy(ts = p.ts :+ e.ts_us))
                val (done, pending) = advanced.partition(_.ts.length == k)
                out = done.map(p => SeqMatch(user, p.id0, p.ts)) ::: out
                parts = keep ::: pending
              }
            }
          }
          val newMax = inOrder.lastOption.map(_.ts_us).getOrElse(st.maxTs)
          state.update(SeqMatchState(parts, math.max(st.maxTs, newMax)))
          idleFlushMs.foreach(state.setTimeoutDuration)
          out.reverseIterator
          }
      }
  }
}
