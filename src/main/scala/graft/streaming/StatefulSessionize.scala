package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom streaming state via `flatMapGroupsWithState` (SURVEY §2.9 / the
 * training-pipeline brief's `KeyValueGroupedDataset` state ops): per-user
 * sessionization with an inactivity gap, emitting one row per CLOSED
 * session while the open session's state persists across micro-batches in
 * the state store (checkpointed, exactly the semantics the incremental
 * server gets from its job state table).
 *
 * This is the streaming twin of the batch `w2_sessionize` window query —
 * same gap rule, but incremental: a session spanning many micro-batches
 * costs one small state row per user, not a re-aggregation of history.
 */
final case class SessionEvent(user_id: Long, ts_us: Long)
final case class SessionState(start_us: Long, last_us: Long, n: Long)
final case class ClosedSession(
    user_id: Long, start_us: Long, end_us: Long, n_events: Long)

object StatefulSessionize {

  /** @param gapUs       event-time inactivity gap that closes a session
    * @param idleFlushMs when set, a processing-time timeout flushes (and
    *                    removes) the state of users who go quiet — without
    *                    it a user's final session never emits and per-user
    *                    state grows with every user_id ever seen. Opt-in
    *                    because ProcessingTimeTimeout makes the engine run
    *                    no-data micro-batches continuously
    *                    (`shouldRunAnotherBatch` is always true), which
    *                    also means `processAllAvailable` never settles —
    *                    deployments using it drive the query by trigger. */
  def apply(events: Dataset[SessionEvent], gapUs: Long,
      idleFlushMs: Option[Long] = None): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleFlushMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle flush: emit the open session and free the state row
            val flushed = state.getOption.map(s =>
              ClosedSession(user, s.start_us, s.last_us, s.n))
            state.remove()
            flushed.iterator
          } else {
            // a micro-batch delivers a group's events unordered: sort
            // locally (bounded by one user's events in one batch)
            val sorted = it.toSeq.sortBy(_.ts_us)
            var closed = List.empty[ClosedSession]
            var st = state.getOption
            for (e <- sorted) {
              st = st match {
                case Some(s) if e.ts_us - s.last_us > gapUs =>
                  closed ::= ClosedSession(user, s.start_us, s.last_us, s.n)
                  Some(SessionState(e.ts_us, e.ts_us, 1))
                case Some(s) =>
                  // a LATE event (cross-batch disorder) folds into the
                  // session without rewinding its frontier — a backwards
                  // last_us would make the next on-time event split the
                  // session spuriously
                  Some(SessionState(math.min(s.start_us, e.ts_us),
                    math.max(s.last_us, e.ts_us), s.n + 1))
                case None =>
                  Some(SessionState(e.ts_us, e.ts_us, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              idleFlushMs.foreach(state.setTimeoutDuration)
            }
            closed.reverse.iterator
          }
      }
  }
}
