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

  def apply(events: Dataset[SessionEvent], gapUs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          // a micro-batch delivers a group's events unordered: sort locally
          // (bounded by one user's events in one batch)
          val sorted = it.toSeq.sortBy(_.ts_us)
          var closed = List.empty[ClosedSession]
          var st = state.getOption
          for (e <- sorted) {
            st = st match {
              case Some(s) if e.ts_us - s.last_us > gapUs =>
                closed ::= ClosedSession(user, s.start_us, s.last_us, s.n)
                Some(SessionState(e.ts_us, e.ts_us, 1))
              case Some(s) =>
                Some(s.copy(last_us = e.ts_us, n = s.n + 1))
              case None =>
                Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          st.foreach(state.update)
          closed.reverse.iterator
      }
  }
}
