package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming variants of the Q30-Q32 window shapes (SURVEY
  * §7 step 4). The transformations are defined ONCE over an unbounded
  * DataFrame and work identically on batch frames — the specs assert
  * that equivalence, and exercise watermark late-data semantics with a
  * MemoryStream.
  *
  * Streaming posture at scale: state is keyed by (window, event_type) /
  * (user, session) — partitioned by key hash across executors; the
  * watermark bounds state size (closed windows are evicted), which is
  * what makes hour-window aggregation over an unbounded 100 TB/day
  * stream feasible.
  */
object StreamingWindows {

  /** Q30 streaming form: 1-hour tumbling counts with a 30-min watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Q31 streaming form: 1-hour windows sliding every 30 minutes, with
    * a 30-min watermark. Each event lands in two open windows; the
    * watermark still bounds state because a window closes once
    * max(event time) - 30min passes its end — same eviction as the
    * tumbling case, just with 2× the concurrently-open keys.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"))

  /** Q32 streaming form via the built-in session_window. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  final case class Ev(ts: Timestamp, user_id: Long, event_type: String,
      value: Double)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Custom stateful sessionizer via flatMapGroupsWithState — the
    * escape hatch for session logic the built-in can't express (e.g.
    * value-dependent gaps, session caps). Semantics match
    * session_window for the plain 30-min gap so the spec can
    * cross-check the two. Event-time timeout keyed to the watermark
    * evicts idle sessions (bounded state).
    */
  def customSessionize(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, new Timestamp(s.start),
              new Timestamp(s.last + gapMs), s.n))
          } else {
            val sorted = it.toIndexedSeq.sortBy(_.ts.getTime)
            var out = Vector.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t < s.last + gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  out :+= Session(user, new Timestamp(s.start),
                    new Timestamp(s.last + gapMs), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.iterator
          }
      }
  }
}
