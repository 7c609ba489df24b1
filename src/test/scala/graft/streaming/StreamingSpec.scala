package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Behavioral streaming tests (SURVEY §5.2.3): batch/stream
  * transformation equivalence, watermark late-data drop, custom
  * stateful sessionization vs the built-in session_window.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runToCompletion(name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
  }

  test("streaming tumbling counts == batch transformation on closed windows") {
    val input = MemoryStream[StreamingWindows.Ev](spark)
    val events = Seq(
      StreamingWindows.Ev(ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      StreamingWindows.Ev(ts("2024-01-01 10:45:00"), 1, "click", 2.0),
      StreamingWindows.Ev(ts("2024-01-01 11:10:00"), 2, "view", 3.0),
      StreamingWindows.Ev(ts("2024-01-01 13:00:00"), 2, "view", 4.0))
    input.addData(events: _*)
    runToCompletion("tumbling", StreamingWindows.tumblingCounts(input.toDF()))
    val streamed = spark.table("tumbling")
      .select("window_start", "event_type", "n_events").collect().toSet
    // batch over the same rows; windows still open at end-of-stream
    // (watermark = max ts - 30min = 12:30 -> the 13:00 window is open)
    val batch = StreamingWindows.tumblingCounts(events.toDF())
      .filter(col("window_end") <= ts("2024-01-01 12:30:00"))
      .select("window_start", "event_type", "n_events").collect().toSet
    assert(streamed == batch)
    assert(streamed.size == 2) // 10:00 click window (2 events), 11:00 view
  }

  test("streaming sliding counts == batch transformation on closed windows") {
    val input = MemoryStream[StreamingWindows.Ev](spark)
    val events = Seq(
      StreamingWindows.Ev(ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      StreamingWindows.Ev(ts("2024-01-01 10:45:00"), 1, "click", 2.0),
      StreamingWindows.Ev(ts("2024-01-01 11:10:00"), 2, "view", 3.0),
      StreamingWindows.Ev(ts("2024-01-01 14:00:00"), 2, "view", 4.0))
    input.addData(events: _*)
    runToCompletion("sliding", StreamingWindows.slidingCounts(input.toDF()))
    val streamed = spark.table("sliding")
      .select("window_start", "window_end", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
    // watermark = max ts - 30min = 13:30: every window ending <= 13:30
    // is closed and emitted; the 14:00 event's two windows stay open
    val batch = StreamingWindows.slidingCounts(events.toDF())
      .filter(col("window_end") <= ts("2024-01-01 13:30:00"))
      .select("window_start", "window_end", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // 10:05 -> [9:30,10:30)+[10:00,11:00); 10:45 -> [10:00,11:00)+[10:30,11:30);
    // 11:10 -> [10:30,11:30)+[11:00,12:00): 4 distinct closed windows
    assert(streamed.size == 4)
    assert(streamed.contains((ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00"), 2L)))
  }

  test("streaming dedup emits each event_id once, watermark bounds state") {
    val input = MemoryStream[StreamingOps.IdEv](spark)
    input.addData(
      StreamingOps.IdEv(ts("2024-01-01 10:00:00"), 1, "click", 100),
      StreamingOps.IdEv(ts("2024-01-01 10:01:00"), 1, "click", 100), // replay
      StreamingOps.IdEv(ts("2024-01-01 10:02:00"), 2, "view", 101),
      StreamingOps.IdEv(ts("2024-01-01 10:02:00"), 2, "view", 101), // exact dup
      StreamingOps.IdEv(ts("2024-01-01 10:03:00"), 3, "click", 102))
    runToCompletion("dedup", StreamingOps.dedupEvents(input.toDF()))
    val out = spark.table("dedup").select("event_id").collect().map(_.getLong(0))
    assert(out.sorted.toSeq == Seq(100L, 101L, 102L))
  }

  test("stream-stream click->view join within 1 hour, per user") {
    val clicks = MemoryStream[StreamingOps.IdEv](spark)
    val views = MemoryStream[StreamingOps.IdEv](spark)
    clicks.addData(
      StreamingOps.IdEv(ts("2024-01-01 10:00:00"), 1, "click", 1),
      StreamingOps.IdEv(ts("2024-01-01 12:00:00"), 2, "click", 2))
    views.addData(
      StreamingOps.IdEv(ts("2024-01-01 10:30:00"), 1, "view", 10), // joins click 1
      StreamingOps.IdEv(ts("2024-01-01 11:30:00"), 1, "view", 11), // > 1h after click 1
      StreamingOps.IdEv(ts("2024-01-01 12:15:00"), 2, "view", 12), // joins click 2
      StreamingOps.IdEv(ts("2024-01-01 12:20:00"), 3, "view", 13)) // no click for user 3
    runToCompletion("ssjoin",
      StreamingOps.clickThenView(clicks.toDF(), views.toDF()))
    val out = spark.table("ssjoin").select("click_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 12L)))
  }

  test("foreachBatch sink: replayed batch overwrites its partition, no duplicates") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val events = Seq(
      StreamingOps.IdEv(ts("2024-01-01 10:00:00"), 1, "click", 1),
      StreamingOps.IdEv(ts("2024-01-01 10:01:00"), 2, "view", 2),
      StreamingOps.IdEv(ts("2024-01-01 10:02:00"), 3, "click", 3))
    val input = MemoryStream[StreamingOps.IdEv](spark)
    input.addData(events: _*)
    val q = StreamingOps.sinkExactlyOnce(input.toDF(), out, ckpt)
    q.awaitTermination(60000)
    val first = spark.read.parquet(out).count()
    assert(first == 3)
    // simulate at-least-once redelivery: the same batch lands again
    StreamingOps.writeBatch(events.toDF().drop("batch_id"), 0, out)
    val after = spark.read.parquet(out)
    assert(after.count() == first) // overwritten, not appended
    assert(after.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("late event beyond the watermark is dropped") {
    val input = MemoryStream[StreamingWindows.Ev](spark)
    input.addData(
      StreamingWindows.Ev(ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      StreamingWindows.Ev(ts("2024-01-01 13:00:00"), 1, "click", 1.0))
    val q1 = StreamingWindows.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("late")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(60000)
    // watermark now 12:30; this event's window (9:00-10:00) is closed
    input.addData(StreamingWindows.Ev(ts("2024-01-01 09:30:00"), 1, "click", 9.0))
    val qq = StreamingWindows.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("late2")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    qq.awaitTermination(60000)
    val all = spark.table("late").union(spark.table("late2"))
    assert(all.filter(col("window_start") === ts("2024-01-01 09:00:00")).isEmpty,
      "late event must not open a closed window")
  }

  test("custom flatMapGroupsWithState sessionizer matches session_window") {
    val events = Seq(
      StreamingWindows.Ev(ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      StreamingWindows.Ev(ts("2024-01-01 10:10:00"), 1, "a", 1.0),
      StreamingWindows.Ev(ts("2024-01-01 11:30:00"), 1, "a", 1.0),
      StreamingWindows.Ev(ts("2024-01-01 10:00:00"), 2, "a", 1.0))
    // streaming custom sessionizer
    val input = MemoryStream[StreamingWindows.Ev](spark)
    input.addData(events: _*)
    // a final far-future event per user closes all sessions via timeout
    input.addData(
      StreamingWindows.Ev(ts("2024-01-02 10:00:00"), 1, "a", 0.0),
      StreamingWindows.Ev(ts("2024-01-02 10:00:00"), 2, "a", 0.0))
    runToCompletion("sessions",
      StreamingWindows.customSessionize(input.toDS()).toDF())
    val custom = spark.table("sessions")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().toSet
    // batch session_window over only the original events
    val builtin = StreamingWindows.sessionCounts(events.toDF())
      .collect().toSet
    assert(builtin.subsetOf(custom),
      s"built-in sessions $builtin must appear in custom $custom")
  }
}
