package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed trailing-hour counters must equal the batch q16c
  * frame (RANGE 1h PRECEDING, inclusive) over the same time-ordered
  * events — INCLUDING frames that span micro-batch boundaries (an
  * event in batch 2 counting neighbors from batch 1), which is
  * exactly what the per-user ListState buffer exists for. Eviction
  * must also be proven: an event arriving more than an hour after its
  * predecessors counts only itself.
  */
class TrailingWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val H = 3600000000L // one hour in micros

  test("streamed trailing-hour == batch RANGE frame, across batch boundaries") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    // user 1: four events inside one hour, then one 2h later (evicts
    // everything); user 2: boundary-inclusive pair exactly 1h apart
    val batch1 = Seq(
      StreamingOps.TrailIn(1L, 102L, 10L * 60 * 1000000, 200L), // unsorted
      StreamingOps.TrailIn(1L, 101L, 0L, 100L),
      StreamingOps.TrailIn(2L, 201L, 0L, 1000L))
    val batch2 = Seq(
      StreamingOps.TrailIn(1L, 103L, 40L * 60 * 1000000, 400L), // sees 101+102
      StreamingOps.TrailIn(1L, 104L, 65L * 60 * 1000000, 800L), // 101 evicted
      StreamingOps.TrailIn(2L, 202L, H, 2000L)) // exactly 1h: 201 INCLUDED
    val batch3 = Seq(
      StreamingOps.TrailIn(1L, 105L, 185L * 60 * 1000000, 1600L)) // all evicted

    val input = MemoryStream[StreamingOps.TrailIn](s)
    val q = StreamingOps.trailingHour(input.toDS()).writeStream
      .format("memory").queryName("trail").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("trail-ckpt").toString)
      .start()
    input.addData(batch1: _*); q.processAllAvailable()
    input.addData(batch2: _*); q.processAllAvailable()
    input.addData(batch3: _*); q.processAllAvailable()
    q.stop()

    val got = s.table("trail").collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap

    // batch reference: the q16c frame computed directly
    val all = batch1 ++ batch2 ++ batch3
    val expected = all.map { e =>
      val frame = all.filter(o => o.user_id == e.user_id &&
        o.tsMicros >= e.tsMicros - H && o.tsMicros <= e.tsMicros)
      e.event_id -> (frame.length.toLong, frame.map(_.valueCents).sum)
    }.toMap
    assert(got == expected)

    // the shapes that motivate the op, asserted explicitly:
    assert(got(103L) == (3L, 700L), "boundary-spanning frame (batch 1+2)")
    assert(got(202L) == (2L, 3000L), "exactly-1h predecessor is INCLUDED")
    assert(got(104L) == (3L, 1400L), "only the older-than-1h row evicted")
    assert(got(105L) == (1L, 1600L), "full eviction leaves only self")
  }

  test("tied timestamps are peer-inclusive, like the batch RANGE frame") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    // three events share one timestamp (plus an in-hour successor):
    // a batch RANGE ... CURRENT ROW frame ends at the current row's
    // VALUE, so every tied row's frame contains all three peers —
    // regardless of event_id order within the tie
    val batch = Seq(
      StreamingOps.TrailIn(7L, 703L, 1000L, 30L), // unsorted on purpose
      StreamingOps.TrailIn(7L, 701L, 1000L, 10L),
      StreamingOps.TrailIn(7L, 702L, 1000L, 20L),
      StreamingOps.TrailIn(7L, 704L, 2000L, 40L))

    val input = MemoryStream[StreamingOps.TrailIn](s)
    val q = StreamingOps.trailingHour(input.toDS()).writeStream
      .format("memory").queryName("trail_ties").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("trail-tie-ckpt").toString)
      .start()
    input.addData(batch: _*); q.processAllAvailable()
    q.stop()

    val got = s.table("trail_ties").collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    val expected = batch.map { e =>
      val frame = batch.filter(o =>
        o.tsMicros >= e.tsMicros - H && o.tsMicros <= e.tsMicros)
      e.event_id -> (frame.length.toLong, frame.map(_.valueCents).sum)
    }.toMap
    assert(got == expected)
    assert(got(701L) == (3L, 60L) && got(702L) == (3L, 60L) &&
      got(703L) == (3L, 60L), "every tied row counts all its peers")
    assert(got(704L) == (4L, 100L))
  }
}
