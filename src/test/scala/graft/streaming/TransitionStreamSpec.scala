package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed transition chain must converge to the batch xe3
  * accounting over the same events — INCLUDING the steps that span a
  * micro-batch boundary (a user's last event of batch 1 chained to
  * their first of batch 2), which is exactly what per-batch window
  * computation would miss and what the per-user ValueState exists
  * for. Also: unordered arrival WITHIN a batch must not corrupt the
  * chain (rows are sorted per key per batch).
  */
class TransitionStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streamed steps == batch chain, across batch boundaries") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    // two users; batch 1 deliberately UNSORTED within each user,
    // batch 2 continues both chains across the boundary
    val batch1 = Seq(
      StreamingOps.EvIn(1L, 102L, 2000L, "click"), // out of order on purpose
      StreamingOps.EvIn(1L, 101L, 1000L, "view"),
      StreamingOps.EvIn(2L, 201L, 1500L, "view"),
      StreamingOps.EvIn(1L, 103L, 3000L, "cart"))
    val batch2 = Seq(
      StreamingOps.EvIn(1L, 104L, 4000L, "purchase"), // chains from cart
      StreamingOps.EvIn(2L, 202L, 2500L, "click"), // chains from view
      StreamingOps.EvIn(2L, 203L, 3500L, "purchase"))

    val input = MemoryStream[StreamingOps.EvIn](s)
    val out = StreamingOps.transitionSteps(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("steps").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chain-ckpt").toString)
      .start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val got = s.table("steps").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

    // batch accounting: per user, ordered by (ts, event_id)
    val all = batch1 ++ batch2
    val expected = all.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      evs.sortBy(e => (e.tsMicros, e.event_id)).sliding(2)
        .collect { case Seq(a, b) => (u, a.event_type, b.event_type) }
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == expected)

    // the boundary-spanning steps are present — a per-batch window
    // could never emit these
    assert(got.contains((1L, "cart", "purchase")))
    assert(got.contains((2L, "view", "click")))
    // total steps = events - users (every event but each user's first)
    assert(got.values.sum ==
      (all.length - all.map(_.user_id).distinct.length).toLong)
  }
}
