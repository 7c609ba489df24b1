package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed last-touch attribution must converge to batch xe4's
  * accounting over the same events — including purchases whose
  * touchpoint landed in an EARLIER micro-batch (the per-user
  * ValueState's reason to exist), purchases with no preceding
  * touchpoint (dropped, as the batch filter drops channel IS NULL),
  * and consecutive purchases sharing one touchpoint (the window's
  * ignoreNulls carry-forward semantics).
  */
class AttributionStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streamed attribution == batch carry-forward, across batch boundaries") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._

    // user 1: touch in batch 1, purchase in batch 2 (boundary credit);
    //         then a SECOND purchase with no new touch (same channel).
    // user 2: purchase FIRST (no touchpoint -> dropped), then
    //         touch + purchase inside one unordered batch.
    val batch1 = Seq(
      StreamingOps.AttrIn(1L, 102L, 2000000L, "click", 0L),
      StreamingOps.AttrIn(1L, 101L, 1000000L, "view", 0L),
      StreamingOps.AttrIn(2L, 201L, 1000000L, "purchase", 500L))
    val batch2 = Seq(
      StreamingOps.AttrIn(1L, 103L, 5000000L, "purchase", 1000L),
      StreamingOps.AttrIn(1L, 104L, 9000000L, "purchase", 700L),
      // deliberately unordered: purchase row first, its touch second
      StreamingOps.AttrIn(2L, 203L, 8000000L, "purchase", 300L),
      StreamingOps.AttrIn(2L, 202L, 6000000L, "view", 0L))

    val input = MemoryStream[StreamingOps.AttrIn](s)
    val out = StreamingOps.attributedPurchases(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("attr").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("attr-ckpt").toString)
      .start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val got = s.table("attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
      .toSet

    // batch xe4 accounting: per user ordered by (ts, event_id), each
    // purchase takes the latest preceding non-purchase
    val all = batch1 ++ batch2
    val expected = all.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      val ordered = evs.sortBy(e => (e.tsMicros, e.event_id))
      ordered.zipWithIndex.collect {
        case (e, i) if e.event_type == "purchase" =>
          ordered.take(i).reverse.find(_.event_type != "purchase").map(src =>
            (u, e.event_id, src.event_type, e.valueCents,
              (e.tsMicros - src.tsMicros) / 1000000L))
      }.flatten
    }.toSet
    assert(got == expected)
    // the boundary-spanning credit exists and the orphan purchase does not
    assert(got.exists(a => a._1 == 1L && a._2 == 103L && a._3 == "click"))
    assert(!got.exists(a => a._2 == 201L))
    // consecutive purchases share the batch-1 touchpoint
    assert(got.exists(a => a._2 == 104L && a._3 == "click"))
  }

  test("touchpoint state survives a query restart from the checkpoint") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("attr-restart").toString

    // query #1: user 7's click commits in batch 0, an unrelated event
    // in batch 1, then the query STOPS
    val click = StreamingOps.AttrIn(7L, 701L, 1000000L, "click", 0L)
    val other = StreamingOps.AttrIn(8L, 801L, 2000000L, "view", 0L)
    // the memory sink refuses checkpoint recovery; foreachBatch into a
    // driver-side buffer supports it (batches run sequentially on the
    // stream thread, so a plain buffer is safe)
    val rows = scala.collection.mutable.ArrayBuffer.empty[StreamingOps.Attr]
    val in1 = MemoryStream[StreamingOps.AttrIn](s)
    val q1 = StreamingOps.attributedPurchases(in1.toDS()).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingOps.Attr],
          _: Long) => { rows ++= df.collect(); () } }
      .option("checkpointLocation", ckpt).start()
    in1.addData(click)
    q1.processAllAvailable()
    in1.addData(other)
    q1.processAllAvailable()
    q1.stop()

    // query #2: fresh source pre-filled to the committed offset (those
    // batches are NOT re-executed — at most the last one replays, and
    // it carries only user 8), SAME checkpoint. User 7's purchase must
    // attribute to the click that exists ONLY in the restored RocksDB
    // state, never in this run's input.
    rows.clear()
    val in2 = MemoryStream[StreamingOps.AttrIn](s)
    in2.addData(click)
    in2.addData(other)
    val q2 = StreamingOps.attributedPurchases(in2.toDS()).writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingOps.Attr],
          _: Long) => { rows ++= df.collect(); () } }
      .option("checkpointLocation", ckpt).start()
    q2.processAllAvailable()
    in2.addData(StreamingOps.AttrIn(7L, 702L, 4000000L, "purchase", 900L))
    q2.processAllAvailable()
    q2.stop()

    val got = rows.map(a =>
      (a.user_id, a.event_id, a.channel, a.valueCents, a.latencySec)).toSet
    assert(got == Set((7L, 702L, "click", 900L, 3L)),
      s"state did not survive the restart: $got")
  }
}
