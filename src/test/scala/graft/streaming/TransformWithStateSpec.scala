package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState running totals must converge to the batch
  * groupBy answer exactly (integer-cents accumulation is order-free),
  * keep ONE state entry per key regardless of event count, and keep
  * counting across micro-batches (state survives batch boundaries in
  * the RocksDB store).
  */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("running totals converge to the batch answer across micro-batches") {
    val s = spark.newSession()
    // transformWithState requires the RocksDB state store provider
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    val input = MemoryStream[(Long, Long)](s)
    val out = StreamingOps.runningTotals(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("twstotals").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws-ckpt").toString)
      .start()

    val batch1 = Seq((1L, 100L), (1L, 250L), (2L, 40L))
    val batch2 = Seq((1L, 50L), (3L, 7L), (2L, 60L))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // latest snapshot per key (memory sink accumulates update rows)
    val got = s.table("twstotals")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct("n", "sum_c")).as("t"))
      .select("user_id", "t.n", "t.sum_c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val expected = (batch1 ++ batch2).groupBy(_._1)
      .map { case (k, vs) => (k, vs.size.toLong, vs.map(_._2).sum) }.toSet
    assert(got == expected)
  }
}
