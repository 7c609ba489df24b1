package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming incremental rollup (xi1's streaming form): orders arrive
  * in micro-batches, each batch lands per-(month, status) partials in
  * an append-only batch_id-partitioned log, and the merged report must
  * be BIT-EQUAL to the direct batch aggregation (xi1) over the same
  * rows — plus idempotence under batch replay.
  */
class RollupStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private type OrderRow = (Long, java.sql.Timestamp, String, Double)

  private def orderRows(): Seq[OrderRow] =
    spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_orderstatus", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))
      .toSeq

  private def report(path: String): Map[String, (Long, Double, Double, Double, Double)] =
    StreamingOps.rollupReport(spark.read.parquet(path)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

  test("streamed partial rollup is bit-equal to the direct batch aggregation") {
    val rows = orderRows()
    val dir = Files.createTempDirectory("rollup").toString
    val path = s"$dir/partials"
    val ckpt = s"$dir/ckpt"
    // three arrivals on ONE source; each AvailableNow run drains what
    // arrived since the last one, resuming from the shared checkpoint
    val input = MemoryStream[OrderRow](spark)
    for (chunk <- rows.grouped((rows.size + 2) / 3)) {
      input.addData(chunk: _*)
      val q = StreamingOps.rollupSink(
        input.toDF().toDF("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"),
        path, ckpt)
      q.awaitTermination(60000)
    }
    val streamed = report(path)
    val direct = graft.queries.Aggregates.xi1.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(streamed == direct)
    // partial log stays aggregate-sized: at most (months x statuses)
    // rows per batch, independent of the batch's row count
    val nPartials = spark.read.parquet(path).count()
    val nGroups = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("date_trunc('month', o_orderdate)", "o_orderstatus")
      .distinct().count()
    assert(nPartials <= 3 * nGroups, s"partial log $nPartials rows not aggregate-sized")
  }

  test("a replayed batch overwrites its own partition - no double count") {
    val rows = orderRows()
    val dir = Files.createTempDirectory("rollup-replay").toString
    val path = s"$dir/partials"
    val firstBatch = rows.take(rows.size / 2).toDF(
      "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
    val rest = rows.drop(rows.size / 2).toDF(
      "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
    StreamingOps.writeBatch(StreamingOps.orderPartials(firstBatch), 0L, path)
    StreamingOps.writeBatch(StreamingOps.orderPartials(rest), 1L, path)
    val before = report(path)
    // at-least-once delivery replays batch 0 after a crash: same data,
    // same batch id - the dynamic partition overwrite must be a no-op
    StreamingOps.writeBatch(StreamingOps.orderPartials(firstBatch), 0L, path)
    assert(report(path) == before)
  }
}
