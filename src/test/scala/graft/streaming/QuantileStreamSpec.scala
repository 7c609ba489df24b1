package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming incremental quantiles (xi2's streaming form): orders
  * arrive in micro-batches, each batch lands fixed-width histogram
  * partials in the batch_id-partitioned log, and the merged quantile
  * report must be BIT-EQUAL to the direct batch query (xi2) over the
  * same rows — the histogram merge is exact integer math, so streaming
  * order cannot perturb it. Plus idempotence under batch replay.
  */
class QuantileStreamSpec extends AnyFunSuite {
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

  private def report(path: String): Seq[(Double, Long, Double, Double, Long, Long)] =
    StreamingOps.quantileReport(spark.read.parquet(path)).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
      .toSeq

  test("streamed histogram quantiles are bit-equal to the batch query") {
    val rows = orderRows()
    val dir = Files.createTempDirectory("qhist").toString
    val path = s"$dir/partials"
    val ckpt = s"$dir/ckpt"
    val input = MemoryStream[OrderRow](spark)
    for (chunk <- rows.grouped((rows.size + 2) / 3)) {
      input.addData(chunk: _*)
      val q = StreamingOps.histSink(
        input.toDF().toDF("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"),
        path, ckpt)
      q.awaitTermination(60000)
    }
    val streamed = report(path)
    val direct = graft.queries.Aggregates.xi2.fn(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(streamed == direct)
    // the log stays histogram-sized: <= bins rows per batch
    val nBins = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("floor(o_totalprice / 1000.0)").distinct().count()
    assert(spark.read.parquet(path).count() <= 3 * nBins)
  }

  test("a replayed histogram batch is a no-op (idempotent partition overwrite)") {
    val rows = orderRows()
    val dir = Files.createTempDirectory("qhist-replay").toString
    val path = s"$dir/partials"
    val half = rows.take(rows.size / 2).toDF(
      "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
    val rest = rows.drop(rows.size / 2).toDF(
      "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
    StreamingOps.writeBatch(StreamingOps.priceHistPartials(half), 0L, path)
    StreamingOps.writeBatch(StreamingOps.priceHistPartials(rest), 1L, path)
    val before = report(path)
    StreamingOps.writeBatch(StreamingOps.priceHistPartials(half), 0L, path)
    assert(report(path) == before)
  }
}
