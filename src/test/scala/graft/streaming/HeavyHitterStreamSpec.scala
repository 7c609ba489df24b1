package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming heavy hitters: the sketch-as-state operator must converge
  * to the batch answer — after the stream drains, each language's
  * latest emitted top-10 equals xt7's exact top-10 (cap ≥ vocab), and
  * the state never exceeds groups × cap.
  */
class HeavyHitterStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed top-10 per language converges to the exact batch answer") {
    import org.apache.spark.sql.functions._
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), explode(graft.queries.Llm.tokens(spark, col("text"))).as("term"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

    val input = MemoryStream[(String, String)](spark)
    val ds = input.toDS().map { case (l, t) => StreamingOps.LangTok(l, t) }
    val q = StreamingOps.topTermsStream(ds, cap = 512, k = 10)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())

    // three arrivals; each AvailableNow drains what arrived since the
    // last run, exercising state carry-over across batches
    for (chunk <- toks.grouped((toks.size + 2) / 3)) {
      input.addData(chunk: _*)
      q.start().awaitTermination(60000)
    }

    // latest snapshot per lang = the row with max n (n is monotone)
    val snap = spark.table("hh")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2)))
      .groupBy(_._1).map { case (lang, rows) => lang -> rows.maxBy(_._2)._3 }
    val streamed = snap.flatMap { case (lang, top) =>
      top.zipWithIndex.map { case (tc, i) =>
        (lang, tc.getString(0), tc.getLong(1), i + 1)
      }
    }.toSet

    val exact = graft.queries.TextAnalysis.xt7.fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(streamed == exact)
  }
}
