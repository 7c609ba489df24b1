package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static incremental dedup: arriving docs matched against the
  * static corpus mask index, verified against a brute-force Jaccard
  * replay — including out-of-vocabulary tokens (which must count in
  * the set size but can never intersect) and replay determinism.
  */
class IncrementalStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (10L, "alpha beta gamma delta epsilon"),
    (11L, "alpha beta gamma delta epsilon"), // exact dup of 10 (same set)
    (12L, "alpha beta gamma delta zeta"),
    (13L, "one two three four five six seven"))

  private val batch = Seq(
    (100L, "alpha beta gamma delta epsilon"), // J=1 vs {10,11}; 0.67 vs 12
    (101L, "alpha beta gamma delta zeta qq"), // OOV token qq: J=5/6 vs 12
    (102L, "totally different words here")) // no match

  private def jaccard(a: Set[String], b: Set[String]): Double =
    (a intersect b).size.toDouble / (a union b).size

  private def expected(threshold: Double): Set[(Long, Long, Double)] = {
    val corpusSets = corpus.map { case (id, t) => (id, t.split(" ").toSet) }
      .groupBy(_._2).map { case (s, ms) => (s, ms.map(_._1).min) }
    (for {
      (db, tb) <- batch
      (sa, minId) <- corpusSets
      j = jaccard(sa, tb.split(" ").toSet)
      if j >= threshold
    } yield (db, minId,
      BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
  }

  test("stream-static dedup matches brute force, incl. OOV tokens") {
    val Some((index, vocab)) =
      graft.queries.Dedup.maskIndex(corpus.toDF("doc_id", "text"))
    val input = MemoryStream[(Long, String)](spark)
    input.addData(batch: _*)
    val out = StreamingOps.incrementalDedup(
      input.toDF().toDF("doc_id", "text"), index, vocab, 0.8)
    val q = out.writeStream.format("memory").queryName("incdedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("incdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected(0.8))
    assert(got.exists(_._1 == 101L), "OOV doc must still match at 5/6")
    assert(!got.exists(_._1 == 102L))
    index.unpersist()
  }

  test("the stateless plan has no state store operators") {
    val Some((index, vocab)) =
      graft.queries.Dedup.maskIndex(corpus.toDF("doc_id", "text"))
    val input = MemoryStream[(Long, String)](spark)
    input.addData(batch: _*)
    val out = StreamingOps.incrementalDedup(
      input.toDF().toDF("doc_id", "text"), index, vocab, 0.8)
    val q = out.writeStream.format("memory").queryName("incplan")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val plan = q.lastProgress.toString
    assert(!plan.contains("stateOperators\" : [ {"),
      s"expected no state operators:\n$plan")
    index.unpersist()
  }
}
