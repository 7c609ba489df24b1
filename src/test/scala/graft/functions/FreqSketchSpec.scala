package graft.functions

import graft.SparkTestSession
import graft.queries.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Misra-Gries sketch guarantees: exactness when cap >= vocabulary
  * (including invariance to partitioning), and the trueCount − N/cap
  * error bound with all true heavy hitters retained under pressure.
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("sketch top-10 equals exact top-10 on the fixture (cap >= vocab)") {
    val exact = TextAnalysis.xt7.fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val sk = TextAnalysis.xt8.fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(sk.toSeq == exact.toSeq)
  }

  /** Skewed synthetic stream: term "hot" = half the stream, 200 cold
    * terms once each. cap=8 forces constant decrements.
    */
  private def skewed = {
    import spark.implicits._
    val rows =
      (0 until 200).map(i => ("x", f"hot")) ++
        (0 until 200).map(i => ("x", f"cold$i%03d"))
    rows.toDF("g", "term")
  }

  test("under pressure: heavy hitter retained, est within N/cap of truth") {
    import spark.implicits._
    val sk = udaf(new FreqSketch(8), org.apache.spark.sql.Encoders.STRING)
    val out = skewed.repartition(4, col("term"))
      .groupBy("g").agg(sk(col("term")).as("s"))
      .select(explode(col("s")).as("tc"))
      .select($"tc.term", $"tc.est").as[(String, Long)].collect().toMap
    val n = 400L
    val err = n / 8
    assert(out.contains("hot"), "frequency-0.5 term must survive cap=8")
    assert(out("hot") <= 200L, "MG never overestimates")
    assert(out("hot") >= 200L - err, s"est ${out("hot")} below 200 - $err")
    // no estimate may exceed its true count
    out.foreach { case (t, e) =>
      val truth = if (t == "hot") 200L else 1L
      assert(e <= truth, s"$t overestimated: $e > $truth")
    }
  }

  test("cap >= vocab: exact counts, invariant under partitioning") {
    import spark.implicits._
    val sk = udaf(new FreqSketch(512), org.apache.spark.sql.Encoders.STRING)
    def run(parts: Int) = skewed.repartition(parts)
      .groupBy("g").agg(sk(col("term")).as("s"))
      .select(explode(col("s")).as("tc"))
      .select($"tc.term", $"tc.est").as[(String, Long)].collect().toMap
    val a = run(1)
    val b = run(8)
    assert(a == b)
    assert(a("hot") == 200L)
    assert(a("cold000") == 1L)
  }
}
