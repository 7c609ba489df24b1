package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Spill-path correctness (SURVEY §6 "spill-aware"): at 100 TB the
  * buffered operators — window frames, the ObjectHashAggregate
  * sort-based fallback, sort-merge-join stream buffers — WILL spill;
  * local-mode runs at fixture scale never trigger it, so the spill
  * code path would ship unexercised. Spark exposes per-operator
  * row-count thresholds that make spilling deterministic: force every
  * buffer to spill after 2 rows and assert the results are
  * bit-identical to the in-memory plans. Covers: q16 (running +
  * sliding frames), q03b (sort-based exact median), q17 (ntile/
  * percent_rank distribution windows), q07 (multi-way join re-planned
  * as SMJ with broadcasts disabled), q32 (session windows).
  */
class SpillSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val spillConfs = Seq(
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "2",
    "spark.sql.windowExec.buffer.spill.threshold" -> "2",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "2",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "2")

  private def withConfs[A](pairs: Seq[(String, String)])(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("forced operator spills leave every result bit-identical") {
    val queries = Seq(Windows.q16, Aggregates.q03b, Windows.q17,
      Joins.q07, EventOps.q32)
    def run() = queries.map(q => q.fn(spark, sf).collect().map(_.toString).toSeq)
    val inMemory = run()
    val spilled = withConfs(spillConfs)(run())
    for (((a, b), q) <- inMemory.zip(spilled).zip(queries))
      assert(a == b, s"${q.name}: spilled result diverged")
  }

  test("SMJ path (broadcasts disabled) still matches under forced spill") {
    def rows() = Joins.q07.fn(spark, sf).collect().map(_.toString).toSeq
    val base = rows()
    withConfs(spillConfs :+
      ("spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      assert(rows() == base, "SMJ spill path diverged")
    }
  }
}
