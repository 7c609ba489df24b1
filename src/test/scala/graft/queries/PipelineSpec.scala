package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the composed curation pipelines that hold regardless
  * of fixture content: stage counts are monotone non-increasing in
  * pipeline order, caps hold, and a re-run selects identical survivors
  * (the determinism the 100 TB reproducibility story rests on).
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("xp2 stage censuses are monotone and caps hold") {
    val rows = Pipeline.xp2.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRaw, nQ, nClean, nKept, nFinal) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nRaw >= nQ && nQ >= nClean && nClean >= nKept && nKept >= nFinal,
        s"non-monotone stages for lang ${r.getString(0)}: $r")
      assert(nFinal <= 40, s"cap violated: $r")
      val totalTokens = r.getLong(6)
      // every surviving doc passed the >= 20 token quality gate
      assert(totalTokens >= nFinal * 20, s"token floor violated: $r")
    }
  }

  test("xp2 is deterministic across runs") {
    val a = Pipeline.xp2.fn(spark, sf).collect().toSeq
    val b = Pipeline.xp2.fn(spark, sf).collect().toSeq
    assert(a == b)
  }
}
