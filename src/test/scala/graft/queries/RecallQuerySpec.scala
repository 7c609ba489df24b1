package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The xr recall-certification queries must emit their assertion row
  * with every boolean true at the cheap fixture — the same contract
  * the driver hash-checks at sf0.01 (SketchRecallSpec floors the raw
  * recalls with more granularity; this guards the assertion-row
  * plumbing itself).
  */
class RecallQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  for (q <- Recall.queries) test(s"${q.name} asserts true at sf0.001") {
    val rows = q.fn(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Boolean]("meets_floor"), s"${q.name} floor breached")
    val nfpIdx = r.fieldIndex("no_false_pos")
    if (!r.isNullAt(nfpIdx))
      assert(r.getBoolean(nfpIdx), s"${q.name} emitted false positives")
  }
}
