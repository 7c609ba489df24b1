package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract surface itself: entry() must return rows on the
  * sf0.001 fixture (the driver's smoke check), and the queries/oracle
  * maps must stay aligned with the registry — a broken entry or a
  * query/oracle key mismatch would fail the external gate before any
  * correctness comparison even runs.
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("entry() returns rows on sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys align with the registry") {
    assert(SparkEntry.queries.keySet ==
      graft.queries.Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.nonEmpty)
  }
}
