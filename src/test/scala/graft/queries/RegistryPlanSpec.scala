package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Whole-registry plan hygiene — the two structural scale-killers are
  * banned for EVERY declared query, not just the ones a reviewer
  * happened to read:
  *
  *  - CartesianProduct: a non-broadcast cross product shuffles n×m
  *    rows; every intended cross shape in the repo rides a broadcast
  *    nested-loop join or an equi-key instead.
  *  - data-sized global windows: a Window with an empty PARTITION BY
  *    funnels the whole input through one task. The whitelisted
  *    cases run over a ~600-row histogram and a months-sized
  *    per-batch table (sketch/batch-count-sized by construction,
  *    constant in corpus size).
  *
  * Building each query's DataFrame executes only driver-bounded prep
  * (vocab probes, k-means on K rows); no query result is materialized.
  */
class RegistryPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Global windows that are provably bounded, not fact-table-sized:
    *  - xi2/xi3: histogram-/batch-count-sized by construction
    *  - xv4: the window input is a LIMIT 20 top-k — constant
    *  - q64: empty-frame total over ONE nation's per-part aggregate
    *    (1/25 of the part dimension; the alternative scalar-subquery
    *    form recomputes the 600k-row supply chain twice — see q64's
    *    scaladoc for the extreme-cardinality escape hatch)
    */
  /** xe7's carry window and xe8's trailing-baseline ROWS frame both
    * run over DISTINCT HOUR BUCKETS (time-range-sized: 8.8k rows/year
    * at any corpus size), never the event stream.
    */
  /** xc11/xc12 no longer need whitelisting: their packed offset runs
    * the RECURSIVE prefix sum (Curation.exclusivePrefix) whose only
    * empty-PARTITION-BY window is over a <= 1024-row base case at any
    * corpus size — and their reap{} checkpoint means the inspected
    * plan here is the materialized scan anyway. ExclusivePrefixSpec
    * pins the recursion's window discipline directly.
    */
  private val globalWindowOk =
    Set("xi2_incremental_quantiles", "xi3_incremental_join",
      "xv4_key_skew", "q64_sql_tpch11", "xe7_peak_concurrency",
      "xe8_hourly_anomaly")

  test("no declared query plans a CartesianProduct or a data-sized global window") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    Registry.all.foreach { q =>
      val df = q.fn(spark, sf)
      val physical = df.queryExecution.executedPlan.toString
      if (physical.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct"
      val globalWindows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      if (globalWindows.nonEmpty && !globalWindowOk(q.name))
        offenders += s"${q.name}: global window"
      spark.catalog.clearCache()
    }
    assert(offenders.isEmpty, s"plan hygiene violations:\n${offenders.mkString("\n")}")
  }
}
