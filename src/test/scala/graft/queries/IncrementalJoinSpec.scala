package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** xi3's incremental-view contract, proved by running the actual
  * delta-maintenance accounting over the sf0.001 fixture: for each
  * batch t, the three delta terms
  *
  *   ΔA_t ⋈ B_{<t},  A_{<t} ⋈ ΔB_t,  ΔA_t ⋈ ΔB_t
  *
  * are pairwise DISJOINT, their union is exactly the pairs with
  * max(t_a, t_b) = t (what the query reports as pairs_added), and
  * the accumulated view after every batch equals the direct join of
  * the prefix — i.e. maintenance never loses, duplicates, or
  * re-materializes a pair, which is the whole claim of incremental
  * join maintenance.
  */
class IncrementalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("delta terms are disjoint, exactly-once, and sum to the view") {
    val c = Ctx(spark, sf)
    val orders = c.orders.select(col("o_orderkey"),
      date_trunc("month", col("o_orderdate")).cast("date").as("ob"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString))
    val lines = c.lineitem.select(col("l_orderkey"), col("l_linenumber"),
      date_trunc("month", col("l_shipdate")).cast("date").as("lb"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDate(2).toString))

    val byKeyO = orders.groupBy(_._1)
    // the fixture's lineitem does NOT keep TPC-H's (orderkey,
    // linenumber) uniqueness (1161 duplicate pairs at sf0.001), so a
    // pair's identity is the physical line ROW (its index) — exactly
    // the multiset semantics the join materializes
    def mx(a: String, b: String): String = if (a >= b) a else b
    val full = (for {
      ((lk, _, lb), idx) <- lines.zipWithIndex
      (_, ob) <- byKeyO.getOrElse(lk, Array.empty)
    } yield (idx, ob, lb)).toArray
    val batches = full.map(p => mx(p._2, p._3)).distinct.sorted

    // the query's per-batch report
    val q = Joins.xi3.fn(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(3)))).toMap
    assert(q.keySet == batches.toSet, "query batches == delta batches")

    var view = Set.empty[(Int, String, String)]
    var cum = 0L
    batches.foreach { t =>
      val dAB = full.filter(p => p._2 == t && p._3 < t) // ΔA ⋈ B_<t
      val ABd = full.filter(p => p._2 < t && p._3 == t) // A_<t ⋈ ΔB
      val dABd = full.filter(p => p._2 == t && p._3 == t) // ΔA ⋈ ΔB
      val terms = Seq(dAB, ABd, dABd).map(_.toSet)
      // pairwise disjoint
      assert(terms.combinations(2).forall { case Seq(a, b) => (a & b).isEmpty })
      val delta = terms.reduce(_ ++ _)
      // exactly the max(ta,tb)=t slice, none already materialized
      assert(delta == full.filter(p => mx(p._2, p._3) == t).toSet)
      assert((view & delta).isEmpty, s"batch $t re-materializes pairs")
      view ++= delta
      cum += delta.size
      // the view after batch t IS the direct join of the prefix
      assert(view == full.filter(p => p._2 <= t && p._3 <= t).toSet)
      // and the query's report agrees
      val (pairsAdded, viewRows) = q(t)
      assert(pairsAdded == delta.size.toLong, s"batch $t pairs_added")
      assert(viewRows == cum, s"batch $t view_rows")
    }
    assert(view.size == full.length, "final view = full join, exactly once")
  }
}
