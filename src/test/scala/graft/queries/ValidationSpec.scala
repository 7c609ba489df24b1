package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** xv2's audit semantics on the sf0.001 fixture: the report carries
  * every declared check, row counts are table-consistent, clean
  * constraints read zero, and the one constraint the synthetic data
  * REALLY violates — (l_orderkey, l_linenumber) uniqueness — reports
  * exactly the replayed violation count (an auditor that hides real
  * violations is worse than none).
  */
class ValidationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("xv2 reports every check and counts real violations exactly") {
    val out = Scans.xv2.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(
      "orders_pk_unique", "orders_price_positive", "orders_fk_customer",
      "lineitem_line_unique", "lineitem_qty_range",
      "lineitem_discount_range", "lineitem_fk_orders"))

    val c = Ctx(spark, sf)
    val nOrders = c.orders.count()
    val nLines = c.lineitem.count()
    out.foreach { case (chk, (bad, n)) =>
      assert(n == (if (chk.startsWith("orders")) nOrders else nLines), chk)
      assert(bad >= 0 && bad <= n, chk)
    }

    // replay the violated uniqueness constraint from raw rows
    val lineDups = {
      val keys = c.lineitem.select("l_orderkey", "l_linenumber")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      (keys.length - keys.distinct.length).toLong
    }
    assert(lineDups > 0, "fixture lost the violation this spec depends on")
    assert(out("lineitem_line_unique")._1 == lineDups)

    // constraints the generator does keep must read clean
    Seq("orders_pk_unique", "orders_fk_customer", "lineitem_fk_orders")
      .foreach(chk => assert(out(chk)._1 == 0L, chk))
  }

  test("xv6 survives an empty table: one row per column, zero counts") {
    // the DuckDB oracle's scalar aggregate always emits its row, so an
    // empty lineitem must profile as 7 rows with n_rows = n_distinct = 0
    // (left join + coalesce, not the inner join that returned 0 rows)
    val tmp = java.nio.file.Files.createTempDirectory("xv6empty").toString
    Ctx(spark, sf).lineitem.limit(0)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val rows = Scans.xv6.fn(spark, tmp).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L, "n_rows")
      assert(r.getLong(2) == 0L, "n_null")
      assert(r.getLong(3) == 0L, "n_distinct")
    }
  }
}
