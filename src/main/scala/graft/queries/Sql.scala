package graft.queries

import Det._

/** The SQL entry point: the engine's tables exposed as temp views and
  * queried with `spark.sql` — proving a user of the reference's
  * BigQuery SQL surface can run textual SQL against this engine
  * unchanged. The query text below is ONE string executed verbatim by
  * BOTH engines (Spark and the DuckDB oracle), so the oracle match
  * certifies dialect-level compatibility, not just result parity.
  */
object Sql {

  /** TPC-H Q5 (local supplier volume): six-table join, selective
    * region filter, one-year date band, revenue per nation. Catalyst
    * plans it like the DataFrame form — the dimension chain
    * (region→nation) broadcasts, the fact joins shuffle on their keys,
    * and the date filter pushes to the orders scan; SqlPlanSpec pins
    * the broadcast + pushdown shape.
    */
  private[queries] val q5Sql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0-l_discount AS DECIMAL(18,8))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin + orderAll("n_name", "revenue")

  val q40 = GQuery(
    "q40_sql_tpch5",
    (s, d) => {
      val c = Ctx(s, d)
      Seq("region", "nation", "customer", "supplier", "orders", "lineitem")
        .foreach(t => c.table(t).createOrReplaceTempView(t))
      s.sql(q5Sql)
    },
    Some(q5Sql))

  def queries: Seq[GQuery] = Seq(q40)
}
