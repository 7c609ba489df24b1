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

  /** TPC-H Q3 (shipping priority), adapted to this schema (orders has
    * no o_shippriority column): top-10 highest-revenue orders taken by
    * BUILDING-segment customers, ordered but not yet shipped at the
    * cutoff date. The selective segment filter broadcasts customer
    * into orders; both date predicates push to their scans; the final
    * top-10 plans as TakeOrderedAndProject (no global sort
    * materialization). Ties broken by (o_orderdate, l_orderkey) so the
    * LIMIT is deterministic cross-engine.
    */
  private[queries] val q3Sql: String =
    """SELECT l_orderkey,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0-l_discount AS DECIMAL(18,8))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-01'
      |  AND l_shipdate > TIMESTAMP '1997-06-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  val q42 = GQuery(
    "q42_sql_tpch3",
    (s, d) => {
      val c = Ctx(s, d)
      Seq("customer", "orders", "lineitem")
        .foreach(t => c.table(t).createOrReplaceTempView(t))
      s.sql(q3Sql)
    },
    Some(q3Sql))

  /** TPC-H Q10 (returned-item reporting), adapted to this schema
    * (customer has no address/phone/comment columns): revenue lost to
    * returns per customer over one quarter, top 20. The quarter
    * filter prunes orders at the scan; nation broadcasts; the
    * aggregate is partial-aggregated before the custkey shuffle.
    */
  private[queries] val q10Sql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0-l_discount AS DECIMAL(18,8))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
      |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  val q43 = GQuery(
    "q43_sql_tpch10",
    (s, d) => {
      val c = Ctx(s, d)
      Seq("customer", "orders", "lineitem", "nation")
        .foreach(t => c.table(t).createOrReplaceTempView(t))
      s.sql(q10Sql)
    },
    Some(q10Sql))

  def queries: Seq[GQuery] = Seq(q40, q42, q43)
}
