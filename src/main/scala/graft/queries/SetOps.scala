package graft.queries

import org.apache.spark.sql.functions._
import Det._

/** Set operations — SURVEY §2.B Q19-Q21: UNION ALL / UNION / INTERSECT /
  * EXCEPT. Spark plans the distinct variants as hash aggregates over the
  * union; EXCEPT/INTERSECT become left-anti / left-semi under the hood.
  */
object SetOps {

  // UNION ALL + multiplicity count (exercises the bag-union path).
  val q19 = GQuery(
    "q19_union_all",
    (s, d) => {
      val c = Ctx(s, d)
      val a = c.customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val b = c.orders.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      canon(a.unionByName(b).groupBy("custkey").agg(count(lit(1)).as("n_occurrences")))
    },
    Some(
      """SELECT custkey, COUNT(*) AS n_occurrences FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY custkey""".stripMargin + orderAll("custkey", "n_occurrences")))

  // UNION (distinct).
  val q19b = GQuery(
    "q19b_union_distinct",
    (s, d) => {
      val c = Ctx(s, d)
      val a = c.customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val b = c.orders.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      canon(a.union(b).distinct())
    },
    Some(
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin +
        orderAll("custkey")))

  // INTERSECT: customers ordering in both 1995 and 1996.
  val q20 = GQuery(
    "q20_intersect",
    (s, d) => {
      val c = Ctx(s, d)
      def inYear(y: Int) = c.orders
        .filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey").as("custkey"))
      canon(inYear(1995).intersect(inYear(1996)))
    },
    Some(
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin +
        orderAll("custkey")))

  // EXCEPT: customers minus those with an urgent order (dual of anti-join
  // Q10; the unfiltered variant is vacuous — every customer has orders).
  val q21 = GQuery(
    "q21_except",
    (s, d) => {
      val c = Ctx(s, d)
      canon(
        c.customer.select(col("c_custkey").as("custkey"))
          .except(c.orders.filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("custkey"))))
    },
    Some(
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin +
        orderAll("custkey")))

  // Scalar subquery: orders priced above the global average. Catalyst
  // plans the subquery as an independent aggregate broadcast into the
  // filter; the average follows the Det decimal discipline.
  val q38 = GQuery(
    "q38_scalar_subquery",
    (s, d) => {
      val c = Ctx(s, d)
      c.orders.createOrReplaceTempView("orders_v38")
      canonBy(s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_v38
          |WHERE o_totalprice > (
          |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
          |  FROM orders_v38)""".stripMargin), "o_orderkey")
    },
    Some(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |  FROM orders)""".stripMargin + orderAll("o_orderkey")))

  // Correlated EXISTS written as SQL — Catalyst decorrelates it into a
  // left-semi join (SURVEY §4.2); the DataFrame-API twin is Q09.
  val q39 = GQuery(
    "q39_correlated_exists",
    (s, d) => {
      val c = Ctx(s, d)
      c.orders.createOrReplaceTempView("orders_v39")
      c.lineitem.createOrReplaceTempView("lineitem_v39")
      canonBy(s.sql(
        """SELECT o_orderkey FROM orders_v39 o
          |WHERE EXISTS (SELECT 1 FROM lineitem_v39 l
          |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)""".stripMargin),
        "o_orderkey")
    },
    Some(
      """SELECT o_orderkey FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)""".stripMargin +
        orderAll("o_orderkey")))

  def queries: Seq[GQuery] = Seq(q19, q19b, q20, q21, q38, q39)
}
