package graft.queries

import org.apache.spark.sql.functions._
import Det._

/** Reshaping operators: PIVOT / UNPIVOT — the warehouse-SQL surface for
  * wide<->long transforms.
  */
object Reshape {

  // Pivot event counts per user into one column per event type. The
  // pivot value list is EXPLICIT (data-derived value discovery would
  // add a driver-side pass and nondeterministic column order); absent
  // combinations are 0 to match the oracle's COUNT FILTER form.
  val q36 = GQuery(
    "q36_pivot",
    (s, d) => {
      val c = Ctx(s, d)
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = c.events
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      canonBy(
        pivoted.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*),
        "user_id")
    },
    Some(
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events GROUP BY user_id""".stripMargin + orderAll("user_id")))

  // Unpivot measure columns into (measure, value) long form.
  val q37 = GQuery(
    "q37_unpivot",
    (s, d) => {
      val c = Ctx(s, d)
      canonBy(
        c.spread(c.lineitem).unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          variableColumnName = "measure",
          valueColumnName = "value"),
        // value IS a sort key: the synthetic fixture has duplicate
        // (l_orderkey, l_linenumber) pairs, so without it tie order is
        // engine scan order — it hash-matched only by accident until a
        // repartition perturbed Spark's tie order (latent since r1)
        "l_orderkey", "l_linenumber", "measure", "value")
    },
    Some(
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin +
        orderAll("l_orderkey", "l_linenumber", "measure", "value")))

  def queries: Seq[GQuery] = Seq(q36, q37)
}
