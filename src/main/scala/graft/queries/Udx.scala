package graft.queries

import org.apache.spark.sql.functions._
import Det._
import graft.functions.GeoMean

/** User-defined extension points — SURVEY §2.B Q33 (scalar UDF),
  * Q34 (UDAF via typed Aggregator), Q35 (generator/UDTF via posexplode).
  */
object Udx {

  // Scalar UDF: wei -> eth. Registered through the SQL function registry
  // so both Column-API and spark.sql callers can use it. A Scala UDF is
  // an eval black box to Catalyst (breaks codegen + pushdown around it);
  // acceptable for one narrow conversion, and the per-row output keeps
  // the result exactly comparable (single IEEE divide, no aggregation).
  val q33 = GQuery(
    "q33_udf_wei2eth",
    (s, d) => {
      val c = Ctx(s, d)
      s.udf.register("wei2eth", (v: Double) => v / 1e18)
      canonBy(
        c.events
          .withColumn("eth", expr("wei2eth(value)"))
          .filter(col("eth") > lit(5e-17))
          .select("event_id", "event_type", "value", "eth"), "event_id")
    },
    Some(
      """SELECT event_id, event_type, value, value / 1e18 AS eth
        |FROM events WHERE value / 1e18 > 5e-17""".stripMargin +
        orderAll("event_id")))

  // UDAF: geometric mean per event_type. ROUND(...,4) because the ln-sum
  // accumulates in double — Spark's partial-merge order differs from
  // DuckDB's sequential AVG, so only ~1e-12 relative agreement is exact.
  val q34 = GQuery(
    "q34_udaf_geomean",
    (s, d) => {
      val c = Ctx(s, d)
      val geomean = udaf(GeoMean)
      canon(
        c.events
          .filter(col("value") > 0.0)
          .groupBy("event_type")
          .agg(
            round(geomean(col("value")), 4).as("geo_mean"),
            count(lit(1)).as("n_pos")))
    },
    Some(
      """SELECT event_type, ROUND(EXP(AVG(LN(value))), 4) AS geo_mean, COUNT(*) AS n_pos
        |FROM events WHERE value > 0 GROUP BY event_type""".stripMargin +
        orderAll("event_type", "geo_mean", "n_pos")))

  // Generator: posexplode over the embedding vector (UDTF shape).
  // Spark pos is 0-based; the DuckDB oracle enumerates 1-based indices.
  val q35 = GQuery(
    "q35_posexplode",
    (s, d) => {
      val c = Ctx(s, d)
      canonBy(
        c.embeddings
          .select(col("vec_id"), posexplode(col("embedding")))
          .filter(col("pos") < 4)
          .select(
            col("vec_id"), col("pos"),
            round(col("col").cast("double"), 4).as("component")),
        "vec_id", "pos")
    },
    Some(
      """SELECT vec_id, CAST(i - 1 AS INT) AS pos, ROUND(CAST(embedding[i] AS DOUBLE), 4) + 0.0 AS component
        |FROM embeddings, generate_series(1, 4) AS t(i)""".stripMargin +
        orderAll("vec_id", "pos")))

  def queries: Seq[GQuery] = Seq(q33, q34, q35)
}
