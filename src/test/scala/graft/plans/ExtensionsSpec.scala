package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the HOF dot-product pattern is rewritten to the
  * codegen'd VectorDot by the injected optimizer rule, with identical
  * results; vec_dot is registered as a SQL function.
  */
class ExtensionsSpec extends AnyFunSuite {

  // Extensions bind at session build time, so this suite needs its own
  // SparkSession (same SparkContext): clear the active/default session
  // and getOrCreate builds a fresh one with the extensions applied.
  private lazy val spark: SparkSession = {
    graft.SparkTestSession.spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("optimizer rewrites aggregate(zip_with(*)) into VectorDot") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val hof = df.select(col("vec_id"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("dot"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vectordot") || optimized.contains("VectorDot"),
      s"expected VectorDot in:\n$optimized")
    // identical results to the unoptimized semantic
    val viaFn = df.selectExpr("vec_id", "vec_dot(v, v) AS dot")
    assert(hof.exceptAll(viaFn).isEmpty && viaFn.exceptAll(hof).isEmpty)
  }

  test("vec_dot registered as a SQL function via injectFunction") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head.getDouble(0)
    assert(r == 32.0)
  }
}
