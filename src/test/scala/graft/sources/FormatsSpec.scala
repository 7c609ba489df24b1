package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORC interop contract: type fidelity, scan-stage pushdown/pruning,
  * and hive-style partition pruning — the parquet posture, second
  * format.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("type fidelity through an ORC write/read cycle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orc-types").toString
    val src = spark.range(100).select(
      col("id"),
      (col("id") * 7).cast("decimal(18,4)").as("price"),
      timestamp_micros(col("id") * 1000000L).as("ts"),
      encode(concat(lit("b"), col("id")), "UTF-8").as("payload"),
      array(col("id"), col("id") + 1).as("arr"),
      struct(col("id").as("a"), (col("id") % 3).as("b")).as("nested"))
    Formats.writeOrc(src, s"$dir/t")
    val back = Formats.readOrc(spark, s"$dir/t")
    // ORC (like parquet) reads fields back nullable; types must match
    // exactly modulo nullability (simpleString carries names + types,
    // not nullability)
    assert(back.schema.simpleString == src.schema.simpleString)
    // exact set equality both directions (ids unique, so set = multiset)
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
    assert(back.count() == 100)
  }

  test("predicate pushdown and column pruning reach the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc-push").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Formats.writeOrc(li, s"$dir/li")
    val q = Formats.readOrc(spark, s"$dir/li")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    q.write.format("noop").mode("overwrite").save()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"expected ORC filter pushdown:\n$plan")
    assert(plan.contains("ReadSchema") &&
      !plan.substring(plan.indexOf("ReadSchema")).contains("l_extendedprice"),
      "expected column pruning to drop unselected columns")
    // pushdown must not change results
    assert(q.count() ==
      li.filter(col("l_quantity") > 45).count())
  }

  test("hive-style partition pruning on partitioned ORC") {
    val dir = java.nio.file.Files.createTempDirectory("orc-part").toString
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    Formats.writeOrc(ord, s"$dir/ord", partitionBy = Seq("o_orderstatus"))
    val q = Formats.readOrc(spark, s"$dir/ord")
      .filter(col("o_orderstatus") === "F")
    q.write.format("noop").mode("overwrite").save()
    assert(q.count() == ord.filter(col("o_orderstatus") === "F").count())
    // the scan carries the partition filter (pruning decided
    // driver-side from directory names, before any file opens)
    val planned = q.queryExecution.executedPlan.toString
    assert(planned.contains("PartitionFilters") &&
      planned.substring(planned.indexOf("PartitionFilters"))
        .contains("o_orderstatus"),
      s"expected partition filters in:\n$planned")
  }
}
