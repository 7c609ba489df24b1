package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-posture operators: salted aggregation correctness under skew,
  * and bucketed tables joining without a shuffle (the co-located join
  * path for repeated fact-fact joins at 100 TB).
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted aggregation equals plain aggregation on skewed data") {
    // hot key: 0 carries 80% of rows
    val rows = (1 to 5000).map { i =>
      (if (i % 5 != 0) 0L else i.toLong % 37, i.toDouble)
    }
    val df = rows.toDF("k", "v")
    val salted = Salting.saltedSum(df, Seq("k"),
      Seq(sum($"v") -> "sum_v", count(lit(1)) -> "n"), buckets = 8)
    val plain = df.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // phase 1 actually spreads the hot key over multiple reducers
    val spread = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter($"k" === 0).select("__salt").distinct().count()
    assert(spread > 1, "hot key must occupy multiple salt buckets")
  }

  test("bucketed tables join without an Exchange") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    val orders = s.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    val joined = s.table("lineitem_b")
      .join(s.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed equi-join must not shuffle:\n$plan")
    assert(joined.count() ==
      lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count())
  }
}
