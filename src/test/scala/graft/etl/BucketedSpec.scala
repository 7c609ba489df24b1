package graft.etl

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** P10d bucketed co-located joins: the point of paying the write-time
  * shuffle is that the recurring join/agg on the bucket key plans NO
  * exchange afterwards — asserted on the executed plan, not assumed.
  */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** Final (post-AQE) physical plan text after forcing execution. */
  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  test("bucketed fact-fact join and bucket-key aggregation plan zero shuffles") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice", "l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    Bucketed.write(li, "li_bkt", s"$dir/li", 8, Seq("l_orderkey"),
      sortCols = Seq("l_orderkey"))
    Bucketed.write(ord, "ord_bkt", s"$dir/ord", 8, Seq("o_orderkey"),
      sortCols = Seq("o_orderkey"))
    try withNoBroadcast {
      val joined = Bucketed.table(spark, "li_bkt")
        .join(Bucketed.table(spark, "ord_bkt"),
          col("l_orderkey") === col("o_orderkey"))
      val joinPlan = executedPlan(joined)
      assert(!joinPlan.contains("Exchange"),
        s"bucketed join should be exchange-free:\n$joinPlan")
      // the same join over plain parquet MUST shuffle — proves the
      // assertion above is detecting bucketing, not a degenerate plan
      val plainPlan = executedPlan(
        li.join(ord, col("l_orderkey") === col("o_orderkey")))
      assert(plainPlan.contains("Exchange"))
      // results identical to the plain join (bucketing is layout only)
      val a = joined.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect().map(_.toString).sorted
      val b = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect().map(_.toString).sorted
      assert(a.sameElements(b))
      // aggregation on the bucket key likewise needs no exchange
      val aggPlan = executedPlan(Bucketed.table(spark, "li_bkt")
        .groupBy("l_orderkey").agg(sum("l_extendedprice")))
      assert(!aggPlan.contains("Exchange"),
        s"bucket-key aggregation should be exchange-free:\n$aggPlan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
