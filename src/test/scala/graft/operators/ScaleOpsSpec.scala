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

  test("AQE splits a skewed join partition at runtime") {
    // fresh session: skew thresholds forced low enough that the hot
    // key's partition qualifies at test scale
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep SMJ
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    // fact: key 0 carries ~90% of 40k rows; dim: one row per key
    val fact = (1 to 40000)
      .map(i => (if (i % 10 != 0) 0L else i.toLong % 97, s"payload-$i"))
      .toDF("k", "payload")
    val dim = (0L until 97L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val joined = fact.join(dim, "k")
    // execute THIS DataFrame's own QueryExecution (count() would build
    // a separate one and leave this plan un-finalized under AQE)
    assert(joined.collect().length == 40000)
    // after execution AQE has re-planned: the skewed SMJ partition is
    // marked and split (plan prints "skew=true" on the sort-merge join)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected AQE skew-split SMJ in:\n$finalPlan")
  }

  test("IVF cells as partition layout: probes prune to their cells' files") {
    // the xs2 story at rest: persist the corpus partitioned BY CELL, and
    // a probe that wants cells (3, 7) must scan only those partitions
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-").toString
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("cid", pmod(hash(col("vec_id")), lit(8))) // stand-in assignment
    e.write.mode("overwrite").partitionBy("cid").parquet(dir)
    val probed = spark.read.parquet(dir).filter(col("cid").isin(3, 7))
    val scan = probed.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cid"),
      s"probe must push a partition filter:\n$scan")
    // only the two probed cells' files are read
    val files = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f =>
      f.contains("cid=3") || f.contains("cid=7")), files.mkString("\n"))
    val full = e.filter(col("cid").isin(3, 7)).count()
    assert(probed.count() == full)
  }

  test("runtime bloom filter prunes the fact side before the shuffle join") {
    // the shuffle-volume saver at 100 TB: a selective dim filter is
    // turned into a bloom filter applied to the fact SCAN, so rows that
    // cannot join never enter the exchange. Thresholds lowered so the
    // optimizer's cost gate passes at test scale.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep SMJ
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val li = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val urgent = s.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") || optimized.contains("BloomFilter"),
      s"expected a runtime bloom filter on the fact side:\n$optimized")
    // semantics unchanged vs the unfiltered plan
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val plain = s2.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .join(s2.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
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
