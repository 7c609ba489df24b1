package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executed evidence for the skew-remedy division of labor the docs
  * claim (Salting.scala, q50): AQE's skew handling splits a skewed
  * JOIN's partitions, but it can NOT split a skewed AGGREGATION's
  * partitions (a split group would double-count), so hot-key
  * aggregation needs the manual two-phase salt — and the salt really
  * does spread the hot key, measured as post-shuffle row spread with
  * the same hash partitioning the aggregate exchange uses.
  *
  * Spread is measured in deterministic ROW COUNTS per reducer
  * partition (spark_partition_id over an explicit repartition on the
  * would-be group keys), never task wall-times — times are host
  * weather, row placement under hash partitioning is arithmetic.
  */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 120k rows, 60% of them on the one hot key (key 1), the rest
    * spread over 1..3000. All index arithmetic, no RNG.
    */
  private def skewed = {
    import spark.implicits._
    (0 until 120000).map { i =>
      val k = if (i % 5 < 3) 1L else 1L + (i % 3000).toLong
      (k, i.toLong % 97)
    }.toDF("key", "v")
  }

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** Max rows landing on one reducer when hash-partitioned on `cols` —
    * exactly the exchange a groupBy on `cols` would perform.
    */
  private def maxPartitionRows(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): Long =
    // explicit partition count: a column-only repartition participates
    // in AQE coalescing, which folds this small fixture into ONE
    // partition and makes the spread measurement vacuous
    df.repartition(32, cols.map(col): _*)
      .groupBy(spark_partition_id()).count()
      .agg(max("count")).head().getLong(0)

  test("AQE splits the skewed join but leaves the skewed aggregate whole") {
    import spark.implicits._
    val dim = (1L to 3000L).map(k => (k, s"d$k")).toDF("key", "name")
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // force the shuffled join — a broadcast join has no skew to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = skewed.join(dim, "key")
        .groupBy("name").agg(count(lit(1)).as("n"))
      joined.collect()
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(joinPlan.contains("skewed"),
        s"AQE did not split the skewed join partition:\n$joinPlan")

      val agg = skewed.groupBy("key").agg(sum("v").as("s"))
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
      // the aggregate's own exchange must NOT be skew-split: splitting
      // a group across tasks would emit partial duplicates. (AQE may
      // still coalesce small partitions — that is fine and irrelevant.)
      assert(!aggPlan.contains("skewed"),
        s"aggregate exchange unexpectedly skew-split:\n$aggPlan")
    }
  }

  test("two-phase salt spreads the hot key's rows; result is exactly lossless") {
    val df = skewed
    val hot = df.filter(col("key") === 1L).count()
    val buckets = 16
    val plainMax = maxPartitionRows(df, Seq("key"))
    val saltedMax = maxPartitionRows(
      df.withColumn("__salt",
        pmod(hash(col("key"), col("v")), lit(buckets))),
      Seq("key", "__salt"))
    // unsalted: the hot key funnels through ONE reducer, so the max
    // partition carries at least all its rows; salted: its 16 cells
    // scatter (some co-hash into the same reducer — birthday
    // collisions — so the bound is "no reducer carries even half the
    // hot key, and the worst reducer shrank 4x", not hot/buckets)
    assert(plainMax >= hot, s"plainMax=$plainMax hot=$hot")
    assert(saltedMax < hot / 2, s"saltedMax=$saltedMax hot=$hot")
    assert(saltedMax <= plainMax / 4,
      s"saltedMax=$saltedMax plainMax=$plainMax")

    // and the rewrite is exactly lossless vs the plain aggregation
    val expect = df.groupBy("key")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val got = Salting.saltedSum(df, Seq("key"),
        Seq(sum(col("v")) -> "s", count(lit(1)) -> "n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
  }
}
