package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fingerprint's contract: identical row MULTISETS give identical
  * checksums regardless of order, partitioning, or file layout; any
  * changed/missing row flips the checksum; the grouped form localizes
  * a mismatch to its slice.
  */
class TableCheckSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private val cols = Seq("l_orderkey", "l_linenumber", "l_partkey")

  test("length-prefixed rendering distinguishes delimiter-shifted rows") {
    import spark.implicits._
    // a bare '|' join renders both rows as "a|b|c" — identical hashes
    // would certify a value shifted across a column boundary
    val a = Seq(("a|b", "c")).toDF("x", "y")
    val b = Seq(("a", "b|c")).toDF("x", "y")
    assert(TableCheck.checksum(a, Seq("x", "y")).collect()(0) !=
      TableCheck.checksum(b, Seq("x", "y")).collect()(0))
  }

  test("NULL position is part of the fingerprint") {
    import spark.implicits._
    // concat_ws drops NULL tokens, so without the reserved 'N'
    // rendering these two rows would hash identically and the
    // operator would certify mismatched nullable tables
    val a = Seq(("a", Option.empty[String], Some("b"))).toDF("x", "y", "z")
    val b = Seq(("a", Some("b"), Option.empty[String])).toDF("x", "y", "z")
    val ks = Seq("x", "y", "z")
    assert(TableCheck.checksum(a, ks).collect()(0) !=
      TableCheck.checksum(b, ks).collect()(0))
    // and NULL is distinct from the literal string "N"
    val c = Seq(("a", Some("N"), Some("b"))).toDF("x", "y", "z")
    assert(TableCheck.checksum(a, ks).collect()(0) !=
      TableCheck.checksum(c, ks).collect()(0))
  }

  test("published checksum is a folded BIGINT in [0, 2^60)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val row = TableCheck.checksum(li, cols).collect()(0)
    val cs = row.getLong(1)
    assert(cs >= 0L && cs < TableCheck.FoldMod)
  }

  test("Md5Hash60 kernel equals the composed conv(substring(md5)) form") {
    graft.functions.Md5Hash60.register(spark)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("s", concat_ws("|", cols.map(col): _*).cast("binary"))
      .select(
        call_function("md5_60", col("s")).as("kernel"),
        expr("conv(substring(md5(s), 1, 15), 16, 10)").cast("long").as("composed"))
    assert(li.filter(col("kernel") =!= col("composed")).count() == 0)
  }

  test("checksum is invariant under repartition and sort order") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val base = TableCheck.checksum(li, cols).collect()(0)
    val shuffled = TableCheck.checksum(
      li.repartition(17, col("l_partkey")).sortWithinPartitions(col("l_extendedprice")),
      cols).collect()(0)
    assert(base == shuffled, "layout changed the fingerprint")
  }

  test("a single changed row changes the checksum; grouped form localizes it") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((cols :+ "l_returnflag").map(col): _*)
    // perturb exactly one existing row's l_partkey
    val target = li.orderBy("l_orderkey", "l_linenumber").limit(1)
      .collect()(0)
    val perturbed = li.withColumn("l_partkey",
      when(col("l_orderkey") === target.getLong(0) &&
        col("l_linenumber") === target.getInt(1), col("l_partkey") + 1)
        .otherwise(col("l_partkey")))

    assert(TableCheck.checksum(li, cols).collect()(0) !=
      TableCheck.checksum(perturbed, cols).collect()(0),
      "a changed row must flip the checksum")

    val a = TableCheck.checksumBy(li, Seq("l_returnflag"), cols)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = TableCheck.checksumBy(perturbed, Seq("l_returnflag"), cols)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val mismatched = a.keySet.filter(k => a(k) != b(k))
    assert(mismatched.size == 1,
      s"exactly one slice should mismatch, got $mismatched")
  }
}
