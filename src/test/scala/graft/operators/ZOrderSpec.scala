package graft.operators

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Z-order clustering must give every output file a small bounding
  * box in BOTH clustered dimensions — that is the property parquet
  * footer min/max pruning converts into skipped I/O. The single-key
  * layout is the baseline: perfect on its sort key, useless on the
  * second dimension.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val files = 8

  /** Per-file (min, max) box of both dims + row count. */
  private def boxes(path: String): Seq[(Long, Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("kmin"), max("l_orderkey").as("kmax"),
        min("l_suppkey").cast("long").as("smin"),
        max("l_suppkey").cast("long").as("smax"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toIndexedSeq

  /** Files whose stats box intersects a predicate box — what a
    * min/max-pruning scan would actually read.
    */
  private def touched(bs: Seq[(Long, Long, Long, Long, Long)],
      k: (Long, Long), s: (Long, Long)): Int =
    bs.count { case (kmin, kmax, smin, smax, _) =>
      kmax >= k._1 && kmin <= k._2 && smax >= s._1 && smin <= s._2
    }

  test("z-order files are selective on BOTH dims; single-key layout is not") {
    val src = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val dir = Files.createTempDirectory("graft_z").toString

    // baseline: the classic single-sort-key layout
    src.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/bykey")
    ZOrder.writeClustered(src, Seq("l_orderkey", "l_suppkey"), s"$dir/z", files)

    // identical content either way
    assert(spark.read.parquet(s"$dir/z").count() == src.count())

    val zb = boxes(s"$dir/z")
    val nb = boxes(s"$dir/bykey")
    assert(zb.size >= files / 2, s"z-order produced only ${zb.size} files")

    // a suppkey-band predicate (the dimension the baseline ignores):
    // baseline touches every file; z-order must skip at least a third
    val kAll = (Long.MinValue, Long.MaxValue)
    val sBand = (0L, 24L) // quarter of the 0-99 suppkey domain
    val zTouched = touched(zb, kAll, sBand)
    val nTouched = touched(nb, kAll, sBand)
    assert(nTouched == nb.size, "baseline unexpectedly selective on suppkey")
    assert(zTouched <= (zb.size * 2) / 3,
      s"z-order touched $zTouched of ${zb.size} files for a quarter-domain band")

    // and a both-dims box prunes harder than either alone
    val kBand = {
      val ks = src.agg(min("l_orderkey"), max("l_orderkey")).head()
      val lo = ks.getLong(0); val hi = ks.getLong(1)
      (lo, lo + (hi - lo) / 4)
    }
    assert(touched(zb, kBand, sBand) <= zTouched)
  }

  test("z-values follow the curve: same code => same grid cell") {
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_suppkey")
    val z = src.withColumn("z", ZOrder.zvalue(src, Seq("l_orderkey", "l_suppkey")))
    // deterministic: recomputing yields identical codes
    val z2 = src.withColumn("z", ZOrder.zvalue(src, Seq("l_orderkey", "l_suppkey")))
    assert(z.orderBy("l_orderkey", "l_suppkey", "z").collect().toSeq ==
      z2.orderBy("l_orderkey", "l_suppkey", "z").collect().toSeq)
    // codes are within the 2-dim 32-bit envelope
    val mx = z.agg(max("z")).head().getLong(0)
    assert(mx >= 0 && mx < (1L << 32))
  }

  test("4-dim codes never go negative (sign bit stays clear)") {
    // 4x16 bits would land the top interleaved bit on bit 63 and flip
    // half the curve negative, splitting it under the signed sort —
    // 4 dims must drop to 15 bits/dim (top bit 59).
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_partkey", "l_quantity")
    val cols = Seq("l_orderkey", "l_suppkey", "l_partkey", "l_quantity")
    val stats = src.withColumn("z", ZOrder.zvalue(src, cols))
      .agg(min("z").as("mn"), max("z").as("mx")).head()
    assert(stats.getLong(0) >= 0, "negative z-value: sign bit reached")
    assert(stats.getLong(1) < (1L << 60), "z-value beyond 4x15-bit envelope")
  }

  test("null cells and empty/all-null inputs degrade safely") {
    import spark.implicits._
    val withNulls = Seq(
      (Some(1L), Some(2L)), (Some(5L), None), (None, Some(9L)), (None, None))
      .toDF("a", "b")
    val z = withNulls.withColumn("z", ZOrder.zvalue(withNulls, Seq("a", "b")))
    // every row gets a non-null, non-negative code (nulls -> grid 0)
    assert(z.filter(col("z").isNull || col("z") < 0).count() == 0)

    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    // bounds row is all-null: must not NPE, and produce an empty result
    assert(empty.withColumn("z", ZOrder.zvalue(empty, Seq("a", "b")))
      .count() == 0)

    val allNull = Seq((Option.empty[Long], Option.empty[Long]))
      .toDF("a", "b")
    val zn = allNull.withColumn("z", ZOrder.zvalue(allNull, Seq("a", "b")))
    assert(zn.head().getLong(2) == 0L)
  }
}
