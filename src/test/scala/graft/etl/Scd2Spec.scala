package graft.etl

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** P14c SCD2 dimension history: delta-sized appends, derived validity,
  * no-op suppression, bitemporal reads.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val keys = Seq("cust_id")
  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshDim(): String = {
    val path = java.nio.file.Files.createTempDirectory("scd2").toString + "/dim"
    Scd2.init(
      Seq((1L, "bronze", "DE"), (2L, "silver", "FR"), (3L, "gold", "US"))
        .toDF("cust_id", "segment", "country"),
      path, ts("2024-01-01 00:00:00"))
    path
  }

  test("changed + new rows append; identical rows are suppressed") {
    val path = freshDim()
    val batch = Seq(
      (1L, "silver", "DE"),  // segment changed
      (2L, "silver", "FR"),  // identical -> no-op
      (4L, "bronze", "JP"))  // new key
      .toDF("cust_id", "segment", "country")
    val stats = Scd2.applyChanges(spark, path, batch, keys,
      ts("2024-02-01 00:00:00"))
    assert(stats.appended == 2 && stats.noops == 1)
    val hist = Scd2.view(spark, path, keys)
    assert(hist.count() == 5) // 3 initial + 2 appended
    // key 1 has a closed old version and an open new one
    val k1 = hist.filter($"cust_id" === 1L)
      .orderBy("valid_from")
      .select("segment", "valid_to", "is_current")
      .collect()
    assert(k1.length == 2)
    assert(k1(0).getString(0) == "bronze" &&
      k1(0).getTimestamp(1) == ts("2024-02-01 00:00:00") && !k1(0).getBoolean(2))
    assert(k1(1).getString(0) == "silver" &&
      k1(1).isNullAt(1) && k1(1).getBoolean(2))
    // current() agrees with the is_current slice of view()
    val cur = Scd2.current(spark, path, keys)
      .orderBy("cust_id").select("cust_id", "segment").as[(Long, String)]
      .collect().toSeq
    assert(cur == Seq((1L, "silver"), (2L, "silver"), (3L, "gold"),
      (4L, "bronze")))
  }

  test("business-time asOf returns the version valid at that instant") {
    val path = freshDim()
    Scd2.applyChanges(spark, path,
      Seq((1L, "silver", "DE")).toDF("cust_id", "segment", "country"),
      keys, ts("2024-02-01 00:00:00"))
    Scd2.applyChanges(spark, path,
      Seq((1L, "gold", "DE")).toDF("cust_id", "segment", "country"),
      keys, ts("2024-03-01 00:00:00"))
    def segAt(t: String) =
      Scd2.asOf(spark, path, keys, ts(t)).filter($"cust_id" === 1L)
        .select("segment").as[String].collect().toSeq
    assert(segAt("2024-01-15 00:00:00") == Seq("bronze"))
    assert(segAt("2024-02-15 00:00:00") == Seq("silver"))
    // boundary instant belongs to the NEW version (valid_to exclusive)
    assert(segAt("2024-03-01 00:00:00") == Seq("gold"))
    // before the dimension existed: no row
    assert(segAt("2023-12-31 00:00:00").isEmpty)
  }

  test("replaying an already-applied batch appends nothing") {
    val path = freshDim()
    val batch = Seq((1L, "silver", "DE"), (4L, "bronze", "JP"))
      .toDF("cust_id", "segment", "country")
    val first = Scd2.applyChanges(spark, path, batch, keys,
      ts("2024-02-01 00:00:00"))
    assert(first.appended == 2)
    val replay = Scd2.applyChanges(spark, path, batch, keys,
      ts("2024-02-02 00:00:00"))
    assert(replay.appended == 0 && replay.noops == 2 && replay.version.isEmpty)
    assert(Scd2.view(spark, path, keys).count() == 5)
  }

  test("NULL attribute transitions are real changes; all-NULL new keys insert") {
    val path = freshDim()
    val stats = Scd2.applyChanges(spark, path,
      Seq((1L, null.asInstanceOf[String], "DE"), // segment -> NULL: a change
        (5L, null.asInstanceOf[String], null.asInstanceOf[String])) // new, all-NULL
        .toDF("cust_id", "segment", "country"),
      keys, ts("2024-02-01 00:00:00"))
    assert(stats.appended == 2)
    // NULL -> NULL replay is then a no-op (null-safe compare)
    val replay = Scd2.applyChanges(spark, path,
      Seq((1L, null.asInstanceOf[String], "DE"))
        .toDF("cust_id", "segment", "country"),
      keys, ts("2024-02-02 00:00:00"))
    assert(replay.appended == 0)
  }

  test("exactly-once stream apply: a replayed batch cannot re-append stale history") {
    val path = freshDim()
    def batch(seg: String) =
      Seq((1L, seg, "DE")).toDF("cust_id", "segment", "country")
    // batch 1: bronze -> silver; batch 2: silver -> bronze again
    assert(Scd2.applyChangesOnce(spark, path, batch("silver"), keys,
      ts("2024-02-01 00:00:00"), "dimstream", 1L).exists(_.appended == 1))
    assert(Scd2.applyChangesOnce(spark, path, batch("bronze"), keys,
      ts("2024-03-01 00:00:00"), "dimstream", 2L).exists(_.appended == 1))
    // REPLAY of batch 1: its value-delta is non-empty again (current is
    // bronze, batch says silver) — value suppression alone would
    // re-append; the marker skips it
    assert(Scd2.applyChangesOnce(spark, path, batch("silver"), keys,
      ts("2024-02-01 00:00:00"), "dimstream", 1L).isEmpty)
    val cur = Scd2.current(spark, path, keys)
      .filter($"cust_id" === 1L).select("segment").as[String].collect().toSeq
    assert(cur == Seq("bronze"))
    assert(Scd2.view(spark, path, keys).filter($"cust_id" === 1L).count() == 3)
    // an all-no-op batch still records its marker (marker-only version)
    assert(Scd2.applyChangesOnce(spark, path, batch("bronze"), keys,
      ts("2024-04-01 00:00:00"), "dimstream", 3L).exists(_.appended == 0))
    assert(Scd2.applyChangesOnce(spark, path, batch("bronze"), keys,
      ts("2024-04-01 00:00:00"), "dimstream", 3L).isEmpty)
  }

  test("property: random change sequences match an in-memory reference model") {
    val rnd = new scala.util.Random(42)
    val path = java.nio.file.Files.createTempDirectory("scd2p").toString + "/dim"
    val segs = Array("bronze", "silver", "gold", null)
    val t0 = ts("2024-01-01 00:00:00")
    Scd2.init(Seq((1L, "bronze", "AA"), (2L, "silver", "BB"))
      .toDF("cust_id", "segment", "country"), path, t0)
    // reference: key -> (segment, country), plus the state at each asOf
    val ref = scala.collection.mutable.Map(
      1L -> ("bronze", "AA"), 2L -> ("silver", "BB"))
    val statesAt = scala.collection.mutable.ArrayBuffer(
      (t0, ref.toMap))
    var expectRows = 2L
    (1 to 8).foreach { i =>
      val asOf = ts(f"2024-${i + 1}%02d-01 00:00:00")
      val keys2 = rnd.shuffle((1L to 6L).toList).take(1 + rnd.nextInt(4))
      val batch = keys2.map(k =>
        (k, segs(rnd.nextInt(segs.length)), s"C${rnd.nextInt(3)}"))
      val stats = Scd2.applyChanges(spark, path,
        batch.toDF("cust_id", "segment", "country"), keys, asOf)
      val changed = batch.count { case (k, sg, ct) =>
        !ref.get(k).contains((sg, ct)) }
      assert(stats.appended == changed && stats.noops == batch.size - changed)
      batch.foreach { case (k, sg, ct) =>
        if (!ref.get(k).contains((sg, ct))) ref(k) = (sg, ct) }
      expectRows += changed
      statesAt += ((asOf, ref.toMap))
      // current() == reference after every batch
      val cur = Scd2.current(spark, path, keys)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getString(2))).toMap
      assert(cur == ref.toMap, s"batch $i current mismatch")
    }
    assert(Scd2.view(spark, path, keys).count() == expectRows)
    // point-in-time reads reproduce every intermediate state
    statesAt.foreach { case (t, expect) =>
      val got = Scd2.asOf(spark, path, keys, t)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getString(2))).toMap
      assert(got == expect, s"asOf $t mismatch")
    }
  }

  test("system-time travel: the dimension as of an earlier lake version") {
    val path = freshDim()
    val v1 = Snapshot.currentVersion(path).get
    Scd2.applyChanges(spark, path,
      Seq((1L, "silver", "DE")).toDF("cust_id", "segment", "country"),
      keys, ts("2024-02-01 00:00:00"))
    // pinned to v1 the change is invisible even at a later business time
    val seg = Scd2.asOf(spark, path, keys, ts("2024-06-01 00:00:00"),
      version = Some(v1))
      .filter($"cust_id" === 1L).select("segment").as[String].collect().toSeq
    assert(seg == Seq("bronze"))
  }
}
