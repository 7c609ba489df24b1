package graft.etl

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestSession
import graft.operators.TableCheck
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chaos integration: a full pipeline cycle — plan range → build batch
  * → exactly-once snapshot sink → exactly-once SCD2 apply → cursor
  * commit — KILLED at every phase boundary and restarted. After each
  * kill+replay the final lake content, SCD2 history, version count,
  * and cursor must be TableCheck-identical to a never-crashed control
  * run: the at-least-once replay composed with the exactly-once sinks
  * (batch markers riding the manifest publish) and the
  * cursor-advances-last discipline yields exactly-once END STATE no
  * matter where the process dies.
  */
class ChaosSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private final case class ChaosCrash(point: Int)
    extends RuntimeException(s"chaos kill after phase $point")

  private final case class Dirs(lake: String, scd2: String, cursor: String)

  private def fresh(): Dirs = {
    val base = Files.createTempDirectory("chaos").toString
    val d = Dirs(s"$base/lake", s"$base/scd2", s"$base/cursor")
    // dimension exists (empty) before the pipeline starts — the usual
    // deploy order; the pipeline itself only ever appends to it
    Scd2.init(
      Seq.empty[(Long, Double)].toDF("entity_id", "price"),
      d.scd2, new Timestamp(1700000000000L))
    d
  }

  /** One pipeline cycle over the synthetic "chain" (blocks 0..∞,
    * batches of 10, cursor-driven). `crashAfter` ∈ 1..5 kills the
    * process at that phase boundary; 0 runs clean. Replays recompute
    * the SAME range from the unmoved cursor, so the exactly-once
    * markers (batchId = start block) dedupe whatever already landed.
    */
  private def cycle(d: Dirs, crashAfter: Int): Unit = {
    def maybeCrash(p: Int): Unit =
      if (crashAfter == p) throw ChaosCrash(p)
    val cursor = Cursor(d.cursor)
    // phase 1: plan the range (P2/P3)
    val start = cursor.read().map(_ + 1).getOrElse(0L)
    val end = start + 9
    maybeCrash(1)
    // phase 2: extract + transform (P5-P9)
    val batch = spark.range(start, end + 1)
      .select(col("id").as("block_number"),
        (col("id") % 3).as("entity_id"),
        (col("id") * lit(10)).cast("double").as("price"))
    maybeCrash(2)
    // phase 3: exactly-once snapshot sink (P10/P12)
    Snapshot.commitAppendOnce(batch, d.lake, "chaos", batchId = start)
    maybeCrash(3)
    // phase 4: exactly-once SCD2 apply (P14c) — per-entity latest row
    val changes = batch.groupBy("entity_id")
      .agg(max(struct(col("block_number"), col("price"))).as("m"))
      .select(col("entity_id"), col("m.price").as("price"))
    Scd2.applyChangesOnce(spark, d.scd2, changes, Seq("entity_id"),
      new Timestamp(1700000000000L + start * 1000L), "chaos-scd2",
      batchId = start)
    maybeCrash(4)
    // phase 5: cursor advances ONLY after both sinks (P13)
    cursor.write(end)
    maybeCrash(5)
  }

  /** (lake fingerprint, lake versions, scd2 fingerprint, cursor). */
  private def stateOf(d: Dirs): (String, Int, String, Option[Long]) = {
    val lake = TableCheck.checksum(Snapshot.read(spark, d.lake),
      Seq("block_number", "entity_id", "price")).collect()(0).toString
    val scd2 = TableCheck.checksum(Snapshot.read(spark, d.scd2),
      Snapshot.read(spark, d.scd2).columns.toSeq).collect()(0).toString
    (lake, Snapshot.versions(d.lake).size, scd2, Cursor(d.cursor).read())
  }

  test("kill+restart at every phase boundary converges to the control state") {
    // control: three clean cycles
    val control = fresh()
    (1 to 3).foreach(_ => cycle(control, crashAfter = 0))
    val want = stateOf(control)
    assert(want._4.contains(29L))

    for (crashPoint <- 1 to 5) {
      val d = fresh()
      cycle(d, crashAfter = 0) // cycle 1 clean
      intercept[ChaosCrash] { cycle(d, crashAfter = crashPoint) } // cycle 2 dies
      // restart: keep cycling until the chain target is consumed — a
      // kill AFTER the cursor commit means cycle 2 already finished,
      // any earlier kill means the restart replays it
      while (!Cursor(d.cursor).read().contains(29L)) cycle(d, crashAfter = 0)
      val got = stateOf(d)
      assert(got == want,
        s"state diverged after kill at phase $crashPoint: $got vs $want")
    }
  }

  test("double kill at the sink/cursor boundary still converges") {
    val control = fresh()
    (1 to 2).foreach(_ => cycle(control, crashAfter = 0))
    val want = stateOf(control)

    val d = fresh()
    cycle(d, crashAfter = 0)
    // die after the sink, replay, die after scd2, replay
    intercept[ChaosCrash] { cycle(d, crashAfter = 3) }
    intercept[ChaosCrash] { cycle(d, crashAfter = 4) }
    while (!Cursor(d.cursor).read().contains(19L)) cycle(d, crashAfter = 0)
    assert(stateOf(d) == want)
  }
}
