package graft.queries

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** xe8's reason to exist is flagging a traffic collapse — which only
  * works if an hour with ZERO events produces a row at all. The dense
  * hour spine guarantees it; this spec pins the behavior on a fixture
  * with a total-outage hour (the pre-spine shape silently skipped the
  * hour and let the trailing frame span the gap).
  */
class EventGapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("xe8 scores zero-event hours: a total outage is an anomaly row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xe8gap").toString
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // 30 hours alternating 80/120 events; hour 25 is a full outage.
    // The alternation gives the trailing window nonzero variance so
    // the outage's z is defined (a constant baseline has sd = 0).
    val rows = for {
      h <- 0 until 30
      if h != 25
      n = if (h % 2 == 0) 80 else 120
      i <- 0 until n
    } yield (java.sql.Timestamp.from(base.plusSeconds(h * 3600L + (i % 3500))),
      i.toLong)
    rows.toDF("ts", "event_id").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")

    val out = Registry.byName("xe8_hourly_anomaly").fn(spark, dir).collect()
    // dense spine: 30 rows including the outage hour
    assert(out.length == 30, s"expected a dense 30-hour spine, got ${out.length}")
    val gap = out.filter(_.getLong(1) == 0L)
    assert(gap.length == 1, "exactly the outage hour has cnt = 0")
    val g = gap.head // (hr, cnt, n_ref, ref_mean, z, is_anomaly)
    assert(g.getLong(2) >= 12, "the outage hour has a full reference window")
    assert(!g.isNullAt(4) && g.getDouble(4) < -3.0,
      s"a collapse to zero must z-score far below the baseline: $g")
    assert(g.getBoolean(5), "the outage hour must be flagged")
  }
}
