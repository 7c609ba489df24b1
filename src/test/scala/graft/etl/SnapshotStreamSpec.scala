package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming tail of a snapshot table (SnapshotStreamSource): each
  * published version arrives as one micro-batch of its added rows,
  * restarts resume exactly-once from the checkpointed version offset,
  * and a non-append-only rewrite in the range fails the stream loudly
  * instead of emitting wrong changes.
  */
class SnapshotStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("versions arrive as micro-batches; restart is exactly-once") {
    val base = Files.createTempDirectory("snapstream").toString
    val path = s"$base/t"
    val ckpt = s"$base/ckpt"
    val out = s"$base/out"
    Snapshot.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)

    // parquet sink: the one built-in sink that supports checkpoint
    // RECOVERY, which is the property under test
    def start() = spark.readStream
      .format("graft-snapshot").load(path)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2L, "bootstrap = full v1")

      Snapshot.commitAppend(Seq((3L, "c")).toDF("id", "v"), path)
      q1.processAllAvailable()
      val got = spark.read.parquet(out).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 3L), s"after v2: $got")
    } finally q1.stop()

    // restart from the checkpoint: only versions AFTER the committed
    // offset arrive — no replays, no gaps
    Snapshot.commitAppend(Seq((4L, "d")).toDF("id", "v"), path)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got2 = spark.read.parquet(out).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got2 == Seq(1L, 2L, 3L, 4L), s"restart replayed or skipped: $got2")
    } finally q2.stop()
  }

  test("startingVersion skips history; overwrite in range fails loudly") {
    val base = Files.createTempDirectory("snapstream2").toString
    val path = s"$base/t"
    Snapshot.commitOverwrite(Seq((1L, "a")).toDF("id", "v"), path)
    Snapshot.commitAppend(Seq((2L, "b")).toDF("id", "v"), path)

    // startingVersion = 1: only the v2 delta arrives
    val q = spark.readStream.format("graft-snapshot")
      .option("startingVersion", 1L).load(path)
      .writeStream.format("memory").queryName("snap_from1")
      .option("checkpointLocation", s"$base/ckpt1")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_from1").select("id")
        .collect().map(_.getLong(0)).toSeq == Seq(2L))

      // an overwrite mid-stream makes the delta inexpressible as
      // added-files: the stream must ERROR, not emit wrong changes
      Snapshot.commitOverwrite(Seq((9L, "z")).toDF("id", "v"), path)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("append-only") ||
        Option(e.getCause).exists(_.getMessage.contains("append-only")),
        s"unexpected failure: ${e.getMessage}")
    } finally q.stop()
  }
}
