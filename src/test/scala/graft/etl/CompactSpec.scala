package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction: many-file partitions are rewritten to few
  * files, content is preserved row-for-row, cold partitions are left
  * alone, and a re-run is a no-op (idempotent/crash-safe).
  */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeAppends(path: String, bucket: Long, appends: Int): Unit =
    for (i <- 1 to appends)
      Seq((bucket, bucket * 1000 + i, s"row-$bucket-$i"))
        .toDF("block_bucket", "block_number", "payload")
        .write.mode("append").partitionBy("block_bucket").parquet(path)

  test("compaction shrinks hot partitions, preserves rows, skips cold ones") {
    val path = Files.createTempDirectory("compact").toString
    writeAppends(path, bucket = 0L, appends = 12) // hot: 12 appended file sets
    writeAppends(path, bucket = 1L, appends = 2)  // cold: under the threshold
    val before = spark.read.parquet(path)
    val rowsBefore = before.collect().map(_.toString).sorted.toSeq
    val statsBefore = Compact.partitionStats(path).map(s => s.dir -> s.files).toMap
    assert(statsBefore("block_bucket=0") >= 12)

    val rewritten = Compact.compact(spark, path, "block_bucket", maxFiles = 4)
    assert(rewritten.map(_.dir) == Seq("block_bucket=0"), "only the hot partition")

    val statsAfter = Compact.partitionStats(path).map(s => s.dir -> s.files).toMap
    assert(statsAfter("block_bucket=0") == 1, "12 small files -> 1")
    assert(statsAfter("block_bucket=1") == statsBefore("block_bucket=1"),
      "cold partition untouched")
    val rowsAfter = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    assert(rowsAfter == rowsBefore, "compaction must be a pure re-layout")

    // idempotent: a second run finds no backlog
    assert(Compact.compact(spark, path, "block_bucket", maxFiles = 4).isEmpty)
  }

  test("EtlLoop.maintain compacts the sink tables between cycles") {
    val root = Files.createTempDirectory("etl-compact")
    val chain = root.resolve("chain")
    ChainFixture.write(chain)
    val cfg = EtlJob.Config(
      chainDir = chain.toString,
      sinkDir = root.resolve("sink").toString,
      cursorDir = root.resolve("cursor").toString,
      batchSize = 100) // many small per-cycle file sets per bucket
    val loop = new EtlLoop(spark, cfg, intervalSec = 0)
    loop.run(maxCycles = 1)
    val mkt = s"${cfg.sinkDir}/marketplace"
    val rows = spark.read.parquet(mkt).collect().map(_.toString).sorted.toSeq
    val rewritten = loop.maintain(maxFiles = 0) // force-compact every partition
    assert(rewritten.nonEmpty)
    // tiny partitions all land in one size-targeted file each
    val after = Compact.partitionStats(mkt)
    assert(after.forall(_.files == 1), after.mkString(", "))
    assert(spark.read.parquet(mkt).collect().map(_.toString).sorted.toSeq == rows)
  }
}
