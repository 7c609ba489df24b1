package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import graft.operators.TableCheck
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door (SnapshotSource): `spark.read.format
  * ("graft-snapshot")` and plain `spark.sql` serve snapshot tables
  * with results identical to Snapshot.read at every version, and the
  * manifest stats envelope prunes files for an ordinary SQL WHERE —
  * no graft API in the query path.
  */
class SnapshotSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    TableCheck.checksum(df, Seq("id", "v")).collect()(0)

  /** Files the scan actually PLANNED (post listFiles pruning) — a
    * DataFrame's inputFiles reports the whole FileIndex, so the
    * numFiles metric of the executed scan is the pruning witness.
    */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val inner = plan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }
    (if (inner.nonEmpty) inner else Seq(plan)).flatMap(_.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }).sum
  }

  test("format reads match Snapshot.read at two versions; SQL works") {
    val base = Files.createTempDirectory("snapsrc").toString
    val path = s"$base/t"
    Snapshot.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    Snapshot.commitAppend(Seq((3L, "c")).toDF("id", "v"), path)

    val cur = spark.read.format("graft-snapshot").load(path)
    assert(fp(cur) == fp(Snapshot.read(spark, path)))
    assert(cur.count() == 3L)

    val v1 = spark.read.format("graft-snapshot")
      .option("versionAsOf", 1L).load(path)
    assert(fp(v1) == fp(Snapshot.read(spark, path, Some(1L))))
    assert(v1.count() == 2L)

    // plain SQL over a registered view — the user-facing contract
    v1.createOrReplaceTempView("snap_v1")
    assert(spark.sql("SELECT count(*) AS n FROM snap_v1")
      .collect()(0).getLong(0) == 2L)
    assert(spark.sql("SELECT v FROM snap_v1 WHERE id = 2").collect()(0)
      .getString(0) == "b")
  }

  test("SQL WHERE prunes via manifest stats; pruning never drops rows") {
    val base = Files.createTempDirectory("snapsrcpr").toString
    val path = s"$base/t"
    Snapshot.commitOverwrite(
      (1L to 100L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1), path)
    Snapshot.commitAppend(
      (101L to 200L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1), path)
    Snapshot.commitAppend(
      (201L to 300L).map(i => (i, s"c$i")).toDF("id", "v").coalesce(1), path)

    val t = spark.read.format("graft-snapshot").load(path)
    assert(t.inputFiles.length == 3)

    // an ordinary filter reaches SnapshotFileIndex.listFiles as a
    // pushed data filter and prunes to the one covering file
    val q = t.filter(col("id") === 150L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("b150"))
    assert(plannedFiles(q.select("id", "v")) == 1,
      "stats envelope did not prune")

    // same through SQL text
    t.createOrReplaceTempView("snap_all")
    val sq = spark.sql("SELECT v FROM snap_all WHERE id > 250")
    assert(sq.count() == 50L)
    assert(plannedFiles(sq) == 1)

    // nothing can match: zero files planned, empty result, no error
    val none = t.filter(col("id") > 1000L)
    assert(none.isEmpty)
    assert(plannedFiles(t.filter(col("id") > 1000L)) == 0)

    // pruned + residual filter == unpruned filter (pruning is I/O only)
    assert(fp(t.filter(col("id") <= 100L)) ==
      fp(Snapshot.read(spark, path).filter(col("id") <= 100L)))
  }

  test("merge-on-read version: deletes stay applied through the format") {
    val base = Files.createTempDirectory("snapsrcdv").toString
    val path = s"$base/t"
    Snapshot.commitOverwrite(
      (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v"), path)
    Snapshot.deleteWhereMergeOnRead(spark, path, col("id") <= 3L)

    val t = spark.read.format("graft-snapshot").load(path)
    assert(t.count() == 7L)
    assert(t.filter(col("id") <= 3L).isEmpty, "format resurrected deletes")
    assert(fp(t) == fp(Snapshot.read(spark, path)))
    // column pruning still works on the fallback path
    assert(t.select("v").collect().map(_.getString(0)).sorted.head == "r10")
  }

  test("write path: append/overwrite/error modes publish real versions") {
    val base = Files.createTempDirectory("snapsrcw").toString
    val path = s"$base/t"
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val d2 = Seq((3L, "c")).toDF("id", "v")

    d1.write.format("graft-snapshot").mode("overwrite").save(path)
    assert(Snapshot.versions(path) == Seq(1L))
    d2.write.format("graft-snapshot").mode("append").save(path)
    assert(Snapshot.versions(path) == Seq(1L, 2L))
    // SQL-written versions ARE snapshot versions: Scala API reads them
    assert(Snapshot.read(spark, path).count() == 3L)
    assert(Snapshot.read(spark, path, Some(1L)).count() == 2L)
    // and the format reads back what it wrote
    assert(fp(spark.read.format("graft-snapshot").load(path)) ==
      fp(Snapshot.read(spark, path)))

    intercept[Exception] {
      d1.write.format("graft-snapshot").mode("errorifexists").save(path)
    }
    d1.write.format("graft-snapshot").mode("ignore").save(path) // no-op
    assert(Snapshot.versions(path) == Seq(1L, 2L))

    // CTAS through plain SQL lands as version 1 of a new table
    d1.createOrReplaceTempView("snap_ctas_src")
    spark.sql(
      s"""CREATE TABLE snap_ctas USING `graft-snapshot`
         |OPTIONS (path '$base/ctas') AS SELECT * FROM snap_ctas_src"""
        .stripMargin)
    try {
      assert(Snapshot.versions(s"$base/ctas") == Seq(1L))
      assert(spark.sql("SELECT count(*) FROM snap_ctas")
        .collect()(0).getLong(0) == 2L)
    } finally spark.sql("DROP TABLE snap_ctas")
  }

  test("imported table reads through the format (bridge composition)") {
    val base = Files.createTempDirectory("snapsrcimp").toString
    val src = s"$base/plain"
    (1L to 50L).map(i => (i, s"x$i")).toDF("id", "v")
      .repartitionByRange(2, col("id")).write.parquet(src)
    val tbl = s"$base/t"
    Snapshot.importTable(spark, src, tbl)
    val t = spark.read.format("graft-snapshot").load(tbl)
    assert(t.count() == 50L)
    // imported footer stats drive pruning through the format too
    assert(plannedFiles(t.filter(col("id") <= 10L)) == 1)
  }
}
