package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import graft.operators.TableCheck
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The retention contract for concurrent readers: a reader PINNED at
  * version v keeps reading exactly v's rows while optimize republishes
  * the table and vacuum reclaims dead files — as long as v stays
  * within the kept-version retention. Only vacuuming v itself away
  * breaks the pin, and it breaks LOUDLY (missing manifest/files), not
  * with silently shifted rows — the same promise Delta's
  * version-retention documents.
  */
class ReaderRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    TableCheck.checksum(df, Seq("id", "v")).collect()(0)

  test("pinned reader survives optimize + vacuum within retention") {
    val base = Files.createTempDirectory("retain").toString
    val path = s"$base/t"
    Snapshot.commitOverwrite(
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "v").repartition(4), path)
    Snapshot.commitAppend(
      (101L to 120L).map(i => (i, s"r$i")).toDF("id", "v"), path)

    // reader pins v2 BEFORE any rewrite — the plan holds v2's file list
    val pinned = Snapshot.read(spark, path, Some(2L))
    val want = fp(Snapshot.read(spark, path, Some(2L)))

    // optimize rewrites the whole table into 2 files at v3
    val v3 = Snapshot.optimize(spark, path, targetFiles = 2)
    assert(v3 == 3L)

    // vacuum keeping v2+v3: v2's files are live, the pin must still read
    Snapshot.vacuum(path, keepVersions = 2)
    assert(fp(pinned) == want, "pinned read changed under optimize+vacuum")
    assert(pinned.count() == 120L)
    // and a FRESH read of v2 still works (manifest retained)
    assert(fp(Snapshot.read(spark, path, Some(2L))) == want)

    // current read serves the optimized layout with identical content
    val cur = Snapshot.read(spark, path)
    assert(cur.inputFiles.length == 2)
    assert(fp(cur) == want)
  }

  test("vacuuming the pinned version away fails loudly, never silently") {
    val base = Files.createTempDirectory("retaingone").toString
    val path = s"$base/t"
    Snapshot.commitOverwrite(
      (1L to 50L).map(i => (i, s"r$i")).toDF("id", "v").repartition(2), path)
    Snapshot.optimize(spark, path, targetFiles = 1) // v2 rewrites v1's files

    // retention 1: only v2 survives; v1's manifest and files are gone
    val dead = Snapshot.vacuum(path, keepVersions = 1)
    assert(dead.nonEmpty, "optimize's rewrite should leave dead files")
    assert(Snapshot.versions(path) == Seq(2L))

    // a read of the reclaimed version is an ERROR (missing manifest),
    // not an empty or partial result
    intercept[Exception] {
      Snapshot.read(spark, path, Some(1L)).count()
    }
    // the surviving version is intact
    assert(Snapshot.read(spark, path).count() == 50L)
  }

  test("reader pinned across a concurrent append never sees new rows") {
    val base = Files.createTempDirectory("retainiso").toString
    val path = s"$base/t"
    Snapshot.commitOverwrite(
      (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v"), path)
    val pinned = Snapshot.read(spark, path, Some(1L))
    Snapshot.commitAppend((11L to 20L).map(i => (i, s"r$i")).toDF("id", "v"),
      path)
    // snapshot isolation: the pin planned v1's files; the append's
    // files live in a NEW commit dir the pin never references
    assert(pinned.count() == 10L)
    assert(Snapshot.read(spark, path).count() == 20L)
  }
}
