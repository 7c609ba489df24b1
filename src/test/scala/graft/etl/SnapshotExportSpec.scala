package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkTestSession
import graft.operators.TableCheck
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-way export bridge (Snapshot.exportVersion): a DV-free
  * version exports as BYTE-IDENTICAL copies of its manifest's file
  * set readable by plain spark.read.parquet; a merge-on-read version
  * materializes with its deletes applied; the sidecar records
  * provenance; a non-empty target refuses.
  */
class SnapshotExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    TableCheck.checksum(df, Seq("id", "v")).collect()(0)

  test("DV-free export: byte-identical file set, plain-parquet readable") {
    val base = Files.createTempDirectory("snapexp").toString
    val path = s"$base/t"
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val d2 = Seq((3L, "c"), (4L, "d")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, path)
    Snapshot.commitAppend(d2, path) // v2 spans TWO commit dirs

    val out = s"$base/export_v2"
    val n = Snapshot.exportVersion(spark, path, out)
    assert(n >= 2, "a two-commit version must export >= 2 files")

    // plain parquet read of the export == the snapshot read at v2
    val plain = spark.read.parquet(out)
    assert(fp(plain) == fp(Snapshot.read(spark, path, Some(2L))))

    // byte identity per exported file against its recorded source
    val sidecar = new String(java.nio.file.Files.readAllBytes(
      Paths.get(s"$out/_graft_export.json")), "UTF-8")
    assert(sidecar.contains("\"mode\":\"file_copy\""))
    assert(sidecar.contains("\"version\":2"))
    val fileRe = """\{"name":"([^"]+)","source":"([^"]+)","bytes":(\d+)\}""".r
    val recs = fileRe.findAllMatchIn(sidecar).map(m =>
      (m.group(1), m.group(2), m.group(3).toLong)).toSeq
    assert(recs.size == n)
    recs.foreach { case (name, src, len) =>
      val exp = java.nio.file.Files.readAllBytes(Paths.get(s"$out/$name"))
      val orig = java.nio.file.Files.readAllBytes(Paths.get(s"$path/$src"))
      assert(exp.sameElements(orig), s"$name differs from $src")
      assert(exp.length.toLong == len, s"$name sidecar size wrong")
    }

    // an older version exports independently (time-travel export)
    val out1 = s"$base/export_v1"
    Snapshot.exportVersion(spark, path, out1, Some(1L))
    assert(fp(spark.read.parquet(out1)) == fp(d1))

    // non-empty target refuses — an export can't silently mix tables
    val e = intercept[IllegalArgumentException] {
      Snapshot.exportVersion(spark, path, out)
    }
    assert(e.getMessage.contains("not empty"))
  }

  test("merge-on-read export materializes deletes; no resurrected rows") {
    val base = Files.createTempDirectory("snapexpdv").toString
    val path = s"$base/t"
    val d = (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v")
    Snapshot.commitOverwrite(d, path)
    val v = Snapshot.deleteWhereMergeOnRead(spark, path, col("id") <= 3L)
      .version

    val out = s"$base/export_mor"
    Snapshot.exportVersion(spark, path, out, Some(v))
    val plain = spark.read.parquet(out)
    // the deleted rows must NOT come back through the plain read
    assert(plain.count() == 7L)
    assert(plain.filter(col("id") <= 3L).isEmpty, "export resurrected deletes")
    assert(fp(plain) == fp(Snapshot.read(spark, path, Some(v))))
    val sidecar = new String(java.nio.file.Files.readAllBytes(
      Paths.get(s"$out/_graft_export.json")), "UTF-8")
    assert(sidecar.contains("\"mode\":\"materialized\""))
    // and the export is one flat directory (the staging dir is gone)
    assert(!java.nio.file.Files.exists(Paths.get(s"$out/_staged")))
  }
}
