package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import graft.operators.TableCheck
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The inbound bridge (Snapshot.importTable): an existing plain
  * parquet directory is adopted BY REFERENCE — no byte copied, no row
  * decoded — and the imported table behaves like a native one:
  * export→import round-trips with checksum equality, readWhere prunes
  * via the harvested footer stats, subsequent commits append on top,
  * and vacuum never reclaims the referenced originals.
  */
class SnapshotImportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    TableCheck.checksum(df, Seq("id", "v")).collect()(0)

  test("export -> import round-trips by reference; native commits follow") {
    val base = Files.createTempDirectory("snapimp").toString
    val src = s"$base/t"
    Snapshot.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)
    Snapshot.commitAppend(Seq((3L, "c")).toDF("id", "v"), src)
    val out = s"$base/exported"
    Snapshot.exportVersion(spark, src, out)

    // adopt the exported directory as a NEW snapshot table elsewhere
    val tbl = s"$base/adopted"
    val v1 = Snapshot.importTable(spark, out, tbl)
    assert(v1 == 1L)
    assert(fp(Snapshot.read(spark, tbl)) == fp(Snapshot.read(spark, src)))

    // by reference: the table dir holds NO data files of its own, and
    // the manifest entries resolve to the export directory's files
    val dataDir = new java.io.File(s"$tbl/data")
    assert(!dataDir.exists || dataDir.listFiles.isEmpty,
      "import must not copy data files")

    // a subsequent native commit appends on top of the imported base
    val v2 = Snapshot.commitAppend(Seq((4L, "d")).toDF("id", "v"), tbl)
    assert(v2 == 2L)
    assert(Snapshot.read(spark, tbl, Some(2L)).count() == 4L)
    // time travel back to the imported version still works
    assert(Snapshot.read(spark, tbl, Some(1L)).count() == 3L)

    // vacuum keeps only v2 but must NOT touch the referenced originals
    Snapshot.vacuum(tbl, 1)
    assert(spark.read.parquet(out).count() == 3L,
      "vacuum reclaimed externally-owned imported files")
    assert(Snapshot.read(spark, tbl).count() == 4L)
  }

  test("imported footer stats drive readWhere pruning") {
    val base = Files.createTempDirectory("snapimppr").toString
    val src = s"$base/plain"
    // two disjoint-range files -> a selective predicate must plan ONE
    (1L to 100L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartitionByRange(2, col("id")).write.parquet(src)
    val tbl = s"$base/t"
    Snapshot.importTable(spark, src, tbl)

    val pruned = Snapshot.readWhere(spark, tbl, col("id") <= 10L)
    assert(pruned.count() == 10L)
    val planned = pruned.inputFiles.length
    assert(planned == 1,
      s"expected the stats envelope to prune to 1 file, planned $planned")
    assert(Snapshot.read(spark, tbl).inputFiles.length == 2)
    // pruning removes I/O only, never rows
    assert(fp(pruned) ==
      fp(Snapshot.read(spark, tbl).filter(col("id") <= 10L)))
  }

  test("convert-in-place: srcDir == path, files stay put") {
    val base = Files.createTempDirectory("snapimpip").toString
    val dir = s"$base/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(dir)
    val before = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq

    Snapshot.importTable(spark, dir, dir)
    assert(Snapshot.versions(dir) == Seq(1L))
    assert(fp(Snapshot.read(spark, dir)) == fp(spark.read.parquet(
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))
        .map(_.getPath).toSeq: _*)))
    // in-place: same parquet files, untouched, now under management
    val after = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
    assert(after == before)
    // manifest entries are RELATIVE (relocatable table)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifests/v000001")), "UTF-8")
    manifest.split("\n").filterNot(_.startsWith("#")).foreach(l =>
      assert(!l.startsWith("/") && !l.contains("://"),
        s"in-place import should record relative entries, got $l"))
  }

  test("subdirectory sources import every row; hidden metadata trees " +
      "are skipped; dir-encoded partition columns are refused loudly") {
    val base = Files.createTempDirectory("snapimpsub").toString
    val src = s"$base/tree"
    // multi-commit-style tree: data lives only in subdirectories (the
    // pre-fix lister was non-recursive; a root-level file made it
    // return non-empty and the subdir rows vanished silently)
    (1L to 20L).map(i => (i, s"r$i")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/c1")
    (21L to 40L).map(i => (i, s"r$i")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/c2")
    Seq((100L, "root")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$base/rootpart")
    val rootFile = new java.io.File(s"$base/rootpart").listFiles
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(rootFile.toPath,
      java.nio.file.Paths.get(s"$src/extra-root.parquet"))
    // plant a decoy parquet inside a metadata dir that must be skipped
    val deltaLog = java.nio.file.Paths.get(s"$src/_delta_log")
    java.nio.file.Files.createDirectories(deltaLog)
    java.nio.file.Files.copy(rootFile.toPath,
      deltaLog.resolve("00000000.checkpoint.parquet"))

    val tbl = s"$base/t"
    Snapshot.importTable(spark, src, tbl)
    val got = Snapshot.read(spark, tbl)
    // 40 subdir rows + 1 root file; the _delta_log decoy excluded
    assert(got.count() == 41L,
      s"expected 41 rows (40 in subdirs + 1 root), got ${got.count()}")
    assert(got.filter(col("id") === 100L).count() == 1L)
    assert(got.filter(col("id") <= 40L).count() == 40L)

    // Hive-layout source: partition values live in dir NAMES only —
    // a by-reference manifest cannot recover them; must refuse, not
    // silently drop the column
    val hive = s"$base/hive"
    (1L to 8L).map(i => (i, i % 2, s"h$i")).toDF("id", "k", "v")
      .write.partitionBy("k").parquet(hive)
    val e = intercept[IllegalArgumentException] {
      Snapshot.importTable(spark, hive, s"$base/t2")
    }
    assert(e.getMessage.contains("partition column"))
    assert(e.getMessage.contains("k"))
  }

  test("refuses a target with existing versions and an empty source") {
    val base = Files.createTempDirectory("snapimpref").toString
    val src = s"$base/plain"
    Seq((1L, "a")).toDF("id", "v").write.parquet(src)
    val tbl = s"$base/t"
    Snapshot.commitOverwrite(Seq((9L, "z")).toDF("id", "v"), tbl)
    val e = intercept[IllegalArgumentException] {
      Snapshot.importTable(spark, src, tbl)
    }
    assert(e.getMessage.contains("already exist"))
    val empty = s"$base/empty"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(empty))
    val e2 = intercept[IllegalArgumentException] {
      Snapshot.importTable(spark, empty, s"$base/t2")
    }
    assert(e2.getMessage.contains("no parquet files"))
  }
}
