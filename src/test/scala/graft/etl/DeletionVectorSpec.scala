package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import graft.operators.TableCheck
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read DELETE WHERE contract: a deletion-vector commit
  * deletes rows by publishing a sidecar + manifest only — no data file
  * is rewritten — and every other lake operation composes with it:
  * reads/readWhere apply it, appends and rollbacks carry it, optimize
  * and copy-on-write DML materialize it (without resurrecting rows),
  * vacuum protects referenced sidecars and reclaims orphaned ones,
  * CDC refuses a range containing one, and a relocated table keeps
  * applying it (root-relative keys).
  */
class DeletionVectorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    TableCheck.checksum(df, Seq("id", "v")).collect()(0)

  private def table(n: Int): org.apache.spark.sql.DataFrame =
    spark.range(1, n + 1).select(col("id"),
      org.apache.spark.sql.functions.concat(lit("r"), col("id")).as("v"))

  /** Every data parquet on disk, excluding DV sidecar dirs — a MoR
    * delete must leave this set untouched (no file rewritten, none
    * added).
    */
  private def diskDataFiles(path: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(path, "data"))
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getParentFile.getName.startsWith("dv"))
      .map(_.getAbsolutePath).toSet
  }

  test("MoR delete rewrites nothing, matches CoW results, is idempotent") {
    val path = Files.createTempDirectory("dv").toString + "/t"
    Snapshot.commitOverwrite(table(100).repartition(4), path)

    val before = diskDataFiles(path)
    val r = Snapshot.deleteWhereMergeOnRead(spark, path, col("id") % 10 === 3)
    assert(r.version == 2L && r.rewrittenFiles == 0 && r.deletedRows == 10L)
    // no data file rewritten or added: same physical files on disk
    assert(diskDataFiles(path) == before)
    // content identical to what a CoW delete of the same predicate gives
    val expected = table(100).filter(!(col("id") % 10 === 3))
    assert(fp(Snapshot.read(spark, path)) == fp(expected))
    assert(Snapshot.read(spark, path).count() == 90L)
    // time travel: pre-delete version still has every row
    assert(Snapshot.read(spark, path, Some(1)).count() == 100L)

    // same predicate again: 0 new deletions, no new version
    val r2 = Snapshot.deleteWhereMergeOnRead(spark, path, col("id") % 10 === 3)
    assert(r2.version == 2L && r2.deletedRows == 0L)
    assert(Snapshot.versions(path) == Seq(1L, 2L))

    // a second DV commit stacks on the first; id 3 is already deleted
    // by the first vector, so only 1,2,4,5 count as NEW deletions
    val r3 = Snapshot.deleteWhereMergeOnRead(spark, path, col("id") <= 5)
    assert(r3.version == 3L && r3.deletedRows == 4L)
    assert(fp(Snapshot.read(spark, path)) ==
      fp(expected.filter(col("id") > 5)))
  }

  test("appends and readWhere compose with carried deletion vectors") {
    val path = Files.createTempDirectory("dv-app").toString + "/t"
    Snapshot.commitOverwrite(table(50), path)
    Snapshot.deleteWhereMergeOnRead(spark, path, col("id") <= 20)
    val appended = Seq((200L, "x"), (201L, "y")).toDF("id", "v")
    Snapshot.commitAppend(appended, path)

    val expect = table(50).filter(col("id") > 20).unionByName(appended)
    assert(fp(Snapshot.read(spark, path)) == fp(expect))
    // readWhere (stats-pruned path) applies the DV too
    assert(Snapshot.readWhere(spark, path, col("id") <= 30).count() == 10L)
    // exactly-once stream append carries the DV as well
    Snapshot.commitAppendOnce(Seq((300L, "z")).toDF("id", "v"),
      path, "sdv", batchId = 0)
    assert(Snapshot.read(spark, path).filter(col("id") <= 20).count() == 0L)
  }

  test("rollback across and onto DV versions; CDC refuses a DV range") {
    val path = Files.createTempDirectory("dv-rb").toString + "/t"
    Snapshot.commitOverwrite(table(30), path) // v1
    Snapshot.deleteWhereMergeOnRead(spark, path, col("id") <= 10) // v2
    Snapshot.commitAppend(Seq((100L, "n")).toDF("id", "v"), path) // v3

    // rollback to pre-delete: rows resurrect (v4)
    Snapshot.rollback(path, to = 1)
    assert(Snapshot.read(spark, path).count() == 30L)
    // rollback to post-delete: deletes hold (v5)
    Snapshot.rollback(path, to = 3)
    assert(Snapshot.read(spark, path).count() == 21L)

    // CDC: append-only range works, a range containing the DV refuses
    assert(Snapshot.readChanges(spark, path, sinceVersion = 2,
      untilVersion = Some(3)).count() == 1L)
    val e = intercept[IllegalStateException](
      Snapshot.readChanges(spark, path, sinceVersion = 1,
        untilVersion = Some(2)))
    assert(e.getMessage.contains("deletion vector"))
    // bootstrap (since=0) reads the head WITH its DVs applied
    assert(Snapshot.readChanges(spark, path, sinceVersion = 0,
      untilVersion = Some(2)).count() == 20L)
  }

  test("optimize and CoW DML materialize DVs without resurrecting rows") {
    val path = Files.createTempDirectory("dv-opt").toString + "/t"
    Snapshot.commitOverwrite(table(100).repartition(4), path)
    Snapshot.deleteWhereMergeOnRead(spark, path, col("id") <= 40) // v2
    // optimize rewrites every file from the DV-applied read: the new
    // manifest must carry NO '#dv=' header and identical content
    val v3 = Snapshot.optimize(spark, path, targetFiles = 2)
    val expect = table(100).filter(col("id") > 40)
    assert(fp(Snapshot.read(spark, path, Some(v3))) == fp(expect))
    assert(Snapshot.read(spark, path).count() == 60L)

    // CoW delete on a DV-bearing table: rewritten files must not
    // resurrect DV-deleted rows, carried files keep their DVs
    val path2 = Files.createTempDirectory("dv-cow").toString + "/t"
    Snapshot.commitOverwrite(table(100).repartition(4), path2)
    Snapshot.deleteWhereMergeOnRead(spark, path2, col("id") % 2 === 0)
    val r = Snapshot.deleteWhere(spark, path2, col("id") <= 10)
    assert(r.deletedRows == 5L) // 1,3,5,7,9 — evens were already gone
    assert(fp(Snapshot.read(spark, path2)) ==
      fp(table(100).filter(col("id") % 2 =!= 0 && col("id") > 10)))

    // updateWhere: DV-deleted rows are not scanned back to life either
    val u = Snapshot.updateWhere(spark, path2, col("id") === 20,
      Map("v" -> lit("changed")))
    assert(u.affectedRows == 0L) // 20 is even: deleted
    assert(Snapshot.read(spark, path2).filter(col("v") === "changed")
      .count() == 0L)
  }

  test("vacuum keeps referenced sidecars, reclaims orphaned ones; relocation holds") {
    val path = Files.createTempDirectory("dv-vac").toString + "/t"
    Snapshot.commitOverwrite(table(40), path) // v1
    Snapshot.deleteWhereMergeOnRead(spark, path, col("id") <= 15) // v2

    // retention to the DV version only: the sidecar must survive
    Snapshot.vacuum(path, keepVersions = 1)
    assert(Snapshot.read(spark, path).count() == 25L)

    // materialize, then vacuum: the sidecar is no longer referenced
    Snapshot.optimize(spark, path, targetFiles = 1) // v3
    Snapshot.vacuum(path, keepVersions = 1)
    assert(Snapshot.read(spark, path).count() == 25L)
    val dataDir = new java.io.File(path, "data")
    assert(!dataDir.listFiles().exists(_.getName.startsWith("dv")),
      "materialized deletion-vector sidecar dir must be vacuumed")

    // relocation: DV keys are root-relative, so a moved table still
    // applies its vectors
    val p2 = Files.createTempDirectory("dv-moved").toString + "/t"
    Snapshot.commitOverwrite(table(40), p2)
    Snapshot.deleteWhereMergeOnRead(spark, p2, col("id") <= 15)
    val moved = Files.createTempDirectory("dv-moved2").toString + "/t2"
    assert(new java.io.File(p2).renameTo(new java.io.File(moved)))
    assert(Snapshot.read(spark, moved).count() == 25L)
  }
}
