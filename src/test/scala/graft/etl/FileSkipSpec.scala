package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest file-skipping contract (FileStats + Snapshot.readWhere):
  * pruning must be invisible in results (always exactly
  * read().filter(p)) and visible in I/O (fewer files planned when
  * the envelope proves a file irrelevant). Conservative fallbacks —
  * statless files, unsupported shapes, legacy manifests — keep
  * files, never drop them.
  */
class FileSkipSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** readWhere(p) ≡ read().filter(p), returning planned file count. */
  private def checkSame(path: String, p: Column): Int = {
    val pruned = Snapshot.readWhere(spark, path, p)
    val full = Snapshot.read(spark, path).filter(p)
    val a = pruned.collect().map(_.toString).sorted.toSeq
    val b = full.collect().map(_.toString).sorted.toSeq
    assert(a == b, s"pruned result diverged for $p")
    pruned.inputFiles.length
  }

  private def totalFiles(path: String): Int =
    Snapshot.read(spark, path).inputFiles.length

  test("disjoint appends prune to the single relevant file") {
    val path = Files.createTempDirectory("skip").toString + "/t"
    Snapshot.commitOverwrite(
      (1L to 100L).map(i => (i, s"a$i%03d")).toDF("id", "v").coalesce(1), path)
    Snapshot.commitAppend(
      (101L to 200L).map(i => (i, f"b$i%03d")).toDF("id", "v").coalesce(1), path)
    Snapshot.commitAppend(
      (201L to 300L).map(i => (i, f"c$i%03d")).toDF("id", "v").coalesce(1), path)
    assert(totalFiles(path) == 3)

    assert(checkSame(path, col("id") === 150L) == 1)
    assert(checkSame(path, col("id") > 250L) == 1)
    assert(checkSame(path, col("id") <= 100L) == 1)
    assert(checkSame(path, col("id") >= 101L && col("id") < 120L) == 1)
    // OR spans two files, third stays pruned
    assert(checkSame(path, col("id") === 50L || col("id") === 250L) == 2)
    // IN list across two files
    assert(checkSame(path, col("id").isin(10L, 110L)) == 2)
    // reversed operand order prunes the same way
    assert(checkSame(path, lit(250L) < col("id")) == 1)
    // string envelope: files carry disjoint prefixes a/b/c
    assert(checkSame(path, col("v") === "b150") == 1)
    assert(checkSame(path, col("v").startsWith("c")) == 1)
    // no row anywhere can match: zero files planned
    assert(checkSame(path, col("id") > 1000L) == 0)
    // unsupported shape (arithmetic) keeps all files but stays correct
    assert(checkSame(path, col("id") % 7 === 0) == 3)
  }

  test("null envelopes: IS NULL / IS NOT NULL / equality prune") {
    val path = Files.createTempDirectory("skipnull").toString + "/t"
    Snapshot.commitOverwrite(
      Seq((1L, Some("x")), (2L, Some("y"))).toDF("id", "v").coalesce(1), path)
    Snapshot.commitAppend(
      Seq((3L, None: Option[String]), (4L, None)).toDF("id", "v").coalesce(1),
      path)
    assert(totalFiles(path) == 2)
    // only the second file holds nulls; only the first holds values
    assert(checkSame(path, col("v").isNull) == 1)
    assert(checkSame(path, col("v").isNotNull) == 1)
    // equality can't match an all-null file
    assert(checkSame(path, col("v") === "x") == 1)
    // null-safe equality against NULL needs a null row
    assert(checkSame(path, col("v") <=> lit(null)) == 1)
  }

  test("optimize with Z-order makes range queries skip files") {
    val path = Files.createTempDirectory("skipz").toString + "/t"
    val rows = scala.util.Random.shuffle(
      (for (x <- 0L until 20L; y <- 0L until 20L) yield (x, y)).toList)
    Snapshot.commitOverwrite(rows.toDF("x", "y").repartition(8), path)
    // random layout: a narrow slice still touches ~every file
    val before = checkSame(path, col("x") === 3L)
    Snapshot.optimize(spark, path, targetFiles = 8, zorderBy = Seq("x", "y"))
    val after = checkSame(path, col("x") === 3L)
    assert(after < totalFiles(path),
      s"z-ordered layout must prune ($after of ${totalFiles(path)} files)")
    assert(after <= before)
    // both clustered dimensions prune
    assert(checkSame(path, col("y") >= 18L) < totalFiles(path))
  }

  test("stats carry forward across commits without footer re-reads") {
    val path = Files.createTempDirectory("skipcarry").toString + "/t"
    Snapshot.commitOverwrite(
      (1L to 10L).map(i => (i, i * 2)).toDF("id", "w").coalesce(1), path)
    Snapshot.commitAppend(
      (11L to 20L).map(i => (i, i * 2)).toDF("id", "w").coalesce(1), path)
    val (fs, root) = LakeFs.resolve(path)
    def manifest(v: Long): Seq[String] = {
      val in = fs.open(new org.apache.hadoop.fs.Path(root, f"manifests/v$v%06d"))
      val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      s.split("\n").filter(_.nonEmpty).toSeq
    }
    val v1Stats = manifest(1).filter(_.startsWith("#stats="))
    val v2Stats = manifest(2).filter(_.startsWith("#stats="))
    assert(v1Stats.size == 1 && v2Stats.size == 2)
    // v1's line is reused verbatim in v2 (carry, not recompute)
    assert(v2Stats.contains(v1Stats.head))
    // ... and relocating the table keeps pruning intact (relative keys)
    val moved = path + "_moved"
    assert(fs.rename(root, new org.apache.hadoop.fs.Path(moved)))
    assert(checkSame(moved, col("id") > 15L) == 1)
  }

  test("legacy manifests without stats read correctly, unpruned") {
    val path = Files.createTempDirectory("skiplegacy").toString + "/t"
    Snapshot.commitOverwrite(
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), path)
    Snapshot.commitAppend(
      (51L to 99L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), path)
    // strip the stats lines in place — a manifest written before the
    // stats format existed
    val (fs, root) = LakeFs.resolve(path)
    val mf = new org.apache.hadoop.fs.Path(root, "manifests/v000002")
    val in = fs.open(mf)
    val lines = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val stripped = lines.split("\n").filterNot(_.startsWith("#stats="))
    val out = fs.create(mf, true)
    try out.write((stripped.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    assert(checkSame(path, col("id") > 90L) == 2) // no stats → no pruning
    // a fresh append restores stats for ALL files (one-time backfill)
    Snapshot.commitAppend(
      (100L to 120L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), path)
    assert(checkSame(path, col("id") > 110L) == 1)
  }

  test("pruning never consults a column the file has no stats for") {
    val path = Files.createTempDirectory("skipmixed").toString + "/t"
    // decimal column: deliberately outside the supported stats domains
    val df = (1L to 40L).map(i => (i, BigDecimal(i) / 4)).toDF("id", "d")
    Snapshot.commitOverwrite(df.coalesce(1), path)
    Snapshot.commitAppend(
      (41L to 80L).map(i => (i, BigDecimal(i) / 4)).toDF("id", "d").coalesce(1),
      path)
    // decimal predicate: no envelope → both files kept, result exact
    assert(checkSame(path, col("d") > 10.0) == 2)
    // id predicate still prunes — the decimal column doesn't poison
    // the file's other envelopes
    assert(checkSame(path, col("id") <= 40L) == 1)
  }
}
