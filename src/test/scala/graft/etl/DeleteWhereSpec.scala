package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import graft.operators.TableCheck
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Copy-on-write DELETE WHERE contract (Snapshot.deleteWhere): results
  * always equal read().filter(NOT p) under SQL DELETE null semantics;
  * pruning is visible as carried (never-read) files; deleted rows stay
  * time-travelable until vacuum, and after vacuum the bytes are gone
  * from every surviving file — the complete erasure procedure.
  */
class DeleteWhereSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshTable(): String = {
    val path = Files.createTempDirectory("delw").toString + "/t"
    // three disjoint-range files via three commits (same construction
    // as FileSkipSpec — each coalesce(1) commit is one file)
    Snapshot.commitOverwrite(
      (1L to 100L).map(i => (i, s"u${i % 7}", i * 10.0)).toDF("id", "user", "score").coalesce(1), path)
    Snapshot.commitAppend(
      (101L to 200L).map(i => (i, s"u${i % 7}", i * 10.0)).toDF("id", "user", "score").coalesce(1), path)
    Snapshot.commitAppend(
      (201L to 300L).map(i => (i, s"u${i % 7}", i * 10.0)).toDF("id", "user", "score").coalesce(1), path)
    path
  }

  test("delete removes exactly the matching rows and counts them") {
    val path = freshTable()
    val before = Snapshot.read(spark, path)
    val expected = before.filter(!(col("id") > 250L)).collect().map(_.toString).sorted.toSeq

    val r = Snapshot.deleteWhere(spark, path, col("id") > 250L)
    assert(r.deletedRows == 50L)
    assert(r.scannedRows == 100L, "only the one possibly-matching file is scanned")
    assert(r.rewrittenFiles == 1 && r.carriedFiles == 2,
      s"range-disjoint files should be carried, got $r")

    val after = Snapshot.read(spark, path).collect().map(_.toString).sorted.toSeq
    assert(after == expected)
  }

  test("carried files are the same physical files (no rewrite I/O)") {
    val path = freshTable()
    val beforeFiles = Snapshot.read(spark, path).inputFiles.toSet
    Snapshot.deleteWhere(spark, path, col("id") <= 100L)
    val afterFiles = Snapshot.read(spark, path).inputFiles.toSet
    // the two untouched files survive by reference; the touched one is gone
    assert((afterFiles -- beforeFiles).size <= 1)
    assert((beforeFiles intersect afterFiles).size == 2)
  }

  test("NULL predicate rows survive (SQL DELETE semantics)") {
    val path = Files.createTempDirectory("delw-null").toString + "/t"
    Snapshot.commitOverwrite(
      Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
        .toDF("id", "tag").coalesce(1), path)
    // tag = 'a' is NULL for row 2 — it must survive
    val r = Snapshot.deleteWhere(spark, path, col("tag") === "a")
    assert(r.deletedRows == 1L)
    assert(Snapshot.read(spark, path).select("id").as[Long].collect().sorted.toSeq
      == Seq(2L, 3L))
  }

  test("provable no-op publishes no new version") {
    val path = freshTable()
    val v0 = Snapshot.currentVersion(path).get
    val r = Snapshot.deleteWhere(spark, path, col("id") > 10000L)
    assert(r.version == v0 && r.rewrittenFiles == 0 && r.deletedRows == 0L)
    assert(Snapshot.currentVersion(path).get == v0)
  }

  test("deleted rows stay time-travelable until vacuum purges them") {
    val path = freshTable()
    val v0 = Snapshot.currentVersion(path).get
    def fp(df: org.apache.spark.sql.DataFrame) =
      TableCheck.checksum(df, Seq("id", "user", "score")).collect()(0)
    val fp0 = fp(Snapshot.read(spark, path))

    Snapshot.deleteWhere(spark, path, col("user") === "u3")
    // time travel still sees the full pre-delete content, byte-identical
    assert(fp(Snapshot.read(spark, path, Some(v0))) == fp0)

    // legal purge: vacuum to 1 version, then NO surviving file holds a
    // deleted row (scan every remaining parquet directly, not via
    // the manifest — the bytes themselves must be gone)
    Snapshot.vacuum(path, keepVersions = 1)
    val survivors = Snapshot.read(spark, path)
    assert(survivors.filter(col("user") === "u3").count() == 0)
    val allRemaining = spark.read.parquet(survivors.inputFiles: _*)
    assert(allRemaining.filter(col("user") === "u3").count() == 0)
    // and the old version is genuinely unreadable now
    intercept[Exception] {
      Snapshot.read(spark, path, Some(v0)).collect()
    }
  }

  test("update rewrites only matching rows, evaluated against the OLD row") {
    val path = freshTable()
    // swap semantics: id := id + score, score := id — if SET expressions
    // saw each other's new values, score would become the NEW id
    val r = Snapshot.updateWhere(spark, path, col("id") <= 100L,
      Map("id" -> (col("id") + col("score")), "score" -> col("id").cast("double")))
    assert(r.affectedRows == 100L && r.rewrittenFiles == 1 && r.carriedFiles == 2)
    val row5 = Snapshot.read(spark, path).filter(col("score") === 5.0).collect()
    assert(row5.length == 1)
    // old row: id=5, score=50.0 → new id=55, new score=5.0 (OLD id)
    assert(row5(0).getAs[Long]("id") == 55L)
    // non-matching rows untouched
    assert(Snapshot.read(spark, path)
      .filter(col("id") === 200L && col("score") === 2000.0).count() == 1)
  }

  test("update keeps the table schema's column types (SET casts)") {
    val path = freshTable()
    // integer literal into a double column: schema must stay double
    Snapshot.updateWhere(spark, path, col("id") === 1L,
      Map("score" -> lit(7)))
    val df = Snapshot.read(spark, path)
    assert(df.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(df.filter(col("id") === 1L).select("score").as[Double].head() == 7.0)
  }

  test("update on a nonexistent column fails loudly") {
    val path = freshTable()
    intercept[IllegalArgumentException] {
      Snapshot.updateWhere(spark, path, col("id") === 1L,
        Map("nope" -> lit(1)))
    }
  }

  test("delete equals filter on an unclustered single-file table (no stats edge)") {
    val path = Files.createTempDirectory("delw-one").toString + "/t"
    Snapshot.commitOverwrite(
      (1L to 1000L).map(i => (i, i % 13)).toDF("id", "bucket").coalesce(1), path)
    val r = Snapshot.deleteWhere(spark, path, col("bucket") === 4L)
    assert(r.deletedRows == (1L to 1000L).count(_ % 13 == 4))
    assert(Snapshot.read(spark, path).count() == 1000L - r.deletedRows)
  }

  // Property sweep: for a family of predicates spanning the pruning
  // shapes (range, equality, IN, string prefix, arithmetic fallback),
  // DML results must equal their DataFrame-algebra definitions and
  // counts must conserve — the cheap-to-state invariants that catch a
  // stats-envelope or null-handling regression anywhere in the family.
  test("property: delete(p) ≡ filter(NOT p) and update(p) conserves rows, across predicate shapes") {
    val preds = Seq(
      col("id") > 150L && col("id") <= 250L,
      col("user") === "u5",
      col("id").isin(3L, 77L, 201L, 9999L),
      col("user").startsWith("u1"),
      col("id") % 7 === 0, // arithmetic: unprunable, full rewrite path
      lit(false), // matches nothing
      col("score") >= 2990.0)
    for (p <- preds) {
      val path = freshTable()
      val before = Snapshot.read(spark, path)
      val total = before.count()
      val expectDeleted = before.filter(coalesce(p, lit(false))).count()
      val expected = before.filter(!coalesce(p, lit(false)))
        .collect().map(_.toString).sorted.toSeq
      val r = Snapshot.deleteWhere(spark, path, p)
      assert(r.deletedRows == expectDeleted, s"delete count for $p")
      val after = Snapshot.read(spark, path)
      assert(after.collect().map(_.toString).sorted.toSeq == expected,
        s"delete result for $p")
      assert(after.count() == total - expectDeleted, s"conservation for $p")

      // update on a fresh copy: row count never changes, only matching
      // rows change, and exactly deletedRows-many rows differ
      val path2 = freshTable()
      val r2 = Snapshot.updateWhere(spark, path2, p,
        Map("score" -> (col("score") + 1.0)))
      assert(r2.affectedRows == expectDeleted, s"update count for $p")
      val after2 = Snapshot.read(spark, path2)
      assert(after2.count() == total, s"update conservation for $p")
      assert(after2.filter(col("score") === col("id") * 10.0 + 1.0).count()
        == expectDeleted, s"updated-row content for $p")
    }
  }
}
