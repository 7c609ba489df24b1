package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import graft.operators.TableCheck
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-writer contracts, interleaved DETERMINISTICALLY via the
  * Snapshot.onBeforePublish fault-injection seam (the hook fires after
  * a commit assembled its manifest from the pinned head, i.e. exactly
  * inside the race window):
  *
  *  - append vs append: optimistic retry — both commit, final table is
  *    the exact union (Delta's append-never-conflicts rule);
  *  - deleteWhere / updateWhere vs append: the DML publish is pinned
  *    at head+1, so the interloper makes it fail LOUDLY instead of
  *    publishing a manifest that silently drops the appended files
  *    (lost-update detection);
  *  - overwrite vs overwrite: fail-loudly (no well-defined merge).
  */
class ConcurrentCommitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fresh(): String = {
    val path = Files.createTempDirectory("conc").toString + "/t"
    Snapshot.commitOverwrite(
      (1L to 100L).map(i => (i, i * 10.0)).toDF("id", "score").coalesce(1),
      path)
    path
  }

  private def interleave(body: => Unit): Unit =
    Snapshot.onBeforePublish = () => {
      Snapshot.onBeforePublish = () => ()
      body
    }

  override def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally Snapshot.onBeforePublish = () => ()

  test("two interleaved appenders both commit; final table is the union") {
    val path = fresh()
    val mine = (101L to 150L).map(i => (i, i * 10.0)).toDF("id", "score")
    val theirs = (151L to 200L).map(i => (i, i * 10.0)).toDF("id", "score")
    // the interloper publishes while OUR append sits in its publish
    // window — our first publish collides, the retry re-reads the new
    // head and lands on top of it
    interleave { Snapshot.commitAppend(theirs.coalesce(1), path) }
    Snapshot.commitAppend(mine.coalesce(1), path)
    assert(Snapshot.versions(path) == Seq(1L, 2L, 3L))
    val expect = (1L to 200L).map(i => (i, i * 10.0)).toDF("id", "score")
    val got = Snapshot.read(spark, path)
    assert(got.count() == 200L)
    assert(
      TableCheck.checksum(got, Seq("id", "score")).collect()(0) ==
        TableCheck.checksum(expect, Seq("id", "score")).collect()(0))
  }

  test("replayed batch racing itself commits once (commitAppendOnce)") {
    val path = fresh()
    val batch = (101L to 150L).map(i => (i, i * 10.0)).toDF("id", "score")
    // a second instance of the SAME stream commits the SAME batch in
    // our publish window: the retry re-checks the marker and resolves
    // as a skip — one append total, not two
    interleave {
      assert(Snapshot.commitAppendOnce(batch.coalesce(1), path, "s1", 7L)
        .nonEmpty)
    }
    assert(Snapshot.commitAppendOnce(batch.coalesce(1), path, "s1", 7L).isEmpty)
    assert(Snapshot.read(spark, path).count() == 150L)
  }

  test("deleteWhere fails loudly when an append lands in its publish window") {
    val path = fresh()
    interleave {
      Snapshot.commitAppend(
        (101L to 120L).map(i => (i, i * 10.0)).toDF("id", "score")
          .coalesce(1), path)
    }
    intercept[java.util.ConcurrentModificationException] {
      Snapshot.deleteWhere(spark, path, col("id") <= 10L)
    }
    // the interloper's rows are intact; the failed delete changed nothing
    assert(Snapshot.read(spark, path).count() == 120L)
  }

  test("updateWhere fails loudly when an append lands in its publish window") {
    val path = fresh()
    interleave {
      Snapshot.commitAppend(
        (101L to 120L).map(i => (i, i * 10.0)).toDF("id", "score")
          .coalesce(1), path)
    }
    intercept[java.util.ConcurrentModificationException] {
      Snapshot.updateWhere(spark, path, col("id") <= 10L,
        Map("score" -> lit(0.0)))
    }
    assert(Snapshot.read(spark, path).count() == 120L)
  }

  test("concurrent overwrite stays fail-loudly") {
    val path = fresh()
    interleave {
      Snapshot.commitOverwrite(
        Seq((1L, 1.0)).toDF("id", "score").coalesce(1), path)
    }
    intercept[java.util.ConcurrentModificationException] {
      Snapshot.commitOverwrite(
        Seq((2L, 2.0)).toDF("id", "score").coalesce(1), path)
    }
    // the winner's overwrite is the table
    assert(Snapshot.read(spark, path).collect().map(_.getLong(0)).toSeq
      == Seq(1L))
  }

  test("SET column names resolve case-insensitively like any Spark plan") {
    val path = fresh()
    val r = Snapshot.updateWhere(spark, path, col("id") === 5L,
      Map("SCORE" -> lit(999.0)))
    assert(r.affectedRows == 1L)
    assert(Snapshot.read(spark, path).filter(col("id") === 5L)
      .select("score").as[Double].head() == 999.0)
    intercept[IllegalArgumentException] {
      Snapshot.updateWhere(spark, path, col("id") === 5L,
        Map("score" -> lit(1.0), "SCORE" -> lit(2.0)))
    }
  }
}
