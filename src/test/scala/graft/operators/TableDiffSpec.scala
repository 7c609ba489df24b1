package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TableDiff's contract: identical versions diff to all-unchanged; the
  * classification is exact per key (added/removed/changed); layout
  * (order, partitioning) never affects the report; and the summary's
  * key checksums let two independent runs certify they saw the same
  * key sets.
  */
class TableDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "s", "v")
  }

  test("identical versions: every key unchanged") {
    val m = TableDiff.summary(base, base, Seq("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("unchanged" -> 4L))
  }

  test("classification is exact per key") {
    import spark.implicits._
    // drop k=2, change k=3's value, add k=9
    val v2 = Seq((1L, "a", 10L), (3L, "c", 31L), (4L, "d", 40L),
      (9L, "z", 90L)).toDF("k", "s", "v")
    val st = TableDiff.status(base, v2, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "unchanged", 2L -> "removed", 3L -> "changed",
      4L -> "unchanged", 9L -> "added"))
  }

  test("layout invariance: repartition/shuffle changes nothing") {
    import spark.implicits._
    val v2 = Seq((1L, "a", 10L), (3L, "c", 31L), (4L, "d", 40L),
      (9L, "z", 90L)).toDF("k", "s", "v")
    val a = TableDiff.summary(base, v2, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = TableDiff.summary(base.repartition(7), v2.orderBy(desc("v")),
      Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("summary checksums identify the key sets, not just their sizes") {
    import spark.implicits._
    // two diffs with the SAME status counts but DIFFERENT removed keys
    // must publish different key checksums
    val v2a = base.filter(col("k") =!= 1L)
    val v2b = base.filter(col("k") =!= 2L)
    def removedCk(v2: org.apache.spark.sql.DataFrame) =
      TableDiff.summary(base, v2, Seq("k")).filter(col("status") === "removed")
        .collect()(0)
    val (ra, rb) = (removedCk(v2a), removedCk(v2b))
    assert(ra.getLong(1) == 1L && rb.getLong(1) == 1L)
    assert(ra.getLong(2) != rb.getLong(2))
  }

  test("composite keys and NULL-bearing value columns diff correctly") {
    import spark.implicits._
    val a = Seq((1L, "x", Option("p")), (1L, "y", Option.empty[String]))
      .toDF("k1", "k2", "v")
    // NULL -> "p" on (1,y) is a CHANGE, not unchanged (the reserved-N
    // rendering makes NULL a first-class value)
    val b = Seq((1L, "x", Option("p")), (1L, "y", Option("p")))
      .toDF("k1", "k2", "v")
    val st = TableDiff.status(a, b, Seq("k1", "k2")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(st == Map((1L, "x") -> "unchanged", (1L, "y") -> "changed"))
  }

  test("diff between two lake snapshot versions") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("tablediff-snap").toString
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val v1 = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "s")
    val ver0 = graft.etl.Snapshot.commitOverwrite(v0, dir)
    val ver1 = graft.etl.Snapshot.commitOverwrite(v1, dir)
    val before = graft.etl.Snapshot.read(spark, dir, Some(ver0))
    val after = graft.etl.Snapshot.read(spark, dir, Some(ver1))
    val m = TableDiff.summary(before.select("k", "s"), after.select("k", "s"),
      Seq("k")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("unchanged" -> 1L, "changed" -> 1L, "added" -> 1L))
  }
}
