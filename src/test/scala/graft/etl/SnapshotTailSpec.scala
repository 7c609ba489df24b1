package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import graft.operators.TableCheck
import org.scalatest.funsuite.AnyFunSuite

/** SnapshotTail contract: each poll delivers exactly the rows appended
  * since the last successful poll; a failed handler replays its whole
  * delta (cursor unmoved); composing the handler with commitAppendOnce
  * upgrades the pipeline to exactly-once end-to-end; rewrites follow
  * the caller's policy (fail loudly, or full-refresh and advance).
  */
class SnapshotTailSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    TableCheck.checksum(df, Seq("id", "v")).collect()(0)

  test("poll delivers per-version deltas once; nothing new => no delivery") {
    val root = Files.createTempDirectory("tail")
    val path = root.toString + "/t"
    val cursor = Cursor(root.toString + "/cur")
    val d1 = Seq((1L, "a")).toDF("id", "v")
    val d2 = Seq((2L, "b")).toDF("id", "v")
    val d3 = Seq((3L, "c")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, path) // v1
    Snapshot.commitAppend(d2, path)    // v2

    var seen = List.empty[SnapshotTail.Delta]
    // first poll: bootstrap consumes (0, 2]
    assert(SnapshotTail.poll(spark, path, cursor) { d => seen ::= d }
      .contains((0L, 2L)))
    assert(fp(seen.head.rows) == fp(d1.unionByName(d2)))
    // head unchanged: short-circuit, handler not called
    assert(SnapshotTail.poll(spark, path, cursor) { d => seen ::= d }.isEmpty)
    assert(seen.size == 1)
    // new append: only the delta arrives
    Snapshot.commitAppend(d3, path)    // v3
    assert(SnapshotTail.poll(spark, path, cursor) { d => seen ::= d }
      .contains((2L, 3L)))
    assert(fp(seen.head.rows) == fp(d3))
  }

  test("a crashed handler leaves the cursor unmoved and replays the delta") {
    val root = Files.createTempDirectory("tail-crash")
    val path = root.toString + "/t"
    val cursor = Cursor(root.toString + "/cur")
    val d1 = Seq((1L, "a")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, path)
    intercept[RuntimeException](
      SnapshotTail.poll(spark, path, cursor) { _ =>
        throw new RuntimeException("handler died")
      })
    assert(cursor.read().isEmpty, "cursor must not advance past a failure")
    var got: Option[SnapshotTail.Delta] = None
    assert(SnapshotTail.poll(spark, path, cursor) { d => got = Some(d) }
      .contains((0L, 1L)))
    assert(fp(got.get.rows) == fp(d1), "the failed delta must replay whole")
  }

  test("handler + commitAppendOnce = exactly-once sink under replay") {
    val root = Files.createTempDirectory("tail-once")
    val src = root.toString + "/src"
    val sink = root.toString + "/sink"
    val cursor = Cursor(root.toString + "/cur")
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, src)

    def handle(d: SnapshotTail.Delta): Unit =
      Snapshot.commitAppendOnce(d.rows, sink, "tail-consumer", d.until)

    // deliver, then simulate a crash AFTER the sink commit but BEFORE
    // the cursor write: replay the same delta by resetting the cursor
    SnapshotTail.poll(spark, src, cursor)(handle)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root.toString + "/cur/etl_cursor.json"))
    SnapshotTail.poll(spark, src, cursor)(handle) // replay of (0, 1]
    // the sink saw the delta twice but committed it once
    assert(fp(Snapshot.read(spark, sink)) == fp(d1))
    assert(Snapshot.versions(sink) == Seq(1L))
  }

  test("a rewrite in the range follows the policy: fail, or full refresh") {
    val root = Files.createTempDirectory("tail-rewrite")
    val path = root.toString + "/t"
    val cursor = Cursor(root.toString + "/cur")
    val d1 = Seq((1L, "a")).toDF("id", "v")
    val d2 = Seq((2L, "b")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, path) // v1
    SnapshotTail.poll(spark, path, cursor) { _ => () } // consume (0,1]
    Snapshot.commitAppend(d2, path)    // v2
    Snapshot.optimize(spark, path, targetFiles = 1) // v3 rewrites files
    // default policy: loud failure, cursor unmoved
    intercept[IllegalStateException](
      SnapshotTail.poll(spark, path, cursor) { _ => () })
    assert(cursor.read().contains(1L))
    // FullRefresh: the whole current version arrives as (0, 3]
    var got: Option[SnapshotTail.Delta] = None
    assert(SnapshotTail.poll(spark, path, cursor,
      SnapshotTail.OnRewrite.FullRefresh) { d => got = Some(d) }
      .contains((0L, 3L)))
    assert(fp(got.get.rows) == fp(d1.unionByName(d2)))
    // and the tail is caught up afterwards
    assert(SnapshotTail.poll(spark, path, cursor) { _ => () }.isEmpty)
  }
}
