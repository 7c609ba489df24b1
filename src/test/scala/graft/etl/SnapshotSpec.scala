package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import graft.operators.TableCheck
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot contract: every published version stays readable and
  * byte-stable while new versions land (immutable files + atomic
  * manifest swap), append never rewrites existing data, rollback
  * republishes without destroying history, and vacuum destroys
  * exactly what retention says — nothing a kept version references.
  * Content equality is asserted with TableCheck fingerprints — the
  * reconciliation operator doing its actual job.
  */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fp(df: org.apache.spark.sql.DataFrame) =
    TableCheck.checksum(df, Seq("id", "v")).collect()(0)

  test("overwrite/append/time-travel/rollback keep every version readable") {
    val path = Files.createTempDirectory("snap").toString + "/t"
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val d2 = Seq((3L, "c")).toDF("id", "v")
    val d3 = Seq((9L, "z")).toDF("id", "v")

    assert(Snapshot.commitOverwrite(d1, path) == 1L)
    assert(Snapshot.commitAppend(d2, path) == 2L)
    assert(Snapshot.commitOverwrite(d3, path) == 3L)
    assert(Snapshot.versions(path) == Seq(1L, 2L, 3L))

    // time travel: each version is exactly its committed content
    assert(fp(Snapshot.read(spark, path, Some(1))) == fp(d1))
    assert(fp(Snapshot.read(spark, path, Some(2))) == fp(d1.unionByName(d2)))
    assert(fp(Snapshot.read(spark, path)) == fp(d3))

    // v2's files include v1's UNCHANGED files (append rewrote nothing)
    val v1Files = Snapshot.read(spark, path, Some(1))
      .select(org.apache.spark.sql.functions.input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    val v2Files = Snapshot.read(spark, path, Some(2))
      .select(org.apache.spark.sql.functions.input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(v1Files.subsetOf(v2Files), "append must reuse v1's files")

    // rollback publishes v4 == v2; v3 remains readable (linear history)
    assert(Snapshot.rollback(path, to = 2) == 4L)
    assert(fp(Snapshot.read(spark, path)) == fp(d1.unionByName(d2)))
    assert(fp(Snapshot.read(spark, path, Some(3))) == fp(d3))
  }

  test("commitAppendOnce is exactly-once under batch replay and crashed commits") {
    val path = Files.createTempDirectory("snap-once").toString + "/t"
    val b0 = Seq((1L, "a")).toDF("id", "v")
    val b1 = Seq((2L, "b")).toDF("id", "v")

    assert(Snapshot.commitAppendOnce(b0, path, "s1", batchId = 0).contains(1L))
    // replay of batch 0 (post-crash redelivery): skipped, nothing new
    assert(Snapshot.commitAppendOnce(b0, path, "s1", batchId = 0).isEmpty)
    assert(Snapshot.versions(path) == Seq(1L))

    // crash BEFORE the manifest rename: only orphan data files exist.
    // simulate by writing a data dir with no manifest
    b1.write.parquet(path + "/data/c999999-orphan")
    // the replayed batch 1 commits cleanly (orphans don't block it)
    assert(Snapshot.commitAppendOnce(b1, path, "s1", batchId = 1).contains(2L))
    assert(fp(Snapshot.read(spark, path)) == fp(b0.unionByName(b1)))
    // vacuum clears the orphan; committed versions unaffected
    val deleted = Snapshot.vacuum(path, keepVersions = 2)
    assert(deleted.exists(_.contains("c999999-orphan")))
    assert(fp(Snapshot.read(spark, path)) == fp(b0.unionByName(b1)))
  }

  test("a new stream id is not mistaken for a replay of the old stream") {
    val path = Files.createTempDirectory("snap-newstream").toString + "/t"
    val b = Seq((1L, "a")).toDF("id", "v")
    assert(Snapshot.commitAppendOnce(b, path, "s1", batchId = 0).contains(1L))
    assert(Snapshot.commitAppendOnce(b, path, "s1", batchId = 1).contains(2L))
    // fresh checkpoint => batch numbering restarts at 0 under a NEW id:
    // must commit, not be dropped as a replay of s1's batch 0/1
    assert(Snapshot.commitAppendOnce(b, path, "s2", batchId = 0).contains(3L))
    // while s1's own replay is still recognized
    assert(Snapshot.commitAppendOnce(b, path, "s1", batchId = 1).isEmpty)

    // history reads the audit trail from manifest metadata alone
    assert(Snapshot.history(path).map(h => (h.version, h.txn)) == Seq(
      (1L, Some("s1/0")), (2L, Some("s1/1")), (3L, Some("s2/0"))))
  }

  test("empty commits, rollback to them, and additive schema evolution stay readable") {
    val path = Files.createTempDirectory("snap-empty").toString + "/t"
    val d1 = Seq((1L, "a")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, path)                        // v1
    Snapshot.commitOverwrite(d1.filter("id < 0"), path)       // v2: EMPTY
    val empty = Snapshot.read(spark, path, Some(2))
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "v"))
    // rollback to the empty version must keep its schema header
    assert(Snapshot.rollback(path, to = 2) == 3L)
    assert(Snapshot.read(spark, path).count() == 0)
    // additive evolution: append a frame with an extra column; the
    // recorded schema governs ALL files, so old rows read with nulls
    // deterministically (not footer-pick-dependent)
    val d2 = Seq((2L, "b", 0.9)).toDF("id", "v", "quality")
    Snapshot.commitAppend(d2, path)                           // v4
    val got = Snapshot.read(spark, path)
    assert(got.columns.toSeq == Seq("id", "v", "quality"))
    assert(got.count() == 1 &&
      got.filter(org.apache.spark.sql.functions.col("quality").isNull)
        .count() == 0)

    intercept[IllegalArgumentException](Snapshot.vacuum(path, 0))
  }

  test("foreachBatch snapshot sink: the stream lands exactly once, time-travelable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = Files.createTempDirectory("snap-stream").toString + "/t"
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("id", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Snapshot.commitAppendOnce(batch, path, "stream-a", id); ()
      }
      .start()
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val all = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    assert(fp(Snapshot.read(spark, path)) == fp(all))
    // each micro-batch is its own time-travelable version
    assert(Snapshot.versions(path).size == 2)
    assert(fp(Snapshot.read(spark, path, Some(1))) ==
      fp(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
  }

  test("a table directory can be relocated between commit and read") {
    val base = Files.createTempDirectory("snap-move")
    val path = base.toString + "/t"
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val d2 = Seq((3L, "c")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, path)
    Snapshot.commitAppend(d2, path)
    // rename the whole table dir: manifests store root-relative paths,
    // so every version must stay readable at the new location
    val moved = base.toString + "/renamed"
    assert(new java.io.File(path).renameTo(new java.io.File(moved)))
    assert(fp(Snapshot.read(spark, moved, Some(1))) == fp(d1))
    assert(fp(Snapshot.read(spark, moved)) == fp(d1.unionByName(d2)))
    // vacuum at the new location still resolves liveness correctly:
    // nothing kept may be deleted
    Snapshot.commitOverwrite(d2, moved)
    Snapshot.vacuum(moved, keepVersions = 3)
    assert(fp(Snapshot.read(spark, moved, Some(1))) == fp(d1))
    assert(fp(Snapshot.read(spark, moved, Some(2))) == fp(d1.unionByName(d2)))
  }

  test("a lost version-allocation race fails loudly, not silently") {
    val path = Files.createTempDirectory("snap-race").toString + "/t"
    val d1 = Seq((1L, "a")).toDF("id", "v")
    val d2 = Seq((2L, "b")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, path) // v1
    // the race: writer A allocates v2 (max+1), then writer B commits
    // v2 first; A's publish of its stale v2 must fail loudly instead
    // of replacing B's manifest
    val stale = Snapshot.currentVersion(path).get + 1 // A allocates 2
    assert(Snapshot.commitOverwrite(d2, path) == stale) // B wins v2
    intercept[java.util.ConcurrentModificationException](
      Snapshot.commitOverwriteAt(d1, path, stale))
    // the loser changed nothing: B's v2 is intact and the loser's
    // data files are unreferenced (vacuum's job)
    assert(Snapshot.versions(path) == Seq(1L, 2L))
    assert(fp(Snapshot.read(spark, path, Some(2))) == fp(d2))
    assert(Snapshot.vacuum(path, keepVersions = 2).nonEmpty,
      "the loser's orphaned data files must be vacuumable")
  }

  test("stream replay markers survive vacuum dropping old manifests") {
    val path = Files.createTempDirectory("snap-marker").toString + "/t"
    val b0 = Seq((1L, "a")).toDF("id", "v")
    val d = Seq((9L, "z")).toDF("id", "v")
    assert(Snapshot.commitAppendOnce(b0, path, "s1", batchId = 5).contains(1L))
    // OTHER commits land after the stream's last batch...
    Snapshot.commitAppend(d, path)    // v2
    Snapshot.commitOverwrite(d, path) // v3
    // ...and vacuum drops every manifest before the stream restarts —
    // including the one that carried s1's own #txn marker
    Snapshot.vacuum(path, keepVersions = 1)
    assert(Snapshot.versions(path) == Seq(3L))
    // the carried txn state in v3 still identifies the replay: batch 5
    // must be skipped, not double-appended
    assert(Snapshot.commitAppendOnce(b0, path, "s1", batchId = 5).isEmpty)
    // while the stream's NEXT batch commits normally
    assert(Snapshot.commitAppendOnce(b0, path, "s1", batchId = 6).contains(4L))
  }

  test("snapshot reads keep filter pushdown and column pruning") {
    val path = Files.createTempDirectory("snap-push").toString + "/t"
    val d = (1L to 100L).map(i => (i, s"v$i", i * 2)).toDF("id", "v", "x")
    Snapshot.commitOverwrite(d, path)
    val q = Snapshot.read(spark, path)
      .filter(org.apache.spark.sql.functions.col("id") > 90)
      .select("id", "v")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThan(id,90)"),
      s"id filter must reach the parquet scan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("x:"),
      s"unprojected column x must not be read:\n$plan")
  }

  test("readChanges yields exactly the appended rows; rejects rewrites") {
    val path = Files.createTempDirectory("snap-cdc").toString + "/t"
    val d1 = Seq((1L, "a")).toDF("id", "v")
    val d2 = Seq((2L, "b")).toDF("id", "v")
    val d3 = Seq((3L, "c")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, path) // v1
    Snapshot.commitAppend(d2, path)    // v2
    Snapshot.commitAppend(d3, path)    // v3
    // bootstrap (since 0) and per-delta consumption
    assert(fp(Snapshot.readChanges(spark, path, 0, Some(1))) == fp(d1))
    assert(fp(Snapshot.readChanges(spark, path, 1, Some(2))) == fp(d2))
    assert(fp(Snapshot.readChanges(spark, path, 1)) == fp(d2.unionByName(d3)))
    // an empty delta is an empty frame with the right shape
    val none = Snapshot.readChanges(spark, path, 3)
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "v"))
    // an overwrite breaks append-only: the delta must refuse, loudly
    Snapshot.commitOverwrite(d1, path) // v4 rewrites everything
    intercept[IllegalStateException](Snapshot.readChanges(spark, path, 3))
    // but deltas entirely within the append-only prefix still work
    assert(fp(Snapshot.readChanges(spark, path, 2, Some(3))) == fp(d3))
  }

  test("optimize compacts and z-orders into a new version, content identical") {
    val path = Files.createTempDirectory("snap-opt").toString + "/t"
    val ks = Seq("id", "x")
    def fpx(df: org.apache.spark.sql.DataFrame) =
      TableCheck.checksum(df, ks).collect()(0)
    // many tiny appends -> many small files
    val parts = (0 until 6).map { i =>
      Seq((i.toLong, i.toLong * 7), (i + 100L, i * 3L)).toDF("id", "x")
    }
    parts.foreach(Snapshot.commitAppend(_, path))
    val all = parts.reduce(_ unionByName _)
    val before = Snapshot.currentVersion(path).get
    val nFilesBefore = Snapshot.history(path).last.files
    assert(nFilesBefore > 2, s"fixture should be fragmented, got $nFilesBefore")

    val v = Snapshot.optimize(spark, path, targetFiles = 2,
      zorderBy = Seq("id", "x"))
    assert(v == before + 1)
    assert(Snapshot.history(path).last.files <= 2, "optimize must compact")
    assert(fpx(Snapshot.read(spark, path)) == fpx(all),
      "optimize changed content")
    // old version untouched and still readable
    assert(fpx(Snapshot.read(spark, path, Some(before))) == fpx(all))
    // optimize is a rewrite: incremental consumers must be told
    intercept[IllegalStateException](
      Snapshot.readChanges(spark, path, before))
  }

  test("vacuum deletes only what kept versions no longer reference") {
    val path = Files.createTempDirectory("snap-vac").toString + "/t"
    val d1 = Seq((1L, "a")).toDF("id", "v")
    val d2 = Seq((2L, "b")).toDF("id", "v")
    Snapshot.commitOverwrite(d1, path) // v1 (files die with retention)
    Snapshot.commitOverwrite(d2, path) // v2
    Snapshot.commitAppend(d1, path)    // v3 = d2 + d1' (new files for d1)

    val deleted = Snapshot.vacuum(path, keepVersions = 2)
    assert(deleted.nonEmpty, "v1's unreferenced files must be deleted")
    assert(Snapshot.versions(path) == Seq(2L, 3L))
    // kept versions still read correctly after the vacuum
    assert(fp(Snapshot.read(spark, path, Some(2))) == fp(d2))
    assert(fp(Snapshot.read(spark, path, Some(3))) == fp(d2.unionByName(d1)))
  }
}
