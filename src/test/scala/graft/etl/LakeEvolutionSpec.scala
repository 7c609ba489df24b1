package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Additive schema evolution on the parquet lake: new columns appear
  * in newly appended files only, mergeSchema reconciles at read with
  * NULLs for pre-evolution rows, and the default (no-mergeSchema) read
  * keeps the original schema — evolution is opt-in per read, never a
  * rewrite of historical files.
  */
class LakeEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("appended columns merge at read; old rows read as NULL") {
    val path = Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
      .write.parquet(path)
    // the pipeline starts emitting an enrichment column later on
    Seq((3L, "c", 0.9)).toDF("id", "payload", "quality")
      .write.mode("append").parquet(path)

    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet == Set("id", "payload", "quality"))
    val rows = merged.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSet
    assert(rows == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.9))))

    // without mergeSchema Spark picks one footer's schema — readers
    // that declared the old shape keep working against evolved data
    val declared = spark.read.schema("id BIGINT, payload STRING").parquet(path)
    assert(declared.columns.toSeq == Seq("id", "payload"))
    assert(declared.count() == 3)
  }

  // ---- non-additive evolution through Snapshot manifests (field ids)

  private def snapTable(): String = {
    val path = Files.createTempDirectory("evolve-snap").toString + "/t"
    Snapshot.commitOverwrite(
      Seq((1, "a", 1.5f), (2, "b", 2.5f)).toDF("id", "payload", "score")
        .coalesce(1), path)
    path
  }

  test("addColumn + non-nullable additive append: carried files read " +
      "NULL, never rejected") {
    val path = Files.createTempDirectory("evolve-add").toString + "/t"
    Snapshot.commitOverwrite(
      Seq((1L, "a"), (2L, "b")).toDF("id", "payload").coalesce(1), path)

    // explicit header-only ADD: no data file written, reads null-fill
    Snapshot.addColumn(spark, path, "quality", org.apache.spark.sql.types.DoubleType)
    val afterAdd = Snapshot.read(spark, path)
    assert(afterAdd.columns.toSeq == Seq("id", "payload", "quality"))
    assert(afterAdd.collect().forall(_.isNullAt(2)))

    // an additive append whose frame claims NOT NULL (e.g. literals)
    // must not poison the recorded schema: the carried pre-add file
    // has no 'quality' at all, so the column stays nullable
    val frame = Seq((3L, "c", 0.9)).toDF("id", "payload", "quality")
    assert(!frame.schema("quality").nullable)
    Snapshot.commitAppend(frame, path)
    val merged = Snapshot.read(spark, path)
    assert(merged.schema("quality").nullable)
    val rows = merged.collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows == Set((1L, None), (2L, None), (3L, Some(0.9))))

    // time travel: the pre-add version still shows the narrow shape
    assert(Snapshot.read(spark, path, Some(1L)).columns.toSeq ==
      Seq("id", "payload"))
    // adding an existing column is refused
    val e = intercept[IllegalArgumentException] {
      Snapshot.addColumn(spark, path, "PAYLOAD",
        org.apache.spark.sql.types.StringType)
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("renameColumn: header-only commit, old files read by field id") {
    val path = snapTable()
    val v1 = Snapshot.currentVersion(path).get
    val filesBefore = Snapshot.read(spark, path).inputFiles.toSet
    Snapshot.renameColumn(spark, path, "payload", "body")

    val df = Snapshot.read(spark, path)
    // no data was rewritten
    assert(df.inputFiles.toSet == filesBefore)
    assert(df.columns.toSeq == Seq("id", "body", "score"))
    // pre-rename files resolve by field identity: values intact
    assert(df.select("id", "body").as[(Int, String)].collect().toSet
      == Set((1, "a"), (2, "b")))
    // time travel: the pre-rename version still shows the old name
    val old = Snapshot.read(spark, path, Some(v1))
    assert(old.columns.toSeq == Seq("id", "payload", "score"))
    assert(old.select("payload").as[String].collect().toSet == Set("a", "b"))
  }

  test("append after rename unions old and new files under the new name") {
    val path = snapTable()
    Snapshot.renameColumn(spark, path, "payload", "body")
    Snapshot.commitAppend(
      Seq((3, "c", 3.5f)).toDF("id", "body", "score").coalesce(1), path)
    val rows = Snapshot.read(spark, path)
      .select("id", "body").as[(Int, String)].collect().toSet
    assert(rows == Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("a later column reusing the renamed-away name is a NEW field") {
    val path = snapTable()
    Snapshot.renameColumn(spark, path, "payload", "body")
    // new pipeline emits a fresh 'payload' column — distinct field id
    Snapshot.commitAppend(
      Seq((3, "c", 3.5f, "fresh")).toDF("id", "body", "score", "payload")
        .coalesce(1), path)
    val df = Snapshot.read(spark, path)
    val rows = df.select("id", "body", "payload")
      .collect().map(r => (r.getInt(0), r.getString(1),
        Option(r.getString(2)))).toSet
    // old files: body carries the ORIGINAL payload values, the reused
    // name reads NULL (their footer has no such field id)
    assert(rows == Set((1, "a", None), (2, "b", None),
      (3, "c", Some("fresh"))))
  }

  test("widenColumn int->long and float->double read old narrow files") {
    val path = snapTable()
    Snapshot.widenColumn(spark, path, "id",
      org.apache.spark.sql.types.LongType)
    Snapshot.widenColumn(spark, path, "score",
      org.apache.spark.sql.types.DoubleType)
    val df = Snapshot.read(spark, path)
    assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(df.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // appends at the widened type coexist with narrow old files
    Snapshot.commitAppend(
      Seq((3000000000L, "c", 3.5d)).toDF("id", "payload", "score")
        .coalesce(1), path)
    assert(Snapshot.read(spark, path).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3000000000L))
    // lossy widenings are refused
    intercept[IllegalArgumentException] {
      Snapshot.widenColumn(spark, path, "payload",
        org.apache.spark.sql.types.IntegerType)
    }
  }

  test("evolution is refused while any file lacks parquet field ids") {
    val path = Files.createTempDirectory("evolve-legacy").toString + "/t"
    val saved = spark.conf.get("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    try Snapshot.commitOverwrite(
      Seq((1, "a")).toDF("id", "payload").coalesce(1), path)
    finally spark.conf.set("spark.sql.parquet.fieldId.write.enabled", saved)
    intercept[IllegalArgumentException] {
      Snapshot.renameColumn(spark, path, "payload", "body")
    }
    // optimize rewrites every file with ids; evolution then proceeds
    Snapshot.optimize(spark, path, targetFiles = 1)
    Snapshot.renameColumn(spark, path, "payload", "body")
    assert(Snapshot.read(spark, path).select("body").as[String]
      .collect().toSeq == Seq("a"))
  }

  test("readWhere still prunes and stays exact across a rename") {
    val path = Files.createTempDirectory("evolve-skip").toString + "/t"
    Snapshot.commitOverwrite(
      (1 to 100).map(i => (i, s"u$i")).toDF("id", "payload").coalesce(1), path)
    Snapshot.commitAppend(
      (101 to 200).map(i => (i, s"u$i")).toDF("id", "payload").coalesce(1), path)
    Snapshot.renameColumn(spark, path, "payload", "body")
    val got = Snapshot.readWhere(spark, path, col("id") <= 100)
    assert(got.count() == 100)
    assert(Snapshot.readWhere(spark, path, col("body") === "u150")
      .select("id").collect().map(_.getInt(0)).toSeq == Seq(150))
  }
}
