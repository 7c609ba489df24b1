package graft.etl

import java.io.File
import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** MERGE semantics on the partitioned lake: matched keys replaced,
  * unmatched inserted (including into brand-new partitions), untouched
  * partitions' files physically untouched, and the whole merge
  * idempotent under re-run.
  */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def seed(path: String): Unit =
    Seq(
      (1L, 10L, "a", 1.0), (2L, 10L, "b", 2.0), (3L, 10L, "c", 3.0),
      (4L, 20L, "d", 4.0), (5L, 20L, "e", 5.0),
      (6L, 30L, "f", 6.0))
      .toDF("event_id", "bucket", "payload", "value")
      .write.partitionBy("bucket").parquet(path)

  private def files(path: String, part: String): Map[String, Long] = {
    val dir = new File(s"$path/$part")
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("merge updates matched keys, inserts new, leaves the rest alone") {
    val path = Files.createTempDirectory("upsert").toString + "/t"
    seed(path)
    val untouchedBefore = files(path, "bucket=30")

    val source = Seq(
      (2L, 10L, "B2", 20.0),  // update in bucket 10
      (7L, 20L, "g", 7.0),    // insert into existing bucket 20
      (8L, 40L, "h", 8.0))    // insert creating brand-new bucket 40
      .toDF("event_id", "bucket", "payload", "value")

    val stats = Upsert.merge(spark, path, source, Seq("event_id"), "bucket")
    assert(stats == Upsert.MergeStats(partitionsTouched = 3, updated = 1, inserted = 2))

    val got = spark.read.parquet(path)
      .selectExpr("event_id", "payload", "value", "CAST(bucket AS BIGINT) AS bucket")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, "a", 1.0, 10L), (2L, "B2", 20.0, 10L), (3L, "c", 3.0, 10L),
      (4L, "d", 4.0, 20L), (5L, "e", 5.0, 20L), (7L, "g", 7.0, 20L),
      (6L, "f", 6.0, 30L), (8L, "h", 8.0, 40L)))

    // bucket=30 carried no source keys: its files must be byte-identical
    assert(files(path, "bucket=30") == untouchedBefore,
      "untouched partition was rewritten")

    // idempotence: the same merge again changes nothing
    val stats2 = Upsert.merge(spark, path, source, Seq("event_id"), "bucket")
    assert(stats2.updated == 3 && stats2.inserted == 0)
    val again = spark.read.parquet(path)
      .selectExpr("event_id", "payload", "value", "CAST(bucket AS BIGINT) AS bucket")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(again == got)
  }

  test("merge matches partitions Spark escapes on write, and the null partition") {
    // ':' and ' ' are path-escaped (%3A, %20) and null becomes
    // __HIVE_DEFAULT_PARTITION__ — raw `$path/$col=$v` probing misses
    // all three, silently dropping their survivors from the merge.
    val path = Files.createTempDirectory("upsert-esc").toString + "/t"
    Seq(
      (1L, Some("a b"), "keep1", 1.0), (2L, Some("a b"), "old", 2.0),
      (3L, Some("x:y"), "keep2", 3.0),
      (4L, None, "keepNull", 4.0), (5L, None, "oldNull", 5.0))
      .toDF("event_id", "part", "payload", "value")
      .write.partitionBy("part").parquet(path)

    val source = Seq(
      (2L, Some("a b"), "NEW", 20.0),
      (5L, None, "NEWNULL", 50.0))
      .toDF("event_id", "part", "payload", "value")

    val stats = Upsert.merge(spark, path, source, Seq("event_id"), "part")
    assert(stats.updated == 2 && stats.inserted == 0)

    val got = spark.read.parquet(path)
      .selectExpr("event_id", "payload", "part")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      .toSet
    assert(got == Set(
      (1L, "keep1", Some("a b")), (2L, "NEW", Some("a b")),
      (3L, "keep2", Some("x:y")),
      (4L, "keepNull", None), (5L, "NEWNULL", None)))
  }

  test("merge preserves a string partition column that LOOKS like a date") {
    // '2024-01-01' directory names infer as DATE on a bare read; the
    // merge reads the target under the SOURCE's schema, so the
    // partition column must come back a STRING and the rewrite must
    // not change its stored rendering
    val path = Files.createTempDirectory("upsert-datestr").toString + "/t"
    Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
        (3L, "2024-01-02", "c"))
      .toDF("event_id", "day", "payload")
      .write.partitionBy("day").parquet(path)

    val source = Seq((2L, "2024-01-01", "B2"))
      .toDF("event_id", "day", "payload")
    val stats = Upsert.merge(spark, path, source, Seq("event_id"), "day")
    assert(stats.updated == 1 && stats.inserted == 0)

    // the partition directories kept their string rendering
    assert(new File(path).listFiles().map(_.getName).toSet
      .filter(_.startsWith("day=")) == Set("day=2024-01-01", "day=2024-01-02"))
    // reading under an explicit schema (the table's contract) round-trips
    val got = spark.read
      .schema("event_id BIGINT, payload STRING, day STRING")
      .parquet(path)
      .selectExpr("event_id", "payload", "day").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, "a", "2024-01-01"), (2L, "B2", "2024-01-01"),
      (3L, "c", "2024-01-02")))
  }

  test("merge with an added source column evolves the table additively") {
    // the target is read under the SOURCE's schema, so a new source
    // column reads as NULL from old files and the rewritten partitions
    // carry it — additive evolution without a separate migration step.
    // Untouched partitions keep their old footprint (their rows gain
    // the column lazily at read time under the evolved schema).
    val path = Files.createTempDirectory("upsert-evolve").toString + "/t"
    Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 20L, "c"))
      .toDF("event_id", "bucket", "payload")
      .write.partitionBy("bucket").parquet(path)

    val source = Seq((2L, 10L, "B2", Some(0.9)), (4L, 10L, "d", None))
      .toDF("event_id", "bucket", "payload", "quality")
    val stats = Upsert.merge(spark, path, source, Seq("event_id"), "bucket")
    assert(stats.updated == 1 && stats.inserted == 1)

    val got = spark.read
      .schema("event_id BIGINT, payload STRING, quality DOUBLE, bucket BIGINT")
      .parquet(path)
      .selectExpr("event_id", "payload", "quality").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set(
      (1L, "a", None), (2L, "B2", Some(0.9)), (4L, "d", None),
      (3L, "c", None)))
  }

  test("merge into an empty table is a plain partitioned insert") {
    val path = Files.createTempDirectory("upsert-empty").toString + "/t"
    new File(path).mkdirs()
    val source = Seq((1L, 10L, "a", 1.0)).toDF("event_id", "bucket", "payload", "value")
    val stats = Upsert.merge(spark, path, source, Seq("event_id"), "bucket")
    assert(stats == Upsert.MergeStats(1, 0L, 1L))
    assert(spark.read.parquet(path).count() == 1)
  }
}
