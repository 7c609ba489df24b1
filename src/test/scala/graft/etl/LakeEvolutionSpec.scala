package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
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
}
