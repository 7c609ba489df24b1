package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Schema-enforced NDJSON/CSV sources: good rows parse and cast, broken
  * lines land in the malformed channel with the raw line preserved,
  * REQUIRED-mode violations land in the required_null channel, and the
  * valid frame carries exactly the declared schema.
  */
class FileSourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("price", DoubleType, nullable = false)))

  private def tmpFile(ext: String, lines: Seq[String]): String = {
    val f = Files.createTempFile("graft_src", ext)
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("ndjson: valid/malformed/required_null three-way split") {
    val path = tmpFile(".json", Seq(
      """{"id": 1, "name": "ok", "price": 2.5}""",
      """{"id": 2, "price": 3.25}""", // nullable name absent -> valid
      """{"id": 3, "name": "noprice"}""", // REQUIRED price null -> reject
      """not json at all{{""", // malformed -> reject w/ raw line
      """{"id": "4", "name": "strid", "price": "7.5"}""", // JSON is typed:
      // string-valued numerics are MALFORMED to from_json, not coerced
      """{"id": 5, "name": "num", "price": 7.5}"""))
    val loaded = FileSources.ndjson(spark, path, schema)

    // names+types match the declaration; Spark keeps extracted struct
    // fields nullable=true in metadata — non-nullness is enforced by
    // the split itself, verified below
    assert(loaded.valid.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val valid = loaded.valid.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(valid == Set(
      (1L, Some("ok"), 2.5), (2L, None, 3.25), (5L, Some("num"), 7.5)))

    val rejects = loaded.rejects.collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rejects.count(_._1 == "malformed") == 2)
    assert(rejects.exists(r => r._1 == "malformed" && r._2 == "not json at all{{"))
    assert(rejects.count(_._1 == "required_null") == 1)
    assert(rejects.find(_._1 == "required_null").get._2.contains("\"id\":3"))
  }

  test("csv: valid/malformed/required_null three-way split") {
    val path = tmpFile(".csv", Seq(
      "1,ok,2.5",
      "2,,3.25", // nullable name empty -> valid with null name
      "3,noprice,", // REQUIRED price empty -> reject
      "4,strid,7.5"))
    val loaded = FileSources.csv(spark, path, schema)
    assert(loaded.valid.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val valid = loaded.valid.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(valid == Set(
      (1L, Some("ok"), 2.5), (2L, None, 3.25), (4L, Some("strid"), 7.5)))
    val rejects = loaded.rejects.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rejects.length == 1 && rejects.head._1 == "required_null")
  }

  test("csv: unparseable types go to a reject channel, not an exception") {
    val path = tmpFile(".csv", Seq("1,ok,2.5", "zap,bad,row"))
    val loaded = FileSources.csv(spark, path, schema)
    assert(loaded.valid.count() == 1)
    assert(loaded.rejects.count() == 1)
  }

  test("plans stay shuffle-free: parse + split are scan-stage projections") {
    val path = tmpFile(".json", Seq("""{"id": 1, "name": "x", "price": 1.0}"""))
    val loaded = FileSources.ndjson(spark, path, schema)
    val plan = loaded.valid.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
