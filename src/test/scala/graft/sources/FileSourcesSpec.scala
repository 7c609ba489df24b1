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

  /** Columnar lake formats: ORC round-trips the same data as parquet
    * with identical query results, and filters/projections reach the
    * ORC scan (PushedFilters + pruned ReadSchema) exactly as they do
    * for parquet — format choice must not cost pushdown.
    */
  test("orc: parquet-equivalent round-trip with filter and column pushdown") {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val dir = Files.createTempDirectory("graft_orc").toString
    src.write.mode("overwrite").orc(s"$dir/orc")
    src.write.mode("overwrite").parquet(s"$dir/pq")

    def q(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
    val fromOrc = q(spark.read.orc(s"$dir/orc"))
    val fromPq = q(spark.read.parquet(s"$dir/pq"))
    assert(fromOrc.collect().toSeq == fromPq.collect().toSeq)

    val scan = fromOrc.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThan(l_quantity"),
      s"filter not pushed to ORC scan:\n$scan")
    // column pruning: the scan reads only the 4 referenced columns
    // (q's 3 outputs + the filter column), never a wider schema
    val readSchema = "ReadSchema: struct<l_orderkey"
    assert(scan.contains(readSchema), s"no ReadSchema in plan:\n$scan")
    assert(!scan.contains("l_comment"), s"ORC scan did not prune columns:\n$scan")
  }
}
