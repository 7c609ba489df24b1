package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-enforced text-format sources — the general form of the
  * reference's NDJSON staging contract (reference `main.py:40-41,171`:
  * newline-delimited JSON loaded against an explicit schema, rows
  * violating REQUIRED modes rejected). Reading is
  * `spark.read.text` + `from_json`/`from_csv` as ordinary per-row
  * expressions:
  *
  *  - everything happens inside the scan stage (parse, cast, validity
  *    split are one codegen'd projection over line splits — zero
  *    shuffles, parallelism = file splits, which is what survives at
  *    100 TB);
  *  - malformed records are DATA, not exceptions: the corrupt-record
  *    column rides the parsed struct, so no DROPMALFORMED silently
  *    eating rows and no FAILFAST killing a 10-hour job at byte
  *    99 percent;
  *  - the same `SchemaEnforce` REQUIRED-mode split as the parquet/ETL
  *    path applies downstream, so every source format shares one
  *    enforcement semantics.
  *
  * Rejects carry (reason, record): `malformed` = unparseable line with
  * the raw line; `required_null` = parsed but violating a non-nullable
  * field, re-serialized. Both frames are lazy views over the same scan.
  */
object FileSources {

  final case class Loaded(valid: DataFrame, rejects: DataFrame)

  private val Corrupt = "_corrupt_record"

  private def split(parsed: DataFrame, target: StructType): Loaded = {
    val ok = parsed.filter(col(s"r.$Corrupt").isNull)
      .select(target.fieldNames.toIndexedSeq.map(n => col(s"r.$n")): _*)
    val malformed = parsed.filter(col(s"r.$Corrupt").isNotNull)
      .select(lit("malformed").as("reason"), col("value").as("record"))
    val enforced = graft.etl.SchemaEnforce(ok, target)
    val requiredNull = enforced.rejects
      .select(lit("required_null").as("reason"),
        to_json(struct(col("*"))).as("record"))
    Loaded(enforced.valid, malformed.unionByName(requiredNull))
  }

  /** Newline-delimited JSON against an explicit schema (never inferred
    * — inference is a second full pass over 100 TB and a schema-drift
    * hazard; the reference also always declares its schema).
    */
  def ndjson(spark: SparkSession, path: String, target: StructType): Loaded = {
    val withCorrupt = StructType(target.fields).add(Corrupt, StringType)
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> Corrupt)).as("r"))
    split(parsed, target)
  }

  /** Headerless delimited text against an explicit schema. */
  def csv(spark: SparkSession, path: String, target: StructType,
      delimiter: String = ","): Loaded = {
    val withCorrupt = StructType(target.fields).add(Corrupt, StringType)
    val parsed = spark.read.text(path)
      .select(col("value"), from_csv(col("value"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> Corrupt, "sep" -> delimiter)).as("r"))
    split(parsed, target)
  }
}
