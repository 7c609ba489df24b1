package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Columnar-format interop beyond parquet — ORC as the second
  * first-class lake format (it ships in spark-sql; Avro needs the
  * external spark-avro module and is deliberately out of scope in
  * this zero-egress build). The value of going through these helpers
  * is the CONTRACT they pin, spec-asserted in FormatsSpec:
  *
  *  - full type fidelity through a write/read cycle (timestamps,
  *    decimals, binary, arrays/structs) — the types the ETL actually
  *    carries;
  *  - predicate pushdown and column pruning reach the ORC scan
  *    (`PushedFilters` / narrowed `ReadSchema`), so a selective query
  *    over an ORC lake reads row-group slices, not files — same
  *    posture as the parquet path;
  *  - hive-style partition layout works identically (partition
  *    pruning decided driver-side from directory names).
  *
  * A user migrating an ORC warehouse onto this engine keeps every
  * scan optimization the parquet tables get.
  */
object Formats {

  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("orc")
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*))
      .save(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.format("orc").load(path)
}
