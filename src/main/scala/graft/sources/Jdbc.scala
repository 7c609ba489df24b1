package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parallel JDBC ingest — the scale-correct way to pull a warehouse
  * dimension or an operational table (the reference's Postgres
  * `etl_cursor` DB is the shape) into the lake. A bare
  * `spark.read.jdbc(url, table)` opens ONE connection and streams the
  * whole table through ONE task — the classic accidental bottleneck.
  * Partitioned reads split the table into `numPartitions` range
  * predicates on `partitionCol` (WHERE col >= l AND col < u), one
  * connection per task, so ingest parallelism scales with the cluster
  * instead of the driver.
  *
  * The bounds are METADATA (a 1-row MIN/MAX query), never a data
  * scan; Catalyst pushes filters and column pruning into the remote
  * SQL (spec-asserted via PushedFilters), so a selective ingest ships
  * only the matching rows over the wire.
  *
  * Skew note: range splits assume roughly uniform `partitionCol`;
  * a hot range still lands in one task. For skewed keys, ingest by a
  * derived uniform column (e.g. MOD(hash-like id, N) — q49's salting
  * move applied to ingest).
  */
object Jdbc {

  /** (lo, hi) of `col` via one remote aggregate — bounds for the
    * range partitioning, metadata-sized.
    */
  def bounds(spark: SparkSession, url: String, table: String,
      col: String, props: java.util.Properties = new java.util.Properties)
      : (Long, Long) = {
    // positional access: JDBC dialects disagree on identifier case
    // (Derby upper-cases unquoted aliases)
    val row = spark.read.jdbc(url,
      s"(SELECT MIN($col) AS lo, MAX($col) AS hi FROM $table) b", props)
      .head()
    require(!row.isNullAt(0) && !row.isNullAt(1),
      s"cannot range-partition $table on $col: table is empty or the column is all-NULL")
    (row.getAs[Number](0).longValue(), row.getAs[Number](1).longValue())
  }

  /** Read `table` in `numPartitions` parallel range slices of
    * `partitionCol` (bounds auto-probed when not given).
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, numPartitions: Int,
      loHi: Option[(Long, Long)] = None,
      props: java.util.Properties = new java.util.Properties): DataFrame = {
    val (lo, hi) = loHi.getOrElse(bounds(spark, url, table, partitionCol, props))
    spark.read.jdbc(url, table, partitionCol, lo, hi, numPartitions, props)
  }
}
