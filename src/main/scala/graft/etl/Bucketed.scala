package graft.etl

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode, SparkSession}

/** Bucketed table layout — the co-located-join primitive (SURVEY §2.A
  * P10d). Writing both sides of a recurring join bucketed by the join
  * key (same bucket count) lets every subsequent join and group-by on
  * that key run with ZERO exchanges: Spark's scan reports the bucket
  * hash-partitioning as its output partitioning, so the shuffle that
  * dominates a 100 TB fact-fact join simply never happens. The shuffle
  * is paid ONCE at write time and amortized over every downstream run
  * — the batch analog of the streaming state-store partitioning, and
  * the same trade Hive/Iceberg/Delta bucketing makes.
  *
  * Mechanics, not magic: bucket b holds rows with
  * `pmod(hashExpr(key), n) == b`; a bucketed scan emits one task per
  * bucket (files of the same bucket coalesce), so two tables with the
  * same key and bucket count are trivially co-partitioned. `sortBy`
  * additionally orders rows within each bucket file, which lets a
  * sort-merge join skip its sort when each bucket is a single file.
  *
  * This rides the session catalog (`saveAsTable` with an explicit
  * `path` = an EXTERNAL table): plain `spark.read.parquet` cannot carry
  * bucketing metadata — the bucket spec lives in the catalog, which is
  * exactly how a production metastore serves it.
  *
  * Scale notes:
  *  - choose the bucket count for the TARGET cluster (e.g. 4096 for a
  *    100 TB fact): it caps the join's parallelism, and all tables
  *    joined together must share it;
  *  - bucketing concentrates each key's rows in one file per writer
  *    task — skewed keys skew bucket sizes; salt the key into a
  *    sub-bucket column first if one key dominates (q49's move);
  *  - appends add files per bucket, never re-shuffle history; compact
  *    per bucket (Compact) when small files accumulate.
  */
object Bucketed {

  /** Write df as an external bucketed parquet table registered as
    * `name` at `path`, bucketed (and optionally bucket-sorted) by
    * `keys`. Overwrites both the table entry and the data.
    */
  def write(df: DataFrame, name: String, path: String, buckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    val base: DataFrameWriter[Row] = df.write.mode(SaveMode.Overwrite)
      .format("parquet").option("path", path)
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
    val sorted =
      if (sortCols.isEmpty) base
      else base.sortBy(sortCols.head, sortCols.drop(1): _*)
    sorted.saveAsTable(name)
  }

  /** The registered table, scan carrying the bucket partitioning. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
