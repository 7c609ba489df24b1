package graft.etl

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MERGE INTO (SCD-1 upsert) for the partitioned parquet lake — the
  * warehouse-side keyed merge the reference delegates to BigQuery,
  * and the exactly-once upgrade over its at-least-once append + dedup
  * view (SURVEY P14): matched keys are replaced by the source row,
  * unmatched source rows are inserted, everything else is untouched.
  *
  * Scale discipline:
  *  - only partitions CONTAINING source keys are read or rewritten —
  *    the work is proportional to the touched slice, not the table.
  *    The touched-partition list is partition METADATA (distinct
  *    partition values of the source), never data-sized;
  *  - the rewrite goes through the same dynamic-partition-overwrite
  *    commit as the streaming sinks and Compact: staged by the output
  *    committer, swapped at job commit, idempotent to re-run (the
  *    same merge applied twice yields the same table);
  *  - like Compact, run inside the single-writer window (P19) —
  *    plain-parquet partition swap is not atomic against concurrent
  *    readers of the partitions being replaced.
  *
  * Contract: `source` must be key-unique (SQL MERGE raises on a row
  * matched twice; here the surviving duplicate would be arbitrary).
  * Brand-new partition values insert cleanly — they have no existing
  * directory to read and dynamic overwrite creates them.
  */
object Upsert {

  final case class MergeStats(partitionsTouched: Int, updated: Long,
      inserted: Long)

  def merge(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], partitionCol: String): MergeStats = {
    import org.apache.spark.sql.functions.col
    // touched partitions: bounded by the source's partition spread
    val touched = source.select(partitionCol).distinct()
      .collect().map(_.get(0).toString).sorted
    val existing = touched.filter(v =>
      new File(s"$path/$partitionCol=$v").isDirectory)
    // basePath keeps the partition column when reading subdirectories
    val target =
      if (existing.isEmpty) None
      else Some(spark.read.option("basePath", path)
        .parquet(existing.map(v => s"$path/$partitionCol=$v").toIndexedSeq: _*))
    // survivors: touched-partition rows NOT replaced by a source key
    val survivors = target.map(_.join(source.select(keys.map(col): _*), keys, "left_anti"))
    val out = survivors match {
      case Some(s) => s.unionByName(source)
      case None => source
    }
    val targetRows = target.map(_.count()).getOrElse(0L)
    val survivorRows = survivors.map(_.count()).getOrElse(0L)
    out.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    val updated = targetRows - survivorRows
    MergeStats(touched.length, updated, source.count() - updated)
  }
}
