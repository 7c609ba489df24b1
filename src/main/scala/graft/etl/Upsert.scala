package graft.etl

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
  * directory to read and dynamic overwrite creates them. Additive
  * schema evolution is free: the target is read under the SOURCE's
  * schema, so a new source column reads as NULL from old files,
  * rewritten partitions carry it physically, and untouched partitions
  * gain it lazily at read time (UpsertSpec).
  */
object Upsert {

  final case class MergeStats(partitionsTouched: Int, updated: Long,
      inserted: Long)

  def merge(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], partitionCol: String): MergeStats = {
    import org.apache.spark.sql.functions.col
    // Materialize the source ONCE up front: stats, the anti-join, and
    // the written union must all see the same rows even if `source` is
    // non-deterministic or itself derived from the lake being rewritten.
    val src = source.persist()
    val sourceRows = src.count()
    // Touched partitions, kept as TYPED values (never .toString): the
    // target slice is selected with a DataFrame filter on the partition
    // column, so Spark's partition pruning + its own path escaping
    // apply. Hand-built `$path/$col=$v` dirs miss values Spark escapes
    // on write (space, ':', '%', '/') and the null partition
    // (__HIVE_DEFAULT_PARTITION__) — rows in a missed partition would
    // silently vanish from the merge output.
    val touchedRows = src.select(partitionCol).distinct().collect()
    val touched = touchedRows.map(_.get(0)).filter(_ != null)
    val hasNullPart = touchedRows.exists(_.isNullAt(0))
    val (fs, root) = LakeFs.resolve(path)
    val hasTable = LakeFs.listStatus(fs, root)
      .exists(_.getPath.getName.startsWith(s"$partitionCol="))
    val target =
      if (!hasTable) None
      else {
        val pc = col(partitionCol)
        val inTouched = Option.when(touched.nonEmpty)(pc.isin(touched.toIndexedSeq: _*))
        val isNullPart = Option.when(hasNullPart)(pc.isNull)
        // Read the target under the SOURCE's schema: without it Spark
        // re-infers the partition column's type from directory names
        // (e.g. '2024-01-01' strings infer as DATE), which can diverge
        // from the source column's type — unionByName would then
        // coerce, and the rewrite would silently change the stored
        // partition type/rendering. Parquet matches user-schema fields
        // by name, and the partition column takes the schema's type
        // instead of the inferred one. (Contract above: source and
        // target share a schema.)
        (inTouched ++ isNullPart).reduceOption(_ || _)
          .map(spark.read.schema(src.schema).parquet(path).filter(_))
      }
    // survivors: touched-partition rows NOT replaced by a source key.
    // persist + count BEFORE the overwrite — the write's input must not
    // lazily re-read the very partitions dynamic overwrite is replacing
    // (committer/FS-timing dependent otherwise).
    val survivors = target.map(
      _.join(src.select(keys.map(col).toIndexedSeq: _*), keys, "left_anti").persist())
    val targetRows = target.map(_.count()).getOrElse(0L)
    val survivorRows = survivors.map(_.count()).getOrElse(0L)
    val out = survivors.map(_.unionByName(src)).getOrElse(src)
    out.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    survivors.foreach(_.unpersist())
    src.unpersist()
    val updated = targetRows - survivorRows
    MergeStats(touchedRows.length, updated, sourceRows - updated)
  }
}
