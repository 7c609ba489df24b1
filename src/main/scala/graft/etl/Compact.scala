package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the partitioned lake tables the ETL sink
  * appends to (EtlJob writes one file set per cycle per block_bucket —
  * a 15-second trigger accumulates thousands of small files per
  * partition over a week, and at 100 TB scan throughput dies on file
  * open/footer overhead long before bytes become the bottleneck).
  *
  * The rewrite is per-partition and idempotent:
  *  - only partitions whose file count exceeds `maxFiles` are touched
  *    (a compacted partition is skipped on re-run — crash-safe to
  *    retry);
  *  - each selected partition is rewritten through the same dynamic
  *    partition overwrite the sink uses, into
  *    ceil(partitionBytes / targetBytes) files — so output files track
  *    the target size instead of the historical append pattern;
  *  - untouched partitions are never read or rewritten (the work is
  *    proportional to the backlog, not the table).
  *
  * Content is preserved row-for-row: compaction is a pure re-layout
  * (coalesce + rewrite), never a dedup or sort — those are the query
  * layer's job (EtlJob.dedupView).
  *
  * Durability is the same class as the sink's own dynamic partition
  * overwrite (StreamingOps.writeBatch): the rewrite is staged by the
  * output committer and swapped at job commit, so a crash mid-job
  * leaves the old files in place — but plain-parquet partition swap is
  * not atomic against concurrent readers of the partition being
  * replaced; run compaction in the single-writer window the ETL loop
  * already guarantees (P19).
  */
object Compact {

  /** One partition's backlog: its directory name (e.g.
    * "block_bucket=1000"), file count and total bytes.
    */
  final case class PartitionStat(dir: String, files: Int, bytes: Long)

  /** List data-file stats per first-level partition directory, via
    * the Hadoop FileSystem bound to the path's scheme — one listing
    * per partition directory, metadata-only (no data reads). At
    * warehouse scale this becomes the table-manifest query; the
    * listing form is what a filesystem-backed lake gives.
    */
  def partitionStats(path: String): Seq[PartitionStat] = {
    val (fs, root) = LakeFs.resolve(path)
    LakeFs.listStatus(fs, root)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { p =>
        val data = fs.listStatus(p.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        PartitionStat(p.getPath.getName, data.length, data.map(_.getLen).sum)
      }
  }

  /** Compact every partition with more than `maxFiles` data files down
    * to ceil(bytes / targetBytes) files. Returns the partitions
    * rewritten.
    */
  def compact(spark: SparkSession, path: String, partitionCol: String,
      maxFiles: Int = 4, targetBytes: Long = 128L * 1024 * 1024)
      : Seq[PartitionStat] = {
    val backlog = partitionStats(path).filter(_.files > maxFiles)
    backlog.foreach { p =>
      val value = p.dir.substring(p.dir.indexOf('=') + 1)
      val nOut = math.max(1, math.ceil(p.bytes.toDouble / targetBytes).toInt)
      spark.read.parquet(s"$path/${p.dir}")
        .coalesce(nOut)
        .withColumn(partitionCol, lit(value).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol)
        .parquet(path)
    }
    backlog
  }
}
