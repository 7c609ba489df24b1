package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

import org.apache.spark.sql.SparkSession

/** Filesystem resolution for the lake layer (Snapshot/Compact/Upsert):
  * every path operation goes through the Hadoop FileSystem API bound
  * to the path's scheme, with the active Spark session's Hadoop conf
  * (so fs.* settings and object-store connector config apply). Local
  * paths resolve to the local filesystem — the test instance — and
  * the same code runs against HDFS or an object store connector.
  */
private[etl] object LakeFs {

  def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** (filesystem, fully-qualified path) for `path`. */
  def resolve(path: String): (FileSystem, Path) = {
    val raw = new Path(path)
    val fs = raw.getFileSystem(hadoopConf)
    (fs, fs.makeQualified(raw))
  }

  def listStatus(fs: FileSystem, dir: Path): Seq[FileStatus] =
    if (!fs.exists(dir)) Nil else fs.listStatus(dir).toIndexedSeq
}
