package graft.etl

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshots for a parquet lake table — the core of the
  * Delta/Iceberg idea at its minimum viable size: data files are
  * IMMUTABLE once published, and a table version is nothing but a
  * manifest listing exactly the files that compose it. Readers pin a
  * manifest (time travel = read an old one); writers add files and
  * publish a new manifest with an atomic rename; nothing published is
  * ever mutated, so readers of version N are never torn by a writer
  * producing N+1 — the isolation plain-parquet dynamic overwrite
  * (Upsert/Compact) cannot give against concurrent readers.
  *
  * Scale shape: a manifest is O(files), not O(rows) — the same
  * metadata-not-data discipline as Compact.partitionStats; commit cost
  * is the data write plus one file rename; `read` plans a normal
  * parquet scan over the listed files (all pushdown/pruning intact).
  * At warehouse scale the manifest list becomes a metadata table
  * (Iceberg's avro manifests) — the contract here (immutable files +
  * atomic pointer swap) is the part that carries over.
  *
  * Single-writer (P19): version allocation is max+1 with an atomic
  * rename publish — concurrent writers would need a CAS on the
  * manifest name (object-store conditional put); the ETL loop already
  * serializes writers.
  *
  * Layout under `path`:
  *   data/c<version>-<uuid>/part-*.parquet   (immutable once published)
  *   manifests/v<version>                    (one referenced file path per line)
  */
object Snapshot {

  private def manifestDir(path: String) = new File(path, "manifests")

  private def manifestFile(path: String, v: Long) =
    new File(manifestDir(path), f"v$v%06d")

  /** Published versions, ascending. */
  def versions(path: String): Seq[Long] =
    Option(manifestDir(path).listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName match {
        case n if n.startsWith("v") => Some(n.drop(1).toLong)
        case _ => None
      }).sorted.toIndexedSeq

  def currentVersion(path: String): Option[Long] = versions(path).lastOption

  /** Manifest lines: '#'-prefixed metadata (e.g. #batch=N), then one
    * referenced file path per line.
    */
  private def manifestLines(path: String, v: Long): Seq[String] =
    new String(Files.readAllBytes(manifestFile(path, v).toPath),
      StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toIndexedSeq

  private def readManifest(path: String, v: Long): Seq[String] =
    manifestLines(path, v).filterNot(_.startsWith("#"))

  /** Write df's files into an immutable commit directory and return
    * their CANONICAL paths (manifest paths and directory listings must
    * compare equal in vacuum no matter how the caller spelled `path` —
    * a relative-vs-absolute mismatch there would delete live files).
    * The directory is named by the version being built plus a uuid, so
    * a crashed commit leaves only unreferenced files (cleaned by
    * vacuum), never a corrupt version.
    */
  private def writeData(df: DataFrame, path: String, v: Long): Seq[String] = {
    val dir = new File(new File(path, "data"),
      f"c$v%06d-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.parquet(dir.toString)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getCanonicalPath).sorted.toIndexedSeq
  }

  /** df's schema as a manifest header line — what makes an EMPTY
    * version (cleared table, filtered-out micro-batch) readable:
    * Spark writes no part files for empty partitions, so without the
    * recorded schema a zero-file read could not even infer one.
    */
  private def schemaMeta(df: DataFrame): String =
    "#schema=" + df.schema.toDDL

  /** Publish `files` (plus optional '#'-metadata header lines) as
    * version `v`: temp write + atomic rename, the same durability
    * move as the ETL cursor. The rename is the single commit point —
    * any metadata in the header (batch markers) becomes visible
    * atomically WITH the file list.
    */
  private def publish(path: String, v: Long, files: Seq[String],
      meta: Seq[String] = Nil): Long = {
    manifestDir(path).mkdirs()
    val tmp = Paths.get(manifestDir(path).toString, s".v$v.tmp")
    Files.write(tmp,
      ((meta ++ files).mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestFile(path, v).toPath,
      StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** The one version-allocation + publish sequence every commit shape
    * shares (overwrite/append/append-once/rollback) — header handling
    * is a decision made once, not per call site.
    */
  private def commitNext(path: String, files: Seq[String],
      meta: Seq[String]): Long =
    publish(path, currentVersion(path).getOrElse(0L) + 1, files, meta)

  private def prevFiles(path: String): Seq[String] =
    currentVersion(path).map(readManifest(path, _)).getOrElse(Nil)

  /** Commit df as a FULL snapshot (overwrite semantics): the new
    * version's manifest lists only df's files. Returns the version.
    */
  def commitOverwrite(df: DataFrame, path: String): Long = {
    val v = currentVersion(path).getOrElse(0L) + 1
    commitNext(path, writeData(df, path, v), Seq(schemaMeta(df)))
  }

  /** Commit df as an APPEND: the new manifest lists the previous
    * version's files plus df's — no existing data is read or
    * rewritten. Returns the version.
    */
  def commitAppend(df: DataFrame, path: String): Long = {
    val v = currentVersion(path).getOrElse(0L) + 1
    commitNext(path, prevFiles(path) ++ writeData(df, path, v),
      Seq(schemaMeta(df)))
  }

  private def schemaOf(path: String, v: Long): Option[String] =
    manifestLines(path, v)
      .collectFirst { case l if l.startsWith("#schema=") => l.drop(8) }

  /** Read a version (default: latest) as a parquet scan over its
    * manifest's files, under the version's RECORDED schema — so mixed
    * footers after additive evolution (commitAppend with a new
    * column) read deterministically (old files yield nulls for the
    * added column) instead of depending on which footer Spark picks,
    * and an EMPTY version (cleared table, filtered-out micro-batch)
    * returns an empty DataFrame with the right shape. Pushdown,
    * pruning and column projection behave as on any parquet read.
    */
  def read(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(path)).getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val files = readManifest(path, v)
    val schema = schemaOf(path, v)
      .map(org.apache.spark.sql.types.StructType.fromDDL)
    (files.nonEmpty, schema) match {
      case (true, Some(s)) => spark.read.schema(s).parquet(files: _*)
      case (true, None) => spark.read.parquet(files: _*)
      case (false, Some(s)) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (false, None) => throw new IllegalStateException(
        s"version $v at $path is empty and carries no schema header")
    }
  }

  /** Exactly-once append for streaming foreachBatch: the
    * (stream id, batch id) transaction marker rides in the manifest's
    * '#txn=' header, so the ONE atomic manifest rename commits the
    * data AND the marker together — no window where a crash records
    * one without the other. A REPLAYED batch (Structured Streaming
    * re-delivers the last batch after a crash) is skipped instead of
    * appended twice — upgrading the sink from at-least-once +
    * dedup-view to exactly-once, the same role
    * StreamingOps.writeBatch's batch_id-partition overwrite plays for
    * the partitioned sink. The marker is scoped to `streamId` (the
    * Delta-style transactional app id): a NEW stream (fresh
    * checkpoint ⇒ batch numbering restarts at 0) picks a new id and
    * its batches are not mistaken for replays of the old stream's. A
    * crash BEFORE the rename leaves only unreferenced data files
    * (vacuum's job), and the replay commits cleanly. Returns the
    * published version, or None if the batch was already committed.
    */
  def commitAppendOnce(df: DataFrame, path: String, streamId: String,
      batchId: Long): Option[Long] = {
    require(!streamId.contains("\n") && !streamId.contains("/"),
      s"streamId must be a plain token: $streamId")
    val prefix = s"#txn=$streamId/"
    // batch ids are delivered monotonically PER STREAM, so only this
    // stream's newest marker matters: scan manifests newest-first and
    // stop at the first one carrying this stream's marker — O(1)
    // amortized per commit instead of re-reading every manifest of
    // the stream's lifetime.
    val lastMarked = versions(path).reverseIterator
      .map(v => manifestLines(path, v).takeWhile(_.startsWith("#"))
        .collectFirst {
          case l if l.startsWith(prefix) => l.drop(prefix.length).toLong
        })
      .collectFirst { case Some(id) => id }
    if (lastMarked.exists(_ >= batchId)) None
    else {
      val v = currentVersion(path).getOrElse(0L) + 1
      Some(commitNext(path, prevFiles(path) ++ writeData(df, path, v),
        Seq(s"$prefix$batchId", schemaMeta(df))))
    }
  }

  /** Roll back by PUBLISHING a new version whose manifest duplicates
    * `to`'s — file list AND schema header (an empty version must stay
    * readable after rollback), but NOT its transaction marker (a
    * rollback is not a stream commit). History stays linear and
    * intact (an audit can still read every version); nothing is
    * deleted.
    */
  def rollback(path: String, to: Long): Long =
    commitNext(path, readManifest(path, to),
      schemaOf(path, to).map("#schema=" + _).toSeq)

  /** One history row per version: (version, file count, txn marker if
    * the version was a stream commit) — the audit view of the linear
    * history, read from manifest metadata only (no data I/O).
    */
  final case class VersionInfo(version: Long, files: Int,
      txn: Option[String])

  def history(path: String): Seq[VersionInfo] =
    versions(path).map { v =>
      val lines = manifestLines(path, v)
      VersionInfo(v,
        lines.count(!_.startsWith("#")),
        lines.collectFirst {
          case l if l.startsWith("#txn=") => l.drop(5)
        })
    }

  /** Delete data files referenced by NO manifest among the most recent
    * `keepVersions` (older manifests are dropped too — keep ≥ 2 so
    * the last batch marker survives for streaming replay checks).
    * Unreferenced files include any orphans from a commit that
    * crashed before its manifest rename. Returns deleted file paths.
    * The one operation that destroys data — bounded by explicit
    * retention, like Delta's VACUUM.
    */
  def vacuum(path: String, keepVersions: Int): Seq[String] = {
    // keep >= 1 always: vacuum(path, 0) would otherwise delete every
    // manifest and every data file — the whole table — in one call
    require(keepVersions >= 1,
      s"vacuum must keep at least 1 version, got $keepVersions")
    val vs = versions(path)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    val live = keep.flatMap(readManifest(path, _)).toSet
    val dataRoot = new File(path, "data")
    val all = Option(dataRoot.listFiles()).getOrElse(Array.empty)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .filter(_.getName.endsWith(".parquet"))
    // canonical paths on BOTH sides: manifests store canonical paths,
    // and the listing must compare equal however `path` was spelled —
    // a raw-string mismatch here would delete live data
    val dead = all.filterNot(f => live.contains(f.getCanonicalPath))
    dead.foreach(_.delete())
    // prune commit dirs with no live parquet left — recursively, since
    // Spark leaves _SUCCESS/.crc sidecars in every commit dir (a
    // "files.isEmpty" check would never fire and dead dirs, including
    // crashed-commit orphans, would accumulate forever)
    Option(dataRoot.listFiles()).getOrElse(Array.empty)
      .filter(d => !Option(d.listFiles()).getOrElse(Array.empty)
        .exists(f => f.getName.endsWith(".parquet") &&
          live.contains(f.getCanonicalPath)))
      .foreach { d =>
        Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
        d.delete()
      }
    drop.foreach(v => manifestFile(path, v).delete())
    dead.map(_.toString).sorted.toIndexedSeq
  }
}
