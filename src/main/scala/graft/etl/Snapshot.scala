package graft.etl

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

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
  * All I/O goes through the Hadoop FileSystem API resolved from the
  * table path's scheme (active session's Hadoop conf), so the layer
  * works unchanged against HDFS or an object store with a Hadoop
  * connector; the local filesystem is just the test instance.
  *
  * Manifests store file paths RELATIVE to the table root, so a table
  * directory can be relocated/renamed wholesale and every version
  * stays readable (absolute paths from older manifests are still
  * honored on read/vacuum for compatibility).
  *
  * Writer concurrency (P19): version allocation is max+1; publish
  * refuses to replace an existing manifest, so a lost race surfaces
  * as a ConcurrentModificationException instead of a silently
  * overwritten commit. That check is best-effort on filesystems
  * without atomic no-overwrite rename (posix rename replaces; a true
  * CAS needs HDFS rename semantics or an object-store conditional
  * put) — the ETL loop already serializes writers, so the guard is a
  * race DETECTOR, not a coordination mechanism.
  *
  * Layout under `path`:
  *   data/c<version>-<uuid>/part-*.parquet   (immutable once published)
  *   manifests/v<version>                    (header lines + one file path per line)
  */
object Snapshot {

  private def resolve(path: String): (FileSystem, Path) =
    LakeFs.resolve(path)

  private def manifestDir(root: Path) = new Path(root, "manifests")

  private def manifestFile(root: Path, v: Long) =
    new Path(manifestDir(root), f"v$v%06d")

  private def listNames(fs: FileSystem, dir: Path): Seq[String] =
    LakeFs.listStatus(fs, dir).map(_.getPath.getName)

  /** Published versions, ascending. */
  def versions(path: String): Seq[Long] = {
    val (fs, root) = resolve(path)
    versionsIn(fs, root)
  }

  private def versionsIn(fs: FileSystem, root: Path): Seq[Long] =
    listNames(fs, manifestDir(root))
      .collect { case n if n.startsWith("v") => n.drop(1).toLong }
      .sorted

  def currentVersion(path: String): Option[Long] = versions(path).lastOption

  /** A version's commit wall-time (epoch millis), from its '#ts='
    * manifest header. None for manifests that predate the stamp.
    */
  def commitTime(path: String, version: Long): Option[Long] = {
    val (fs, root) = resolve(path)
    headerOf(fs, root, version)
      .collectFirst { case l if l.startsWith("#ts=") => l.drop(4).toLong }
  }

  /** TIMESTAMP AS OF resolution: the newest version committed at or
    * before `tsMillis` — versions scanned in commit order, keeping the
    * last whose stamp qualifies, so a wall-clock regression between
    * commits degrades gracefully to commit-order semantics instead of
    * lying. Versions without a stamp (pre-'#ts=' manifests) can't
    * prove their commit time and never match. None = every stamped
    * version is newer than the asked-for time (the Delta "timestamp
    * before earliest version" error case — callers decide how loud).
    */
  def versionAt(path: String, tsMillis: Long): Option[Long] = {
    val (fs, root) = resolve(path)
    versionsIn(fs, root).foldLeft(Option.empty[Long]) { (acc, v) =>
      val ts = headerOf(fs, root, v)
        .collectFirst { case l if l.startsWith("#ts=") => l.drop(4).toLong }
      if (ts.exists(_ <= tsMillis)) Some(v) else acc
    }
  }

  /** DESCRIBE HISTORY: one row per surviving version, computed purely
    * from the manifests — commit stamp, file count, files
    * added/removed vs the PREVIOUS SURVIVING version (vacuum may have
    * reclaimed older manifests, so deltas are relative to what still
    * exists; the first surviving version counts all its files as
    * added), deletion-vector sidecar count, and the recorded schema
    * DDL. O(versions × manifest lines) driver-side metadata — the
    * same cost class as any manifest read — and SQL-visible as the
    * Iceberg-style metadata table `graft.db.t.history`.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val (fs, root) = resolve(path)
    var prev = Option.empty[Set[String]]
    val rows = versionsIn(fs, root).map { v =>
      val hdr = headerOf(fs, root, v)
      val files = fileEntries(fs, root, v)
      val cur = files.toSet
      val ts = hdr.collectFirst { case l if l.startsWith("#ts=") =>
        new java.sql.Timestamp(l.drop(4).toLong) }.orNull
      val added = prev.map(p => (cur -- p).size).getOrElse(files.size)
      val removed = prev.map(p => (p -- cur).size).getOrElse(0)
      prev = Some(cur)
      org.apache.spark.sql.Row(v, ts, files.size, added, removed,
        dvEntries(hdr).size,
        hdr.collectFirst { case l if l.startsWith("#schema=") =>
          l.drop(8) }.orNull)
    }
    val schema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("timestamp", TimestampType, nullable = true),
      StructField("n_files", IntegerType, nullable = false),
      StructField("n_added", IntegerType, nullable = false),
      StructField("n_removed", IntegerType, nullable = false),
      StructField("n_dv_files", IntegerType, nullable = false),
      StructField("schema", StringType, nullable = true)))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  /** A version's live file inventory from its manifest: resolved
    * path, stats-recorded row count (null for a statless file), and
    * whether a skipping envelope exists — the pruning-debug view,
    * SQL-visible as the metadata table `graft.db.t.files`.
    */
  def filesOf(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types._
    val (fs, root) = resolve(path)
    val v = version.orElse(versionsIn(fs, root).lastOption).getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val stats = statsOf(fs, root, v)
    val rows = fileEntries(fs, root, v).map { e =>
      val st = stats.get(e)
      org.apache.spark.sql.Row(resolveEntry(fs, root, e).toString,
        st.map(s => java.lang.Long.valueOf(s.rows)).orNull,
        st.isDefined)
    }
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("rows", LongType, nullable = true),
      StructField("has_stats", BooleanType, nullable = false)))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  /** Manifest lines: '#'-prefixed header (schema, txn markers), then
    * one referenced file path per line (relative to the table root).
    */
  private def manifestLines(fs: FileSystem, root: Path, v: Long): Seq[String] = {
    val in = fs.open(manifestFile(root, v))
    val bytes = try in.readAllBytes() finally in.close()
    new String(bytes, StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toIndexedSeq
  }

  private def headerOf(fs: FileSystem, root: Path, v: Long): Seq[String] =
    manifestLines(fs, root, v).takeWhile(_.startsWith("#"))

  private def fileEntries(fs: FileSystem, root: Path, v: Long): Seq[String] =
    manifestLines(fs, root, v).filterNot(_.startsWith("#"))

  /** Resolve a manifest file entry against the table root. Relative
    * entries (current format) follow a relocated root; absolute ones
    * (legacy manifests, [[importTable]] adoptions) pass through.
    * Scheme-qualified entries are returned verbatim — qualifying them
    * against the TABLE's filesystem would throw 'Wrong FS' when the
    * entry lives on a different filesystem (a cross-store import),
    * and they already carry everything a reader needs to bind their
    * own FileSystem via `Path.getFileSystem`.
    */
  private def resolveEntry(fs: FileSystem, root: Path, entry: String): Path =
    if (entry.contains("://")) new Path(entry)
    else if (entry.startsWith("/")) fs.makeQualified(new Path(entry))
    else new Path(root, entry)

  // ------------------------------------------------------- field identity

  /** Parse a manifest's '#fields=' line: (name, fid) in schema order.
    * The line is what makes NON-ADDITIVE evolution (rename, widen)
    * possible: a column's identity is its fid, not its name, and every
    * data file written by this layer embeds the fid in its parquet
    * schema (`parquet.field.id`, the Iceberg convention Spark matches
    * on natively).
    */
  private def parseFields(header: Seq[String]): Seq[(String, Int)] =
    header.collectFirst { case l if l.startsWith("#fields=") => l.drop(8) }
      .map(_.split(",").toSeq.filter(_.nonEmpty).map { t =>
        val i = t.indexOf(':')
        (t.drop(i + 1), t.take(i).toInt) // fid:name
      }).getOrElse(Nil)

  private def fieldsOf(fs: FileSystem, root: Path,
      head: Option[Long]): Seq[(String, Int)] =
    head.map(v => parseFields(headerOf(fs, root, v))).getOrElse(Nil)

  /** Assign fids for `cols` against the previous mapping: a name that
    * existed keeps its fid (case-insensitive, like column resolution),
    * a new name gets max+1. Stable across appends, which is exactly
    * the identity rename/widen pivot on.
    */
  private def assignFields(prev: Seq[(String, Int)],
      cols: Seq[String]): Seq[(String, Int)] = {
    val byName = prev.map { case (n, i) => n.toLowerCase -> i }.toMap
    var next = (0 +: prev.map(_._2)).max
    cols.map { c =>
      c -> byName.getOrElse(c.toLowerCase, { next += 1; next })
    }
  }

  private def fieldsLine(fields: Seq[(String, Int)]): Option[String] =
    Option.when(fields.nonEmpty &&
      fields.forall { case (n, _) => !n.contains(":") && !n.contains(",") &&
        !n.contains("\n") })(
      "#fields=" + fields.map { case (n, i) => s"$i:$n" }.mkString(","))

  /** Attach `parquet.field.id` metadata so the written footers carry
    * the fids (spark.sql.parquet.fieldId.write.enabled is on by
    * default). A metadata-only select — no row-level work.
    */
  private def withFieldIds(df: DataFrame,
      fids: Seq[(String, Int)]): DataFrame = {
    val byName = fids.toMap
    df.select(df.columns.map { c =>
      byName.get(c) match {
        case Some(id) => df(c)
          .as(c, new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(df.schema(c).metadata)
            .putLong("parquet.field.id", id.toLong).build())
        case None => df(c)
      }
    }.toIndexedSeq: _*)
  }

  /** Write df's files into an immutable commit directory and return
    * their paths RELATIVE to the table root (what the manifest
    * stores). The directory is named by the version being built plus
    * a uuid, so a crashed commit leaves only unreferenced files
    * (cleaned by vacuum), never a corrupt version. Columns are
    * annotated with their fids (assigned against the CURRENT head) so
    * every footer carries stable field identity.
    */
  private def writeData(df: DataFrame, fs: FileSystem, root: Path,
      v: Long): Seq[String] = {
    val dirName = f"c$v%06d-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = new Path(new Path(root, "data"), dirName)
    val fids = assignFields(
      fieldsOf(fs, root, versionsIn(fs, root).lastOption),
      df.schema.map(_.name).toSeq)
    // snapshot data files always write timestamps as INT64 micros:
    // INT96 (Spark's legacy default) is deprecated in parquet and
    // carries no usable chunk statistics, so it would exempt every
    // timestamp column from '#stats=' pruning and the metadata-only
    // min/max path (session conf restored after the eager write)
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val saved = df.sparkSession.conf.getOption(tsKey)
    df.sparkSession.conf.set(tsKey, "TIMESTAMP_MICROS")
    try withFieldIds(df, fids).write.parquet(dir.toString)
    finally saved match {
      case Some(prev) => df.sparkSession.conf.set(tsKey, prev)
      case None => df.sparkSession.conf.unset(tsKey)
    }
    listNames(fs, dir).filter(_.endsWith(".parquet"))
      .map(n => s"data/$dirName/$n").sorted
  }

  /** df's schema as a manifest header line — what makes an EMPTY
    * version (cleared table, filtered-out micro-batch) readable:
    * Spark writes no part files for empty partitions, so without the
    * recorded schema a zero-file read could not even infer one.
    */
  private def schemaMeta(df: DataFrame): String =
    "#schema=" + df.schema.toDDL

  /** The '#schema=' line for an APPEND-shaped commit (old files are
    * carried): the appended frame's schema, with nullability RELAXED
    * against the head's recorded schema. A column the head already
    * declares nullable may hold nulls in carried files, and a column
    * the head doesn't know at all reads as NULL from every pre-add
    * file — recording the frame's own `NOT NULL` for either (an
    * INSERT of literals arrives non-nullable) would make the
    * vectorized parquet reader reject carried files ("required column
    * is missing") instead of null-filling them. Overwrites keep the
    * frame's exact schema: no carried file exists to contradict it.
    */
  private def appendSchemaMeta(fs: FileSystem, root: Path,
      head: Option[Long], df: DataFrame): String = {
    val headSchema = head.flatMap(schemaOf(fs, root, _)).flatMap(ddl =>
      try Some(org.apache.spark.sql.types.StructType.fromDDL(ddl))
      catch { case scala.util.control.NonFatal(_) => None })
    headSchema match {
      case None => schemaMeta(df)
      case Some(hs) =>
        val known = hs.map(f => f.name.toLowerCase -> f.nullable).toMap
        val merged = org.apache.spark.sql.types.StructType(df.schema.map(f =>
          known.get(f.name.toLowerCase) match {
            case Some(headNullable) =>
              f.copy(nullable = f.nullable || headNullable)
            case None => f.copy(nullable = true)
          }))
        "#schema=" + merged.toDDL
    }
  }

  /** Publish `files` (plus '#'-header lines) as version `v`: temp
    * write + rename, the same durability move as the ETL cursor. The
    * rename is the single commit point — any header metadata becomes
    * visible atomically WITH the file list. Refuses to replace an
    * existing manifest: a concurrent writer that allocated the same
    * version loses the race LOUDLY (its data files stay unreferenced
    * for vacuum; the table is untouched).
    */
  private def publish(fs: FileSystem, root: Path, v: Long,
      files: Seq[String], meta: Seq[String] = Nil): Long = {
    val dst = manifestFile(root, v)
    fs.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root),
      s".v$v.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    // commit wall-time header (TIMESTAMP AS OF time travel): stamped
    // here — the one place every manifest is written — so restore/
    // rollback paths that re-carry an old header can't smuggle a
    // stale stamp in (any inherited '#ts=' is dropped first)
    val stamped = s"#ts=${System.currentTimeMillis()}" +:
      meta.filterNot(_.startsWith("#ts="))
    val out = fs.create(tmp, true)
    try out.write(
      ((stamped ++ files).mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    def lose(why: String): Nothing = {
      fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"snapshot version $v at $root $why — concurrent writer won the race")
    }
    if (fs.exists(dst)) lose("already published")
    if (!fs.rename(tmp, dst)) lose("could not be published")
    v
  }

  private def splitMarker(m: String): (String, Long) = {
    val i = m.lastIndexOf('/')
    (m.take(i), m.drop(i + 1).toLong)
  }

  /** Stream txn state carried into every new manifest (Delta-style):
    * the newest marker per streamId, merged from the PREVIOUS
    * manifest's state and this commit's own '#txn=' marker. Because
    * every manifest carries the full state forward, the replay check
    * never depends on an OLD manifest surviving vacuum — dropping all
    * but the newest manifest cannot lose a marker.
    */
  private def carriedTxnState(fs: FileSystem, root: Path,
      meta: Seq[String], head: Option[Long]): Seq[String] = {
    val own = meta.collect {
      case l if l.startsWith("#txn=") => splitMarker(l.drop(5))
    }
    val prev = head.toSeq
      .flatMap(headerOf(fs, root, _))
      .collect {
        case l if l.startsWith("#txn=") => splitMarker(l.drop(5))
        case l if l.startsWith("#txnstate=") => splitMarker(l.drop(10))
      }
    val ownStreams = own.map(_._1).toSet
    (prev ++ own).groupMapReduce(_._1)(_._2)(math.max)
      .toSeq.filterNot { case (s, _) => ownStreams.contains(s) }
      .sortBy(_._1)
      .map { case (s, b) => s"#txnstate=$s/$b" }
  }

  /** Per-file stats lines for `files` (data skipping,
    * Snapshot.readWhere): files already covered by the PREVIOUS
    * manifest reuse its '#stats=' entry verbatim — a carried file's
    * footer is never re-read, the same carry-forward discipline as
    * txn state — and only genuinely new files (plus, once, files of
    * legacy manifests that predate stats) cost a footer read. Footer
    * reads are metadata-only; a file whose stats can't be collected
    * simply gets no line (readers keep statless files).
    */
  private def statsLines(fs: FileSystem, root: Path,
      files: Seq[String], head: Option[Long]): Seq[String] = {
    val prev: Map[String, String] = head.toSeq
      .flatMap(headerOf(fs, root, _))
      .flatMap { l =>
        if (!l.startsWith("#stats=")) None
        else {
          val rest = l.drop(7)
          val i = rest.indexOf('\t')
          Option.when(i > 0)(rest.take(i) -> rest.drop(i + 1))
        }
      }.toMap
    lazy val conf = LakeFs.hadoopConf
    files.flatMap { f =>
      prev.get(f)
        .orElse(FileStats.collect(conf, resolveEntry(fs, root, f))
          .map(FileStats.toJson))
        .map(j => s"#stats=$f\t$j")
    }
  }

  private def statsOf(fs: FileSystem, root: Path,
      v: Long): Map[String, FileStats.FileStat] =
    headerOf(fs, root, v).flatMap { l =>
      if (!l.startsWith("#stats=")) None
      else {
        val rest = l.drop(7)
        val i = rest.indexOf('\t')
        Option.when(i > 0)(rest.take(i) -> rest.drop(i + 1))
          .flatMap { case (f, j) => FileStats.fromJson(j).map(f -> _) }
      }
    }.toMap

  /** The one header-assembly + publish sequence every commit shape
    * shares, PINNED to the head version it was built from: carried txn
    * state, carried stats, and the published version number all derive
    * from the SAME `head` the caller read its base file list from. A
    * concurrent writer landing head+1 in between therefore makes the
    * publish fail loudly (manifest exists) instead of silently
    * dropping the interloper's files from a manifest allocated at
    * head+2 — the lost-update hole a late re-read of `versionsIn`
    * would open.
    */
  private def commitPinned(fs: FileSystem, root: Path, head: Option[Long],
      files: Seq[String], meta: Seq[String]): Long = {
    val headHdr = head.map(headerOf(fs, root, _)).getOrElse(Nil)
    // '#evolved' (some version renamed/widened a column, so readers
    // must match files by field id) and '#fields=' (the fid mapping)
    // flow through every commit like txn state; evolution commits
    // supply their own lines
    val evolved =
      if (meta.exists(_.startsWith("#evolved"))) Nil
      else headHdr.filter(_.startsWith("#evolved")).take(1)
    val fields =
      if (meta.exists(_.startsWith("#fields="))) Nil
      else meta.collectFirst { case l if l.startsWith("#schema=") => l.drop(8) }
        .toSeq.flatMap { ddl =>
          try fieldsLine(assignFields(parseFields(headHdr),
            org.apache.spark.sql.types.StructType.fromDDL(ddl)
              .map(_.name).toSeq)).toSeq
          catch { case scala.util.control.NonFatal(_) => Nil }
        }
    val state = carriedTxnState(fs, root, meta, head)
    val stats = statsLines(fs, root, files, head)
    onBeforePublish()
    publish(fs, root, head.getOrElse(0L) + 1, files,
      meta ++ evolved ++ fields ++ state ++ stats)
  }

  /** Test seam (fault injection): invoked once immediately before
    * every manifest publish, AFTER the manifest body was assembled
    * from its pinned head — specs interleave a concurrent commit into
    * exactly the window the optimistic-concurrency machinery must
    * survive. No-op in production; a spec's hook must reset it before
    * committing to avoid recursing.
    */
  private[etl] var onBeforePublish: () => Unit = () => ()

  private def filesAt(fs: FileSystem, root: Path, head: Option[Long]): Seq[String] =
    head.map(fileEntries(fs, root, _)).getOrElse(Nil)

  /** Commit df as a FULL snapshot (overwrite semantics): the new
    * version's manifest lists only df's files. Returns the version.
    * Concurrent-writer posture: fail-loudly (a concurrent overwrite
    * has no well-defined merge — Delta's Serializable rule for
    * replace-the-table commits).
    */
  def commitOverwrite(df: DataFrame, path: String): Long = {
    val (fs, root) = resolve(path)
    val head = versionsIn(fs, root).lastOption
    commitPinned(fs, root, head,
      writeData(df, fs, root, head.getOrElse(0L) + 1), Seq(schemaMeta(df)))
  }

  /** Test seam for the version-allocation race: commit df AT a
    * pre-allocated version instead of allocating at publish time —
    * the interleaving a concurrent writer creates (allocate max+1,
    * write data, lose the publish race to a writer that published the
    * same version first). Production commit paths allocate and
    * publish back-to-back; this exists so the race DETECTION (publish
    * refuses to replace an existing manifest) is spec-testable
    * deterministically.
    */
  private[etl] def commitOverwriteAt(df: DataFrame, path: String,
      v: Long): Long = {
    val (fs, root) = resolve(path)
    val files = writeData(df, fs, root, v)
    commitPinned(fs, root, Some(v - 1).filter(_ > 0), files,
      Seq(schemaMeta(df)))
  }

  /** How many publish races an optimistic append re-tries before
    * giving up — a liveness bound, not a correctness one (every retry
    * re-reads the head, so any successful publish is built on it).
    */
  private val AppendRetries = 5

  /** Commit df as an APPEND: the new manifest lists the previous
    * version's files plus df's — no existing data is read or
    * rewritten. Returns the version.
    *
    * Concurrent-writer posture: OPTIMISTIC RETRY. Append commits are
    * always file-disjoint from a concurrent winner (this writer's new
    * files live in their own immutable commit directory; the base list
    * is re-read from the winner's head), so a lost publish race
    * re-reads the new head and re-publishes on top of it — Delta's
    * append-never-conflicts rule. The data is written ONCE; only the
    * manifest assembly repeats. Bounded retries keep a livelocked
    * writer loud.
    */
  def commitAppend(df: DataFrame, path: String): Long = {
    val (fs, root) = resolve(path)
    val data = writeData(df, fs, root,
      versionsIn(fs, root).lastOption.getOrElse(0L) + 1)
    retryAppend(fs, root) { head =>
      // an append leaves existing files untouched, so the head's
      // deletion vectors stay valid — carry them (re-read per retry:
      // the interloper may have been a merge-on-read delete)
      Some((filesAt(fs, root, head) ++ data,
        Seq(appendSchemaMeta(fs, root, head, df)) ++
          dvLinesOf(fs, root, head)))
    }.get
  }

  /** Re-read the head and re-publish until a publish wins or retries
    * run out. `attempt` sees the pinned head and returns the manifest
    * body to publish on top of it — or None to abort (used by
    * commitAppendOnce when a replayed marker appears mid-retry).
    */
  private def retryAppend(fs: FileSystem, root: Path)(
      attempt: Option[Long] => Option[(Seq[String], Seq[String])]): Option[Long] = {
    var last: java.util.ConcurrentModificationException = null
    var i = 0
    while (i <= AppendRetries) {
      val head = versionsIn(fs, root).lastOption
      attempt(head) match {
        case None => return None
        case Some((files, meta)) =>
          try return Some(commitPinned(fs, root, head, files, meta))
          catch {
            case e: java.util.ConcurrentModificationException => last = e
          }
      }
      i += 1
    }
    throw last
  }

  private def schemaOf(fs: FileSystem, root: Path, v: Long): Option[String] =
    headerOf(fs, root, v)
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
  /** The version's logical schema for READING: on an evolved table
    * (some version renamed/widened a column) the fields carry
    * `parquet.field.id` metadata and the session's field-id parquet
    * matching is switched on, so files written under pre-rename names
    * or pre-widen types resolve by FIELD IDENTITY — an old file yields
    * the renamed column's values under its new name, and INT32 data
    * widens to LONG on scan. Non-evolved tables read exactly as before
    * (name matching, no conf touched).
    */
  private def readSchema(spark: SparkSession, fs: FileSystem, root: Path,
      v: Long): Option[org.apache.spark.sql.types.StructType] = {
    val hdr = headerOf(fs, root, v)
    val base = hdr.collectFirst { case l if l.startsWith("#schema=") =>
      org.apache.spark.sql.types.StructType.fromDDL(l.drop(8)) }
    if (!hdr.exists(_.startsWith("#evolved"))) base
    else {
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      val fids = parseFields(hdr).map { case (n, i) => n.toLowerCase -> i }.toMap
      base.map(sch => org.apache.spark.sql.types.StructType(sch.map(f =>
        fids.get(f.name.toLowerCase) match {
          case Some(id) => f.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putLong("parquet.field.id", id.toLong).build())
          case None => f
        })))
    }
  }

  // ---------------------------------------------------- deletion vectors

  /** A version's deletion-vector sidecar files ('#dv=' header lines):
    * parquet files of (__path, __pos) keys naming rows DELETED from
    * the version's (unchanged) data files — the merge-on-read half of
    * DELETE WHERE. __path is root-relative (same relocation story as
    * file entries); __pos is the row's position within its file
    * (parquet `_metadata.row_index` — stable because published files
    * are immutable).
    */
  private def dvLinesOf(fs: FileSystem, root: Path,
      v: Option[Long]): Seq[String] =
    v.toSeq.flatMap(headerOf(fs, root, _)).filter(_.startsWith("#dv="))

  private def dvEntries(hdr: Seq[String]): Seq[String] =
    hdr.collect { case l if l.startsWith("#dv=") => l.drop(4) }

  /** The root-relative spelling of this row's source file, rebuilt
    * from the scan's `_metadata.file_path` — commit dir names never
    * contain '/data/', so the LAST occurrence splits at the table's
    * own data root however the table URI is spelled or relocated.
    */
  private def dvPathExpr = org.apache.spark.sql.functions.expr(
    "concat('data/', substring_index(_metadata.file_path, '/data/', -1))")

  /** Filter a scan of version files down to its LIVE rows: anti-join
    * on the version's deletion vectors keyed by (file, row position).
    * The DV side is a normal parquet scan with real size statistics,
    * so the planner broadcasts it whenever it is small (the common
    * case — a DV holds deleted keys, not data); results are exactly
    * "the version's rows minus its deleted rows". At warehouse scale
    * the per-row key pair becomes a per-file position BITMAP resolved
    * in the reader (the Delta/Iceberg DV format); the manifest
    * contract here — immutable data files + DV sidecar files + carry
    * rules — is the part that carries over.
    */
  private def applyDv(spark: SparkSession, fs: FileSystem, root: Path,
      hdr: Seq[String], base: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dvs = dvEntries(hdr)
    if (dvs.isEmpty) base
    else {
      val dv = spark.read
        .parquet(dvs.map(resolveEntry(fs, root, _).toString): _*)
        .select(col("__path").as("__graft_dv_path"),
          col("__pos").as("__graft_dv_pos"))
      base
        .withColumn("__graft_dv_path", dvPathExpr)
        .withColumn("__graft_dv_pos", col("_metadata.row_index"))
        .join(dv, Seq("__graft_dv_path", "__graft_dv_pos"), "left_anti")
        .select(base.columns.map(col).toIndexedSeq: _*)
    }
  }

  def read(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val (fs, root) = resolve(path)
    val v = version.orElse(versionsIn(fs, root).lastOption).getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val files = fileEntries(fs, root, v)
      .map(resolveEntry(fs, root, _).toString)
    val schema = readSchema(spark, fs, root, v)
    val base = (files.nonEmpty, schema) match {
      case (true, Some(s)) => spark.read.schema(s).parquet(files: _*)
      case (true, None) => spark.read.parquet(files: _*)
      case (false, Some(s)) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (false, None) => throw new IllegalStateException(
        s"version $v at $path is empty and carries no schema header")
    }
    if (files.isEmpty) base
    else applyDv(spark, fs, root, headerOf(fs, root, v), base)
  }

  /** Read with FILE SKIPPING: plan the scan over only the manifest
    * files whose stats envelope ([min,max] + null counts per column,
    * FileStats) may satisfy `predicate` — the read-side payoff of
    * `optimize(zorderBy = …)`: clustered files carry disjoint ranges,
    * so a selective predicate opens a handful of files out of
    * thousands, decided driver-side from manifest metadata BEFORE any
    * footer is fetched. Pruning is conservative (files without usable
    * stats, predicates outside the supported shapes, and type
    * mismatches are kept) and the predicate is re-applied as a normal
    * filter on the survivors — so results are always exactly
    * `read(...).filter(predicate)`, pruning only removes I/O.
    *
    * Supported pruning shapes: AND/OR of =, <=>, <, <=, >, >=, IN,
    * IS [NOT] NULL, startsWith on top-level numeric / date /
    * timestamp / boolean / string columns.
    */
  def readWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column,
      version: Option[Long] = None): DataFrame = {
    val (fs, root) = resolve(path)
    val v = version.orElse(versionsIn(fs, root).lastOption).getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val stats = statsOf(fs, root, v)
    val pred =
      org.apache.spark.sql.graftbridge.ColumnExpr.expression(predicate)
    val kept = fileEntries(fs, root, v).filter(e =>
      stats.get(e).forall(FileStats.mayMatch(pred, _)))
    val files = kept.map(resolveEntry(fs, root, _).toString)
    val schema = readSchema(spark, fs, root, v)
    val base = (files.nonEmpty, schema) match {
      case (true, Some(s)) => spark.read.schema(s).parquet(files: _*)
      case (true, None) => spark.read.parquet(files: _*)
      case (false, Some(s)) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (false, None) => throw new IllegalStateException(
        s"version $v at $path pruned to empty and carries no schema header")
    }
    val live =
      if (files.isEmpty) base
      else applyDv(spark, fs, root, headerOf(fs, root, v), base)
    live.filter(predicate)
  }

  /** Incremental consumption (append-only CDC): the rows ADDED after
    * `sinceVersion` (exclusive) up to `untilVersion` (inclusive,
    * default latest), as a parquet scan over exactly the manifest
    * entries new in that range — a downstream job (embedding refresh,
    * incremental dedup xd6, training-mix rebuild) processes each
    * version delta without ever rescanning the table. `sinceVersion
    * = 0` bootstraps with the full first version. Cost is
    * O(files-in-two-manifests) metadata plus a scan of only the new
    * files.
    *
    * Append-only is VERIFIED, not assumed: if any file referenced at
    * `sinceVersion` is gone at `untilVersion` (overwrite, rollback,
    * or an optimize rewrite happened in between), the delta is not
    * expressible as added-files and this throws — the Delta streaming
    * source's posture — instead of silently emitting wrong changes.
    */
  def readChanges(spark: SparkSession, path: String, sinceVersion: Long,
      untilVersion: Option[Long] = None): DataFrame = {
    val (fs, root) = resolve(path)
    val to = untilVersion.orElse(versionsIn(fs, root).lastOption).getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    require(sinceVersion >= 0 && sinceVersion <= to,
      s"sinceVersion $sinceVersion outside [0, $to]")
    val base = if (sinceVersion == 0) Nil else fileEntries(fs, root, sinceVersion)
    val cur = fileEntries(fs, root, to)
    val removed = base.filterNot(cur.toSet)
    if (removed.nonEmpty) throw new IllegalStateException(
      s"versions ($sinceVersion, $to] at $path are not append-only: " +
        s"${removed.size} base file(s) were removed/rewritten — " +
        "consume the full snapshot instead")
    // merge-on-read deletes change ALREADY-CONSUMED rows without
    // touching the file list — a new '#dv=' sidecar in the range is a
    // row-level retraction no added-files delta can express. Refuse,
    // like a rewrite. (A bootstrap at sinceVersion=0 has consumed
    // nothing yet, so it simply reads `to` with its DVs applied.)
    if (sinceVersion > 0) {
      val dvBase = dvLinesOf(fs, root, Some(sinceVersion)).toSet
      val dvCur = dvLinesOf(fs, root, Some(to)).toSet
      if (dvBase != dvCur) throw new IllegalStateException(
        s"versions ($sinceVersion, $to] at $path are not append-only: " +
          "a merge-on-read delete (deletion vector) landed in the " +
          "range — consume the full snapshot instead")
    }
    val added = cur.filterNot(base.toSet)
      .map(resolveEntry(fs, root, _).toString)
    val schema = readSchema(spark, fs, root, to)
    val delta = (added.nonEmpty, schema) match {
      case (true, Some(s)) => spark.read.schema(s).parquet(added: _*)
      case (true, None) => spark.read.parquet(added: _*)
      case (false, Some(s)) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (false, None) => throw new IllegalStateException(
        s"empty delta at $path ($sinceVersion, $to] carries no schema header")
    }
    if (sinceVersion == 0 && added.nonEmpty)
      applyDv(spark, fs, root, headerOf(fs, root, to), delta)
    else delta
  }

  /** OPTIMIZE: republish the CURRENT content re-laid-out — compacted
    * into `targetFiles` files, optionally Z-ORDER clustered on
    * `zorderBy` (2-4 columns, operators.ZOrder) so footer min/max
    * stats prune scans on any clustered dimension — as a NEW version.
    * Content is byte-identical (pure re-layout, TableCheck-provable);
    * readers pinned to old versions are untouched (their files are
    * immutable) and vacuum reclaims the small files once retention
    * passes. The snapshot-native form of Compact: same motivation
    * (small-file open/footer overhead dominates scans long before
    * bytes do), but transactional — a crash mid-optimize leaves only
    * unreferenced files, never a half-compacted table.
    */
  def optimize(spark: SparkSession, path: String, targetFiles: Int,
      zorderBy: Seq[String] = Nil): Long = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val cur = read(spark, path)
    val laid =
      if (zorderBy.isEmpty) cur.repartition(targetFiles)
      else {
        import org.apache.spark.sql.functions.col
        cur.withColumn("_z", graft.operators.ZOrder.zvalue(cur, zorderBy))
          .repartitionByRange(targetFiles, col("_z"))
          .sortWithinPartitions("_z")
          .drop("_z")
      }
    commitOverwrite(laid, path)
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
  /** Newest committed batch id for `streamId`, if any — the PUBLIC
    * replay probe behind commitAppendOnce's skip, for sinks whose OWN
    * side effects (quarantine writes, ops counters, index updates)
    * must also be replay-safe: check this BEFORE computing anything,
    * because after the original commit the lake already contains the
    * batch's rows and any recomputation would see them (e.g. a
    * replayed dedup batch matching its own survivors). None when the
    * table doesn't exist yet or the stream has never committed.
    */
  def lastCommittedBatch(path: String, streamId: String): Option[Long] = {
    val (fs, root) = resolve(path)
    if (!fs.exists(root)) None else lastMarkedIn(fs, root, streamId)
  }

  // batch ids are delivered monotonically PER STREAM, so only this
  // stream's newest marker matters. Every manifest carries the full
  // txn state forward, so the scan stops at the newest manifest in
  // the current format; the walk continues only across legacy
  // manifests that predate carried state.
  private def lastMarkedIn(fs: FileSystem, root: Path,
      streamId: String): Option[Long] = {
    val prefix = s"#txn=$streamId/"
    val statePrefix = s"#txnstate=$streamId/"
    versionsIn(fs, root).reverseIterator
      .map { v =>
        val ids = headerOf(fs, root, v).collect {
          case l if l.startsWith(prefix) => l.drop(prefix.length).toLong
          case l if l.startsWith(statePrefix) => l.drop(statePrefix.length).toLong
        }
        ids.maxOption
      }
      .collectFirst { case Some(id) => id }
  }

  def commitAppendOnce(df: DataFrame, path: String, streamId: String,
      batchId: Long): Option[Long] = {
    require(!streamId.contains("\n") && !streamId.contains("/"),
      s"streamId must be a plain token: $streamId")
    val (fs, root) = resolve(path)
    val prefix = s"#txn=$streamId/"
    def lastMarked: Option[Long] = lastMarkedIn(fs, root, streamId)
    // data written at most once (lazily: a replayed batch writes
    // nothing); the marker is RE-CHECKED inside every retry, so a race
    // lost to another instance of the SAME stream committing this very
    // batch resolves as a skip, not a double-append.
    lazy val data = writeData(df, fs, root,
      versionsIn(fs, root).lastOption.getOrElse(0L) + 1)
    retryAppend(fs, root) { head =>
      if (lastMarked.exists(_ >= batchId)) None
      else Some((filesAt(fs, root, head) ++ data,
        Seq(s"$prefix$batchId", appendSchemaMeta(fs, root, head, df)) ++
          dvLinesOf(fs, root, head)))
    }
  }

  /** Roll back by PUBLISHING a new version whose manifest duplicates
    * `to`'s — file list AND schema header (an empty version must stay
    * readable after rollback), but NOT its transaction marker (a
    * rollback is not a stream commit; the carried txn state still
    * flows forward from the latest version, so replay protection
    * survives the rollback — the Delta RESTORE posture: data rewinds,
    * stream transaction state does not).
    */
  def rollback(path: String, to: Long): Long = {
    val (fs, root) = resolve(path)
    // the restored content is `to`'s files MINUS `to`'s deletion
    // vectors — carry to's own '#dv=' lines (not the head's): rolling
    // back across a merge-on-read delete must resurrect the rows,
    // rolling back to a post-delete version must keep them deleted
    commitPinned(fs, root, versionsIn(fs, root).lastOption,
      fileEntries(fs, root, to),
      schemaOf(fs, root, to).map("#schema=" + _).toSeq ++
        dvLinesOf(fs, root, Some(to)))
  }

  // ------------------------------------------------------ schema evolution

  /** Carried stats lines from version `v` with one column's envelope
    * removed per file — rename invalidates the NAME the stats are
    * keyed by (and a later column reusing the old name must not
    * inherit them), so the renamed column simply loses skipping until
    * files are rewritten (optimize). Conservative, never wrong.
    */
  private def statsDropColumn(fs: FileSystem, root: Path, v: Long,
      column: String): Seq[String] =
    headerOf(fs, root, v).flatMap { l =>
      if (!l.startsWith("#stats=")) None
      else {
        val rest = l.drop(7)
        val i = rest.indexOf('\t')
        if (i <= 0) None
        else FileStats.fromJson(rest.drop(i + 1)).map { st =>
          s"#stats=${rest.take(i)}\t" +
            FileStats.toJson(st.copy(cols = st.cols - column.toLowerCase))
        }
      }
    }

  /** Evolution gate: every file of version `v` must carry parquet
    * field ids in its footer, or a rename/widen would silently read
    * the affected column as NULL from files that can only be matched
    * by name. Footer-only reads, O(files) — evolution is rare. A
    * pre-field-id table becomes evolvable after one `optimize()`
    * (which rewrites every file with ids).
    */
  private def requireFieldIds(fs: FileSystem, root: Path, v: Long,
      op: String): Unit = {
    val conf = LakeFs.hadoopConf
    val missing = fileEntries(fs, root, v)
      .filterNot(e => FileStats.hasFieldIds(conf, resolveEntry(fs, root, e)))
    require(missing.isEmpty,
      s"$op needs every data file to carry parquet field ids; " +
        s"${missing.size} file(s) predate field-id writes — run " +
        "optimize() first to rewrite them, then retry")
  }

  private def evolveCommit(fs: FileSystem, root: Path, v: Long,
      schema: org.apache.spark.sql.types.StructType,
      fields: Seq[(String, Int)], stats: Seq[String]): Long = {
    val meta = Seq("#schema=" + schema.toDDL, "#evolved=1") ++
      fieldsLine(fields) ++ dvLinesOf(fs, root, Some(v))
    val state = carriedTxnState(fs, root, meta, Some(v))
    onBeforePublish()
    publish(fs, root, v + 1, fileEntries(fs, root, v),
      meta ++ state ++ stats)
  }

  /** ADDITIVE evolution: append a nullable column to the table schema
    * as a HEADER-ONLY commit — no data file is touched; the new
    * version's '#schema=' simply carries the extra trailing field, and
    * the read path's recorded-schema discipline makes every existing
    * file scan the column as NULL (the same mixed-footer rule that
    * already serves `commitAppend` with a wider frame). '#fields='
    * assignment in [[commitPinned]] hands the new name a fresh field
    * id, so later renames/widenings of it resolve by id like any
    * other column. Existing stats envelopes carry verbatim — they
    * don't mention the new column, which readers treat conservatively
    * (no pruning on it, metadata-count falls back) until files
    * actually containing it are written. Concurrent-writer posture:
    * append-like bounded retries (the file list is re-pinned to the
    * winner's head each attempt). Time travel to a pre-add version
    * shows the old schema. Returns the published version.
    */
  def addColumn(spark: SparkSession, path: String, name: String,
      to: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.types._
    val (fs, root) = resolve(path)
    require(name.nonEmpty && !name.contains(":") && !name.contains(",") &&
      !name.contains("\n") && !name.contains("."),
      s"added column '$name' is not a plain column name")
    val resolver = spark.sessionState.analyzer.resolver
    retryAppend(fs, root) { head =>
      val v = head.getOrElse(throw new IllegalStateException(
        s"no snapshot versions at $path"))
      val schema = schemaOf(fs, root, v)
        .map(StructType.fromDDL).getOrElse(
          throw new IllegalStateException(
            s"version $v at $path carries no schema header"))
      require(!schema.fields.exists(f => resolver(f.name, name)),
        s"column '$name' already exists in the table schema")
      val newSchema = StructType(
        schema.fields :+ StructField(name, to, nullable = true))
      Some((filesAt(fs, root, head),
        Seq("#schema=" + newSchema.toDDL) ++ dvLinesOf(fs, root, head)))
    }.get
  }

  /** NON-ADDITIVE evolution: rename a column as a HEADER-ONLY commit —
    * no data file is touched; the column keeps its field id, the new
    * version's schema carries the new name, and reads resolve old
    * files by field identity (readSchema). Old versions keep their own
    * schema: time travel to a pre-rename version still shows the old
    * name. Requires every current file to carry field ids (see
    * requireFieldIds). Returns the published version.
    */
  def renameColumn(spark: SparkSession, path: String, from: String,
      to: String): Long = {
    val (fs, root) = resolve(path)
    val v = versionsIn(fs, root).lastOption.getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val schema = schemaOf(fs, root, v)
      .map(org.apache.spark.sql.types.StructType.fromDDL).getOrElse(
        throw new IllegalStateException(
          s"version $v at $path carries no schema header"))
    val resolver = spark.sessionState.analyzer.resolver
    val hits = schema.fields.filter(f => resolver(f.name, from))
    require(hits.length == 1,
      s"rename source '$from' resolves to ${hits.length} columns")
    require(!schema.fields.exists(f => resolver(f.name, to)),
      s"rename target '$to' already exists in the table schema")
    require(to.nonEmpty && !to.contains(":") && !to.contains(",") &&
      !to.contains("\n") && !to.contains("."),
      s"rename target '$to' is not a plain column name")
    requireFieldIds(fs, root, v, "renameColumn")
    val actual = hits.head.name
    val fields0 = parseFields(headerOf(fs, root, v)) match {
      case Nil => assignFields(Nil, schema.map(_.name).toSeq)
      case f => f
    }
    val fields = fields0.map { case (n, i) =>
      (if (n.equalsIgnoreCase(actual)) to else n, i)
    }
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.map(f => if (f.name == actual) f.copy(name = to) else f))
    evolveCommit(fs, root, v, newSchema, fields,
      statsDropColumn(fs, root, v, actual))
  }

  /** NON-ADDITIVE evolution: widen a column's type as a HEADER-ONLY
    * commit. Allowed widenings are the lossless parquet-readable ones
    * (byte/short/int → a wider integral; float → double): Spark's
    * parquet readers upcast the physical values on scan, so old files
    * need no rewrite. Stats envelopes stay valid (the VALUES are
    * unchanged) and carry forward. Time travel to a pre-widen version
    * shows the narrow type. Returns the published version.
    */
  def widenColumn(spark: SparkSession, path: String, name: String,
      to: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.types._
    def widens(a: DataType, b: DataType): Boolean = (a, b) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
    val (fs, root) = resolve(path)
    val v = versionsIn(fs, root).lastOption.getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val schema = schemaOf(fs, root, v)
      .map(org.apache.spark.sql.types.StructType.fromDDL).getOrElse(
        throw new IllegalStateException(
          s"version $v at $path carries no schema header"))
    val resolver = spark.sessionState.analyzer.resolver
    val hits = schema.fields.filter(f => resolver(f.name, name))
    require(hits.length == 1,
      s"widen target '$name' resolves to ${hits.length} columns")
    val f0 = hits.head
    require(widens(f0.dataType, to),
      s"cannot widen ${f0.dataType.simpleString} to ${to.simpleString} — " +
        "allowed: byte/short/int -> wider integral, float -> double")
    requireFieldIds(fs, root, v, "widenColumn")
    val fields0 = parseFields(headerOf(fs, root, v)) match {
      case Nil => assignFields(Nil, schema.map(_.name).toSeq)
      case f => f
    }
    val newSchema = org.apache.spark.sql.types.StructType(
      schema.map(f => if (f.name == f0.name) f.copy(dataType = to) else f))
    evolveCommit(fs, root, v, newSchema, fields0,
      headerOf(fs, root, v).filter(_.startsWith("#stats=")))
  }

  /** Outcome of a `deleteWhere`: the published version (unchanged when
    * the delete was a provable no-op), file-level surgery counts, and
    * the exact audit row counts a compliance log wants.
    */
  final case class DeleteResult(version: Long, rewrittenFiles: Int,
      carriedFiles: Int, scannedRows: Long, deletedRows: Long)

  /** Copy-on-write DELETE WHERE: publish a new version with every row
    * matching `predicate` physically absent — the targeted-erasure
    * (GDPR / right-to-be-forgotten / contamination-quarantine) shape a
    * training-data lake must support without rewriting the world.
    *
    * File-level surgery driven by the SAME manifest stats envelope
    * `readWhere` prunes with (FileStats.mayMatch):
    *  - files whose [min,max]/null envelope PROVES no row can match
    *    are carried into the new version untouched — a manifest-line
    *    copy: no read, no write, no shuffle, and their '#stats='
    *    lines carry forward without a footer re-read;
    *  - only possibly-matching files are scanned, filtered to the
    *    survivors, and rewritten. On a Z-ordered table a selective
    *    delete (one user's rows) touches a handful of files out of
    *    thousands, decided driver-side before any data I/O.
    * Both row counts ride the ONE rewrite pass as `observe` metrics
    * (no extra scan). SQL DELETE semantics: a NULL predicate row
    * SURVIVES (only predicate=TRUE deletes).
    *
    * A no-op delete (every file pruned) publishes nothing and returns
    * the current version. Deleted rows remain reachable via TIME
    * TRAVEL until `vacuum` drops the old versions — for a legal
    * purge, follow with `vacuum(path, keepVersions = 1)`; that pair
    * of calls is the complete erasure procedure, and SnapshotSpec's
    * delete suite proves the bytes are gone from every surviving
    * file afterward.
    */
  def deleteWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): DeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, count, lit, not, sum, when}
    val (fs, root) = resolve(path)
    val v = versionsIn(fs, root).lastOption.getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val entries = fileEntries(fs, root, v)
    val stats = statsOf(fs, root, v)
    val pred =
      org.apache.spark.sql.graftbridge.ColumnExpr.expression(predicate)
    // conservative partition: a file without usable stats MAY match
    val (touched, carried) = entries.partition(e =>
      stats.get(e).forall(FileStats.mayMatch(pred, _)))
    if (touched.isEmpty)
      return DeleteResult(v, 0, carried.size, 0L, 0L)
    val schema = readSchema(spark, fs, root, v)
    val paths = touched.map(resolveEntry(fs, root, _).toString)
    val raw = schema match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
    // rewrite only the LIVE rows of the touched files: without the DV
    // filter, rewriting a file would RESURRECT rows a prior
    // merge-on-read delete removed (the rewritten file sheds its DV
    // entries — they key on the old path)
    val base = applyDv(spark, fs, root, headerOf(fs, root, v), raw)
    val obs = org.apache.spark.sql.Observation()
    val matches = coalesce(predicate, lit(false))
    val survivors = base
      .observe(obs, count(lit(1)).as("scanned"),
        sum(when(matches, 1L).otherwise(0L)).as("deleted"))
      .filter(not(matches))
    val newFiles = writeData(survivors, fs, root, v + 1)
    // publish PINNED at v+1: the carried file list was read at v, so a
    // concurrent commit landing v+1 in between must fail this publish
    // loudly (lost-update detection) — advertised as a compliance
    // erasure procedure, it must never silently drop an interloper's
    // files from the published manifest. Carried files keep v's DVs
    // (stale entries for the rewritten files match nothing).
    val newV = commitPinned(fs, root, Some(v), carried ++ newFiles,
      Seq(schema.map("#schema=" + _.toDDL)
        .getOrElse(schemaMeta(survivors))) ++ dvLinesOf(fs, root, Some(v)))
    val row = obs.get
    DeleteResult(newV, touched.size, carried.size,
      row("scanned").asInstanceOf[Long],
      Option(row("deleted")).map(_.asInstanceOf[Long]).getOrElse(0L))
  }

  /** MERGE-ON-READ DELETE WHERE: publish a new version where rows
    * matching `predicate` are deleted WITHOUT rewriting any data file
    * — the commit writes only a small deletion-vector sidecar (the
    * matching rows' (file, row-position) keys as parquet) and a new
    * manifest whose file list is UNCHANGED plus a '#dv=' header per
    * sidecar file. Reads (read/readWhere/TableCheck/SnapshotTail)
    * anti-join the sidecar transparently, appends and rollbacks carry
    * it, `optimize()` / CoW deleteWhere materialize it into rewritten
    * files, and `vacuum` protects referenced sidecars.
    *
    * This is the 100 TB shape of targeted erasure: copy-on-write
    * `deleteWhere` rewrites every possibly-matching file — right for
    * the final legal purge (bytes physically gone), wrong as the
    * everyday path where a daily quarantine would rewrite terabytes
    * to drop thousands of rows. Merge-on-read defers the rewrite:
    * delete now at metadata+sidecar cost, materialize later in one
    * scheduled `optimize()`. The ERASURE guarantee differs — deleted
    * rows' bytes remain inside the (immutable) data files until an
    * optimize/CoW-delete + vacuum; for compliance erasure use
    * `deleteWhere` + `vacuum`, exactly as its scaladoc prescribes.
    *
    * Same manifest-stats surgery as CoW: provably-unmatched files are
    * never even scanned for candidates. Rows already deleted by an
    * earlier DV are excluded from the scan, so re-running the same
    * predicate deletes 0 rows and publishes nothing (idempotent).
    * Concurrent-writer posture: pinned publish, fail-loudly (the
    * row-position keys were computed against this head's files).
    * Returns rewrittenFiles = 0 always; deletedRows counts NEW
    * deletions only.
    */
  def deleteWhereMergeOnRead(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): DeleteResult = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum, when}
    val (fs, root) = resolve(path)
    val v = versionsIn(fs, root).lastOption.getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val hdr = headerOf(fs, root, v)
    val entries = fileEntries(fs, root, v)
    val stats = statsOf(fs, root, v)
    val pred =
      org.apache.spark.sql.graftbridge.ColumnExpr.expression(predicate)
    val touched = entries.filter(e =>
      stats.get(e).forall(FileStats.mayMatch(pred, _)))
    if (touched.isEmpty)
      return DeleteResult(v, 0, entries.size, 0L, 0L)
    val schema = readSchema(spark, fs, root, v)
    val paths = touched.map(resolveEntry(fs, root, _).toString)
    val raw = schema match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
    // key columns must be projected BEFORE the existing-DV anti-join:
    // past it the scan's `_metadata` is no longer reachable (and would
    // be ambiguous against the sidecar's own source)
    val keyed = raw
      .withColumn("__path", dvPathExpr)
      .withColumn("__pos", col("_metadata.row_index"))
    val existing = dvEntries(hdr)
    val live =
      if (existing.isEmpty) keyed
      else keyed.join(
        spark.read
          .parquet(existing.map(resolveEntry(fs, root, _).toString): _*),
        Seq("__path", "__pos"), "left_anti")
    val matches = coalesce(predicate, lit(false))
    val obs = org.apache.spark.sql.Observation()
    val keys = live
      .observe(obs, count(lit(1)).as("scanned"),
        sum(when(matches, 1L).otherwise(0L)).as("deleted"))
      .filter(matches)
      .select(col("__path"), col("__pos"))
    // sidecar under data/ so vacuum's dead-file scan owns its lifecycle
    val dirName = f"dv$v%06d-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = new Path(new Path(root, "data"), dirName)
    keys.write.parquet(dir.toString)
    val row = obs.get
    val deleted =
      Option(row("deleted")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val scanned = row("scanned").asInstanceOf[Long]
    if (deleted == 0L) { // provable no-op: no new version, no sidecar
      fs.delete(dir, true)
      return DeleteResult(v, 0, entries.size, scanned, 0L)
    }
    val newDv = listNames(fs, dir).filter(_.endsWith(".parquet"))
      .map(n => s"#dv=data/$dirName/$n").sorted
    val newV = commitPinned(fs, root, Some(v), entries,
      Seq(schemaOf(fs, root, v).map("#schema=" + _)
        .getOrElse(schemaMeta(raw))) ++
        dvLinesOf(fs, root, Some(v)) ++ newDv)
    DeleteResult(newV, 0, entries.size, scanned, deleted)
  }

  /** Outcome of an `updateWhere`: the published version (unchanged
    * when the update was a provable no-op), file-level surgery counts,
    * and the rows scanned / actually rewritten.
    */
  final case class UpdateResult(version: Long, rewrittenFiles: Int,
      carriedFiles: Int, scannedRows: Long, affectedRows: Long)

  /** Copy-on-write UPDATE ... SET: publish a new version where rows
    * matching `predicate` have the `set` columns replaced by their
    * expressions (evaluated per row; non-matching and NULL-predicate
    * rows pass through untouched) — deleteWhere's sibling completing
    * the lake's DML triad (MERGE lives in etl.Upsert). The same
    * manifest-stats surgery applies: files whose envelope proves no
    * row can match are carried by reference; only possibly-matching
    * files rewrite. Affected-row count rides the rewrite pass as an
    * observe metric. `set` may not touch columns the table doesn't
    * have (loud error; names resolve with the session's resolver, so
    * the usual case-insensitive analysis rules apply) and types must
    * be cast-compatible — the rewritten columns keep the table
    * schema's type.
    */
  def updateWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]): UpdateResult = {
    import org.apache.spark.sql.functions.{coalesce, count, lit, sum, when}
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    val (fs, root) = resolve(path)
    val v = versionsIn(fs, root).lastOption.getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val entries = fileEntries(fs, root, v)
    val stats = statsOf(fs, root, v)
    val pred =
      org.apache.spark.sql.graftbridge.ColumnExpr.expression(predicate)
    val (touched, carried) = entries.partition(e =>
      stats.get(e).forall(FileStats.mayMatch(pred, _)))
    if (touched.isEmpty)
      return UpdateResult(v, 0, carried.size, 0L, 0L)
    val schema = readSchema(spark, fs, root, v)
    val paths = touched.map(resolveEntry(fs, root, _).toString)
    val raw = schema match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
    // live rows only — same resurrection hazard as deleteWhere
    val base = applyDv(spark, fs, root, headerOf(fs, root, v), raw)
    // SET names resolve against the table schema with the SESSION'S
    // resolver (case-insensitive under default config, exactly like
    // column resolution in any Spark plan) — Map("SCORE" -> …) updates
    // a column named `score`; an ambiguous or missing name stays loud.
    val resolver = spark.sessionState.analyzer.resolver
    val byActual: Map[String, org.apache.spark.sql.Column] =
      set.map { case (name, e) =>
        val hits = base.columns.filter(resolver(_, name))
        require(hits.nonEmpty,
          s"SET column '$name' does not exist in the table schema")
        require(hits.length == 1,
          s"SET column '$name' is ambiguous in the table schema: " +
            hits.mkString(", "))
        hits.head -> e
      }
    require(byActual.size == set.size,
      "two SET entries resolve to the same table column: " +
        set.keys.mkString(", "))
    val matches = coalesce(predicate, lit(false))
    val obs = org.apache.spark.sql.Observation()
    val observed = base.observe(obs, count(lit(1)).as("scanned"),
      sum(when(matches, 1L).otherwise(0L)).as("updated"))
    // ONE select evaluates every SET expression against the OLD row —
    // SQL UPDATE semantics; a withColumn fold would let a later SET
    // read an earlier SET's new value. Each kept cast to the table's
    // column type so the schema never drifts.
    val updated = observed.select(base.columns.map { c =>
      byActual.get(c) match {
        case Some(e) =>
          when(matches, e.cast(base.schema(c).dataType))
            .otherwise(observed(c)).as(c)
        case None => observed(c)
      }
    }.toIndexedSeq: _*)
    val newFiles = writeData(updated, fs, root, v + 1)
    // pinned at v+1 — same lost-update detection and DV carry as
    // deleteWhere
    val newV = commitPinned(fs, root, Some(v), carried ++ newFiles,
      Seq(schema.map("#schema=" + _.toDDL).getOrElse(schemaMeta(updated))) ++
        dvLinesOf(fs, root, Some(v)))
    val row = obs.get
    UpdateResult(newV, touched.size, carried.size,
      row("scanned").asInstanceOf[Long],
      Option(row("updated")).map(_.asInstanceOf[Long]).getOrElse(0L))
  }

  /** Create an EMPTY table: version 1 holds no files, only the
    * '#schema=' header, so reads return zero rows under the declared
    * schema and the first INSERT/append is an ordinary version-2
    * commit. This is the catalog's CREATE TABLE primitive
    * ([[GraftCatalog.createTable]]) — O(1) metadata, no job runs.
    * Refuses a path with existing versions.
    */
  def createEmpty(path: String,
      schema: org.apache.spark.sql.types.StructType): Long = {
    val (fs, root) = resolve(path)
    require(versionsIn(fs, root).isEmpty,
      s"cannot create table at $path: snapshot versions already exist")
    fs.mkdirs(root)
    commitPinned(fs, root, None, Nil, Seq("#schema=" + schema.toDDL))
  }

  final case class MergeResult(version: Long, rewrittenFiles: Int,
      carriedFiles: Int, updated: Long, inserted: Long)

  /** Keyed MERGE (SCD-1 upsert) on a SNAPSHOT table — [[Upsert.merge]]'s
    * contract, re-expressed over the manifest machinery so SQL `MERGE
    * INTO` on a catalog table lands as one atomic version: target rows
    * whose key matches a source row are REPLACED by that source row,
    * unmatched source rows are INSERTED, everything else is carried
    * untouched.
    *
    * Scale shape — the Delta min/max merge discipline: one scalar
    * aggregation computes the source's per-key bounds, and only files
    * whose '#stats=' envelope CAN contain a key in those bounds are
    * read and rewritten; every other file is carried by reference
    * (statless files rewrite conservatively). Carried files provably
    * hold no source key, so matched/unmatched resolution runs against
    * the touched slice, never the table. The source is persisted once
    * (stats, the anti-join, and the written union must see identical
    * rows), and rows with any NULL key never match (SQL's
    * null-rejecting `=`) — they insert.
    *
    * Contract (as [[Upsert.merge]]): `source` must be key-unique; the
    * source must carry every table column (names resolve with the
    * session resolver, values cast to the table's types, so the schema
    * never drifts). Same single-writer + lost-update posture as
    * [[updateWhere]]: the commit pins at head+1 and a racing writer
    * loses loudly.
    */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String]): MergeResult = {
    import org.apache.spark.sql.functions.{col, lit, max, min}
    require(keys.nonEmpty, "mergeInto needs at least one key column")
    val (fs, root) = resolve(path)
    val v = versionsIn(fs, root).lastOption.getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val entries = fileEntries(fs, root, v)
    val stats = statsOf(fs, root, v)
    val schema = readSchema(spark, fs, root, v)
    val tableCols = schema.map(_.fieldNames.toSeq).getOrElse {
      require(entries.nonEmpty,
        s"version $v at $path is empty and carries no schema header")
      spark.read.parquet(
        entries.map(resolveEntry(fs, root, _).toString): _*).columns.toSeq
    }
    val resolver = spark.sessionState.analyzer.resolver
    def actual(name: String, cols: Seq[String], what: String): String = {
      val hits = cols.filter(resolver(_, name))
      require(hits.nonEmpty, s"$what column '$name' not found")
      require(hits.length == 1, s"$what column '$name' is ambiguous")
      hits.head
    }
    val keyCols = keys.map(actual(_, tableCols, "merge key"))
    // align the source to the table schema ONCE, then persist: every
    // branch below must see the same rows
    val srcAligned = {
      val sCols = source.columns.toSeq
      val types = schema.map(s => s.map(f => f.name -> f.dataType).toMap)
      source.select(tableCols.map { c =>
        val sc = source(actual(c, sCols, "source"))
        types.flatMap(_.get(c)).map(sc.cast(_)).getOrElse(sc).as(c)
      }: _*).persist()
    }
    try {
      // matchable rows: all keys non-null (a NULL key never matches)
      val matchable = srcAligned.filter(
        keyCols.map(col(_).isNotNull).reduce(_ && _))
      val boundsRow = matchable.agg(
        min(col(keyCols.head)).as("lo0"), (
          Seq(max(col(keyCols.head)).as("hi0")) ++
            keyCols.zipWithIndex.drop(1).flatMap { case (k, i) =>
              Seq(min(col(k)).as(s"lo$i"), max(col(k)).as(s"hi$i")) }): _*)
        .head
      val hasMatchable = !boundsRow.isNullAt(0)
      val rangePred = Option.when(hasMatchable)(
        keyCols.zipWithIndex.map { case (k, i) =>
          col(k) >= lit(boundsRow.get(2 * i)) &&
            col(k) <= lit(boundsRow.get(2 * i + 1))
        }.reduce(_ && _))
      val predExpr = rangePred.map(
        org.apache.spark.sql.graftbridge.ColumnExpr.expression)
      val (touched, carried) = predExpr match {
        case None => (Seq.empty[String], entries)
        case Some(p) => entries.partition(e =>
          stats.get(e).forall(FileStats.mayMatch(p, _)))
      }
      val base: Option[DataFrame] = Option.when(touched.nonEmpty) {
        val paths = touched.map(resolveEntry(fs, root, _).toString)
        val raw = schema match {
          case Some(s) => spark.read.schema(s).parquet(paths: _*)
          case None => spark.read.parquet(paths: _*)
        }
        applyDv(spark, fs, root, headerOf(fs, root, v), raw)
      }
      val updated = base.map(
        _.join(matchable, keyCols, "left_semi").count()).getOrElse(0L)
      val inserted = base match {
        case Some(b) =>
          srcAligned.count() - matchable.join(b, keyCols, "left_semi").count()
        case None => srcAligned.count()
      }
      val out = base match {
        case Some(b) => b.join(matchable, keyCols, "left_anti")
          .unionByName(srcAligned)
        case None => srcAligned
      }
      val newFiles = writeData(out, fs, root, v + 1)
      val newV = commitPinned(fs, root, Some(v), carried ++ newFiles,
        Seq(schema.map("#schema=" + _.toDDL).getOrElse(schemaMeta(out))) ++
          dvLinesOf(fs, root, Some(v)))
      MergeResult(newV, touched.size, carried.size, updated, inserted)
    } finally { srcAligned.unpersist(); () }
  }

  /** One history row per version: (version, file count, txn marker if
    * the version was a stream commit) — the audit view of the linear
    * history, read from manifest metadata only (no data I/O). Carried
    * '#txnstate=' lines are bookkeeping, not commits, and don't
    * appear here.
    */
  final case class VersionInfo(version: Long, files: Int,
      txn: Option[String])

  def history(path: String): Seq[VersionInfo] = {
    val (fs, root) = resolve(path)
    versionsIn(fs, root).map { v =>
      val lines = manifestLines(fs, root, v)
      VersionInfo(v,
        lines.count(!_.startsWith("#")),
        lines.collectFirst {
          case l if l.startsWith("#txn=") => l.drop(5)
        })
    }
  }

  /** Delete data files referenced by NO manifest among the most recent
    * `keepVersions` (older manifests are dropped too — stream replay
    * markers survive any retention because every manifest carries the
    * txn state forward). Unreferenced files include any orphans from
    * a commit that crashed before its manifest rename. Returns
    * deleted file paths. The one operation that destroys data —
    * bounded by explicit retention, like Delta's VACUUM.
    */
  def vacuum(path: String, keepVersions: Int): Seq[String] = {
    // keep >= 1 always: vacuum(path, 0) would otherwise delete every
    // manifest and every data file — the whole table — in one call
    require(keepVersions >= 1,
      s"vacuum must keep at least 1 version, got $keepVersions")
    val (fs, root) = resolve(path)
    val vs = versionsIn(fs, root)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepVersions))
    // resolve every kept entry to a fully-qualified path string so the
    // comparison is spelling-independent (and legacy absolute entries
    // still protect their files). Deletion-vector sidecars referenced
    // by a kept manifest's '#dv=' header are live too — they ARE the
    // version's content (dropping one would resurrect deleted rows);
    // sidecars referenced only by dropped manifests fall out of the
    // live set and are reclaimed like any dead file.
    val live = keep.flatMap(v =>
        fileEntries(fs, root, v) ++ dvEntries(headerOf(fs, root, v)))
      .map(resolveEntry(fs, root, _).toString).toSet
    val dataRoot = new Path(root, "data")
    val commitDirs = LakeFs.listStatus(fs, dataRoot).filter(_.isDirectory)
    val dead = commitDirs
      .flatMap(d => fs.listStatus(d.getPath))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
      .filterNot(p => live.contains(p.toString))
    dead.foreach(fs.delete(_, false))
    // prune commit dirs with no live parquet left — recursively, since
    // Spark leaves _SUCCESS/.crc sidecars in every commit dir (a
    // "files.isEmpty" check would never fire and dead dirs, including
    // crashed-commit orphans, would accumulate forever)
    commitDirs.map(_.getPath)
      .filter(d => !fs.listStatus(d)
        .exists(f => f.getPath.getName.endsWith(".parquet") &&
          live.contains(f.getPath.toString)))
      .foreach(fs.delete(_, true))
    drop.foreach(v => fs.delete(manifestFile(root, v), false))
    dead.map(_.toString).sorted.toIndexedSeq
  }

  // --------------------------------------------------------------- export

  /** One-way bridge OUT of the snapshot format: materialize `version`
    * (current if None) at `outDir` as a PLAIN parquet directory —
    * `spark.read.parquet(outDir)`, DuckDB's read_parquet, or a
    * Delta/Iceberg bootstrap (`CONVERT TO DELTA parquet.\`dir\``,
    * Iceberg's `add_files`) consumes it with no knowledge of this
    * layer. The migration recipe lives in DESIGN.md.
    *
    * A version WITHOUT deletion vectors exports as BYTE-IDENTICAL
    * copies of its immutable data files — the manifest's file list IS
    * the export plan; no row is decoded. Output names are prefixed
    * with their commit dir (`c<version>-<uuid>_part-*.parquet`) so a
    * multi-commit version can't collide on part numbers. A
    * merge-on-read version (`#dv=` in the header) cannot be exported
    * by file copy without resurrecting its deleted rows, so it
    * materializes through [[read]] at that version — one distributed
    * scan + write.
    *
    * `_graft_export.json` lands next to the files (underscore prefix:
    * parquet directory listings ignore it) recording the source
    * table, version, mode, and per-file provenance + size — the
    * directory-listing sidecar an external cataloger consumes.
    *
    * Scale shape: the copy loop is O(manifest files) driver-side
    * metadata + per-file byte streams through the FileSystem API —
    * the same envelope as [[vacuum]]; nothing is row-decoded. Returns
    * the number of data files exported.
    */
  def exportVersion(spark: SparkSession, path: String, outDir: String,
      version: Option[Long] = None): Int = {
    val (fs, root) = resolve(path)
    val v = version.orElse(versionsIn(fs, root).lastOption).getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val (ofs, oroot) = resolve(outDir)
    require(!ofs.exists(oroot) || LakeFs.listStatus(ofs, oroot).isEmpty,
      s"export target $outDir exists and is not empty")
    ofs.mkdirs(oroot)
    val hdr = headerOf(fs, root, v)
    val entries = fileEntries(fs, root, v)
    val hasDv = dvEntries(hdr).nonEmpty
    val conf = spark.sparkContext.hadoopConfiguration
    val exported: Seq[(String, String, Long)] =
      if (hasDv) {
        // merge-on-read: materialize live rows (deletes applied)
        read(spark, path, Some(v)).write.mode("errorifexists")
          .parquet(new Path(oroot, "_staged").toString)
        // flatten the staged write into outDir so the export is one
        // plain directory (no nested dir a naive lister would skip)
        // list + rename with the OUTPUT filesystem: _staged lives under
        // oroot, so touching it through the source `fs` breaks (or
        // silently returns nothing) on a cross-filesystem export even
        // though the file-copy branch supports cross-fs via FileUtil
        val staged = new Path(oroot, "_staged")
        val parts = ofs.listStatus(staged)
          .filter(_.getPath.getName.endsWith(".parquet"))
        val moved = parts.map { p =>
          val dst = new Path(oroot, p.getPath.getName)
          require(ofs.rename(p.getPath, dst), s"move failed: ${p.getPath}")
          (dst.getName, s"materialized from version $v",
            ofs.getFileStatus(dst).getLen)
        }.toIndexedSeq
        ofs.delete(staged, true)
        moved
      } else entries.map { e =>
        val src = resolveEntry(fs, root, e)
        // commit-dir prefix keeps multi-commit part names unique
        val name = s"${src.getParent.getName}_${src.getName}"
        val dst = new Path(oroot, name)
        // src's own fs, not the table's: imported entries may be foreign
        org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src,
          ofs, dst, false, false, conf)
        (name, e, ofs.getFileStatus(dst).getLen)
      }
    def js(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val body =
      s"""{"source":${js(path)},"version":$v,""" +
        s""""mode":${js(if (hasDv) "materialized" else "file_copy")},""" +
        s""""files":[""" + exported.map { case (n, srcE, len) =>
          s"""{"name":${js(n)},"source":${js(srcE)},"bytes":$len}"""
        }.mkString(",") + "]}"
    val out = ofs.create(new Path(oroot, "_graft_export.json"), false)
    try out.write((body + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    exported.size
  }

  /** Plan surface for the SQL/DataSource read path ([[SnapshotSource]]):
    * the pinned version, its recorded schema, each manifest entry
    * resolved to a path and paired with its '#stats=' envelope, and
    * whether the version carries deletion vectors (merge-on-read).
    */
  private[etl] def scanPlan(spark: SparkSession, path: String,
      version: Option[Long]): (Long,
        Option[org.apache.spark.sql.types.StructType],
        Seq[(Path, Option[FileStats.FileStat])], Boolean) = {
    val (fs, root) = resolve(path)
    val v = version.orElse(versionsIn(fs, root).lastOption).getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $path"))
    val stats = statsOf(fs, root, v)
    val entries = fileEntries(fs, root, v).map(e =>
      (resolveEntry(fs, root, e), stats.get(e)))
    (v, readSchema(spark, fs, root, v), entries,
      dvEntries(headerOf(fs, root, v)).nonEmpty)
  }

  // --------------------------------------------------------------- import

  /** The bridge IN: adopt an existing PLAIN parquet directory — a
    * table that predates this layer, an [[exportVersion]] output, or
    * an unpartitioned Delta/Iceberg table's data files after their
    * own vacuum — as the initial version of a snapshot table at
    * `path`, BY REFERENCE. The listing recurses (data may live in
    * subdirectories, e.g. per-commit trees), skipping hidden/metadata
    * dirs (`_delta_log`, dot-dirs, `manifests`); Hive-style
    * `col=value` partition directories are REFUSED loudly, because
    * their partition values exist only in directory names and a
    * by-reference manifest cannot recover them.
    * No row is decoded and no byte is copied: the new manifest simply
    * lists the existing files (Delta's CONVERT TO DELTA / Iceberg's
    * add_files move), so converting a 100 TB directory costs O(files)
    * metadata — one schema inference over footers plus one footer
    * read per file for the '#stats=' skipping envelope, the exact
    * harvest a normal commit performs via [[FileStats]].
    *
    * `srcDir == path` is convert-in-place: the files stay where they
    * are and `manifests/` appears alongside them. A `srcDir` outside
    * `path` is adopted with fully-qualified absolute entries (the
    * legacy-manifest form every reader already resolves); either way
    * the imported table supports read / readWhere pruning / time
    * travel and every subsequent commit shape (append, upsert,
    * optimize) exactly like a native table — subsequent commits write
    * under `data/` as usual and carry the imported entries forward.
    *
    * Imported files are REFERENCED, not owned: vacuum reclaims only
    * files under `data/`, so even after an optimize rewrite drops the
    * imported entries from the live manifest, the original directory
    * is never deleted by this layer (it may be someone else's table).
    *
    * Refuses a target that already has versions — adopting files into
    * an existing history would alias rows into versions that never
    * contained them; append to an existing table instead.
    */
  def importTable(spark: SparkSession, srcDir: String, path: String): Long = {
    val (sfs, sroot) = resolve(srcDir)
    val (fs, root) = resolve(path)
    require(versionsIn(fs, root).isEmpty,
      s"cannot import into $path: snapshot versions already exist")
    require(sfs.exists(sroot), s"import source $srcDir does not exist")
    // Recurse: partitioned layouts (Hive dirs, Delta/Iceberg data
    // trees) keep rows in subdirectories. Metadata/hidden trees
    // (_delta_log, .hive-staging, our own manifests/) are skipped by
    // ancestor-component filtering, matching spark.read's convention.
    val srootQ = sfs.makeQualified(sroot).toString
    def visible(p: Path): Boolean = {
      val rel = p.toString.stripPrefix(srootQ).stripPrefix("/")
      rel.split('/').forall { seg =>
        !seg.startsWith("_") && !seg.startsWith(".") && seg != "manifests"
      }
    }
    val it = sfs.listFiles(sroot, true)
    val found = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next().getPath).toVector
    val parts = found
      .filter(p => p.getName.endsWith(".parquet") && visible(p))
      .sortBy(_.toString)
    require(parts.nonEmpty, s"import source $srcDir has no parquet files")
    // Hive-style `col=value` directory segments encode partition
    // values in dir NAMES, not file bytes — a by-reference manifest
    // cannot recover them (readers see only the files). Refuse loudly
    // instead of silently dropping the column.
    val dirCols = parts.flatMap { p =>
      p.toString.stripPrefix(srootQ).stripPrefix("/")
        .split('/').dropRight(1)
        .filter(_.contains('=')).map(_.takeWhile(_ != '='))
    }.distinct
    require(dirCols.isEmpty,
      s"source encodes partition column(s) ${dirCols.mkString(", ")} in " +
        "directory names only; a by-reference import cannot recover " +
        "them — rewrite the source with the columns materialized, or " +
        "import without them via a plain rewrite")
    // schema from the listed files' footers only (no data read, and
    // no directory-based partition inference — the manifest readers
    // see exactly these files); recorded in the header so empty
    // follow-up versions and schema-pinned reads work like a native
    // table's
    val schema = spark.read.parquet(parts.map(_.toString): _*).schema
    val rootQ = fs.makeQualified(root).toString
    val entries = parts.map { p =>
      val q = sfs.makeQualified(p).toString
      if (q == rootQ) q
      else if (q.startsWith(rootQ + "/")) q.drop(rootQ.length + 1)
      else q
    }
    fs.mkdirs(root)
    commitPinned(fs, root, None, entries,
      Seq("#schema=" + schema.toDDL, s"#import=$srcDir"))
  }
}
