package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic epoch-manifest publish for the index lake layouts
  * (Bm25Index postings/df/ubs, AnnIndex cells, PqIndex codes) —
  * closes the torn-read window the r10 layouts documented: a probe
  * listing a raw parquet dir while an append was mid-commit could
  * score an in-flight document from a SUBSET of its rows.
  *
  * Mechanism (the same version-file CAS discipline as etl.Snapshot,
  * scoped down to whole-epoch granularity — index appends are
  * immutable batch folds, so file-level manifests would be overkill):
  *
  *   <path>/<table>/epoch=N/   one immutable directory per build (0)
  *                             or append (N ≥ 1); written with
  *                             errorIfExists, never rewritten
  *   <path>/manifests/vNNNNN.txt  one line per VISIBLE epoch; the
  *                             highest version is current
  *
  * Readers resolve the current manifest ONCE and read exactly its
  * epoch dirs (leaf-dir reads — an in-flight or orphaned epoch dir is
  * never even listed). Writers stage the epoch dir first, then
  * publish with create-temp + rename; rename-onto-existing fails on
  * HDFS/local semantics, so concurrent publishers serialize — the
  * loser re-reads and retries with the next version. A crash between
  * stage and publish leaves an invisible orphan dir (space, not
  * correctness; a rebuild clears it).
  *
  * One manifest covers ALL of an index's epoch tables, so a reader
  * can never pair one table's new epoch with another's old view
  * (Bm25's postings without their ubs was exactly the r10 hazard).
  *
  * Layout-version compatibility: a directory WITHOUT `manifests/` is
  * a v1 (r10) index; [[visibleEpochs]] returns None, [[readTable]]
  * falls back to the raw directory read, and the index operators keep
  * v1 append semantics for it (raw-dir append, the documented torn-
  * read window) — pre-epoch indexes on disk stay fully probe-able and
  * append-able, and a `build` moves them to the epoch layout. The two
  * layouts never mix inside one table.
  */
object IndexManifest {

  private def resolve(spark: SparkSession, p: String): (FileSystem, Path) = {
    val hp = new Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  /** Per-index intra-JVM publish lock. The version-file CAS below
    * relies on rename-onto-existing FAILING, which HDFS guarantees
    * but POSIX rename does not (it silently replaces — two same-JVM
    * threads that both computed version N would each rename onto
    * vN.txt and the first writer's epoch would vanish; caught by
    * IndexPublishSpec's 8-thread race). Publishers within one JVM —
    * the realistic shape: one driver owns an index's maintenance
    * loop — serialize here, so the rename CAS only ever has to
    * arbitrate CROSS-process races, where HDFS/object-store rename
    * semantics make it a true CAS; on a bare local FS cross-process
    * publishing remains best-effort, the same documented posture as
    * etl.Snapshot's publish guard.
    *
    * Lifetime: one monitor Object per DISTINCT qualified index root,
    * never evicted — deliberate. A driver publishes to a handful of
    * index roots for its whole life (the entry is ~100 bytes; even a
    * pathological fleet touching 10^5 roots holds ~10 MB), and weak
    * eviction would reintroduce the race it exists to close: two
    * threads that interned DIFFERENT monitors for the same root
    * serialize against nothing.
    */
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(fs: FileSystem, root: Path): Object =
    publishLocks.computeIfAbsent(
      fs.makeQualified(root).toString, _ => new Object)

  private def manifestDir(root: Path) = new Path(root, "manifests")

  private def vFile(root: Path, v: Long) =
    new Path(manifestDir(root), f"v$v%05d.txt")

  /** Visible epoch ids per the CURRENT manifest; None for a v1 layout
    * (no manifests directory — raw-dir reads apply).
    */
  def visibleEpochs(spark: SparkSession, path: String): Option[Seq[Int]] = {
    val (fs, root) = resolve(spark, path)
    val md = manifestDir(root)
    if (!fs.exists(md)) return None
    val vs = fs.listStatus(md).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toLong }
    if (vs.isEmpty) return None
    val in = fs.open(vFile(root, vs.max))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    Some(body.split("\n").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
  }

  def epochDir(path: String, table: String, epoch: Int): String =
    s"$path/$table/epoch=$epoch"

  /** The next epoch id: past the visible max AND past any staged
    * orphan dir, so a retried append can never collide with a crashed
    * one's leftovers.
    */
  def nextEpoch(spark: SparkSession, path: String, tables: Seq[String]): Int = {
    val (fs, root) = resolve(spark, path)
    val staged = tables.flatMap { t =>
      val td = new Path(root, t)
      if (!fs.exists(td)) Nil
      else fs.listStatus(td).map(_.getPath.getName)
        .collect { case n if n.startsWith("epoch=") =>
          n.stripPrefix("epoch=").toInt }
    }
    val vis = visibleEpochs(spark, path).getOrElse(Nil)
    ((-1 +: staged) ++ vis).max + 1
  }

  /** Atomically make `epoch` visible (together with everything the
    * current manifest lists). CAS loop on the version file; safe to
    * race with other publishers and with readers.
    */
  def publish(spark: SparkSession, path: String, epoch: Int): Unit = {
    val (fs, root) = resolve(spark, path)
    fs.mkdirs(manifestDir(root))
    lockFor(fs, root).synchronized {
    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      require(attempts <= 50, s"manifest publish contention at $path")
      val cur = visibleEpochs(spark, path).getOrElse(Nil)
      val next = (cur :+ epoch).distinct.sorted
      val vs = fs.listStatus(manifestDir(root)).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
          n.stripPrefix("v").stripSuffix(".txt").toLong }
      val v = if (vs.isEmpty) 0L else vs.max + 1L
      val tmp = new Path(manifestDir(root),
        s".v$v-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, false)
      try out.write((next.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      // rename-onto-existing returns false on HDFS — the cross-
      // process CAS; same-JVM publishers are already serialized by
      // the enclosing lock (POSIX rename replaces, see lockFor)
      done = fs.rename(tmp, vFile(root, v))
      if (!done) fs.delete(tmp, false)
    }
    }
  }

  /** Atomically REPLACE the visible set with exactly `epoch` — the
    * compaction publish: a rewritten epoch holding the whole table
    * supersedes every prior one in a single manifest CAS, so probes
    * flip from the many-epoch view to the one-epoch view atomically.
    * The superseded dirs stay on disk (readers pinned to an older
    * view keep working) until [[vacuum]] removes them.
    */
  def publishReplacing(spark: SparkSession, path: String, epoch: Int): Unit = {
    val (fs, root) = resolve(spark, path)
    fs.mkdirs(manifestDir(root))
    lockFor(fs, root).synchronized {
      var done = false
      var attempts = 0
      while (!done) {
        attempts += 1
        require(attempts <= 50, s"manifest publish contention at $path")
        val vs = fs.listStatus(manifestDir(root)).map(_.getPath.getName)
          .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
            n.stripPrefix("v").stripSuffix(".txt").toLong }
        val v = if (vs.isEmpty) 0L else vs.max + 1L
        val tmp = new Path(manifestDir(root),
          s".v$v-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
        val out = fs.create(tmp, false)
        try out.write((epoch.toString + "\n").getBytes("UTF-8"))
        finally out.close()
        done = fs.rename(tmp, vFile(root, v))
        if (!done) fs.delete(tmp, false)
      }
    }
  }

  /** Delete epoch directories no longer reachable from the CURRENT
    * manifest — compaction's garbage, and crashed appends' orphans.
    * The highest-numbered unreferenced dir per table is SPARED: it may
    * be an in-flight append staged but not yet published (nextEpoch
    * allocates above everything on disk, so only the newest orphan can
    * still be racing toward a publish; anything below it can never be
    * published again). Returns the deleted directory count.
    */
  def vacuum(spark: SparkSession, path: String, tables: Seq[String]): Int = {
    val (fs, root) = resolve(spark, path)
    val vis = visibleEpochs(spark, path).getOrElse(return 0).toSet
    var deleted = 0
    for (t <- tables) {
      val td = new Path(root, t)
      if (fs.exists(td)) {
        val staged = fs.listStatus(td).map(_.getPath.getName)
          .collect { case n if n.startsWith("epoch=") =>
            n.stripPrefix("epoch=").toInt }
        val dead = staged.filterNot(vis.contains)
        val spare = if (dead.isEmpty) -1 else dead.max
        for (e <- dead if e != spare) {
          if (fs.delete(new Path(td, s"epoch=$e"), true)) deleted += 1
        }
      }
    }
    deleted
  }

  /** Read one of the index's epoch tables at the CURRENT manifest —
    * the visible epoch dirs as leaf reads — or the plain raw dir for a
    * v1 layout. Returns None when the table doesn't exist in any form
    * (callers decide whether that's a fallback or an error).
    */
  def readTable(spark: SparkSession, path: String, table: String)
      : Option[DataFrame] =
    readTableAt(spark, path, table, visibleEpochs(spark, path))

  /** [[readTable]] pinned to an already-resolved manifest view — a
    * probe that reads several of an index's tables resolves the
    * manifest ONCE and passes the same view to each read, so two
    * tables can never straddle a concurrent publish.
    */
  def readTableAt(spark: SparkSession, path: String, table: String,
      view: Option[Seq[Int]]): Option[DataFrame] = {
    val (fs, root) = resolve(spark, path)
    val td = new Path(root, table)
    view match {
      case None =>
        if (!fs.exists(td)) None
        else Some(spark.read.parquet(s"$path/$table"))
      case Some(eps) =>
        val dirs = eps.map(e => epochDir(path, table, e))
          .filter(d => fs.exists(new Path(d)))
        if (dirs.isEmpty) None
        // explicit basePath: the epoch dirs may hold further partition
        // levels (AnnIndex cells/epoch=E/cid=N), and multi-root reads
        // without a declared base refuse mixed depths; with it, only
        // the LISTED epoch dirs are walked (an in-flight epoch is
        // never even listed) and epoch/cid become partition columns —
        // cid keeps its partition-pruning role, epoch is dropped here
        else Some(spark.read.option("basePath", s"$path/$table")
          .parquet(dirs: _*).drop("epoch"))
    }
  }
}
