package graft.etl

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableCatalog` over [[Snapshot]] tables — the
  * SQL-standard front door the V1 format (`graft-snapshot`) can't
  * provide: catalog-managed names, `FOR VERSION AS OF` time travel,
  * `CREATE TABLE` / `CTAS` / `INSERT INTO` / `INSERT OVERWRITE`, and
  * (with [[graft.plans.GraftExtensions]] installed) `DELETE` /
  * `UPDATE` / `MERGE INTO` routed to the manifest DML triad.
  *
  *   spark.sql.catalog.graft = graft.etl.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /lake
  *
  *   SELECT * FROM graft.db.t VERSION AS OF 3
  *   INSERT INTO graft.db.t SELECT ...
  *   DELETE FROM graft.db.t WHERE k < 10
  *
  * Identifiers map to warehouse paths (`warehouse/ns.../name`);
  * `CREATE TABLE ... LOCATION p` registers an external path. Tables
  * are the manifest directories themselves — no separate metastore,
  * so `listTables` is a directory listing and every table created by
  * the Scala API is visible to SQL the moment its first version
  * publishes (and vice versa). All data-plane semantics — atomic
  * version publish, optimistic append, stats harvesting, vacuum
  * retention — are [[Snapshot]]'s; the catalog is a thin name layer.
  *
  * Read planning: the table advertises BATCH_READ through a
  * [[V1Scan]] fallback (correct everywhere, materializes via
  * [[Snapshot.read]]), and [[graft.plans.GraftExtensions]] rewrites
  * the relation at analysis time to [[SnapshotSource.relationFor]]'s
  * HadoopFsRelation — the native vectorized parquet scan with
  * manifest-stats file pruning, identical to the V1 format's plan.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def tablePath(ident: Identifier): String =
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")

  private def nsPath(ns: Array[String]): String =
    (warehouse +: ns.toSeq).mkString("/")

  private def isTableDir(p: Path): Boolean = {
    val (fs, root) = LakeFs.resolve(p.toString)
    fs.exists(new Path(root, "manifests"))
  }

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val (fs, root) = LakeFs.resolve(nsPath(namespace))
    LakeFs.listStatus(fs, root)
      .filter(s => s.isDirectory && isTableDir(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    Snapshot.versions(tablePath(ident)).nonEmpty

  override def loadTable(ident: Identifier): Table = {
    val path = tablePath(ident)
    if (Snapshot.versions(path).nonEmpty)
      return new GraftSnapshotTable(ident.toString, path, None)
    // Iceberg-style metadata tables: `graft.db.t.history` (one row per
    // surviving version) and `graft.db.t.files` (the live file
    // inventory with stats coverage) — the trailing name selects the
    // view over the base table the namespace points at. A REAL table
    // always shadows (checked above), and an unknown suffix stays a
    // loud missing-table error.
    if (ident.namespace.nonEmpty) {
      val base = nsPath(ident.namespace)
      if (Snapshot.versions(base).nonEmpty)
        ident.name.toLowerCase(java.util.Locale.ROOT) match {
          case "history" =>
            return new GraftMetaTable(ident.toString,
              () => Snapshot.history(spark, base))
          case "files" =>
            return new GraftMetaTable(ident.toString,
              () => Snapshot.filesOf(spark, base))
          case _ =>
        }
    }
    throw new NoSuchTableException(ident)
  }

  /** `FOR VERSION AS OF v` — Spark routes the SQL time-travel clause
    * here; the returned table pins every read to that version.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = tablePath(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft time travel takes a numeric version, got '$version'")
    }
    if (!Snapshot.versions(path).contains(v))
      throw new NoSuchTableException(ident)
    new GraftSnapshotTable(s"$ident@v$v", path, Some(v))
  }

  /** `FOR TIMESTAMP AS OF t` — Spark hands the literal as epoch
    * MICROseconds; resolve to the newest version committed at or
    * before it via the manifests' '#ts=' stamps
    * ([[Snapshot.versionAt]]). A time before the earliest stamped
    * commit is a loud error, like asking Delta for a pre-history
    * timestamp.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = tablePath(ident)
    if (Snapshot.versions(path).isEmpty) throw new NoSuchTableException(ident)
    val tsMillis = Math.floorDiv(timestamp, 1000L)
    val v = Snapshot.versionAt(path, tsMillis).getOrElse(
      throw new IllegalArgumentException(
        s"$ident has no version committed at or before " +
          s"${java.time.Instant.ofEpochMilli(tsMillis)} — the earliest " +
          "stamped commit is newer (or the table predates '#ts=' stamps)"))
    new GraftSnapshotTable(s"$ident@v$v", path, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft snapshot tables do not take PARTITIONED BY; use " +
        "Compact/ZOrder for layout")
    val path = Option(properties.get(TableCatalog.PROP_LOCATION))
      .getOrElse(tablePath(ident))
    if (Snapshot.versions(path).nonEmpty)
      throw new TableAlreadyExistsException(ident)
    Snapshot.createEmpty(path, schema)
    new GraftSnapshotTable(ident.toString, path, None)
  }

  /** SQL schema evolution, routed to the manifest's header-only
    * evolution commits: `ADD COLUMNS` → [[Snapshot.addColumn]]
    * (trailing nullable column, existing files read NULL), `RENAME
    * COLUMN` → [[Snapshot.renameColumn]] (field-id identity), `ALTER
    * COLUMN ... TYPE` → [[Snapshot.widenColumn]] (lossless parquet
    * widenings only). Everything else — drops, repositioning,
    * non-null adds, nested fields — is refused loudly; no shape here
    * ever rewrites a data file.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val path = tablePath(ident)
    if (Snapshot.versions(path).isEmpty) throw new NoSuchTableException(ident)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "ADD COLUMNS supports top-level columns only, got " +
            a.fieldNames.mkString("."))
        require(a.position() == null,
          "ADD COLUMNS appends at the end; FIRST/AFTER is not supported")
        require(a.isNullable,
          "added columns must be nullable — existing rows read as NULL")
        Snapshot.addColumn(spark, path, a.fieldNames.head, a.dataType())
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "RENAME COLUMN supports top-level columns only, got " +
            r.fieldNames.mkString("."))
        Snapshot.renameColumn(spark, path, r.fieldNames.head, r.newName())
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          "ALTER COLUMN TYPE supports top-level columns only, got " +
            u.fieldNames.mkString("."))
        Snapshot.widenColumn(spark, path, u.fieldNames.head, u.newDataType())
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change ${other.getClass.getSimpleName} is not " +
          "supported on snapshot tables (no data-file rewrite shapes)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = tablePath(ident)
    val (fs, root) = LakeFs.resolve(path)
    val existed = Snapshot.versions(path).nonEmpty
    if (existed) fs.delete(root, true)
    existed
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val (fs, oldRoot) = LakeFs.resolve(tablePath(oldIdent))
    if (Snapshot.versions(tablePath(oldIdent)).isEmpty)
      throw new NoSuchTableException(oldIdent)
    if (Snapshot.versions(tablePath(newIdent)).nonEmpty)
      throw new TableAlreadyExistsException(newIdent)
    val (_, newRoot) = LakeFs.resolve(tablePath(newIdent))
    fs.mkdirs(newRoot.getParent)
    require(fs.rename(oldRoot, newRoot),
      s"rename $oldIdent -> $newIdent failed")
  }

  // -------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val (fs, root) = LakeFs.resolve(warehouse)
    LakeFs.listStatus(fs, root)
      .filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => Array(s.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val (fs, root) = LakeFs.resolve(nsPath(namespace))
      if (!fs.exists(root)) throw new NoSuchNamespaceException(namespace)
      LakeFs.listStatus(fs, root)
        .filter(s => s.isDirectory && !isTableDir(s.getPath))
        .map(s => namespace :+ s.getPath.getName).toArray
    }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val (fs, root) = LakeFs.resolve(nsPath(namespace))
    namespace.isEmpty || fs.exists(root)
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map("location" -> nsPath(namespace)).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val (fs, root) = LakeFs.resolve(nsPath(namespace))
    fs.mkdirs(root)
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val (fs, root) = LakeFs.resolve(nsPath(namespace))
    if (!fs.exists(root)) false
    else {
      if (!cascade)
        require(LakeFs.listStatus(fs, root).isEmpty,
          s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(root, true)
    }
  }
}

/** A catalog table: one snapshot path, optionally pinned to a version
  * (time travel). Reads fall back to a V1Scan materializing through
  * [[Snapshot.read]] unless [[graft.plans.GraftExtensions]] rewrote
  * the relation to the native file scan first; writes go through the
  * V1 write bridge to [[Snapshot.commitAppend]] /
  * [[Snapshot.commitOverwrite]]; `DELETE FROM` lands on
  * [[Snapshot.deleteWhere]] through `SupportsDelete` (Spark pushes
  * the WHERE clause as data-source filters, translated back to one
  * predicate `Column`, so the manifest keeps files the predicate
  * can't touch untouched).
  */
final class GraftSnapshotTable(ident: String, val path: String,
    val pinnedVersion: Option[Long])
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = ident

  // header '#schema=' when recorded (O(1) metadata), footer inference
  // otherwise — NOT relationFor, whose per-entry getFileStatus is
  // O(files) and belongs to scan planning, not name resolution
  override lazy val schema: StructType = {
    val (v, schemaOpt, entries, _) =
      Snapshot.scanPlan(spark, path, pinnedVersion)
    schemaOpt.getOrElse {
      require(entries.nonEmpty,
        s"version $v at $path is empty and carries no schema header")
      spark.read.parquet(entries.map(_._1.toString): _*).schema
    }
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  override def properties(): util.Map[String, String] =
    (Map("path" -> path, "provider" -> "graft-snapshot") ++
      pinnedVersion.map(v => "versionAsOf" -> v.toString)).asJava

  // ------------------------------------------------------------- read

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = { () =>
    val tableSchema = schema
    val p = path
    val v = pinnedVersion
    new V1Scan {
      override def readSchema(): StructType = tableSchema
      override def toV1TableScan[T <: BaseRelation with TableScan](
          ctx: SQLContext): T =
        new BaseRelation with TableScan {
          override def sqlContext: SQLContext = ctx
          override def schema: StructType = tableSchema
          override def buildScan(): org.apache.spark.rdd.RDD[Row] =
            Snapshot.read(ctx.sparkSession, p, v).rdd
        }.asInstanceOf[T]
    }: Scan
  }

  // ------------------------------------------------------------ write

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"cannot write to $ident: a time-travelled table is read-only")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: DataFrame, overwriteFlag: Boolean) => {
            if (overwrite || overwriteFlag)
              Snapshot.commitOverwrite(data, path)
            else Snapshot.commitAppend(data, path)
            ()
          }
      }
    }
  }

  // --------------------------------------- metadata-only aggregates

  /** Aggregates answerable from the manifest alone — the
    * metadata-only-query optimization (Delta/Iceberg answer
    * `SELECT count(*)` / min / max from their logs the same way):
    * `count(*)` sums per-file row counts, `count(col)` subtracts each
    * file's recorded null count, and `min(col)` / `max(col)` fold the
    * per-file envelopes — which are EXACT whenever present
    * (parquet-mr chunk statistics are omitted when unusable, never
    * truncated). Values return as Catalyst internal representations,
    * null for a provably all-null (or empty) column's extrema.
    *
    * Returns None — caller falls back to the ordinary scan — when the
    * version carries deletion vectors (merge-on-read rows are
    * subtracted at READ time, so per-file stats overcount), when any
    * live file lacks a stats envelope or the requested column's
    * entry, when a null count is unknown, on a stats/type domain
    * mismatch, or for types whose stats order isn't provably Spark's:
    * extrema qualify only for integral/date/timestamp, boolean, and
    * default-collation strings (parquet's unsigned-byte string order
    * IS UTF8_BINARY's) — float/double are categorically excluded
    * because envelopes cannot prove NaN's absence (see extremum),
    * though their COUNTS remain provable. At warehouse scale this turns a
    * 100 TB table's freshness probe into an O(files) manifest read
    * with zero data I/O.
    */
  def metadataAnswer(reqs: Seq[GraftSnapshotTable.MetaReq])
      : Option[Seq[Any]] = {
    import GraftSnapshotTable._
    val (_, _, entries, hasDv) = Snapshot.scanPlan(spark, path, pinnedVersion)
    if (hasDv) return None
    val stats = entries.map(_._2)
    if (stats.exists(_.isEmpty)) return None
    val fss = stats.flatten
    val total = fss.map(_.rows).sum
    val live = fss.filter(_.rows > 0)

    def extremum(name: String,
        dt: org.apache.spark.sql.types.DataType, isMin: Boolean)
        : Option[Any] = {
      // float/double are NEVER extremum-provable: parquet writers
      // omit NaN from min/max envelopes (and may omit the envelope
      // for an all-NaN chunk while nulls=0), so a finite recorded
      // max=1.5 over a file holding {1.5, NaN} silently contradicts
      // Spark's NaN-is-greatest answer — an envelope cannot prove
      // NaN's absence, so the scan must
      dt match {
        case org.apache.spark.sql.types.FloatType |
            org.apache.spark.sql.types.DoubleType => return None
        case _ =>
      }
      val tag = statsTag(dt).getOrElse(return None)
      val key = name.toLowerCase(java.util.Locale.ROOT)
      val cs = live.map(f => (f.rows, f.cols.get(key)))
      if (cs.exists { case (_, c) => c.isEmpty || c.get.tag != tag })
        return None
      // a value-less envelope only PROVES emptiness when the null
      // count accounts for every row; anything else (unknown nulls,
      // one-sided envelope) is refused, not guessed
      val sides = cs.map { case (rows, cOpt) =>
        val c = cOpt.get
        (if (isMin) c.min else c.max) match {
          case Some(v) => Some(Some(v))
          case None if c.min.isEmpty && c.max.isEmpty &&
              c.nulls == rows => Some(None)
          case None => None
        }
      }
      if (sides.exists(_.isEmpty)) return None
      val vals = sides.flatten.flatten
      if (vals.isEmpty) Some(null) // zero rows or provably all null
      else
        try {
          val picked: Any =
            if (tag == "b") {
              val bs = vals.map(java.util.Base64.getDecoder.decode)
              if (isMin) bs.min(bytesOrder) else bs.max(bytesOrder)
            } else {
              val ns = vals.map(new java.math.BigDecimal(_))
              val ord = Ordering.fromLessThan[java.math.BigDecimal](
                _.compareTo(_) < 0)
              if (isMin) ns.min(ord) else ns.max(ord)
            }
          decodeValue(picked, dt)
        } catch { case scala.util.control.NonFatal(_) => None }
    }

    val per = reqs.map {
      case RowCount => Some(total)
      case NonNullCount(name) =>
        val key = name.toLowerCase(java.util.Locale.ROOT)
        val counts = live.map(_.cols.get(key) match {
          case Some(c) if c.nulls >= 0 => Some(c.nulls)
          case _ => None
        })
        if (counts.exists(_.isEmpty)) None
        else Some(live.map(_.rows).sum - counts.flatten.sum)
      case ColMin(name, dt) => extremum(name, dt, isMin = true)
      case ColMax(name, dt) => extremum(name, dt, isMin = false)
    }
    if (per.exists(_.isEmpty)) None else Some(per.map(_.get))
  }

  private def statsTag(dt: org.apache.spark.sql.types.DataType)
      : Option[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
          TimestampType | TimestampNTZType | BooleanType => Some("l")
      case FloatType | DoubleType => Some("d")
      case st: StringType if st == StringType => Some("b")
      case _ => None
    }
  }

  private val bytesOrder: Ordering[Array[Byte]] = (x, y) => {
    val n = math.min(x.length, y.length)
    var i = 0
    var c = 0
    while (i < n && c == 0) {
      c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      i += 1
    }
    if (c != 0) c else java.lang.Integer.compare(x.length, y.length)
  }

  /** Stats-domain value → Catalyst internal value of `dt`. */
  private def decodeValue(v: Any,
      dt: org.apache.spark.sql.types.DataType): Option[Any] = {
    import org.apache.spark.sql.types._
    (v, dt) match {
      case (b: Array[Byte], st: StringType) if st == StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromBytes(b))
      case (n: java.math.BigDecimal, _) => dt match {
        case LongType | TimestampType | TimestampNTZType =>
          Some(n.longValueExact)
        case IntegerType | DateType => Some(n.intValueExact)
        case ShortType => Some(n.shortValueExact)
        case ByteType => Some(n.byteValueExact)
        case DoubleType => Some(n.doubleValue)
        case FloatType => Some(n.floatValue)
        case BooleanType => Some(n.signum != 0)
        case _ => None
      }
      case _ => None
    }
  }

  // ----------------------------------------------------------- delete

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    pinnedVersion.isEmpty && filters.forall(GraftSnapshotTable.translatable)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinnedVersion.isEmpty,
      s"cannot DELETE from $ident: a time-travelled table is read-only")
    val pred = filters.map(GraftSnapshotTable.filterToColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    Snapshot.deleteWhere(spark, path, pred)
    ()
  }
}

/** A read-only metadata table (`graft.db.t.history` / `.files`): the
  * DataFrame is rebuilt per scan — manifest-sized, driver-computed —
  * through the V1Scan fallback ([[graft.plans.GraftSqlRules]] leaves
  * non-snapshot tables alone, so no native-scan rewrite applies).
  */
final class GraftMetaTable(ident: String,
    df: () => DataFrame) extends Table with SupportsRead {

  override def name(): String = ident

  override lazy val schema: StructType = df().schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = { () =>
    val s = schema
    val thunk = df
    new V1Scan {
      override def readSchema(): StructType = s
      override def toV1TableScan[T <: BaseRelation with TableScan](
          ctx: SQLContext): T =
        new BaseRelation with TableScan {
          override def sqlContext: SQLContext = ctx
          override def schema: StructType = s
          override def buildScan(): org.apache.spark.rdd.RDD[Row] =
            thunk().rdd
        }.asInstanceOf[T]
    }: Scan
  }
}

object GraftSnapshotTable {

  /** One aggregate a metadata-only query asks of the manifest. */
  sealed trait MetaReq
  case object RowCount extends MetaReq
  final case class NonNullCount(col: String) extends MetaReq
  final case class ColMin(col: String,
      dt: org.apache.spark.sql.types.DataType) extends MetaReq
  final case class ColMax(col: String,
      dt: org.apache.spark.sql.types.DataType) extends MetaReq

  private[etl] def translatable(f: Filter): Boolean = f match {
    case _: sources.EqualTo | _: sources.EqualNullSafe |
        _: sources.GreaterThan | _: sources.GreaterThanOrEqual |
        _: sources.LessThan | _: sources.LessThanOrEqual |
        _: sources.In | _: sources.IsNull | _: sources.IsNotNull |
        _: sources.StringStartsWith | _: sources.StringEndsWith |
        _: sources.StringContains | _: sources.AlwaysTrue |
        _: sources.AlwaysFalse => true
    case sources.And(l, r) => translatable(l) && translatable(r)
    case sources.Or(l, r) => translatable(l) && translatable(r)
    case sources.Not(c) => translatable(c)
    case _ => false
  }

  /** Data-source `Filter` → predicate `Column` — the inverse of the
    * pushdown translation, so `DELETE FROM ... WHERE` arrives at
    * [[Snapshot.deleteWhere]] as the same `Column` shape the Scala
    * API takes (and [[FileStats.mayMatch]] already knows how to
    * prune).
    */
  private[etl] def filterToColumn(f: Filter): Column = f match {
    case sources.EqualTo(a, v) => col(a) === lit(v)
    case sources.EqualNullSafe(a, v) => col(a) <=> lit(v)
    case sources.GreaterThan(a, v) => col(a) > lit(v)
    case sources.GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case sources.LessThan(a, v) => col(a) < lit(v)
    case sources.LessThanOrEqual(a, v) => col(a) <= lit(v)
    case sources.In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
    case sources.IsNull(a) => col(a).isNull
    case sources.IsNotNull(a) => col(a).isNotNull
    case sources.StringStartsWith(a, v) => col(a).startsWith(v)
    case sources.StringEndsWith(a, v) => col(a).endsWith(v)
    case sources.StringContains(a, v) => col(a).contains(v)
    case sources.And(l, r) => filterToColumn(l) && filterToColumn(r)
    case sources.Or(l, r) => filterToColumn(l) || filterToColumn(r)
    case sources.Not(c) => !filterToColumn(c)
    case sources.AlwaysTrue() => lit(true)
    case sources.AlwaysFalse() => lit(false)
    case other => throw new UnsupportedOperationException(
      s"DELETE predicate shape not translatable: $other")
  }
}
