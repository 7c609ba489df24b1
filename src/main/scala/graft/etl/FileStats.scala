package graft.etl

import java.math.{BigDecimal => JBigDecimal}
import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column statistics for snapshot manifests — the metadata
  * that turns Z-order clustering into actual I/O savings: Delta-style
  * data skipping. At commit time the parquet FOOTERS of the files just
  * written are read (metadata-only, no row I/O) and each file's
  * min/max/null-count per top-level column is recorded in the
  * manifest; at read time `Snapshot.readWhere` evaluates a predicate
  * against those intervals and plans the scan over only the files
  * that MAY contain matches.
  *
  * Scale shape: collection is O(new files) footer reads per commit
  * (carried-forward files reuse the previous manifest's entry, like
  * txn state), and pruning is driver-side interval arithmetic over
  * O(files) manifest lines — at warehouse scale this is exactly the
  * role of Delta's per-file stats JSON / Iceberg's manifest column
  * ranges. A 100 TB table clustered on (tenant, day) answers a
  * one-tenant-one-week query by opening a handful of files, because
  * skipping happens BEFORE any parquet footer is even fetched.
  *
  * Correctness posture: pruning is strictly CONSERVATIVE. A file is
  * dropped only when the predicate is provably false on the file's
  * [min,max]/null-count envelope; any column without usable stats,
  * any unsupported expression shape, and any type mismatch keeps the
  * file. `readWhere` additionally re-applies the full predicate as a
  * normal filter, so pruning can only ever remove I/O, never change
  * results.
  *
  * Comparison domains (tag): "l" = integral (INT32/INT64 incl. DATE
  * days and MICROS timestamps, BOOLEAN as 0/1), "d" = FLOAT/DOUBLE,
  * "b" = UTF-8 string bytes compared unsigned-lexicographically (the
  * parquet STRING sort order AND Spark's UTF8String order, so string
  * pruning is exact). DECIMAL-annotated ints, raw binary, unsigned
  * ints, and non-micros timestamps are skipped — conservative, not
  * wrong. NaN/Infinity float envelopes are dropped entirely.
  */
private[etl] object FileStats {

  /** One column's envelope. min/max absent = no non-null value seen
    * (all-null column) OR stats unusable; `nulls` = -1 when unknown.
    */
  final case class ColStat(tag: String, min: Option[String],
      max: Option[String], nulls: Long)

  /** One file's envelope: total rows + per-column stats (lowercased
    * column name — Spark's default case-insensitive resolution).
    */
  final case class FileStat(rows: Long, cols: Map[String, ColStat])

  private val mapper = new ObjectMapper()

  // ---------------------------------------------------------------- collect

  /** Read `file`'s parquet footer and build its stats envelope.
    * Returns None when the footer yields nothing usable. Never
    * throws on malformed/unsupported content — stats are an
    * optimization, commits must not fail over them.
    */
  def collect(conf: Configuration, file: Path): Option[FileStat] =
    try {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        if (rows == 0) return Some(FileStat(0L, Map.empty))
        // per column name: the chunks of every row group, merged
        val chunks = blocks.flatMap(_.getColumns.asScala)
          .groupBy(_.getPath.toDotString)
          .filter { case (name, cs) =>
            !name.contains(".") && cs.size == blocks.size
          }
        val cols = chunks.flatMap { case (name, cs) =>
          mergeChunks(cs).map(name.toLowerCase -> _)
        }
        Some(FileStat(rows, cols))
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Tag for a parquet primitive + logical annotation, or None when
    * the type has no safe comparison domain here.
    */
  private def tagOf(t: org.apache.parquet.schema.PrimitiveType): Option[String] = {
    val ann = t.getLogicalTypeAnnotation
    (t.getPrimitiveTypeName, ann) match {
      case (_, _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) => None
      case (PrimitiveTypeName.INT32, a) => a match {
        case null => Some("l")
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
          if (i.isSigned) Some("l") else None
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => Some("l")
        case _ => None
      }
      case (PrimitiveTypeName.INT64, a) => a match {
        case null => Some("l")
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
          if (i.isSigned) Some("l") else None
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          if (ts.getUnit == TimeUnit.MICROS) Some("l") else None
        case _ => None
      }
      case (PrimitiveTypeName.FLOAT, _) | (PrimitiveTypeName.DOUBLE, _) =>
        Some("d")
      case (PrimitiveTypeName.BOOLEAN, _) => Some("l")
      case (PrimitiveTypeName.BINARY,
          _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) => Some("b")
      case _ => None
    }
  }

  /** Merge one column's chunks across row groups into a ColStat.
    * None when any chunk lacks usable statistics (old writer, NaN
    * envelope, unsupported type) — conservative drop.
    */
  private def mergeChunks(
      cs: Seq[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
      : Option[ColStat] = {
    val tag = tagOf(cs.head.getPrimitiveType).getOrElse(return None)
    val stats = cs.map(_.getStatistics)
    if (stats.exists(s => s == null || s.isEmpty)) return None
    val nulls =
      if (stats.forall(_.isNumNullsSet)) stats.map(_.getNumNulls).sum else -1L
    val withVals = stats.filter(_.hasNonNullValue)
    if (withVals.isEmpty) {
      // every chunk all-null: envelope is (no min, no max, all nulls)
      return if (nulls >= 0) Some(ColStat(tag, None, None, nulls)) else None
    }
    // a chunk that holds values but exposes no min/max would make the
    // envelope a lie; hasNonNullValue implies min/max are present for
    // parquet-mr typed statistics, so render them per domain
    val rendered = withVals.map { s =>
      (s.genericGetMin, s.genericGetMax) match {
        case (mn: java.lang.Number, mx: java.lang.Number) if tag == "l" =>
          Some((JBigDecimal.valueOf(mn.longValue), JBigDecimal.valueOf(mx.longValue)))
        case (mn: java.lang.Boolean, mx: java.lang.Boolean) =>
          Some((JBigDecimal.valueOf(if (mn) 1L else 0L),
            JBigDecimal.valueOf(if (mx) 1L else 0L)))
        case (mn: java.lang.Number, mx: java.lang.Number) if tag == "d" =>
          val (a, b) = (mn.doubleValue, mx.doubleValue)
          if (java.lang.Double.isFinite(a) && java.lang.Double.isFinite(b))
            Some((new JBigDecimal(a), new JBigDecimal(b)))
          else None
        case (mn: org.apache.parquet.io.api.Binary,
            mx: org.apache.parquet.io.api.Binary) if tag == "b" =>
          Some((mn.getBytes, mx.getBytes))
        case _ => None
      }
    }
    if (rendered.exists(_.isEmpty)) return None
    if (tag == "b") {
      val bs = rendered.map(_.get.asInstanceOf[(Array[Byte], Array[Byte])])
      val mn = bs.map(_._1).min(byteOrder)
      val mx = bs.map(_._2).max(byteOrder)
      Some(ColStat(tag, Some(b64(mn)), Some(b64(mx)), nulls))
    } else {
      val ns = rendered.map(_.get.asInstanceOf[(JBigDecimal, JBigDecimal)])
      val mn = ns.map(_._1).reduce((a, b) => if (a.compareTo(b) <= 0) a else b)
      val mx = ns.map(_._2).reduce((a, b) => if (a.compareTo(b) >= 0) a else b)
      Some(ColStat(tag, Some(mn.toPlainString), Some(mx.toPlainString), nulls))
    }
  }

  private val byteOrder: Ordering[Array[Byte]] = (x, y) => {
    val n = math.min(x.length, y.length)
    var i = 0
    var c = 0
    while (i < n && c == 0) {
      c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      i += 1
    }
    if (c != 0) c else java.lang.Integer.compare(x.length, y.length)
  }

  private def b64(b: Array[Byte]): String =
    Base64.getEncoder.encodeToString(b)

  /** Does every top-level field of `file`'s parquet schema carry a
    * field id? The schema-evolution gate: rename/widen are only safe
    * when all current files can be matched by id (Snapshot writes ids
    * on every commit; files from before that, or from other writers,
    * may lack them). Footer-only read; false on any error.
    */
  def hasFieldIds(conf: Configuration, file: Path): Boolean =
    try {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try r.getFooter.getFileMetaData.getSchema.getFields.asScala
        .forall(_.getId != null)
      finally r.close()
    } catch { case scala.util.control.NonFatal(_) => false }

  // ------------------------------------------------------------ json codec

  def toJson(fs: FileStat): String = {
    val root = mapper.createObjectNode()
    root.put("rows", fs.rows)
    val cols = root.putObject("cols")
    fs.cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      val o = cols.putObject(name)
      o.put("t", c.tag)
      c.min.foreach(o.put("min", _))
      c.max.foreach(o.put("max", _))
      if (c.nulls >= 0) o.put("n", c.nulls)
    }
    mapper.writeValueAsString(root)
  }

  def fromJson(s: String): Option[FileStat] =
    try {
      val root = mapper.readTree(s)
      val cols = Option(root.get("cols")).collect { case o: ObjectNode =>
        o.properties().asScala.map { e =>
          val c = e.getValue
          e.getKey -> ColStat(
            c.get("t").asText(),
            Option(c.get("min")).map(_.asText()),
            Option(c.get("max")).map(_.asText()),
            Option(c.get("n")).map(_.asLong()).getOrElse(-1L))
        }.toMap
      }.getOrElse(Map.empty[String, ColStat])
      Some(FileStat(root.get("rows").asLong(), cols))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------- predicate

  /** Literal → (tag, comparable) in a column domain: numerics/dates/
    * timestamps/booleans land in BigDecimal ("n"), strings in UTF-8
    * bytes ("b"). None = this literal can't drive pruning.
    */
  private def litVal(l: Literal): Option[(String, Any)] =
    if (l.value == null) None
    else l.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(("n", JBigDecimal.valueOf(l.value.asInstanceOf[Number].longValue)))
      case DateType =>
        Some(("n", JBigDecimal.valueOf(l.value.asInstanceOf[Int].toLong)))
      case TimestampType | TimestampNTZType =>
        Some(("n", JBigDecimal.valueOf(l.value.asInstanceOf[Long])))
      case BooleanType =>
        Some(("n", JBigDecimal.valueOf(
          if (l.value.asInstanceOf[Boolean]) 1L else 0L)))
      case FloatType =>
        val d = l.value.asInstanceOf[Float].toDouble
        if (java.lang.Double.isFinite(d)) Some(("n", new JBigDecimal(d))) else None
      case DoubleType =>
        val d = l.value.asInstanceOf[Double]
        if (java.lang.Double.isFinite(d)) Some(("n", new JBigDecimal(d))) else None
      case StringType =>
        Some(("b", l.value.asInstanceOf[UTF8String].getBytes))
      case _ => None
    }

  /** The column's envelope in the literal's comparison domain, or
    * None when domains don't line up (→ no pruning).
    */
  private def envelope(c: ColStat, domain: String)
      : Option[(Option[Any], Option[Any])] = (c.tag, domain) match {
    case ("l" | "d", "n") =>
      Some((c.min.map(new JBigDecimal(_)), c.max.map(new JBigDecimal(_))))
    case ("b", "b") =>
      Some((c.min.map(Base64.getDecoder.decode),
        c.max.map(Base64.getDecoder.decode)))
    case _ => None
  }

  private def cmp(domain: String, a: Any, b: Any): Int = domain match {
    case "n" => a.asInstanceOf[JBigDecimal].compareTo(b.asInstanceOf[JBigDecimal])
    case _ => byteOrder.compare(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name.toLowerCase)
    case a: AttributeReference => Some(a.name.toLowerCase)
    case _ => None
  }

  /** Spark 4's Column DSL emits name-based `UnresolvedFunction` nodes
    * (">", "and", "isnull", …) that the ANALYZER would later bind to
    * concrete expressions; pruning runs pre-analysis, so bind the
    * comparison/boolean shapes here. Unknown names stay unresolved —
    * mayMatch keeps those files.
    */
  private def normalize(e: Expression): Expression = e match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.size == 1 =>
      val as = f.arguments.map(normalize)
      (f.nameParts.head.toLowerCase, as) match {
        case (">", Seq(a, b)) => GreaterThan(a, b)
        case (">=", Seq(a, b)) => GreaterThanOrEqual(a, b)
        case ("<", Seq(a, b)) => LessThan(a, b)
        case ("<=", Seq(a, b)) => LessThanOrEqual(a, b)
        case ("=" | "==", Seq(a, b)) => EqualTo(a, b)
        case ("<=>", Seq(a, b)) => EqualNullSafe(a, b)
        case ("and", Seq(a, b)) => And(a, b)
        case ("or", Seq(a, b)) => Or(a, b)
        case ("not", Seq(a)) => Not(a)
        case ("isnull", Seq(a)) => IsNull(a)
        case ("isnotnull", Seq(a)) => IsNotNull(a)
        case ("in", a +: rest) => In(a, rest)
        case ("startswith", Seq(a, b)) => StartsWith(a, b)
        case _ => f
      }
    case other => other.mapChildren(normalize)
  }

  /** May `expr` be true for some row of a file with envelope `fs`?
    * Three-valued logic collapsed conservatively: anything not
    * provably false is true. Supported shapes: And/Or, =, <=>, <, <=,
    * >, >=, In, IsNull/IsNotNull, StartsWith; attribute on either
    * side of a comparison.
    */
  def mayMatch(expr: Expression, fs: FileStat): Boolean =
    may(normalize(expr), fs)

  private def may(expr: Expression, fs: FileStat): Boolean = {
    if (fs.rows == 0) return false

    def col(e: Expression): Option[ColStat] =
      attrName(e).flatMap(fs.cols.get)

    // the comparison `a op v` over the file's [min,max]; all-null
    // columns (min/max absent with known full nulls) match nothing
    def rangeCheck(a: Expression, l: Literal)(
        test: (String, Any, Any, Any) => Boolean): Boolean = {
      val out = for {
        c <- col(a)
        (domain, v) <- litVal(l)
        (mnO, mxO) <- envelope(c, domain)
      } yield (mnO, mxO) match {
        case (Some(mn), Some(mx)) => test(domain, v, mn, mx)
        case _ => c.nulls != fs.rows // no values: only all-null is provable
      }
      out.getOrElse(true)
    }

    expr match {
      case And(l, r) => may(l, fs) && may(r, fs)
      case Or(l, r) => may(l, fs) || may(r, fs)

      case EqualTo(a, l: Literal) => rangeCheck(a, l)((d, v, mn, mx) =>
        cmp(d, mn, v) <= 0 && cmp(d, v, mx) <= 0)
      case EqualTo(l: Literal, a) => may(EqualTo(a, l), fs)
      case EqualNullSafe(a, l: Literal) if l.value != null =>
        may(EqualTo(a, l), fs)
      case EqualNullSafe(l: Literal, a) if l.value != null =>
        may(EqualTo(a, l), fs)
      case EqualNullSafe(a, l: Literal) => // <=> NULL: needs a null row
        col(a).forall(c => c.nulls != 0)
      case EqualNullSafe(l: Literal, a) if l.value == null =>
        col(a).forall(c => c.nulls != 0)

      case GreaterThan(a, l: Literal) =>
        rangeCheck(a, l)((d, v, _, mx) => cmp(d, mx, v) > 0)
      case GreaterThan(l: Literal, a) => // v > a  ⇔  a < v
        rangeCheck(a, l)((d, v, mn, _) => cmp(d, mn, v) < 0)
      case GreaterThanOrEqual(a, l: Literal) =>
        rangeCheck(a, l)((d, v, _, mx) => cmp(d, mx, v) >= 0)
      case GreaterThanOrEqual(l: Literal, a) =>
        rangeCheck(a, l)((d, v, mn, _) => cmp(d, mn, v) <= 0)
      case LessThan(a, l: Literal) =>
        rangeCheck(a, l)((d, v, mn, _) => cmp(d, mn, v) < 0)
      case LessThan(l: Literal, a) =>
        rangeCheck(a, l)((d, v, _, mx) => cmp(d, mx, v) > 0)
      case LessThanOrEqual(a, l: Literal) =>
        rangeCheck(a, l)((d, v, mn, _) => cmp(d, mn, v) <= 0)
      case LessThanOrEqual(l: Literal, a) =>
        rangeCheck(a, l)((d, v, _, mx) => cmp(d, mx, v) >= 0)

      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => may(EqualTo(a, v.asInstanceOf[Literal]), fs))

      case IsNull(a) => col(a).forall(_.nulls != 0)
      case IsNotNull(a) => col(a).forall(c => c.nulls != fs.rows)

      case StartsWith(a, l: Literal) =>
        // rows with prefix p live in [p, successor(p)) byte-wise
        val out = for {
          c <- col(a)
          (domain, v) <- litVal(l) if domain == "b"
          (mnO, mxO) <- envelope(c, "b")
        } yield (mnO, mxO) match {
          case (Some(mn), Some(mx)) =>
            val p = v.asInstanceOf[Array[Byte]]
            byteOrder.compare(mx.asInstanceOf[Array[Byte]], p) >= 0 &&
              successor(p).forall(s =>
                byteOrder.compare(mn.asInstanceOf[Array[Byte]], s) < 0)
          case _ => c.nulls != fs.rows
        }
        out.getOrElse(true)

      case _ => true
    }
  }

  /** Smallest byte string greater than every string with prefix `p`:
    * increment the last non-0xFF byte, truncate after it. None when
    * all bytes are 0xFF (unbounded above).
    */
  private def successor(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == -1) i -= 1
    if (i < 0) None
    else {
      val s = java.util.Arrays.copyOf(p, i + 1)
      s(i) = (s(i) + 1).toByte
      Some(s)
    }
  }
}
