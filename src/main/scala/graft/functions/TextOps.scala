package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer: lowercase + split on non-[a-z] runs + drop
  * empties, fused into ONE byte scan over the UTF8String.
  *
  * The declarative form — filter(split(lower(text), "[^a-z]+"),
  * t -> t <> '') — pays per row: a full lowered String copy, a Java
  * regex walk, an array of substrings, and an INTERPRETED lambda call
  * per token (ArrayFilter does not participate in codegen). That
  * composition sits in the scan stage of every text-family query
  * (tokenize → group/explode), i.e. it is the corpus-facing kernel of
  * the whole family. Measured on 320k docs / 17.3M tokens (local[32]):
  * 0.21 s/pass vs the HOF form's 0.50 s — 2.4× on the isolated
  * kernel; invisible at sf0.1 where shuffles dominate, material for a
  * 100 TB scan stage. This expression emits tokens in a single pass
  * over the raw bytes — ASCII letters lowered by arithmetic, token
  * bytes copied once, no regex, no lambda — and stays inside
  * whole-stage codegen via a static kernel call.
  *
  * Semantics: identical to the HOF form for ASCII input (spec'd
  * property-style in TextOpsSpec, random strings). Non-ASCII bytes
  * (>= 0x80) are separators — the regex form agrees, since a
  * non-ASCII char is never [a-z]; the one divergence is exotic
  * code points whose LOWERCASE is an ASCII letter (e.g. the Kelvin
  * sign lowering to 'k'), which the regex form keeps and this kernel
  * splits on. The corpus contract (documents.text, FIXTURES.md) is
  * ASCII, and the DuckDB oracles' string_split_regex agrees
  * byte-for-byte on it.
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tokenize expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    Tokenize.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenize.split($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

object Tokenize {

  /** One pass: runs of [A-Za-z] become lowercased tokens; every other
    * byte (punctuation, digits, whitespace, any UTF-8 continuation or
    * lead byte) is a separator. Called from generated code — must stay
    * a static, allocation-lean JVM method.
    */
  def split(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    var start = -1
    while (i <= n) {
      val alpha = i < n && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
      }
      if (alpha) {
        if (start < 0) start = i
      } else if (start >= 0) {
        val len = i - start
        val tb = new Array[Byte](len)
        var j = 0
        while (j < len) {
          val b = bytes(start + j)
          tb(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          j += 1
        }
        out.add(UTF8String.fromBytes(tb))
        start = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

object TextOps {
  /** Expose `tokenize(text)`, `term_counts(text)`, and
    * `shingle_hash(toks, n)` (n must be a literal); idempotent per
    * session.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize", exprs => Tokenize(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "term_counts", exprs => TermCounts(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bigram_counts", exprs => BigramCounts(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hash", exprs => ShingleHash(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "built-in")
  }
}

/** Per-document term frequencies fused into the tokenize pass:
  * text → MAP<term, count> in one byte scan, first-occurrence key
  * order. Exactly `tokenize(text)` then count-by-term — spec'd
  * equivalent in TextOpsSpec — but the counting happens ROW-LOCAL in
  * the scan stage, so the tf-table queries (xt5/xt6/xt7/xt9) explode
  * distinct-terms-per-doc rows instead of feeding the whole token
  * stream through a hash aggregate: the groupBy(doc, term) that was
  * each query's first shuffle input disappears entirely. At 100 TB
  * the difference is the token stream (every occurrence) vs the
  * per-doc vocabulary (its distinct support) entering aggregation —
  * typically 3-10× fewer rows, and zero exchange for the per-doc
  * counts themselves since a row's counts never leave the row.
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"term_counts expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType,
      org.apache.spark.sql.types.IntegerType, valueContainsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {

  /** Static kernel (called from generated code): Tokenize.split's
    * byte walk, but tokens land in an insertion-ordered count map
    * instead of a list. Token bytes are copied once; repeat terms
    * only bump a counter box.
    */
  def counts(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayBasedMapData = {
    val bytes = s.getBytes
    val n = bytes.length
    val m = new java.util.LinkedHashMap[UTF8String, Array[Int]](16)
    var i = 0
    var start = -1
    while (i <= n) {
      val alpha = i < n && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
      }
      if (alpha) {
        if (start < 0) start = i
      } else if (start >= 0) {
        val len = i - start
        val tb = new Array[Byte](len)
        var j = 0
        while (j < len) {
          val b = bytes(start + j)
          tb(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          j += 1
        }
        val t = UTF8String.fromBytes(tb)
        val c = m.get(t)
        if (c == null) m.put(t, Array(1)) else c(0) += 1
        start = -1
      }
      i += 1
    }
    val sz = m.size()
    val keys = new Array[AnyRef](sz)
    val vals = new Array[Int](sz)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue()(0)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** Distinct hashed n-shingles of a token array in one pass — the
  * candidate-key projection of the order-sensitive dedup family
  * (xd3's scan stage). The declarative form,
  *
  *   array_distinct(transform(sequence(1, size(toks)-n+1),
  *     i -> xxhash64(concat_ws(' ', slice(toks, i, n))))),
  *
  * materializes per shingle: a sequence array, a sliced sub-array, a
  * concatenated UTF8String, and an interpreted lambda frame — then a
  * second array_distinct pass. This kernel writes each shingle's
  * bytes into one reusable buffer, hashes with the same XXH64
  * (seed 42) xxhash64 uses — so outputs are IDENTICAL longs, spec'd
  * in TextOpsSpec — and dedups during emission (first-occurrence
  * order, matching array_distinct). Fewer than n tokens → empty.
  */
case class ShingleHash(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hash expects ARRAY<STRING>, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash.hashes(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {

  /** Static kernel (called from generated code): distinct xxhash64 of
    * each n-token window joined with ' ', first-occurrence order.
    */
  def hashes(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): GenericArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val words = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) { words(i) = toks.getUTF8String(i).getBytes; i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var buf = new Array[Byte](64)
    i = 0
    while (i <= m - n) {
      var len = n - 1 // separators
      var j = 0
      while (j < n) { len += words(i + j).length; j += 1 }
      if (buf.length < len) buf = new Array[Byte](len * 2)
      var off = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(off) = ' '; off += 1 }
        val w = words(i + j)
        System.arraycopy(w, 0, buf, off, w.length)
        off += w.length
        j += 1
      }
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          len, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Per-document character-BIGRAM frequencies fused into one byte scan:
  * text → MAP<gram, count> of every adjacent 2-char window containing
  * no space — exactly xt3's declarative
  * `filter(transform(sequence(1, length(text)-1), i -> substring(text, i, 2)),
  *         g -> length(g) = 2 AND NOT contains(g, ' '))`
  * then count-by-gram (spec'd equivalent in TextOpsSpec), without
  * materializing a per-character substring array per row. ASCII
  * contract as Tokenize: the byte walk treats each byte as one
  * character, which matches substring() on the fixture's ASCII text;
  * multi-byte code points would diverge and are out of the corpus
  * contract (FIXTURES.md).
  */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bigram_counts expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType,
      org.apache.spark.sql.types.IntegerType, valueContainsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    BigramCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

object BigramCounts {

  /** Static kernel (called from generated code): one pass, space-free
    * adjacent byte pairs into an insertion-ordered count map.
    */
  def counts(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayBasedMapData = {
    val bytes = s.getBytes
    val n = bytes.length
    val m = new java.util.LinkedHashMap[UTF8String, Array[Int]](16)
    var i = 0
    while (i < n - 1) {
      val a = bytes(i)
      val b = bytes(i + 1)
      if (a != ' ' && b != ' ') {
        val tb = new Array[Byte](2)
        tb(0) = a
        tb(1) = b
        val t = UTF8String.fromBytes(tb)
        val c = m.get(t)
        if (c == null) m.put(t, Array(1)) else c(0) += 1
      }
      i += 1
    }
    val sz = m.size()
    val keys = new Array[AnyRef](sz)
    val vals = new Array[Int](sz)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue()(0)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
