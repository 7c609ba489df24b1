package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** md5 folded straight to the 60-bit integer TableCheck sums —
  * semantically `conv(substring(md5(x), 1, 15), 16, 10)` (the first
  * 15 hex digits of the digest as an unsigned long), computed without
  * the intermediate 32-char hex string, the substring copy, or the
  * base-16 string parse that the composed form allocates PER ROW.
  * The digest's first 8 big-endian bytes unsigned-shifted right by 4
  * ARE the first 15 hex digits' value, so the two forms are
  * bit-identical (spec'd in TableCheckSpec) and the DuckDB oracle can
  * keep stating the readable string form. md5 itself stays because
  * it is bit-identical across engines — the portability requirement
  * an engine-native hash can't meet.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_60 expects BINARY, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hash60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5(b) as an unsigned long (60 bits).
    * Called from generated code — static, allocation-lean (one
    * 16-byte digest array per call, reused MessageDigest).
    */
  def hash60(b: Array[Byte]): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(b)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Expose as SQL function `md5_60(binary)`; idempotent per session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_60", exprs => Md5Hash60(exprs.head), "built-in")
}

/** SimHash signature of an ARRAY<BIGINT> of per-token hashes over the
  * low `bits` bit positions: bit j of the result is set iff the ±1
  * majority vote of the inputs' bit j is strictly positive (ties → 0).
  *
  * Semantically identical to the nested higher-order form
  * `aggregate(sequence(0, bits-1), 0L, (acc, j) -> acc +
  *   shiftleft(CAST(aggregate(hs, 0, (s, h) ->
  *     s + CASE WHEN shiftright(h, j) % 2 != 0 THEN 1 ELSE -1 END) > 0
  *   AS BIGINT), j))`
  * — including negative inputs, where `% 2 != 0` reads the same low
  * bit as `& 1` — but computed as ONE tight pass over the token array
  * instead of `bits` interpreted lambda walks with per-element closure
  * dispatch (the dominant cost of the sketch queries' signature stage;
  * HashOpsSpec pins equality against the HOF form, the xd2b gate pins
  * the end result against DuckDB computing the same sketch in SQL).
  *
  * Contract: `bits` in [1, 64]; null array propagates null; null
  * elements are not expected (token hashes are non-null by
  * construction) and would throw on read like the HOF form would.
  */
case class SimHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(LongType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig expects (ARRAY<BIGINT>, INT), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    SimHashSig.sig(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SimHashSig.sig($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashSig =
    copy(left = newLeft, right = newRight)
}

object SimHashSig {

  /** One pass over the hash array: counts[j] accumulates the ±1 vote
    * of bit j; the signature sets bit j iff counts[j] > 0. Called from
    * generated code.
    */
  def sig(hs: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >> j) & 1L) != 0L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Expose as SQL function `simhash_sig(hashes, bits)`; idempotent
    * per session.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs(0), exprs(1)), "built-in")
}

/** The md5 layer fused INTO the SimHash vote — semantically
  * `simhash_sig(transform(toks, t -> md5_60(CAST(t AS BINARY))), bits)`
  * but one JVM pass per token array: token bytes → 60-bit digest →
  * ±1 vote, no materialized hash array and no per-element interpreted
  * lambda dispatch (inside a higher-order `transform`, the custom
  * md5_60 Expression evaluates interpreted per element — the remaining
  * fixed cost of xd2b's signature stage after the vote fusion).
  * ArrayOpsSpec pins bit-equality against the composed form.
  */
case class SimHashMd5Sig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_md5_sig expects (ARRAY<STRING>, INT), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    SimHashMd5Sig.sig(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SimHashMd5Sig.sig($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashMd5Sig =
    copy(left = newLeft, right = newRight)
}

object SimHashMd5Sig {

  /** Per-thread token→hash60 memo. Token frequencies are Zipfian, so
    * across the distinct-set corpus the same common words are hashed
    * thousands of times; a bounded value-keyed map turns the repeat
    * md5 calls (plus the per-token getBytes copy) into one probe.
    * Keys are CLONED UTF8Strings — the lookup key may point into a
    * reused unsafe-row buffer, so only a defensive copy is safe to
    * retain. Capped at 1M entries (~tens of MB for word-sized keys);
    * past the cap we still compute, just stop inserting — correctness
    * never depends on a hit. Purely a cache of a pure function, so
    * results are bit-identical with or without it.
    */
  private val memoCap = 1 << 20
  private val memo =
    ThreadLocal.withInitial[java.util.HashMap[
        org.apache.spark.unsafe.types.UTF8String, java.lang.Long]](() =>
      new java.util.HashMap(1 << 16))

  /** One pass: md5-60 each token's UTF-8 bytes (CAST(string AS BINARY)
    * is exactly those bytes), vote its low `bits` bits. Called from
    * generated code.
    */
  def sig(toks: ArrayData, bits: Int): Long = {
    val m = memo.get()
    val counts = new Array[Int](bits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      var hv = m.get(t)
      if (hv == null) {
        hv = java.lang.Long.valueOf(Md5Hash60.hash60(t.getBytes))
        if (m.size < memoCap) m.put(t.clone(), hv)
      }
      val h = hv.longValue()
      var j = 0
      while (j < bits) {
        counts(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Expose as SQL function `simhash_md5_sig(tokens, bits)`;
    * idempotent per session.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_md5_sig", exprs => SimHashMd5Sig(exprs(0), exprs(1)), "built-in")
}
