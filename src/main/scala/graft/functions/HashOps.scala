package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

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
