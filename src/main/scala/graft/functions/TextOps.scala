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
  /** Expose as the SQL function `tokenize(text)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize", exprs => Tokenize(exprs.head), "built-in")
}
