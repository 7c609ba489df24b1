package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two ARRAY<DOUBLE> columns.
  *
  * The composable form — aggregate(zip_with(a, b, _*_), 0d, _+_) —
  * allocates an intermediate 64-element array per row and walks it with
  * interpreted lambda calls; on an all-pairs similarity join that is
  * the entire hot path. This Expression stays inside whole-stage
  * codegen: one fused loop over the two ArrayData buffers, no
  * allocation, no virtual calls. Accumulation order is the same
  * sequential left-to-right fold as the HOF form and DuckDB's
  * list_dot_product, so results are bit-identical to both.
  *
  * Null contract — EXACTLY the HOF form's, so the optimizer rewrite in
  * graft.plans.RewriteDotProduct is semantics-preserving on every
  * input, not just fixed-dim embeddings: null if either array is null,
  * null on length mismatch (zip_with pads the shorter side with nulls
  * and a null product poisons the aggregate), null if any element is
  * null. The per-element null check is emitted only when the child
  * types say elements can be null (containsNull), so the embedding hot
  * path stays a branch-free fused loop. Inputs must already be
  * ARRAY<DOUBLE> (cast at the call site); no implicit coercion.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // may produce null on ragged/null-element inputs even when children
  // are non-nullable columns
  override def nullable: Boolean = true

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elemsNullable(left) || elemsNullable(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val nullCheck =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two ARRAY<TINYINT> columns (int8-quantized
  * vectors) — accumulates byte×byte products into a LONG, no floating
  * point in the loop. The quantized-similarity path (xs3) runs this
  * once per candidate pair over arrays an eighth the size of the
  * double form: the win at scale is bandwidth (64-byte rows through
  * broadcast/shuffle instead of 512), the codegen loop keeps the
  * compute side from giving it back. Null contract mirrors VectorDot:
  * null array / length mismatch / null element (statically-nullable
  * only) → null.
  */
case class VectorDotInt8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elemsNullable(left) || elemsNullable(right)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getByte(i).toLong * y.getByte(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val nullCheck =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += (long) $a.getByte($i) * $b.getByte($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotInt8 =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Expose as the SQL functions `vec_dot(a, b)` (double) and
    * `vec_dot_i8(a, b)` (int8 → long); call via expr(...).
    * Registration is idempotent per session.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_i8", exprs => VectorDotInt8(exprs(0), exprs(1)), "built-in")
  }
}
