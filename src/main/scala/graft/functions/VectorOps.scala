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
  * Null contract: null if either array is null; elements are assumed
  * non-null (embedding vectors), matching zip_with+aggregate on the
  * same data. Inputs must already be ARRAY<DOUBLE> (cast at the call
  * site); no implicit coercion is attempted.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
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
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Expose as the SQL function `vec_dot(a, b)`; call via expr(...).
    * Registration is idempotent per session.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
}
