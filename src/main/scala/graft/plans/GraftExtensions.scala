package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.VectorDot

/** Catalyst optimizer rule: rewrite the composable dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, e) -> acc + e)
  *
  * into the codegen'd VectorDot(a, b). The HOF form allocates an
  * intermediate array per row and evaluates interpreted lambdas; the
  * fused expression stays inside WholeStageCodegen (see
  * graft.functions.VectorDot — same sequential fold, bit-identical).
  * Users write the natural declarative form; the optimizer supplies the
  * fast path — the Catalyst way of making an idiom free.
  *
  * The rewrite is semantics-preserving on ALL inputs — ragged lengths
  * and null elements included — because VectorDot propagates null for
  * exactly the cases where zip_with's null-padding poisons the HOF
  * aggregate (see VectorDot's null contract + ExtensionsSpec's
  * ragged/null-element cases). No type guard is needed.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0, _), DoubleType, _, _) => true
    case _ => false
  }

  private def isDoubleArray(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(Add(acc: NamedLambdaVariable, e: NamedLambdaVariable, _),
              Seq(lacc: NamedLambdaVariable, le: NamedLambdaVariable), _),
            finish)
          if isZero(zero) && isDoubleArray(a.dataType) &&
            Set(x.exprId, y.exprId) == Set(lx.exprId, ly.exprId) &&
            acc.exprId == lacc.exprId && e.exprId == le.exprId &&
            isIdentityFinish(finish) =>
        VectorDot(a, b)
    }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }
}

/** Session extensions: inject the optimizer rewrite and register the
  * engine's SQL functions.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    // catalog SQL routing (GraftCatalog tables): UPDATE/MERGE to the
    // manifest DML triad in the resolution batch, then pure reads to
    // the native manifest-backed file scan post-hoc
    ext.injectResolutionRule(s => GraftDmlRule(s))
    ext.injectPostHocResolutionRule(s => GraftReadRule(s))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
        (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("tokenize"),
        new ExpressionInfo(classOf[graft.functions.Tokenize].getName, "tokenize"),
        (exprs: Seq[Expression]) => graft.functions.Tokenize(exprs.head)))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
        new ExpressionInfo(classOf[graft.functions.SortedIntersectCount].getName,
          "sorted_intersect_count"),
        (exprs: Seq[Expression]) =>
          graft.functions.SortedIntersectCount(exprs(0), exprs(1))))
  }
}
