package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: recognize the compositional dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * and replace it with the fused native expression `DotProduct(a, b)`.
  * Higher-order lambda chains do not participate in WholeStageCodegen and
  * materialize the zipped intermediate array per row; the native expression
  * is one codegen'd loop. Registered via `GraftExtensions`
  * (injectOptimizerRule) or ad hoc through
  * `spark.experimental.extraOptimizations`.
  *
  * The rewrite preserves semantics exactly: same left-to-right accumulation
  * order and same null behavior — a null array input, a length mismatch
  * (zip_with null-pads the shorter side and the null propagates through the
  * multiply and the sum), and a null element all produce NULL in BOTH forms,
  * because `DotProduct` implements precisely the lambda-chain null
  * semantics. It fires only for array<double> inputs, the type the native
  * expression is compiled for.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(aacc: NamedLambdaVariable, av: NamedLambdaVariable, _),
              Seq(macc: NamedLambdaVariable, mv: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(farg: NamedLambdaVariable), _))
          if mx.exprId == zx.exprId && my.exprId == zy.exprId &&
            aacc.exprId == macc.exprId && av.exprId == mv.exprId &&
            fin.exprId == farg.exprId &&
            isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
    }
}
