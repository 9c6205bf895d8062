package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast,
  Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted HOF dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProduct]]. zip_with/aggregate are
  * HigherOrderFunctions (CodegenFallback — see DotProduct's scaladoc), so
  * any query phrased in the idiomatic SQL/Column form pays two lambda
  * invocations per element and breaks its projection out of whole-stage
  * codegen; after this rule the session evaluates the exact same fold as
  * a primitive loop. Semantics are identical BY CONSTRUCTION: same
  * left-to-right double accumulation from 0.0, same null propagation
  * (ragged zip_with pads nulls which poison the fold — DotProduct
  * returns null on ragged/null-element inputs), same 0.0 on empty, so
  * the rewrite is invisible to results (spec-asserted bit-equality) —
  * the Catalyst-native way to accelerate a pattern users already write,
  * instead of asking them to call an engine-specific function.
  *
  * Matches conservatively: both sides ARRAY<FLOAT|DOUBLE>, the multiply
  * over exactly the two zip_with variables (in order, modulo the
  * double-widening casts the Column API inserts and the optimizer may
  * have already simplified away), zero literal 0.0, merge = acc + v over
  * exactly the accumulator and element variables, and an identity
  * finish. Anything else is left alone (negative-case spec). */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def elemOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** `e` is `v` itself or `CAST(v AS DOUBLE)` (the widening the Column
    * API writes; already stripped by SimplifyCasts when v is double). */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(nv: NamedLambdaVariable, DoubleType, _, _) => nv.exprId == v.exprId
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(ma, mv, _),
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if elemOk(a) && elemOk(b) &&
        isVar(mx, x) && isVar(my, y) &&
        isVar(ma, acc) && isVar(mv, v) &&
        isIdentityFinish(finish) =>
      DotProduct(a, b)
  }
}
