package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two embedding/plane arrays — the raw-fold
  * sibling of [[CosineSimilarity]].
  *
  * Why it exists: the HOF formulation (VectorFunctions.dot: zip_with +
  * aggregate) is a HigherOrderFunction, which Catalyst cannot codegen —
  * any projection containing one falls back to interpreted evaluation
  * with two lambda invocations per element. The SRP fingerprint build
  * evaluates `bits` dots per row (16 planes × 64 dims = 2048 lambda
  * calls/row) and the JL projection k more; this Expression turns each
  * into a primitive loop inside whole-stage codegen.
  *
  * Each side may be ARRAY<FLOAT> (embeddings) or ARRAY<DOUBLE> (literal
  * hyperplanes) — both widen to double per element, exactly like the
  * HOF's `x.cast("double") * y.cast("double")`. Accumulation is
  * sequential in index order starting from 0.0 — the SAME fold the HOF
  * and the generated DuckDB oracle use, so all three produce
  * bit-identical doubles (bit-equality spec-asserted). Ragged inputs and
  * null elements null the result (zip_with pads the short side with
  * nulls and the fold propagates them); empty arrays dot to 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects ARRAY<FLOAT|DOUBLE> on both sides, got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // null elements / ragged inputs null the result even when the array
  // columns themselves are non-nullable (cf. CosineSimilarity's note)
  override def nullable: Boolean = true

  private def isFloat(t: DataType) =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = isFloat(left.dataType); val rf = isFloat(right.dataType)
    val n = x.numElements()
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val anyNull = ctx.freshName("anyNull")
      val getX =
        if (isFloat(left.dataType)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getY =
        if (isFloat(right.dataType)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0;
         |boolean $anyNull = ($n != $b.numElements());
         |for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  $dot += ($getX) * ($getY);
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
