package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd cosine similarity over two ARRAY<FLOAT> embedding columns.
  *
  * The HOF formulation (VectorFunctions.cosine: zip_with + aggregate)
  * is semantically identical but evaluates lambda functions per element —
  * measured ~600 ns/vector-pair at dim 64 on the sf0.1 bench, dominating
  * the kNN queries. This Expression generates a tight primitive loop
  * inside whole-stage codegen: no per-element closures, no intermediate
  * array allocation (SURVEY §4.3's one sanctioned custom Expression).
  *
  * Accumulation is sequential in index order, double precision — the SAME
  * fold order as the HOF version, so both produce bit-identical results.
  * Division by a zero norm follows IEEE (yields NaN/Infinity), matching
  * the HOF behavior.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  // a null ELEMENT nulls the result, so the expression is nullable even
  // when both array inputs are non-nullable (else codegen hardwires
  // isNull=false and the null branch is silently dropped)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // ragged inputs null the result — zip_with pads the shorter side with
    // nulls, which the HOF fold propagates to null; a prefix-cosine would
    // instead let a truncated/corrupt vector win a kNN ranking
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      // a null ELEMENT nulls the whole result — same propagation as the
      // HOF formulation (zip_with/aggregate) this expression replaces
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |boolean $anyNull = ($n != $b.numElements());
         |for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  double xi = (double) $a.getFloat($i);
         |  double yi = (double) $b.getFloat($i);
         |  $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
