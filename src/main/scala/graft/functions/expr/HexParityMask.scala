package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd hex-digit parity mask: bit `j` of the result is the low bit
  * of hex digit `j` (0-based from the string start, at most 64 digits) —
  * the per-token vote vector of the SimHash family packed into ONE long
  * in a single pass over the string.
  *
  * Why an Expression: the SQL formulation parses the hex into 15-digit
  * words via `conv` (string-to-long parsing, 5 calls per sha2-256) and
  * was measured at ~40% of the 64-bit fingerprint build on the sf0.1
  * bench — for what is ONE byte-compare-and-or per digit. This loop does
  * exactly that inside whole-stage codegen: no parsing, no intermediate
  * strings, no per-call overhead (the same justification as
  * [[CosineSimilarity]], the engine's other sanctioned Expression).
  *
  * Semantics: digits beyond the 64th are ignored (a long holds 64 votes;
  * md5 supplies 32, sha2-256 supplies 64 — the two hashes the operators
  * use). Uppercase hex accepted. A NON-hex character nulls the result —
  * a malformed input must not silently vote. */
case class HexParityMask(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hex_parity_mask expects STRING, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex_parity_mask"
  // non-hex input nulls the result even when the child is non-nullable
  // (else codegen hardwires isNull=false and drops the null branch)
  override def nullable: Boolean = true

  override def nullSafeEval(h: Any): Any = {
    val s = h.asInstanceOf[UTF8String]
    val n = math.min(s.numBytes, 64)
    var mask = 0L
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return null
      mask |= (v & 1).toLong << i
      i += 1
    }
    java.lang.Long.valueOf(mask)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mask = ctx.freshName("mask")
      val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = java.lang.Math.min($h.numBytes(), 64);
         |long $mask = 0L;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $c = $h.getByte($i);
         |  int $v;
         |  if ($c >= '0' && $c <= '9') { $v = $c - '0'; }
         |  else if ($c >= 'a' && $c <= 'f') { $v = $c - 'a' + 10; }
         |  else if ($c >= 'A' && $c <= 'F') { $v = $c - 'A' + 10; }
         |  else { $bad = true; break; }
         |  $mask |= ((long) ($v & 1)) << $i;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $mask;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HexParityMask =
    copy(child = newChild)
}
