package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Codegen'd content-defined-chunking cut finder: ONE pass over a binary
  * payload returning the ascending cut-offset array `[0, c1, c2, …]` —
  * offset `i` (0-based, `window <= i < length`) is a cut iff the
  * fingerprint of the `window` bytes ENDING at `i` is ≡ 0 (mod `mask`).
  *
  * The fingerprint is bit-identical to the SQL formulation the DuckDB
  * oracle replays — `conv(substring(md5(win), 1, 15), 16, 10) % mask`,
  * i.e. the top 60 bits of the window's MD5 — so swapping this
  * expression under `Multimodal.cdcChunks` changes the PLAN, never a
  * cut (spec- and oracle-pinned).
  *
  * Why an Expression: the SQL formulation explodes one row PER BYTE
  * (`sequence(window, n_bytes)`), fingerprints each via string md5, and
  * re-assembles segments with a per-doc LEAD window — a |payload bytes|-
  * row explode plus a window shuffle for what is one local scan. This
  * loop emits only the cut array (output-sized), inside whole-stage
  * codegen, with the digest reused across positions; downstream segment
  * zipping and maxChunk splitting stay narrow array ops. Cuts per
  * payload are ~n_bytes/mask, so the array is bounded and small.
  *
  * Same-cost caveat, stated honestly: the digest work is still
  * O(n·window) MD5 bytes — identical to the SQL's — because cut PARITY
  * with the oracle pins the fingerprint; a true rolling hash (Gear/
  * Rabin, O(n) total) is the production fingerprint once cross-engine
  * replay is no longer the constraint. What this expression removes is
  * the per-byte ROW machinery: the explode, the shuffle-backed LEAD
  * window, and the per-position string round-trips. */
case class CdcCuts(child: Expression, window: Int, mask: Int)
    extends UnaryExpression {
  require(window >= 1 && mask >= 2, "degenerate CDC parameters")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_cuts expects BINARY content, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override def nullSafeEval(content: Any): Any =
    CdcCuts.compute(content.asInstanceOf[Array[Byte]], window, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.CdcCuts.compute($c, $window, $mask);")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The cut loop (also the codegen target — Scala emits a static
    * forwarder, so generated Java calls it directly). */
  def compute(content: Array[Byte], window: Int, mask: Int): ArrayData = {
    val nb = content.length
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    out += 0L // sentinel: the first segment always starts at offset 0
    val md = md5.get()
    var i = window
    while (i < nb) {
      md.reset()
      md.update(content, i - window, window)
      val d = md.digest()
      // top 60 bits of the digest = conv(substring(hex, 1, 15), 16, 10)
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      if (v % mask == 0L) out += i.toLong
      i += 1
    }
    new GenericArrayData(out.result())
  }
}
