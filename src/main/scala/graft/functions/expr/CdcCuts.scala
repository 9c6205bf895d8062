package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Codegen'd content-defined-chunking cut finder: ONE pass over a binary
  * payload returning the ascending cut-offset array `[0, c1, c2, …]` —
  * offset `i` (0-based, `window <= i < length`) is a cut iff the
  * fingerprint of the bytes ENDING at `i` is ≡ 0 (mod `mask`).
  *
  * TWO fingerprints, selected by `gear`:
  *
  *  - `gear = false` (default, the ORACLE path): the fingerprint of the
  *    `window` bytes ending at `i`, bit-identical to the SQL formulation
  *    the DuckDB oracle replays — `conv(substring(md5(win), 1, 15), 16,
  *    10) % mask`, i.e. the top 60 bits of the window's MD5 — so
  *    swapping this expression under `Multimodal.cdcChunks` changes the
  *    PLAN, never a cut (spec- and oracle-pinned). Digest work is
  *    O(n·window) MD5 bytes, the price of cross-engine replayability.
  *
  *  - `gear = true` (the PRODUCTION fingerprint): a Gear rolling hash
  *    (FastCDC's fingerprint; public-textbook CDC) — `h = (h << 1) +
  *    G[byte]`, cut iff `h mod mask == 0` (unsigned). O(n) TOTAL: one
  *    table lookup, one shift, one add per byte. The 64-bit shift means
  *    `h` depends only on the last 64 bytes, which IS the resync
  *    property: an insertion stops perturbing cuts 64 bytes downstream
  *    (spec fuzz-pinned). `G` derives from a fixed seed via splitmix64,
  *    so cuts are deterministic across JVMs and sessions — same
  *    reproducibility contract as the md5 path, different engine cost.
  *    `window` keeps its role as the minimum cut offset.
  *
  * Why an Expression (either mode): the SQL formulation explodes one row
  * PER BYTE (`sequence(window, n_bytes)`), fingerprints each, and
  * re-assembles segments with a per-doc LEAD window — a |payload bytes|-
  * row explode plus a window shuffle for what is one local scan. This
  * loop emits only the cut array (output-sized), inside whole-stage
  * codegen; downstream segment zipping and maxChunk splitting stay
  * narrow array ops. Cuts per payload are ~n_bytes/mask, so the array is
  * bounded and small. */
case class CdcCuts(child: Expression, window: Int, mask: Int,
                   gear: Boolean = false)
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
    if (gear) CdcCuts.computeGear(content.asInstanceOf[Array[Byte]], window, mask)
    else CdcCuts.compute(content.asInstanceOf[Array[Byte]], window, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (gear) "computeGear" else "compute"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.CdcCuts.$fn($c, $window, $mask);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The md5-window cut loop (also the codegen target — Scala emits a
    * static forwarder, so generated Java calls it directly). */
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

  /** 256-entry Gear table from splitmix64 over a FIXED seed (a pi-digit
    * constant — nothing up the sleeve): deterministic across JVMs, no
    * dependence on java.util.Random's sequence contract. */
  private[graft] val gearTable: Array[Long] = {
    var x = 0x243F6A8885A308D3L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  /** The Gear rolling-hash cut loop (codegen target, cf. [[compute]]):
    * same cut-offset contract — cuts in `[window, nb)`, leading 0
    * sentinel — different fingerprint. Unsigned modulus: `h` uses all 64
    * bits, and a signed `%` would silently halve the cut rate on
    * negative hashes. */
  def computeGear(content: Array[Byte], window: Int, mask: Int): ArrayData = {
    val nb = content.length
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    out += 0L
    var h = 0L
    var i = 0
    while (i < nb) {
      h = (h << 1) + gearTable(content(i) & 0xff)
      val pos = i + 1 // bytes consumed; a cut at nb would be the trailing
                      // boundary, which the segment zip supplies itself
      if (pos >= window && pos < nb &&
          java.lang.Long.remainderUnsigned(h, mask) == 0L) out += pos.toLong
      i += 1
    }
    new GenericArrayData(out.result())
  }
}
