package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkSpec}

class HexParityMaskSpec extends SparkSpec {
  import spark.implicits._

  /** Reference mask: bit i = parity of hex digit i. */
  private def refMask(hex: String): Long =
    hex.take(64).zipWithIndex.foldLeft(0L) { case (m, (c, i)) =>
      m | ((Character.digit(c, 16) & 1).toLong << i)
    }

  test("mask is bit-identical to the reference over md5 and sha2 hex") {
    val df = (1 to 200).map(i => s"token_$i").toDF("t")
      .select(col("t"), md5(col("t")).as("h32"), sha2(col("t"), 256).as("h64"))
    val rows = df.select(col("h32"), col("h64"),
        GraftFunctions.hexParityMask(df, col("h32")).as("m32"),
        GraftFunctions.hexParityMask(df, col("h64")).as("m64"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == refMask(r.getString(0)), s"md5 mask for ${r.getString(0)}")
      assert(r.getLong(3) == refMask(r.getString(1)), s"sha2 mask for ${r.getString(1)}")
    }
    // md5 masks use only the low 32 bits — the unused votes must be zero
    assert(rows.forall(r => (r.getLong(2) >>> 32) == 0L))
  }

  test("uppercase hex accepted; non-hex input nulls the result; >64 digits ignored") {
    val df = Seq("ABCDEF09", "abcdef09", "xyz", "f" * 80).toDF("h")
    val out = df.select(GraftFunctions.hexParityMask(df, col("h")).as("m")).collect()
    assert(out(0).getLong(0) == out(1).getLong(0)) // case-insensitive
    assert(out(2).isNullAt(0))                     // malformed must not vote
    assert(out(3).getLong(0) == -1L)               // 64 odd digits = all bits set
  }

  test("the expression runs inside whole-stage codegen") {
    val df = spark.range(4).select(md5(col("id").cast("string")).as("h"))
    val q = df.select(GraftFunctions.hexParityMask(df, col("h")))
    val codegen = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("Found 1 WholeStageCodegen subtrees"), codegen)
  }
}
