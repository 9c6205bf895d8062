package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** detRound — the engine-independent final round (see NumericFunctions:
  * ROUND diverges between engines exactly at representation-ambiguous
  * half boundaries; the floor form is pure IEEE arithmetic). */
class NumericFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def r4(x: java.lang.Double): java.lang.Double =
    Seq(Tuple1(x)).toDF("x")
      .select(NumericFunctions.detRound(col("x"), 4).as("r"))
      .collect().head.getAs[java.lang.Double]("r")

  test("the sf1.0 x37 knife row: -91.83375/27 rounds DOWN-in-magnitude on both spellings") {
    // exact rational -3.40125; nearest double is -3.4012499999999997,
    // BELOW the half — the floor form reads the binary value and gives
    // -3.4012 (Spark's ROUND agreed; DuckDB's ROUND snapped to the
    // 15-digit print and said -3.4013 — the divergence this fixes)
    assert(r4(-91.83375 / 27) == -3.4012)
    assert(r4(91.83375 / 27) == 3.4013)  // floor form: halves toward +∞
  }

  test("clean values round as ROUND would; nulls pass through") {
    assert(r4(1.23456) == 1.2346)
    assert(r4(-1.23454) == -1.2345)
    assert(r4(0.0) == 0.0)
    assert(r4(null) == null)
  }

  test("scale 6 and the SQL spelling agree with the Scala spelling by construction") {
    val out = Seq(Tuple1(0.1234565)).toDF("x")
      .select(NumericFunctions.detRound(col("x"), 6).as("a"))
      .selectExpr("a", NumericFunctions.detRoundSql("a", 6) + " AS b")
      .collect().head
    assert(out.getDouble(0) == out.getDouble(1))
  }

  test("|detRound(x,4) - x| never exceeds half a unit in the last place rounded") {
    val xs = Seq(-3.40125, 2.71828, -0.00005, 12345.00004999, -9999.99995)
    xs.foreach { x =>
      val r = r4(x)
      assert(math.abs(r - x) <= 0.5e-4 + math.ulp(12345.0), s"x=$x r=$r")
    }
  }
}
