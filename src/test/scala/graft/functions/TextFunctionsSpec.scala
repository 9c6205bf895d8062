package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(Option(text)).toDF("t").select(c).collect().head.getAs[T](0)

  test("tokens drops empties; rawTokens keeps them") {
    val df = Seq("a  b", "", "x").toDF("t")
    val got = df.select(size(tokens(col("t"))).as("n"), size(rawTokens(col("t"))).as("r"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // "a  b" splits to [a, "", b]; "" splits to [""]
    assert(got == Seq((2, 3), (0, 1), (1, 1)))
  }

  test("shingles: n-grams over raw tokens, count = len - n + 1") {
    val df = Seq("a b c d").toDF("t")
    val got = df.select(shingles(rawTokens(col("t")), 3).as("s"))
      .collect().head.getSeq[String](0)
    assert(got == Seq("a b c", "b c d"))
  }

  test("tokenHash is ASCII-stable: non-ASCII first chars are skipped") {
    // "ñata": first printable-ASCII char after strip is 'a' (97);
    // length counts the ORIGINAL token (4).
    assert(one[Long](tokenHash(col("t")), "ñata") == 97L * 31 + 4)
    // plain ascii token
    assert(one[Long](tokenHash(col("t")), "cat") == 99L * 31 + 3)
    // token with NO ascii chars: ascii('') = 0, hash = length only
    assert(one[Long](tokenHash(col("t")), "ñé") == 2L)
  }

  test("rollingFingerprint: empty token list folds to 0, order-sensitive") {
    val fp = (t: String) => one[Long](rollingFingerprint(tokens(col("t"))), t)
    assert(fp("") == 0L)
    assert(fp("ab cd") != fp("cd ab"))
    assert(fp("ab cd") == (((97L * 31 + 2) * 131) + (99L * 31 + 2)) % 1000000007L)
  }

  test("wordSetCount counts occurrences of set members") {
    assert(one[Long](wordSetCount(tokens(col("t")), Seq("the", "of")), "the cat of the") == 3L)
  }
}
