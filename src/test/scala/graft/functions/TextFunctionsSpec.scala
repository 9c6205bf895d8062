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

  test("tfidfTopTerms: rare terms outrank ubiquitous ones; k bounds output") {
    val docs = Seq(
      (1L, "shared shared rare1"),
      (2L, "shared shared rare2"),
      (3L, "shared unique unique unique")
    ).toDF("doc_id", "text")
    val top = graft.operators.TextAnalysis.tfidfTopTerms(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // "shared" appears in every doc -> idf = ln(1) = 0: it can only trail
    // (docs here have just 2 distinct terms, so k=2 still includes it)
    assert(top.filter(_._2 == "shared").forall(_._3 == 0.0))
    val byDoc = top.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 2))
    // the TOP term per doc is always the rare one, never the ubiquitous one
    assert(byDoc.values.forall(_.maxBy(_._3)._2 != "shared"))
    // doc 3: unique (tf=3, df=1) scores 3*ln(3)
    val u = top.find(t => t._1 == 3L && t._2 == "unique").get
    assert(math.abs(u._3 - math.rint(3 * math.log(3) * 10000) / 10000) < 1e-9)
  }

  test("deterministicSplit: partition-independent, exhaustive, near 90/5/5") {
    val docs = (1L to 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = graft.operators.TextAnalysis.deterministicSplit(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.operators.TextAnalysis.deterministicSplit(docs.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)                      // same doc -> same split, always
    assert(a.size == 1000)
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 850 && counts("train") < 950)
    assert(counts("val") > 20 && counts("val") < 90)
    assert(counts("test") > 20 && counts("test") < 90)
  }
}
