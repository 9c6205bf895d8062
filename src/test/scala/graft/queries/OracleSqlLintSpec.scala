package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Static lint over the DuckDB oracle SQL — pins the two round-12
  * disciplines that sf1.0 forced, so a future "simplification" cannot
  * silently reopen them (the driver gate at sf0.01 would stay green;
  * only a large-scale replay would catch the regression):
  *
  *  1. NO engine `ROUND` over a rational quotient. `ROUND(double, s)`
  *     is engine-defined exactly where the rounded value is a quotient
  *     of exact sums/counts that lands on (or prints next to) a half
  *     boundary — those sites must use the detRound FLOOR spelling
  *     (see `NumericFunctions`). Rounds whose argument goes through an
  *     irrational function (ln/sqrt/exp/pow/quantile interpolation)
  *     keep engine ROUND: a dyadic double cannot EQUAL a non-dyadic
  *     half, so only the measure-zero print-disagreement class remains
  *     there.
  *
  *  2. Shared heavy CTE chains stay `AS MATERIALIZED`. DuckDB INLINES
  *     WITH-chain CTEs per reference; x90's five unrolled power-
  *     iteration rounds re-expanded the whole shingle→minhash→band
  *     pipeline dozens of times (15 GB spill, OOM under the capped
  *     harness), and x67's two-branch union doubled the exact-Jaccard
  *     chain the same way. */
class OracleSqlLintSpec extends AnyFunSuite {

  /** Balanced-paren argument of each ROUND( occurrence, up to the
    * top-level scale comma (or the whole body for scale-less round). */
  private def roundArgs(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val up = sql
    var i = up.indexOf("ROUND(")
    while (i >= 0) {
      var depth = 1
      var j = i + "ROUND(".length
      val start = j
      var cut = -1
      while (j < up.length && depth > 0) {
        up.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' => if (depth == 1 && cut < 0) cut = j
          case _   =>
        }
        j += 1
      }
      out += up.substring(start, if (cut >= 0) cut else j - 1)
      i = up.indexOf("ROUND(", j)
    }
    out.result()
  }

  // markers that make a divided ROUND argument irrational (or already
  // interpolation-granular) and therefore legitimately engine-rounded
  private val irrational =
    Seq("ln(", "log(", "sqrt(", "exp(", "pow(", "quantile", "PERCENT_RANK",
      "/ nrm") // nrm is a sqrt alias (x160's component normalization)

  test("no oracle ROUND rounds a rational quotient (detRound class)") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        roundArgs(sql)
          .filter(a => a.contains("/"))
          .filterNot(a => irrational.exists(a.contains))
          .map(a => s"$name: ROUND(${a.take(90)}...)")
    }
    assert(offenders.isEmpty,
      s"rational-quotient ROUND must use the detRound FLOOR form:\n  ${offenders.mkString("\n  ")}")
  }

  test("heavy shared CTE chains are AS MATERIALIZED") {
    val expect = Map(
      // pageRank family: sig/bands (LSH root) + pairs/edges/deg
      "x90_pagerank" -> 5,
      // textRank: its own tedges + prefixed tdeg (+ nothing from LSH)
      "x101_textrank" -> 2,
      // CC family rides pairs/edges + the LSH root
      "x21_cc_dedup" -> 4,
      // exact-Jaccard chain: shi/inter/card
      "x10_ngram_jaccard" -> 3,
      "x67_containment" -> 3,
      // x128 = LSH root (sig/bands) + jaccard chain (shi/inter/card)
      "x128_est_error" -> 5)
    expect.foreach { case (name, n) =>
      val c = "AS MATERIALIZED".r.findAllIn(SparkEntry.oracleSql(name)).size
      assert(c >= n, s"$name: expected >= $n MATERIALIZED CTEs, found $c")
    }
  }

  test("the detRound FLOOR spelling is present where sf1.0 diverged") {
    // the five knife-edge queries + the three resource-class queries
    Seq("x37_unigram_lm", "x41_bigram_lm", "x84_perplexity_buckets",
      "x158_lm_quality_corr", "x154_len_quality_corr",
      "x10_ngram_jaccard", "x67_containment", "x128_est_error",
      "oq07_agg_suite").foreach { name =>
      assert(SparkEntry.oracleSql(name).contains("FLOOR(("),
        s"$name lost its detRound FLOOR form")
    }
  }
}
