package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives. Everything here is built from codegen'd
  * built-ins (no UDFs) and is deliberately expressible 1:1 in ANSI/DuckDB
  * SQL so the driver's oracle can replay the exact same computation.
  *
  * Reference: tokenization/cleaning behaviors trace to the order-flatten
  * layer of the reference (extract-app/app.py:37-98) — e.g. digit-strip
  * (app.py:42) — generalized here for the documents table.
  */
object TextFunctions {

  /** Deterministic engine-independent bucketing: md5 of the value's
    * string form, first 15 hex digits as a long, mod `m`. THE shared
    * hash discipline for split assignment, pack sharding, and skew-block
    * splitting — one definition, so the Spark operators and the generated
    * oracle SQL (`('0x' || substring(md5(x::VARCHAR), 1, 15))::BIGINT %
    * m`) cannot drift apart per call site. */
  def md5Mod(c: Column, m: Column): Column =
    pmod(conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long"), m)

  /** Raw single-space split. Keeps empty tokens so that shingle indexing is
    * bit-identical to DuckDB's string_split. */
  def rawTokens(text: Column): Column = split(text, " ")

  /** Whitespace tokens with empties dropped (token-count semantics). */
  def tokens(text: Column): Column = filter(rawTokens(text), t => t =!= "")

  /** Word n-gram shingles over raw tokens, 1-based indexing.
    * Caller MUST pre-filter size(toks) >= n: Spark's `sequence(1, x)` with
    * x < 1 would generate a descending range, not an empty one. */
  def shingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))

  /** [[shingles]] guarded for short docs: empty array when size(toks) < n,
    * so an `explode` simply emits no rows for them. Exists because the
    * `.filter(size(ts) >= n)` guard the explode sites used gets PUSHED
    * BELOW the token-staging projection by Catalyst, substituting ts back
    * to split(text) — the corpus was tokenized TWICE per row (once in the
    * pushed filter, once in the projection; codegen does not eliminate
    * subexpressions across operators). Guarding inside the generator
    * expression over the staged column keeps one split per row and the
    * identical output (short docs are absent either way). */
  def shinglesOrEmpty(toks: Column, n: Int): Column =
    when(size(toks) >= n, shingles(toks, n))
      .otherwise(typedLit(Seq.empty[String]))

  /** Deterministic cross-engine token hash: ascii(first ASCII char)*31 +
    * length. `ascii`/`length` agree between Spark and DuckDB only on ASCII
    * input (Spark returns the first UTF-8 BYTE, DuckDB the code point), so
    * non-printable-ASCII chars are stripped before the ascii() probe; the
    * length term still covers the full token, keeping distinct non-ASCII
    * tokens likely-distinct. */
  def tokenHash(t: Column): Column =
    (ascii(substring(regexp_replace(t, "[^ -~]", ""), 1, 1)) * 31 + length(t))
      .cast("long")

  /** Polynomial rolling hash (document fingerprint): fold over token hashes,
    * acc*131 + h (mod 1e9+7). Max intermediate 1.4e11 << Long.Max. */
  def rollingFingerprint(toks: Column): Column =
    aggregate(transform(toks, t => tokenHash(t)), lit(0L),
      (acc, h) => (acc * lit(131L) + h) % lit(1000000007L))

  /** Count of tokens contained in a fixed word set (language-ID / quality
    * signals). */
  def wordSetCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** Longest CONSECUTIVE integer run in a position array (sorted
    * internally) — THE one definition of the gaps-and-islands fold shared
    * by the contamination-run and self-repeat-run operators, replayed in
    * SQL as `pos - ROW_NUMBER() OVER (PARTITION BY ... ORDER BY pos)`
    * islands. One ordered array pass; state is three longs. Empty
    * arrays fold to 0. */
  def longestConsecutiveRun(positions: Column): Column =
    aggregate(
      sort_array(positions),
      struct(lit(-2L).as("prev"), lit(0L).as("cur"), lit(0L).as("best")),
      (st, p) => {
        val cur = when(p === st.getField("prev") + 1L,
          st.getField("cur") + 1L).otherwise(1L)
        struct(p.as("prev"), cur.as("cur"),
          greatest(st.getField("best"), cur).as("best"))
      },
      st => st.getField("best"))
}
