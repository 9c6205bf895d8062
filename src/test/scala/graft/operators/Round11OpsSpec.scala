package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 operators: exact-substring contamination runs, behavioral
  * profile twins, data-constrained epoch planning, code-switch
  * segmentation, hash-sample calibration, and block-fingerprint binary
  * near-dup — each pinned against a hand fixture or a driver-side
  * reference. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- contaminationRuns (x138) --------------------------------------

  private val benchDocs = Seq(
    (100L, "q w e r t y u i", "en", "bench")
  ).toDF("doc_id", "text", "lang", "source")

  test("contaminationRuns: a copied contiguous passage flags; scattered hits do not") {
    val docs = Seq(
      // "q w e r t y" copied -> trigram run 4 -> 6 source tokens -> flagged
      (1L, "aa bb q w e r t y cc", "en", "s"),
      // two isolated bench trigrams with a gap -> longest run 1 (3 tokens)
      (2L, "q w e zz ss r t y", "en", "s"),
      // clean doc
      (3L, "mm nn oo pp", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Dedup.contaminationRuns(docs, benchDocs, n = 3, minRunTokens = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) === ((7L, 4L, 4L, 6L, true)))
    assert(out(2L) === ((6L, 2L, 1L, 3L, false)))
    assert(out(3L) === ((2L, 0L, 0L, 0L, false)))
  }

  test("contaminationRuns: repeated matched shingles count with multiplicity, runs need adjacency") {
    // trigrams: [q w e][w e q][e q w][q w e] -> matched at pos 0 and 3
    val docs = Seq((1L, "q w e q w e", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Dedup.contaminationRuns(docs, benchDocs, n = 3).collect()
    assert(out.length === 1)
    val r = out(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 2L, 1L)))
  }

  test("contaminationRuns: docs below n tokens are absent; fully copied doc runs its whole length") {
    val docs = Seq(
      (1L, "q w", "en", "s"),
      (2L, "q w e r t y u i", "en", "s") // the bench doc verbatim: 6 trigrams
    ).toDF("doc_id", "text", "lang", "source")
    val out = Dedup.contaminationRuns(docs, benchDocs, n = 3).collect()
    assert(out.length === 1 && out(0).getLong(0) === 2L)
    assert(out(0).getLong(3) === 6L && out(0).getLong(4) === 8L)
    assert(out(0).getBoolean(5))
  }

  // ---- profileTwins (x140) -------------------------------------------

  private def ev(rows: (Long, String)*) =
    rows.map { case (u, t) => (u, t) }.toDF("user_id", "event_type")

  test("profileTwins: same quantized mix at different volumes collides; different mix stays singleton") {
    val events = ev(
      (1L, "a"), (1L, "b"),                                  // 0.5 / 0.5
      (2L, "a"), (2L, "a"), (2L, "a"), (2L, "a"), (2L, "a"), // 0.5 / 0.5
      (2L, "b"), (2L, "b"), (2L, "b"), (2L, "b"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "b"), (3L, "b")             // 0.3 / 0.8
    )
    val out = Relational.profileTwins(events, col("user_id"), col("event_type"))
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      === ((2L, 1L, 2L, 2L, 12L)))
  }

  test("profileTwins: count partials fold additively — any batch split yields the batch report") {
    val all = ev(
      (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "b"), (2L, "b"),
      (3L, "c"), (3L, "c"))
    val batch = Relational.profileTwins(all, col("user_id"), col("event_type"))
      .collect().map(_.toSeq).toSet
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id").as("key"), col("event_type").as("etype"))
        .groupBy(col("key"), col("etype")).agg(count(lit(1)).as("c"))
    // split mid-user: user 2's events straddle the batch boundary
    val b1 = ev((1L, "a"), (1L, "b"), (1L, "b"), (2L, "a"))
    val b2 = ev((2L, "b"), (2L, "b"), (3L, "c"), (3L, "c"))
    val folded = counts(b1).unionByName(counts(b2))
      .groupBy(col("key"), col("etype")).agg(sum(col("c")).as("c"))
    val incr = Relational.profileTwinsFromCounts(folded)
      .collect().map(_.toSeq).toSet
    assert(incr === batch && batch.nonEmpty)
  }

  test("profileTwins: prefix-related type names fingerprint consistently (combined-entry ordering)") {
    // types "a" and "a!" — ':' (58) vs '!' (33) would reorder under
    // type-only ordering; the combined-entry order must be stable
    val events = ev(
      (1L, "a"), (1L, "a!"),
      (2L, "a"), (2L, "a!"))
    val out = Relational.profileTwins(events, col("user_id"), col("event_type"))
      .collect()
    assert(out.length === 1 && out(0).getLong(1) === 2L)
  }
}
