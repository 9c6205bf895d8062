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

  // ---- epochPlan (x139) ----------------------------------------------

  test("epochPlan: under-allocation is fully effective; repetition discounts by the fitted form; unmapped is null") {
    // u=10 tokens per source (10 single-char tokens)
    val text = (1 to 10).map(_ => "t").mkString(" ")
    val docs = Seq(
      (1L, text, "en", "cold"),  // share 0.05 of 100 -> alloc 5  <= u
      (2L, text, "en", "hot"),   // share 0.50 of 100 -> alloc 50 -> 5 epochs
      (3L, text, "en", "unmapped")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.epochPlan(docs, col("source"),
        size(split(col("text"), " ")).cast("long"),
        Map("cold" -> 0.05, "hot" -> 0.5), budget = 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    val cold = out("cold")
    assert(cold.getLong(4) === 5L && cold.getDouble(5) === 5.0)
    assert(cold.getDouble(6) === 1.0)
    val hot = out("hot")
    assert(hot.getDouble(3) === 5.0 && hot.getLong(4) === 50L)
    // driver-side reference: U*(1 + R*(1 - exp(-R/R*))), R = 4, R* = 15.4
    val expected = 10.0 * (1.0 + 15.4 * (1.0 - math.exp(4.0 * (-1.0 / 15.4))))
    assert(math.abs(hot.getDouble(5) - expected) < 0.005)
    assert(hot.getDouble(6) < 1.0)
    val un = out("unmapped")
    assert(un.isNullAt(2) && un.isNullAt(4) && un.isNullAt(5) && un.isNullAt(6))
  }

  test("epochPlan: efficiency decreases monotonically with epochs at fixed u") {
    val text = (1 to 10).map(_ => "t").mkString(" ")
    val docs = Seq(
      (1L, text, "en", "a"), (2L, text, "en", "b"), (3L, text, "en", "c")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.epochPlan(docs, col("source"),
        size(split(col("text"), " ")).cast("long"),
        Map("a" -> 0.2, "b" -> 0.4, "c" -> 0.8), budget = 500L)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(6))).toMap
    assert(out("a")._1 < out("b")._1 && out("b")._1 < out("c")._1)
    assert(out("a")._2 > out("b")._2 && out("b")._2 > out("c")._2)
  }

  // ---- piiPrevalence (x162) / nullProfile (x163) ---------------------

  test("piiPrevalence: emails and long numbers roll per source; clean feeds read zero") {
    val docs = Seq(
      (1L, "contact me at a.b@example.com or 555-123 4567 x", "en", "dirty"),
      (2L, "nothing personal here at all", "en", "dirty"),
      (3L, "clean text only", "en", "clean")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.piiPrevalence(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out("dirty") === ((2L, 1L, 0.5, 1L, 1L)))
    assert(out("clean") === ((1L, 0L, 0.0, 0L, 0L)))
    assert(1.0 / out("clean")._3 > 0)
  }

  test("nullProfile: one pass, per-column null rates; all-null and no-null columns both report") {
    val df = Seq(
      (Some(1L), None: Option[String], "x"),
      (None, None, "y"),
      (Some(3L), None, "z")
    ).toDF("a", "b", "c")
    val out = Relational.nullProfile(df, Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") === ((3L, 1L, 0.333333)))
    assert(out("b") === ((3L, 3L, 1.0)))
    assert(out("c") === ((3L, 0L, 0.0)))
  }

  // ---- packedDupColocation (x167) ------------------------------------

  test("packedDupColocation: same-bin near-dups flag; a budget that splits them clears the alarm") {
    val mirror = (1 to 10).map(i => s"m$i").mkString(" ")
    val docs = Seq(
      (1L, mirror, "en", "s"), (2L, mirror, "en", "s"),
      (3L, (1 to 10).map(i => s"u$i").mkString(" "), "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    // one shard, budget >= both docs -> mirrors share a bin
    val hot = Dedup.packedDupColocation(docs, pairs,
      budgetTokens = 100L, shards = 1).collect()(0)
    assert((hot.getLong(1), hot.getLong(2)) === ((1L, 1L)))
    // budget of one doc -> every doc its own bin -> clean
    val cold = Dedup.packedDupColocation(docs, pairs,
      budgetTokens = 10L, shards = 1).collect()(0)
    assert((cold.getLong(1), cold.getLong(2)) === ((0L, 0L)))
    // no pair graph -> zeros with the bin count intact
    val none = Dedup.packedDupColocation(docs,
      Seq.empty[(Long, Long)].toDF("a_id", "b_id"),
      budgetTokens = 100L, shards = 1).collect()(0)
    assert(none.getLong(0) >= 1L && none.getLong(1) === 0L && none.getLong(2) === 0L)
  }

  // ---- hashUniformity (x166) -----------------------------------------

  test("hashUniformity: matches the driver-side chi-square including empty-bucket mass") {
    val df = (1L to 200L).map(Tuple1(_)).toDF("k")
    val b = 8
    val out = Relational.hashUniformity(df, col("k"), buckets = b).collect()(0)
    // driver-side reference over the SAME md5Mod assignment
    val got = df.select(graft.functions.TextFunctions.md5Mod(col("k"), lit(b)).as("bk"))
      .groupBy("bk").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = 200.0 / b
    val chi = got.values.map { c =>
      BigDecimal((c - e) * (c - e) / e).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble + (b - got.size) * e
    val expected = BigDecimal(chi).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getLong(0) === 200L && out.getDouble(4) === expected)
    assert(out.getLong(1) === got.size.toLong)
  }

  test("hashUniformity: a single row yields the closed-form chi-square whatever bucket it lands in") {
    val out = Relational.hashUniformity(Seq(Tuple1(42L)).toDF("k"), col("k"),
      buckets = 4).collect()(0)
    // one bucket holds 1 (term (1-.25)^2/.25 = 2.25), three empty add .25 each
    assert(out.getDouble(4) === 3.0)
  }

  // ---- fkOrphanAudit (x164) / valueProfile (x165) --------------------

  test("fkOrphanAudit: orphans count with multiplicity and distinctly; null keys are out of scope") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Relational.fkOrphanAudit(child, col("k"), parent, col("pk"))
      .collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getDouble(2), out.getLong(3))
      === ((5L, 2L, 0.4, 1L)))
  }

  test("valueProfile: decimal-exact mean, median, extremes; all-null groups surface null stats") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(6.0)),
      ("b", None: Option[Double]), ("b", None)
    ).toDF("g", "v")
    val out = Relational.valueProfile(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) === 3L && a.getLong(2) === 0L)
    assert(a.getDouble(3) === 3.0 && a.getDouble(4) === 2.0)
    assert(a.getDouble(5) === 1.0 && a.getDouble(6) === 6.0)
    val b = out("b")
    assert(b.getLong(2) === 2L && b.isNullAt(3) && b.isNullAt(4))
  }

  // ---- pairDiffThirds (x161) -----------------------------------------

  test("pairDiffThirds: front-only boilerplate overlap vs full-mirror overlap route differently") {
    val boiler = (1 to 12).map(_ => "subscribe now terms apply").mkString(" ") // shared front
    val docs = Seq(
      (1L, boiler + " " + (1 to 48).map(i => s"a$i").mkString(" "), "en", "s"),
      (2L, boiler + " " + (1 to 48).map(i => s"b$i").mkString(" "), "en", "s"),
      (3L, (1 to 90).map(i => s"m$i").mkString(" "), "en", "s"),
      (4L, (1 to 90).map(i => s"m$i").mkString(" "), "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a_id", "b_id")
    val out = Dedup.pairDiffThirds(docs, pairs, n = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2))) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // boilerplate pair: front third fully shared, tail third disjoint
    val front = out((1L, 2L, 0L))
    assert(front._2 === front._1 && front._1 > 0, s"front must be fully shared: $front")
    val tail = out((1L, 2L, 2L))
    assert(tail._2 === 0L && tail._4 === 0L, s"tail must be disjoint: $tail")
    // mirror pair: every third fully shared on both sides
    (0L to 2L).foreach { t =>
      val m = out((3L, 4L, t))
      assert(m._1 === m._2 && m._3 === m._4 && m._1 > 0, s"mirror third $t: $m")
    }
  }

  test("pairDiffThirds: docs outside the pair set cannot affect the report (restriction equivalence)") {
    // the operator restricts its positional-shingle explode to docs that
    // appear in a pair (r16); this pins the invariant that makes the
    // restriction bit-identical — including an extra doc that SHARES
    // every shingle with the paired docs (a global stat leak would move
    // the shared counts) and an unrelated one
    val w30 = (1 to 30).map(i => s"w$i").mkString(" ")
    val base = Seq((1L, w30), (2L, w30)).toDF("doc_id", "text")
    val extra = Seq((3L, w30), (4L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    def rows(docs: org.apache.spark.sql.DataFrame) =
      Dedup.pairDiffThirds(docs, pairs, n = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(rows(base.unionByName(extra)) === rows(base))
  }

  // ---- anisotropy (x160) ---------------------------------------------

  test("anisotropy: a collapsed cone reads ~1, an even one-hot basis reads 1/d; zero vectors are excluded") {
    val collapsed = (1L to 20L).map(i => (i, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val c = Similarity.anisotropy(collapsed).collect()(0)
    assert(c.getLong(0) === 20L && c.getLong(1) === 4L)
    assert(c.getDouble(2) === 1.0)
    // 4 dims, each used 5 times -> per-dim mean unit component 1/4 ->
    // anisotropy = 4 * (1/4)^2 = 0.25
    val oneHot = (0L until 20L).map { i =>
      val v = Array.fill(4)(0.0f); v((i % 4).toInt) = 1.0f
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val o = Similarity.anisotropy(oneHot).collect()(0)
    assert(o.getDouble(2) === 0.25)
    // a zero vector must not poison the norms
    val withZero = collapsed.unionByName(
      Seq((99L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val z = Similarity.anisotropy(withZero).collect()(0)
    assert(z.getLong(0) === 20L && z.getDouble(2) === 1.0)
  }

  // ---- selfLoopShare (x159) ------------------------------------------

  test("selfLoopShare: the diagonal share of the transition matrix; types with no outgoing hops are absent") {
    val rows = Seq(
      (1L, 1L, "2026-01-01 10:00:00", "a"),
      (1L, 2L, "2026-01-01 10:01:00", "a"),   // a -> a
      (1L, 3L, "2026-01-01 10:02:00", "b"),   // a -> b
      (2L, 4L, "2026-01-01 10:00:00", "b")    // terminal: no outgoing
    )
    val events = rows.toDF("user_id", "event_id", "s", "event_type")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Relational.selfLoopShare(events, col("user_id"),
        Seq(col("ts"), col("event_id")), col("event_type"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map("a" -> ((2L, 1L, 0.5))))
  }

  // ---- dedupStrategyAudit (x156) / detectorAgreement (x157) ----------

  test("dedupStrategyAudit: a star graph prices greedy == CC; a chain shows the extra docs greedy keeps") {
    val docs = (1L to 5L).map(i => (i, s"doc $i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    // star: (1,2),(1,3) — greedy drops {2,3}, CC keeps min 1 -> equal
    val star = Seq((1L, 2L), (1L, 3L)).toDF("a_id", "b_id")
    val s1 = Dedup.dedupStrategyAudit(docs, star).collect()(0)
    assert((s1.getLong(2), s1.getLong(3), s1.getLong(4)) === ((3L, 3L, 0L)))
    // chain via shared sink: (1,3),(2,3) — greedy keeps {1,2,4,5}, CC {1,4,5}
    val chain = Seq((1L, 3L), (2L, 3L)).toDF("a_id", "b_id")
    val s2 = Dedup.dedupStrategyAudit(docs, chain).collect()(0)
    assert((s2.getLong(2), s2.getLong(3), s2.getLong(4)) === ((4L, 3L, 1L)))
    assert(s2.getBoolean(5), "a 2-pair graph must converge")
  }

  test("dedupStrategyAudit: a non-converged CC pass is SURFACED, not read as extra_greedy = 0") {
    val docs = (1L to 12L).map(i => (i, s"doc $i", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    // an 11-hop chain: exactly the long-chain corpus the audit exists
    // for — under a starved iteration cap the CC side falls back to
    // greedy, and BEFORE round 9 that read as extra_greedy = 0
    // ("greedy is free") with nothing marking the lie
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val starved = Dedup.dedupStrategyAudit(docs, chain, maxIters = 1).collect()(0)
    assert(!starved.getBoolean(5), "1 iteration cannot label an 11-hop chain")
    assert(starved.getLong(3) === starved.getLong(2),
      "fallback kept_cc IS the greedy count — the flag is what distinguishes it")
    val full = Dedup.dedupStrategyAudit(docs, chain).collect()(0)
    assert(full.getBoolean(5))
    assert((full.getLong(2), full.getLong(3), full.getLong(4)) === ((1L, 1L, 0L)))
  }

  test("detectorAgreement: byte-identical docs are found by both detectors; clean corpora report null overlap") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base, "en", "s"), (2L, base, "en", "s"),
      (3L, (100 to 140).map(i => s"z$i").mkString(" "), "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Dedup.detectorAgreement(docs).collect()(0)
    assert(out.getLong(2) >= 1L, "the identical pair must be in BOTH detectors")
    assert(out.getDouble(5) > 0.0)
    val clean = Seq(
      (1L, (1 to 30).map(i => s"a$i").mkString(" "), "en", "s"),
      (2L, (50 to 80).map(i => s"b$i").mkString(" "), "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val c = Dedup.detectorAgreement(clean).collect()(0)
    if (c.getLong(0) + c.getLong(1) === 0L) assert(c.isNullAt(5))
  }

  // ---- sessionProfile (x152) -----------------------------------------

  test("sessionProfile: bounce rate, depth and duration percentiles on a hand-built session set") {
    val rows = Seq(
      (1L, 1L, "2026-01-01 10:00:00"),  // session A: 2 events, 10 min apart
      (1L, 2L, "2026-01-01 10:10:00"),
      (1L, 3L, "2026-01-01 13:00:00"),  // session B: bounce
      (2L, 4L, "2026-01-01 09:00:00")   // session C: bounce
    )
    val events = rows.toDF("user_id", "event_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Relational.sessionProfile(events, col("user_id"),
      unix_micros(col("ts")), col("event_id"), gapMicros = 1800000000L)
      .collect()(0)
    assert(out.getLong(0) === 3L)
    assert(out.getDouble(1) === 0.666667)
    assert(out.getDouble(2) === 1.0)          // p50 depth of [1,1,2]
    assert(out.getLong(3) === 2L)             // p90 depth rounds to 2
    assert(out.getDouble(4) === 0.0)          // p50 duration of [0,0,600s]
    assert(out.getLong(5) === 480000000L)     // p90 interpolates 0.8*600s
  }

  // ---- activeDaysHistogram (x153) ------------------------------------

  test("activeDaysHistogram: counts users at exactly-d distinct days; null users drop") {
    val rows = Seq(
      (Some(1L), "2026-01-01 10:00:00"), (Some(1L), "2026-01-01 23:00:00"),
      (Some(1L), "2026-01-02 10:00:00"),
      (Some(2L), "2026-01-05 10:00:00"),
      (Some(3L), "2026-01-05 11:00:00"),
      (None,     "2026-01-05 12:00:00")
    )
    val events = rows.toDF("user_id", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Relational.activeDaysHistogram(events, col("user_id"), col("ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 1L))
  }

  // ---- corrBy (x154) -------------------------------------------------

  test("corrBy: perfect linear scores 1, anti-linear -1, zero variance null; +0.0 discipline") {
    val df = Seq(
      ("lin", 1.0, 2.0), ("lin", 2.0, 4.0), ("lin", 3.0, 6.0),
      ("anti", 1.0, 3.0), ("anti", 2.0, 2.0), ("anti", 3.0, 1.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0)
    ).toDF("g", "x", "y")
    val out = Relational.corrBy(df, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(out("lin") === ((3L, Some(1.0))))
    assert(out("anti") === ((3L, Some(-1.0))))
    assert(out("flat") === ((2L, None)))
    assert(1.0 / out("lin")._2.get > 0)
  }

  // ---- outageGaps (x155) ---------------------------------------------

  test("outageGaps: a 3-hour feed gap is found on the spine; a continuous feed reads zero") {
    val rows = Seq(
      ("a", "2026-01-01 00:30:00"), ("a", "2026-01-01 01:30:00"),
      ("a", "2026-01-01 05:30:00"),                    // hours 2,3,4 empty
      ("b", "2026-01-01 00:10:00"), ("b", "2026-01-01 01:10:00")
    )
    val events = rows.toDF("event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Relational.outageGaps(events, "event_type", "ts", unit = "hour")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") === ((6L, 3L, 3L)))
    assert(out("b") === ((2L, 0L, 0L)))
  }

  // ---- shardPlan (x151) ----------------------------------------------

  test("shardPlan: exact ceil shard counts; tiny strata floor at one shard; fills are exact ratios") {
    val df = Seq(
      ("a", 100L), ("a", 156L),   // 256 bytes -> 1 shard at 256 target, fill 1.0
      ("b", 257L),                // 257 -> 2 shards, fill 257/512
      ("c", 1L)                   // 1 -> 1 shard, fill 1/256
    ).toDF("s", "nb")
    val out = Relational.shardPlan(df, col("s"), col("nb"), targetBytes = 256L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") === ((256L, 1L, 1.0)))
    assert(out("b") === ((257L, 2L, 0.501953)))
    assert(out("c") === ((1L, 1L, 0.003906)))
  }

  // ---- conversionLag (x150) ------------------------------------------

  test("conversionLag: converts at-or-after first entry only; non-converters stay in the denominator") {
    val rows = Seq(
      (1L, "signup", "2026-01-05 10:00:00"),   // week of Jan 5 (Monday)
      (1L, "purchase", "2026-01-05 11:00:00"), // +1h -> converted
      (1L, "purchase", "2026-01-06 09:00:00"), // later purchase ignored (min)
      (2L, "purchase", "2026-01-04 09:00:00"), // BEFORE signup -> not a conversion
      (2L, "signup", "2026-01-07 10:00:00"),
      (3L, "signup", "2026-01-12 10:00:00")    // next week, never converts
    )
    val events = rows.toDF("user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Relational.conversionLag(events, col("user_id"), col("ts"),
        col("event_type"), "signup", "purchase")
      .collect().map(r => r.getDate(0).toString -> r).toMap
    val w1 = out("2026-01-05")
    assert(w1.getLong(1) === 2L && w1.getLong(2) === 1L && w1.getDouble(3) === 0.5)
    assert(w1.getDouble(4) === 3600.0 * 1e6)
    val w2 = out("2026-01-12")
    assert(w2.getLong(1) === 1L && w2.getLong(2) === 0L && w2.getDouble(3) === 0.0)
    assert(w2.isNullAt(4) && w2.isNullAt(5))
  }

  // ---- vocabCoverage (x149) ------------------------------------------

  test("vocabCoverage: the top-V cut is deterministic and OOV mass lands on the right source") {
    val docs = Seq(
      // "hot" appears 6x corpus-wide; "rare1/rare2" once each in src b
      (1L, "hot hot hot common", "en", "a"),
      (2L, "hot hot hot common rare1 rare2", "en", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.vocabCoverage(docs, topV = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    // vocab = {hot, common}; src a fully covered, src b misses 2 of 6
    assert(out("a") === ((4L, 0L, 0.0, 2L, 0L)))
    assert(out("b") === ((6L, 2L, 0.333333, 4L, 2L)))
    // zero rate serializes +0.0
    assert(1.0 / out("a")._3 > 0)
  }

  // ---- qualityEnsemble (x148) ----------------------------------------

  test("qualityEnsemble: varied prose outranks repetitive junk; repetition lowers the ensemble; buckets stay in range") {
    val varied = (1 to 60).map(i => s"w$i").mkString(" ")
    val looped = (1 to 20).flatMap(_ => Seq("spam", "spam", "buy")).mkString(" ")
    val digits = (1 to 60).map(i => s"$i$i$i").mkString(" ")
    val docs = Seq(
      (1L, varied, "en", "s"),
      (2L, looped, "en", "s"),
      (3L, digits, "en", "s"),
      (4L, varied + " extra tokens here", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.qualityEnsemble(docs, buckets = 4, minEnsemble = 3.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out.size === 4)
    out.values.foreach { case (q, e, rr, ens, _) =>
      assert(q >= 1 && q <= 4 && e >= 1 && e <= 4 && rr >= 1 && rr <= 4)
      assert(ens >= 0.0 && ens <= 5.0)
    }
    // the varied docs must outrank the looped doc (entropy + repetition axes)
    assert(out(1L)._4 > out(2L)._4, s"varied ${out(1L)} vs looped ${out(2L)}")
    assert(out(4L)._4 > out(2L)._4)
    // the looped doc sits in the TOP repetition bucket (inverted axis)
    assert(out(2L)._3 === 4L)
  }

  // ---- labelPurity (x147) --------------------------------------------

  test("labelPurity: clean separated clusters score 1.0; a mislabeled member drags its label down") {
    // cluster A along +x (label 0), cluster B along +y (label 1);
    // vec 6 sits in cluster B but carries label 0
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (10L, Seq(0.99f, 0.01f), 0), (11L, Seq(0.98f, 0.02f), 0),
      (100L, Seq(0.0f, 1.0f), 1), (12L, Seq(0.01f, 0.99f), 1), (13L, Seq(0.02f, 0.98f), 1),
      (6L, Seq(0.03f, 0.97f), 0)
    ).toDF("vec_id", "embedding", "label")
    // queries: vec_id % 100 == 0 -> 0 and 100
    val out = Similarity.labelPurity(emb, col("vec_id") % 100 === 0, k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // query 0 (label 0): neighbors 10, 11 (same label) -> purity 1
    assert(out(0L) === ((1L, 2L, 2L, 1.0)))
    // query 100 (label 1): nearest two of {12, 13, 6} - 6 is closest in
    // angle? vectors 12/13/6 all near +y; top-2 by cosine are 12 and 6
    // (0.01,0.99) and (0.03,0.97) vs (0.02,0.98): sims to (0,1):
    // 12: 0.99/|..|, 6: 0.97/|..|, 13: 0.98/|..| -> top2 = 12, 13 -> both label 1
    assert(out(1L)._4 === 1.0)
  }

  test("labelPurity: a label whose neighborhoods are foreign scores 0") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 7),                       // lone query, label 7
      (1L, Seq(0.99f, 0.01f), 1), (2L, Seq(0.98f, 0.02f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelPurity(emb, col("vec_id") === 0, k = 2).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 7L && out(0).getDouble(4) === 0.0)
    assert(1.0 / out(0).getDouble(4) > 0, "zero purity must serialize +0.0")
  }

  // ---- functionalDependencyAudit (x146) ------------------------------

  test("functionalDependencyAudit: clean keys read is_fd; violations report the majority; nulls count as a value") {
    val df = Seq(
      ("a", Some("en")), ("a", Some("en")), ("a", Some("en")),
      ("b", Some("en")), ("b", Some("es")),            // tie -> 'en' (dep-asc)
      ("c", Some("de")), ("c", None)                   // null is a violation
    ).toDF("k", "v")
    val out = Relational.functionalDependencyAudit(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out("a") === ((3L, 1L, "en", 1.0, true)))
    assert(out("b") === ((2L, 2L, "en", 0.5, false)))
    assert(out("c") === ((2L, 2L, "__null__", 0.5, false)))
  }

  test("functionalDependencyAudit: count partials fold — a violation arriving in a later batch flips the key") {
    val b1 = Seq(("a", Some("en")), ("a", Some("en"))).toDF("k", "v")
    val b2 = Seq(("a", Some("es"))).toDF("k", "v")
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k").as("det"),
          coalesce(col("v").cast("string"), lit("__null__")).as("dep"))
        .groupBy(col("det"), col("dep")).agg(count(lit(1)).as("c"))
    val folded = counts(b1).unionByName(counts(b2))
      .groupBy(col("det"), col("dep")).agg(sum(col("c")).as("c"))
    val out = Relational.functionalDependencyAuditFromCounts(folded).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(!r.getBoolean(5) && r.getLong(2) === 2L && r.getString(3) === "en")
    // and equals the one-pass audit over the union
    val batch = Relational.functionalDependencyAudit(
      b1.unionByName(b2), col("k"), col("v")).collect().map(_.toSeq).toSet
    assert(out.map(_.toSeq).toSet === batch)
  }

  // ---- typeHourProfile (x145) ----------------------------------------

  test("typeHourProfile: a one-hour needle scores entropy 0 and share 1; uniform hours score ln k; peak ties break hour-asc") {
    val rows =
      (1 to 5).map(i => ("cron", s"2026-01-0$i 03:15:00")) ++
      Seq(("organic", "2026-01-01 08:00:00"), ("organic", "2026-01-01 09:00:00"),
          ("organic", "2026-01-01 10:00:00"), ("organic", "2026-01-01 11:00:00"))
    val events = rows.toDF("event_type", "s")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Relational.typeHourProfile(events, col("event_type"), col("ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out("cron") === ((5L, 1L, 3L, 1.0, 0.0)))
    // uniform over 4 hours: entropy ln 4, tie -> earliest hour 8
    val ln4 = BigDecimal(math.log(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("organic") === ((4L, 4L, 8L, 0.25, ln4)))
    // the needle's zero entropy must serialize as +0.0
    assert(1.0 / out("cron")._5 > 0)
  }

  // ---- selfRepeatRuns (x144) -----------------------------------------

  test("selfRepeatRuns: a looped block flags; scattered phrase reuse does not; unique docs score zero") {
    val docs = Seq(
      // fully looped: every trigram repeats -> run covers the whole doc
      (1L, "x y z x y z x y z", "en", "s"),
      // two separated repeats of "a b c d" -> runs of 2 trigrams each
      (2L, "a b c d q q2 q3 a b c d", "en", "s"),
      // all-unique doc
      (3L, "m n o p q r", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Dedup.selfRepeatRuns(docs, n = 3, minRunTokens = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) === ((7L, 7L, 7L, 9L, true)))
    assert(out(2L) === ((9L, 4L, 2L, 4L, false)))
    assert(out(3L) === ((4L, 0L, 0L, 0L, false)))
  }

  // ---- blockFingerprints / blockNearDupPairs (x143) ------------------

  test("blockNearDupPairs: identical payloads pair at hamming 0; a one-block edit flips at most one bit") {
    val base = ("ab" * 32)                       // 64 bytes, 32 2-byte blocks
    val edit = base.substring(0, 10) + "XY" + base.substring(12)
    val other = "z" * 57                         // different length: blocks shift
    val docs = Seq(
      (1L, base, "en", "s"), (2L, base, "en", "s"),
      (3L, edit, "en", "s"), (4L, other, "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val bin = Multimodal.asBinaryTable(docs)
    val fps = Multimodal.blockFingerprints(bin, blocks = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) <= 1)
    val pairs = Multimodal.blockNearDupPairs(bin, blocks = 32, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) === 0L)
    // the edited variant pairs with BOTH copies at the same distance
    val d = java.lang.Long.bitCount(fps(1L) ^ fps(3L)).toLong
    assert(pairs.get((1L, 3L)).contains(d) && pairs.get((2L, 3L)).contains(d))
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("blockFingerprints: empty payloads are absent; fingerprints fit the declared width") {
    val docs = Seq((1L, "", "en", "s"), (2L, "abc", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Multimodal.blockFingerprints(Multimodal.asBinaryTable(docs), blocks = 8)
      .collect()
    assert(out.length === 1 && out(0).getLong(0) === 2L)
    assert(out(0).getLong(1) >= 0L && out(0).getLong(1) < (1L << 8))
  }

  // ---- sampleCalibration (x142) --------------------------------------

  test("sampleCalibration: full row is exact with +0.0 errors; samples are nested and deterministic") {
    val df = (1L to 1000L).map(i => (i, i.toDouble)).toDF("k", "v")
    val out = Relational.sampleCalibration(df, col("k"), col("v"),
        ratesPerMille = Seq(10, 100))
      .collect().map(r => r.getLong(0) -> r).toMap
    val full = out(1000L)
    assert(full.getLong(1) === 1000L && full.getDouble(2) === 500.5)
    assert(full.getDouble(5) === 0.0 && 1.0 / full.getDouble(5) > 0)
    // nested: the 1% member set is a subset of the 10% member set
    import graft.functions.TextFunctions.md5Mod
    val h = df.select(col("k"), md5Mod(col("k"), lit(1000)).as("h"))
    val in10 = h.filter(col("h") < 10).select("k").collect().map(_.getLong(0)).toSet
    val in100 = h.filter(col("h") < 100).select("k").collect().map(_.getLong(0)).toSet
    assert(in10.subsetOf(in100))
    assert(out(10L).getLong(1) === in10.size.toLong)
    assert(out(100L).getLong(1) === in100.size.toLong)
    // errors are relative and nonnegative
    assert(out(10L).getDouble(5) >= 0.0 && out(100L).getDouble(5) >= 0.0)
  }

  test("sampleCalibration: a zero-valued baseline percentile yields null error, not a division blow-up") {
    val df = (1L to 50L).map(i => (i, 0.0)).toDF("k", "v")
    val out = Relational.sampleCalibration(df, col("k"), col("v"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1000L).getDouble(2) === 0.0 && out(1000L).isNullAt(5))
  }

  // ---- codeSwitch (x141) ---------------------------------------------

  private def chunkOf(lang: String, n: Int): String = {
    val w = lang match { case "en" => "the"; case "es" => "el"; case _ => "zz" }
    List.fill(n)(w).mkString(" ")
  }

  test("codeSwitch: a bilingual concat flags; a uniform doc does not; ties break lang-asc") {
    val docs = Seq(
      // chunk 1 all-en, chunk 2 all-es -> tie 1:1 -> major en, mixed 0.5
      (1L, chunkOf("en", 20) + " " + chunkOf("es", 20), "en", "s"),
      // uniform en doc, two chunks -> mixed 0.0
      (2L, chunkOf("en", 40), "en", "s"),
      // no lexicon hits at all -> every chunk 'und', mixed 0.0
      (3L, chunkOf("xx", 25), "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.codeSwitch(docs, chunkTokens = 20, mixedThreshold = 0.25)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) === ((2L, "en", 1L, 0.5, true)))
    assert(out(2L) === ((2L, "en", 2L, 0.0, false)))
    assert(out(3L) === ((2L, "und", 2L, 0.0, false)))
  }

  test("codeSwitch: empty docs are absent; a short single-chunk doc is never mixed") {
    val docs = Seq(
      (1L, "", "en", "s"),
      (2L, chunkOf("es", 5), "es", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.codeSwitch(docs, chunkTokens = 20).collect()
    assert(out.length === 1 && out(0).getLong(0) === 2L)
    assert(out(0).getString(2) === "es" && out(0).getDouble(4) === 0.0)
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
