package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 operators: Zipf-slope source fingerprinting, per-doc
  * contamination fractions, dup-cluster token mass, classifier
  * calibration, packing efficiency, and fertility-adjusted language
  * budgets — each pinned against a hand fixture or an independent
  * driver-side reference implementation. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def r4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue()
  private def d6(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)

  /** Driver-side replica of the shared log-log OLS (zipfSlope / heapsLaw)
    * over (x, y) points already cut/checkpointed. */
  private def lnLnFit(points: Seq[(Double, Double)]): (Double, Double) = {
    val n = points.size.toDouble
    def s(f: ((Double, Double)) => Double): Double =
      points.map(p => d6(f(p))).reduce(_ add _).doubleValue
    val sx = s(p => math.log(p._1))
    val sy = s(p => math.log(p._2))
    val sxx = s(p => math.log(p._1) * math.log(p._1))
    val sxy = s(p => math.log(p._1) * math.log(p._2))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    (r4(slope) + 0.0, r4((sy - slope * sx) / n) + 0.0)
  }
  private def zipfFit(points: Seq[(Int, Long)]): (Double, Double) =
    lnLnFit(points.map(p => (p._1.toDouble, p._2.toDouble)))

  test("zipfSlope: matches the driver-side OLS on a geometric corpus; flat source fits 0") {
    // source g: counts 8,4,2,1 for terms a,b,c,d; source f: 4 distinct singletons
    val g = List.fill(8)("a") ++ List.fill(4)("b") ++ List.fill(2)("c") ++ List("d")
    val docs = Seq(
      (0L, g.mkString(" "), "en", "g"),
      (1L, "w x y z", "en", "f")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.zipfSlope(docs, topV = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val (es, ei) = zipfFit(Seq(1 -> 8L, 2 -> 4L, 3 -> 2L, 4 -> 1L))
    assert(out("g") === ((4L, es, ei)))
    assert(es < -0.5, s"geometric source must slope steeply, got $es")
    // all-singleton source: ln(freq) identically 0 -> slope 0, intercept 0
    assert(out("f") === ((4L, 0.0, 0.0)))
    // and the zero is POSITIVE zero (the +0.0 normalization)
    assert(1.0 / out("f")._2 > 0, "slope must serialize as +0.0")
  }

  test("zipfSlope: topV cut is deterministic under count ties (term-asc tiebreak)") {
    // five tied terms; topV=3 must keep a,b,c — fit over ranks 1..3, counts 2
    val docs = Seq((0L, "e d c b a e d c b a", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.zipfSlope(docs, topV = 3).collect()
    assert(out.length === 1 && out(0).getLong(1) === 3L)
    val (es, ei) = zipfFit(Seq(1 -> 2L, 2 -> 2L, 3 -> 2L))
    assert(out(0).getDouble(2) === es && out(0).getDouble(3) === ei)
    // single-distinct-term source has no variance and drops
    val one = Seq((0L, "solo solo solo", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    assert(TextAnalysis.zipfSlope(one, topV = 3).count() === 0L)
  }

  test("contaminationScores: mirror flags at 1.0, partial quote scores its shingle share, clean scores 0") {
    val benchText = "alpha beta gamma delta epsilon zeta"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, benchText),                                    // exact mirror: frac 1.0
      (2L, "one two three alpha beta gamma four five"),   // quotes one bench trigram run
      (3L, "clean text with no overlap at all here"),     // frac 0
      (4L, "too short")                                   // < 3 tokens: absent
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationScores(docs, bench, n = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) === ((4L, 4L, 1.0, true)))
    // doc 2: 6 distinct shingles, 2 of them bench ("alpha beta gamma" is a
    // bench shingle; "beta gamma four" etc. are not; "three alpha beta" not)
    assert(out(2L)._1 === 6L && out(2L)._2 === 1L)
    assert(out(2L)._3 === 0.166667 && !out(2L)._4)
    assert(out(3L) === ((6L, 0L, 0.0, false)))
    assert(!out.contains(4L))
  }

  test("clusterTokenSavings: per-cluster mass, min-id representative, saved-desc cut") {
    val docs = Seq(
      (1L, "a b c d e"),        // 5 tokens — representative of {1,2,3}
      (2L, "a b c d e f g h"),  // 8
      (3L, "a b"),              // 2
      (10L, "x y z"),           // 3 — representative of {10,11}
      (11L, "x y z w v u t s r q p o n m l k j i h g"), // 20
      (99L, "singleton never appears")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val out = Dedup.clusterTokenSavings(docs, pairs, k = 10)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // cluster 10 saves 20, cluster 1 saves 10 — saved DESC order
    assert(rows.toSeq === Seq((10L, 2L, 23L, 3L, 20L), (1L, 3L, 15L, 5L, 10L)))
    // k cut keeps the TOP saver
    val top1 = Dedup.clusterTokenSavings(docs, pairs, k = 1).collect()
    assert(top1.length === 1 && top1(0).getLong(0) === 10L)
    // no pairs -> empty frame with the contract schema
    val none = Dedup.clusterTokenSavings(docs, pairs.limit(0), k = 5)
    assert(none.count() === 0L && none.columns.toSeq ===
      Seq("cluster", "n_docs", "total_tokens", "kept_tokens", "saved_tokens"))
  }

  test("heapsLaw: checkpoint growth matches the driver-side fit; degenerate sources drop") {
    val docs = Seq(
      // source g, bucketDocs=2: bucket0 = {0,1}, bucket1 = {2,3}, bucket2 = {4}
      (0L, "a b", "en", "g"), (1L, "a c", "en", "g"),     // N=4, V=3
      (2L, "a b", "en", "g"), (3L, "d d", "en", "g"),     // N=8, V=4
      (4L, "e f g", "en", "g"),                           // N=11, V=7
      // source z: empty doc makes bucket0 a zero point (dropped), leaving
      // ONE valid checkpoint -> no variance -> source absent
      (0L, "", "en", "z"), (2L, "a b", "en", "z")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.heapsLaw(docs, bucketDocs = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val (es, ei) = lnLnFit(Seq((4.0, 3.0), (8.0, 4.0), (11.0, 7.0)))
    assert(out === Map("g" -> ((3L, es, ei))))
    assert(es > 0.4 && es < 1.0, s"growing vocab must fit a positive beta, got $es")
  }

  test("sourceSimilarity: identical profiles score 1, disjoint vocabularies are absent, topV gates the axis") {
    val docs = Seq(
      (0L, "a a b c", "en", "s1"),
      (1L, "a a b c", "en", "s2"),   // same distribution as s1
      (2L, "x y z w", "en", "s3")    // disjoint from s1/s2
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.sourceSimilarity(docs, topV = 100).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out((("s1", "s2"))) === ((3L, 1.0)))
    assert(!out.contains(("s1", "s3")) && !out.contains(("s2", "s3")))
    // topV=2 keeps only the globally-heaviest terms (a ×4, then b/c tie ->
    // b): s1/s2 still overlap on {a, b}; s3 has neither and stays absent
    val cut = TextAnalysis.sourceSimilarity(docs, topV = 2).collect()
    assert(cut.length === 1 && cut(0).getLong(2) === 2L)
  }

  test("transitionLatency: per-edge gap stats with exact p50 midpoints and whole-µs p90") {
    val events = Seq(
      // u1: view@0 -> click@1000; u3: view@0 -> click@2000  (two gaps)
      ("u1", 0L, 1L, "view"), ("u1", 1000L, 2L, "click"),
      ("u3", 0L, 5L, "view"), ("u3", 2000L, 6L, "click"),
      // u2: click@0 -> view@500 (single gap)
      ("u2", 0L, 3L, "click"), ("u2", 500L, 4L, "view")
    ).toDF("user_id", "tus", "event_id", "event_type")
    val out = Relational.transitionLatency(events, col("user_id"),
        Seq(col("tus"), col("event_id")), col("event_type"), col("tus"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6))))
      .toMap
    // gaps {1000, 2000}: p50 = exact midpoint, p90 = 1000 + 0.9·1000
    assert(out(("view", "click")) === ((2L, 1000L, 1500.0, 1900L, 2000L)))
    assert(out(("click", "view")) === ((1L, 500L, 500.0, 500L, 500L)))
    assert(out.size === 2)
  }

  test("sourceTopTerms: shared terms zero out; ranking is score-desc with a term tiebreak") {
    val docs = Seq(
      (0L, "apple apple banana shared", "en", "s1"),
      (1L, "cherry shared shared", "en", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.sourceTopTerms(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getString(2), r.getDouble(3))))
      .toMap
    val ln2 = r4(math.log(2.0))
    assert(out(("s1", 1L)) === (("apple", r4(2.0 * math.log(2.0)))))
    assert(out(("s1", 2L)) === (("banana", ln2)))
    assert(out(("s2", 1L)) === (("cherry", ln2)))
    // "shared" appears in every source -> ln(2/2) = 0 score
    assert(out(("s2", 2L)) === (("shared", 0.0)))
  }

  test("langConfusion: diagonal and off-diagonal cells with exact shares; lexicon-free text maps to und") {
    val docs = Seq(
      (0L, "the cat is of the house and it is big", "en", "s"), // en -> en
      (1L, "el gato la casa de que los un perro", "en", "s"),   // en -> es (mislabel)
      (2L, "xyzzy qwerty plugh nothing", "en", "s"),            // en -> und
      (3L, "the dog of a to in the yard is", "fr", "s")         // fr -> en (mislabel)
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(("en", "en")) === ((1L, 0.333333)))
    assert(out(("en", "es")) === ((1L, 0.333333)))
    assert(out(("en", "und")) === ((1L, 0.333333)))
    assert(out(("fr", "en")) === ((1L, 1.0)))
    assert(out.size === 4)
  }

  test("embeddingAudit: widths, zero norms, and exact norm percentiles on a hand table") {
    val emb = Seq(
      (1L, Array(3.0f, 4.0f, 0.0f), 0L),  // norm 5
      (2L, Array(0.0f, 0.0f, 0.0f), 0L),  // norm 0 (unembeddable)
      (3L, Array(1.0f, 0.0f, 0.0f), 0L)   // norm 1
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.embeddingAudit(emb).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((3L, 1L, 3L, 3L, 1L)))
    assert(r.getDouble(5) === 1.0)   // p50 over {0, 1, 5}
    assert(r.getDouble(6) === 4.6)   // p95: 1 + 0.9·(5 − 1)
  }

  test("behaviorEntropy: uniform two-type user scores ln 2; monotype and single-event users score 0") {
    val events = Seq(
      ("a", "view"), ("a", "buy"), ("a", "view"), ("a", "buy"),
      ("b", "view"), ("b", "view"), ("b", "view"),
      ("c", "view")
    ).toDF("user_id", "event_type")
    val out = Relational.behaviorEntropy(events, col("user_id"), col("event_type"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") === ((4L, 2L, r4(math.log(2.0)))))
    assert(out("b")._3 === 0.0 && out("c")._3 === 0.0)
    assert(out("b")._1 === 3L && out("c")._2 === 1L)
  }

  test("cdc chunk-set similarity: byte mirrors pair at 1.0, disjoint payloads stay absent") {
    val long1 = (1 to 80).map(i => s"w$i").mkString(" ")
    val long2 = (100 to 180).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, long1), (2L, long1),   // byte-identical: identical chunk sets
      (3L, long2)                 // disjoint content
    ).toDF("doc_id", "text")
    val sets = Multimodal.cdcChunks(Multimodal.asBinaryTable(docs),
        window = 8, mask = 16, maxChunk = 64)
      .select(col("doc_id"), col("h").as("s")).distinct()
    val out = Dedup.jaccardPairsFromSets(sets, threshold = 0.3, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out === Map((1L, 2L) -> 1.0))
  }

  test("jaccardEstimateError: exact mirrors land in the top bucket with zero error") {
    val mirror = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, mirror), (2L, mirror),                       // identical pair
      (3L, "totally different words here nothing shared with others at all")
    ).toDF("doc_id", "text")
    val out = Dedup.jaccardEstimateError(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out === Map(9L -> ((1L, 1.0, 1.0, 0.0))))
  }

  test("jaccardEstimateError: candidate-doc restriction equals the unrestricted report") {
    // The operator restricts its exact chain to docs the banding surfaced
    // (r16 optimization); this pins the equivalence against an independent
    // driver-side recomputation from the two UNRESTRICTED public
    // generators on the real fixture.
    val docs = graft.sources.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("text"))
    val (n, k, bands, maxDf) = (3, 12, 4, 256)
    val est = Dedup.estimatedJaccardPairs(docs, n, k, bands).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Dedup.jaccardPairsFromSets(
        Dedup.shingleSet(docs, n), threshold = 0.0, maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val joined = est.keySet.intersect(exact.keySet).toSeq
      .map(p => (est(p), exact(p)))
    assert(joined.nonEmpty, "fixture must surface shared candidate pairs")
    val ref = joined.groupBy { case (je, _) => math.min((je * 10.0).floor, 9.0).toLong }
      .map { case (b, ps) =>
        def mean(f: ((Double, Double)) => Double): Double =
          r4(ps.map(p => d6(f(p))).reduce(_ add _).doubleValue / ps.size) + 0.0
        b -> ((ps.size.toLong, mean(_._1), mean(_._2),
          mean(p => math.abs(p._1 - p._2))))
      }
    val out = Dedup.jaccardEstimateError(docs, n, k, bands, maxDf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out === ref)
  }

  test("dedupSweep: monotone curve, exact doc counting, (0,0) rows for dry thresholds") {
    val pairs = Seq(
      (1L, 2L, 0.9), (1L, 3L, 0.9), (4L, 5L, 0.6), (6L, 7L, 0.3)
    ).toDF("a_id", "b_id", "j")
    val out = Dedup.dedupSweep(pairs, "j", Seq(0.2, 0.5, 0.8, 0.95)).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (0.2, 4L, 7L),   // all pairs, docs 1..7
      (0.5, 3L, 5L),   // drops (6,7)
      (0.8, 2L, 3L),   // keeps the two 0.9 pairs, docs {1,2,3}
      (0.95, 0L, 0L))) // dry threshold still emits its row
  }

  test("calibrationReport: equal-mass bins cover the corpus; mean_p nondecreasing; rates bounded") {
    val docs = graft.sources.Tables(spark, sf(), "documents")
    val out = TextAnalysis.calibrationReport(docs, iters = 2, bins = 5)
      .orderBy("bin").collect()
    assert(out.length >= 2, "score spread must fill more than one quantile bin")
    assert(out.map(_.getLong(1)).sum === docs.count())
    val means = out.map(_.getDouble(2))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      s"quantile-bin mean_p must be nondecreasing: ${means.mkString(",")}")
    assert(out.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("packEfficiency: deciles, mass, and padding equal the driver-side rollup of packSequences") {
    val docs = graft.sources.Tables(spark, sf(), "documents")
    val budget = 128L
    val perBin = TextAnalysis.packSequences(docs, budget, shards = 4)
      .collect()
      .groupBy(r => (r.getLong(1), r.getLong(2)))
      .map { case (_, rs) => rs.map(r => math.max(r.getLong(3), 1L)).sum }
    val expected = perBin.groupBy(c => math.min(c * 10 / budget, 10L))
      .map { case (d, cs) =>
        d -> (cs.size.toLong, cs.sum, cs.map(c => math.max(budget - c, 0L)).sum) }
    val out = TextAnalysis.packEfficiency(docs, budget, shards = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === expected)
  }

  test("fertilityBudget: floors of budget·share through the fertility exchange rate; unmapped lang nulls") {
    val docs = graft.sources.Tables(spark, sf(), "documents")
    val target = Map("en" -> 0.6, "fr" -> 0.4) // de/es/zh unmapped
    val budget = 10000L
    val fert = TextAnalysis.bpeFertility(docs, merges = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val out = TextAnalysis.fertilityBudget(docs, target, budget, merges = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((lang, share) <- target) {
      val row = out(lang)
      val tok = math.floor(budget.toDouble * share).toLong
      assert(row.getLong(4) === tok)
      assert(row.getLong(5) === math.floor(tok.toDouble / fert(lang)).toLong)
    }
    for (lang <- out.keySet -- target.keySet) {
      assert(out(lang).isNullAt(3) && out(lang).isNullAt(4) && out(lang).isNullAt(5))
    }
  }
}
