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

  test("unigramLogProb: corpus-typical docs outrank rare-vocab docs; closed-form check") {
    // counts over the corpus: a=3, b=1, total=4
    val docs = Seq((1L, "a a"), (2L, "a b")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lpA = math.log(3.0 / 4)  // -0.2877
    val lpB = math.log(1.0 / 4)  // -1.3863
    assert(out(1L)._1 == 2L && out(2L)._1 == 2L)
    assert(math.abs(out(1L)._2 - lpA) < 1e-3)
    assert(math.abs(out(2L)._2 - (lpA + lpB) / 2) < 1e-3)
    // the all-common-token doc is strictly more "typical"
    assert(out(1L)._2 > out(2L)._2)
  }

  test("bigramLogProb: closed-form check; order breakage scores below identical unigrams") {
    // single doc "a a b": uni a=2 b=1 tot=3; big (a,a)=1 (a,b)=1
    //  t1 (no hist): ln(2/3); t2: ln(.8*(1/2)+.2*(2/3)); t3: ln(.8*(1/2)+.2*(1/3))
    val solo = Seq((1L, "a a b")).toDF("doc_id", "text")
    val r1 = graft.operators.TextAnalysis.bigramLogProb(solo, lambda = 0.8).collect().head
    assert(r1.getLong(1) == 3L)
    assert(r1.getDouble(2) == -0.5987)
    // 8 natural copies fix the bigram stats; doc 9 permutes the SAME
    // unigram multiset — the unigram LM ties them, the bigram LM must not
    val natural = "the cat sat on the mat"
    val docs = ((1L to 8L).map(i => (i, natural)) :+ (9L, "mat the on sat cat the"))
      .toDF("doc_id", "text")
    val big = graft.operators.TextAnalysis.bigramLogProb(docs, lambda = 0.8).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val uni = graft.operators.TextAnalysis.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(9L) == uni(1L))  // unigram model is blind to word order
    assert(big(9L) < big(1L))   // bigram model sees the breakage
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.bigramLogProb(docs, lambda = 1.0)
    }
  }

  test("pmiTopPairs: closed-form check; minCount floor; deterministic cut") {
    // "x y x y …" (5 each): pair (x,y) occurs 5×, (y,x) 4× (floored out at 5);
    // T=10 tokens, TB=9 adjacent positions → PMI(x,y) = ln((5/9)/(0.5·0.5))
    val docs = Seq((1L, "x y x y x y x y x y")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.pmiTopPairs(docs, minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("x", "y", 5L, math.rint(math.log((5.0 / 9) / 0.25) * 1e4) / 1e4)))
    // a true collocation outranks pairs of independently-frequent words
    val filler = (1 to 30).map(i => s"w$i").mkString(" ")
    val coll = (1L to 10L).map(i => (i, s"new york $filler")).toDF("doc_id", "text")
    val top = graft.operators.TextAnalysis.pmiTopPairs(coll, minCount = 5, k = 1)
      .collect().head
    assert((top.getString(0), top.getString(1)) == ("new", "york"))
  }

  test("temperatureWeights: sqrt-flattening upweights rare strata, weights sum to 1") {
    val docs = Seq.tabulate(5)(i => (i.toLong, "t", if (i < 4) "a" else "b"))
      .toDF("doc_id", "text", "src")
    val out = graft.operators.TextAnalysis
      .temperatureWeights(docs, col("src"), alpha = 0.5).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // shares 0.8/0.2; sqrt(0.8):sqrt(0.2) = 2:1 → weights 2/3, 1/3
    assert(out("a")._1 == 0.8 && out("a")._2 == 0.666667)
    assert(out("b")._1 == 0.2 && out("b")._2 == 0.333333)
    // the rare stratum is upweighted (rate > 1), the dominant one damped
    assert(out("b")._3 > 1.0 && out("a")._3 < 1.0)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("mixReport: shares, KL-term signs, and null for unmapped strata") {
    val docs = Seq.tabulate(8)(i =>
      (i.toLong, "t", if (i < 6) "a" else if (i < 7) "b" else "z"))
      .toDF("doc_id", "text", "src")
    val out = graft.operators.TextAnalysis
      .mixReport(docs, col("src"), Map("a" -> 0.5, "b" -> 0.5)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // a over-represented (0.75 vs 0.5): positive term 0.75·ln(1.5);
    // b under-represented (0.125 vs 0.5): negative term 0.125·ln(0.25)
    assert(out("a") == (6L, 0.75, Some(0.304099)))
    assert(out("b") == (1L, 0.125, Some(-0.173287)))
    assert(out("z") == (1L, 0.125, None)) // unmapped: surfaced, kl null
  }

  test("tokenBudgetPlan: under- and over-allocated regimes; unmapped stratum -> null plan") {
    // a: 100 tokens vs 60 allotted (under, rate<1); b: 20 vs 40 (over,
    // rate capped, epochs 2); z: unmapped — surfaced, plan columns null
    val docs = Seq((1L, "a", 60L), (2L, "a", 40L), (3L, "b", 20L), (4L, "z", 10L))
      .toDF("doc_id", "src", "n")
    val out = graft.operators.TextAnalysis
      .tokenBudgetPlan(docs, col("src"), col("n"), Map("a" -> 0.6, "b" -> 0.4), 100L)
      .collect().map { r =>
        def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        r.getString(0) -> (r.getLong(1), d(2), d(3), d(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))
      }.toMap
    assert(out("a") == (100L, Some(0.6), Some(0.6), Some(0.6), Some(60L)))
    assert(out("b") == (20L, Some(0.4), Some(1.0), Some(2.0), Some(20L)))
    assert(out("z") == (10L, None, None, None, None),
      "unmapped stratum must surface with a null plan, not rate=1/take-all")
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.tokenBudgetPlan(
        docs, col("src"), col("n"), Map("a" -> 0.0), 100L)
    }
  }

  test("encodeTokens: vocab-order ids, OOV -> 0, sequence preserves token order") {
    // counts: b=3, a=2, c=1 → ids b=1, a=2, c=3; topV=2 cuts c → OOV
    val docs = Seq((1L, "a b c b"), (2L, "b a")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.encodeTokens(docs, topV = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (4L, "2,1,0,1"))  // c fell out of the vocab
    assert(out(2L) == (2L, "1,2"))      // order is token order, not id order
  }

  test("chunkDocs: stride windows with end clamp; stride=chunk partitions exactly") {
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.chunkDocs(docs, chunkTokens = 4, strideTokens = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    // doc 1: starts 0,2,4,6,8 — the last two clamp at the doc's end
    assert(out.filter(_._1 == 1L) == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"), (1L, 1L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 4L, "t5 t6 t7 t8"), (1L, 3L, 4L, "t7 t8 t9 t10"),
      (1L, 4L, 2L, "t9 t10")))
    // zero-token doc emits nothing; 1-token doc emits its single clamp
    assert(!out.exists(_._1 == 2L))
    assert(out.filter(_._1 == 3L) == Seq((3L, 0L, 1L, "solo")))
    // stride == chunk: a partition — concatenating chunks rebuilds the doc
    val flat = graft.operators.TextAnalysis.chunkDocs(docs, 3, 3)
      .filter(col("doc_id") === 1L).orderBy("chunk_idx")
      .collect().map(_.getString(3)).mkString(" ")
    assert(flat == "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
  }

  test("upsampleStrata: integer weights copy exactly; zero weight drops; frac splits") {
    val docs = (1L to 200L).map(i =>
      (i, if (i <= 60) "a" else if (i <= 120) "b" else "c")).toDF("doc_id", "lang")
    val out = graft.operators.TextAnalysis.upsampleStrata(
        docs, col("lang"), Seq("a" -> 3.0, "b" -> 0.0, "c" -> 2.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1)
    // weight 3.0: every 'a' doc appears exactly 3 times, copy_id 1..3
    assert((1L to 60L).forall(i => byDoc(i).map(_._3).sorted.toSeq == Seq(1L, 2L, 3L)))
    // weight 0.0: stratum 'b' vanishes
    assert(out.forall(_._2 != "b"))
    // weight 2.5: every 'c' doc gets 2 or 3 copies; the fractional third
    // copy lands on roughly half of them (salted-md5 draw, 80 docs)
    val cCounts = (121L to 200L).map(i => byDoc(i).length)
    assert(cCounts.forall(n => n == 2 || n == 3))
    val frac3 = cCounts.count(_ == 3).toDouble / cCounts.length
    assert(frac3 > 0.3 && frac3 < 0.7, s"fractional-copy rate $frac3 implausible for 0.5")
    // deterministic: the same call reproduces the identical multiset
    val again = graft.operators.TextAnalysis.upsampleStrata(
        docs, col("lang"), Seq("a" -> 3.0, "b" -> 0.0, "c" -> 2.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
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

  test("curationScores equals the langId ⋈ quality composition") {
    val docs = Seq(
      (1L, "the cat of the house is to be in the garden", "en"),
      (2L, "el la de y que los un perro", "es"),
      (3L, "numbers 123 456 789 everywhere 000", "en"),
      (4L, "zz yy xx ww", "de")
    ).toDF("doc_id", "text", "lang")
    val fused = graft.operators.TextAnalysis.curationScores(docs)
      .orderBy("doc_id").collect().toSeq
    val composed = graft.operators.TextAnalysis.langId(docs)
      .select(col("doc_id"), col("pred_lang"))
      .join(graft.operators.TextAnalysis.quality(docs)
        .select(col("doc_id"), col("quality_score")), "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(fused == composed)
  }

  test("repetitionRatio: looping text scores high, all-distinct scores 0, short docs drop") {
    val docs = Seq(
      (1L, "a b a b a b"),      // trigrams: aba, bab, aba, bab -> 4 total, 2 distinct
      (2L, "p q r s t"),        // all distinct -> ratio 0
      (3L, "x y")               // < 3 tokens -> no row
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.repetitionRatio(docs, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.map(_._1).sorted == Seq(1L, 2L))
    val d1 = got.find(_._1 == 1L).get
    assert(d1 == ((1L, 4L, 2L, 0.5)))
    assert(got.find(_._1 == 2L).get._4 == 0.0)
  }

  test("corpusStats: exact counts and percentiles per language") {
    val docs = Seq(
      (1L, "a b c", "en"), (2L, "a b c d e", "en"), (3L, "a", "en"),
      (4L, "x y z w", "es")
    ).toDF("doc_id", "text", "lang")
    val got = graft.operators.TextAnalysis.corpusStats(docs).orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    // en: token counts {3,5,1} -> mean 3, median 3, p95 = 3 + 0.9*(5-3) = 4.8
    assert(got(0) == (("en", 3L, 3.0, 3.0, 4.8)))
    assert(got(1) == (("es", 1L, 4.0, 4.0, 4.0)))
  }

  test("packSequences: deterministic greedy bins per shard; oversize doc advances the bin") {
    val docs = Seq(
      (1L, Seq.fill(300)("w").mkString(" ")),
      (2L, Seq.fill(300)("w").mkString(" ")),
      (3L, Seq.fill(700)("w").mkString(" ")), // > budget: spans past a boundary
      (4L, Seq.fill(100)("w").mkString(" "))
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.packSequences(docs, budgetTokens = 512, shards = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // exclusive prefix sums 0, 300, 600, 1300 -> bins 0, 0, 1, 2
    assert(got.toSeq == Seq((1L, 0L, 300L), (2L, 0L, 300L), (3L, 1L, 700L), (4L, 2L, 100L)))
    // input partitioning must not change the assignment
    val re = graft.operators.TextAnalysis.packSequences(docs.repartition(5), 512, 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(re.toSeq == got.toSeq)
  }

  test("redactPii masks emails and long numbers, counts each, leaves clean text alone") {
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or call +56 (2) 2345-6789 now"),
      (2L, "ticket 12345678 and mail bob@corp.io"),
      (3L, "no pii here just words and the number 42")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.redactPii(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got(0)._2 == "contact me at <EMAIL> or call +<NUM> now")
    assert(got(0)._3 == 1L && got(0)._4 == 1L)
    assert(got(1)._2 == "ticket <NUM> and mail <EMAIL>")
    assert(got(1)._3 == 1L && got(1)._4 == 1L)
    // clean text passes through byte-identical, zero counts ("42" is short)
    assert(got(2) == ((3L, "no pii here just words and the number 42", 0L, 0L)))
  }

  test("stratifiedSample: deterministic per-stratum fractions, salt-decorrelated from split") {
    import graft.operators.TextAnalysis
    val docs = (1L to 1000L).map(i => (i, s"doc $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val frac = Map("en" -> 0.5, "de" -> 0.0)
    val kept = TextAnalysis.stratifiedSample(docs, col("lang"), frac)
    val a = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = TextAnalysis.stratifiedSample(docs.repartition(7), col("lang"), frac)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b) // same doc -> same draw, regardless of partitioning
    // fraction 0 drops the stratum wholesale; 0.5 keeps about half of the 500 en
    assert(kept.filter(col("lang") === "de").count() == 0)
    assert(a.size > 200 && a.size < 300, s"en keep-count off: ${a.size}/500")
    // strata absent from the map keep the default fraction (1.0)
    val deOnly = TextAnalysis.stratifiedSample(docs, col("lang"), Map("en" -> 0.0))
    assert(deOnly.count() == 500 && deOnly.filter(col("lang") === "en").count() == 0)
    // the SALTED draw is independent of the split buckets: kept docs still
    // spread across train/val/test (an unsalted draw at 0.5 would keep
    // exactly buckets 0-49, i.e. 100% train)
    val splits = TextAnalysis.deterministicSplit(docs)
      .join(kept.select("doc_id"), "doc_id")
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.getOrElse("val", 0L) > 0 && splits.getOrElse("test", 0L) > 0,
      s"sampled docs collapsed into one split: $splits")
    // out-of-range fractions are rejected
    intercept[IllegalArgumentException] {
      TextAnalysis.stratifiedSample(docs, col("lang"), Map("en" -> 1.5))
    }
  }

  test("quotaSample: exact per-stratum caps via prefix filter; fallback path stays exact") {
    import graft.operators.TextAnalysis
    import graft.operators.TextAnalysis.{mixSalt, mixResolution}
    val docs = (1L to 1000L).map(i => (i, s"doc $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.quotaSample(docs, col("lang"), Map("en" -> 100L))
    assert(got.filter(col("lang") === "en").count() == 100)
    assert(got.filter(col("lang") === "de").count() == 500) // defaultCap keeps all
    // exactness: equals the straight full-window answer
    val draw = md5Mod(concat(col("doc_id").cast("string"), lit(mixSalt)), lit(mixResolution))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(draw, col("doc_id"))
    val expected = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= when(col("lang") === "en", 100L).otherwise(Long.MaxValue))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val a = got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == expected)
    val b = TextAnalysis.quotaSample(docs.repartition(7), col("lang"), Map("en" -> 100L))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(b == a) // partition-independent
    // cap 0 removes the stratum entirely
    assert(TextAnalysis.quotaSample(docs, col("lang"), Map("en" -> 0L))
      .filter(col("lang") === "en").count() == 0)
    // force the prefix undershoot: a stratum made of the 10 LARGEST draws
    // of the corpus has no survivor under a safety=1 cap/n threshold, so
    // the verified fallback must fire — and still return exactly the cap
    // smallest draws of that stratum
    val withDraw = docs.withColumn("d", draw)
    val topIds = withDraw.orderBy(col("d").desc, col("doc_id")).limit(10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = docs.filter(col("doc_id").isInCollection(topIds))
      .withColumn("lang", lit("hi"))
    val hiGot = TextAnalysis.quotaSample(hi, col("lang"), Map("hi" -> 5L), safety = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val hiExpected = withDraw.filter(col("doc_id").isInCollection(topIds))
      .orderBy(col("d"), col("doc_id")).limit(5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(hiGot == hiExpected)
  }

  test("vocabulary: counts, deterministic tie-break, topV cut") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "a b  d"),   // double space: empty token must not count
      (3L, "c")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(docs, topV = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // a:3, then b:2/c:2 tie broken by term asc, d:1 cut by topV
    assert(got == Seq(("a", 3L), ("b", 2L), ("c", 2L)))
  }

  test("assembleBins: bins concatenate in doc_id order and agree with packSequences") {
    import graft.operators.TextAnalysis
    // one shard so the greedy order is the plain doc_id order
    val docs = Seq(
      (1L, "w w w"),   // 3 tokens, prefix 0 -> bin 0
      (2L, "w w"),     // prefix 3  -> bin 0
      (3L, "w w w w"), // prefix 5  -> bin 1
      (4L, "w")        // prefix 9  -> bin 2
    ).toDF("doc_id", "text")
    val bins = TextAnalysis.assembleBins(docs, budgetTokens = 4L, shards = 1, sep = "|")
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(bins == Seq(
      (0L, 2L, 5L, "w w w|w w"),
      (1L, 1L, 4L, "w w w w"),
      (2L, 1L, 1L, "w")))
    // the assembled view must agree with the assignment view bin-for-bin
    val assign = TextAnalysis.packSequences(docs, 4L, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(assign == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  test("packSequences: zero-token docs cost one budget token (bin membership bounded)") {
    import graft.operators.TextAnalysis
    val docs = (1L to 5L).map(i => (i, "")).toDF("doc_id", "text")
    val bins = TextAnalysis.packSequences(docs, budgetTokens = 2L, shards = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // without the cost floor every empty doc would share bin 0 unboundedly;
    // floored costs prefix 0,1,2,3,4 -> bins 0,0,1,1,2
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("tokenEntropy: uniform text maxes entropy, one-token loops score 0, empty docs drop") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c d"),       // 4 distinct of 4: H = ln(4)
      (2L, "a a a a"),       // one token: H = 0
      (3L, "a a b b"),       // H = ln(4) − (2·ln2·2)/4 = ln(2)
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((4L, 4L, math.rint(math.log(4) * 10000) / 10000)))
    assert(out(2L)._1 == 4L && out(2L)._2 == 1L && out(2L)._3 == 0.0)
    assert(out(3L)._3 == math.rint((math.log(4) - math.rint(2 * math.log(2) * 1e6) / 1e6 * 2 / 4) * 10000) / 10000)
  }

  test("curationFunnel attributes each doc to its FIRST failing gate; counts are exhaustive") {
    import graft.operators.TextAnalysis
    // doc 1: kept (long english, clean); doc 2: exact dup of 1 AND would
    // also fail near-dup — exact_dup must win (priority order); doc 3:
    // near-dup only; doc 4: wrong language; doc 5: too digit-heavy
    val en = ("the a of and is to in " * 15).trim
    val docs = Seq(
      (1L, en, "web"),
      (2L, en, "web"),
      (3L, en + " extra", "web"),
      (4L, "el la de y que los un " + "palabra " * 10, "mirror"),
      // english stopwords so the lang gate passes, but short + digit-heavy
      // so quality = min(n/100,1)·(1−digits/chars) lands far below 0.5
      (5L, "the 111 of 222 and 333 is 444 to 555 in 666", "mirror")
    ).toDF("doc_id", "text", "source")
    val exactDrops = Seq(2L).toDF("doc_id")
    val nearDrops = Seq(2L, 3L).toDF("doc_id")   // 2 is in BOTH drop lists
    val out = TextAnalysis.curationFunnel(docs, exactDrops, nearDrops, "en", 0.5)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(
      ("web", "kept") -> 1L, ("web", "exact_dup") -> 1L, ("web", "near_dup") -> 1L,
      ("mirror", "lang") -> 1L, ("mirror", "low_quality") -> 1L))
    assert(out.values.sum == 5L)   // every doc attributed exactly once
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

  test("weightedSample: exact k per stratum, deterministic, weight-monotone inclusion") {
    import graft.operators.TextAnalysis
    val docs = (1L to 40L).map(i =>
      (i, s"s${i % 2}", if (i <= 2) 100000L else 1L)).toDF("doc_id", "lang", "n_chars")
    def sample(salt: String) = TextAnalysis.weightedSample(
        docs, col("lang"), col("n_chars"), k = 5, salt = salt)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s1 = sample("#a")
    assert(s1.groupBy(_._1).values.forall(_.size == 5))
    // pure function of (doc_id, salt, weight): repartitioning changes nothing
    val s1b = TextAnalysis.weightedSample(docs.repartition(7), col("lang"),
        col("n_chars"), k = 5, salt = "#a")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 == s1b)
    // the two 100000x-weight docs should be drawn under (nearly) every salt
    val salts = Seq("#a", "#b", "#c", "#d", "#e")
    val heavyHits = salts.map(sample).count(s => s.contains(("s1", 1L)) && s.contains(("s0", 2L)))
    assert(heavyHits >= 4, s"heavy docs sampled in only $heavyHits/5 draws")
    // different salts give different samples (it IS a random draw)
    assert(salts.map(sample).distinct.size > 1)
  }

  test("sourceDivergence: closed-form KL per stratum; corpus-typical strata score 0") {
    import graft.operators.TextAnalysis
    // A: {a:2, b:1}, B: {b:3}; corpus: {a:2, b:4}, N=6
    //   KL_A = (2/3)ln(2·6/(3·2)) + (1/3)ln(1·6/(3·4)) = (1/3)ln 2
    //   KL_B = ln(3·6/(3·4)) = ln 1.5
    val docs = Seq(
      (1L, "a a b", "A"),
      (2L, "b b b", "B")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceDivergence(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("A")._1 == 3L && out("A")._2 == 2L)
    assert(math.abs(out("A")._3 - math.log(2) / 3) < 1e-5)
    assert(out("B") == ((3L, 1L, math.rint(math.log(1.5) * 1e6) / 1e6)))
    // two strata with the SAME distribution as the corpus diverge 0
    val flat = Seq((1L, "x y", "A"), (2L, "x y", "B")).toDF("doc_id", "text", "source")
    TextAnalysis.sourceDivergence(flat).collect()
      .foreach(r => assert(r.getDouble(3) == 0.0))
  }

  test("dsirSelect: target-like pool docs outrank off-target; quota cuts; add-1 keeps OOV finite") {
    import graft.operators.TextAnalysis
    // target (t=true): {a:3, b:1}; pool: doc 1 "a a" (target-heavy),
    // doc 2 "b z" (z is pool-only — add-1 smoothing must keep it finite),
    // doc 3 "z z z". Vocab = {a,b,z}, N_t=4, N_p=7, so the smoothed
    // denominators are N_t+V=7 and N_p+V=10:
    // w(a)=ln((4/7)/(3/10)), w(b)=ln((2/7)/(2/10)), w(z)=ln((1/7)/(5/10))
    val docs = Seq(
      (10L, "a a a b", "en"), (1L, "a a", "fr"),
      (2L, "b z", "fr"), (3L, "z z z", "de")
    ).toDF("doc_id", "text", "lang")
    def w(ct: Int, cp: Int) =
      math.log(((ct + 1).toDouble / 7.0) / ((cp + 1).toDouble / 10.0))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val exp = Map(
      1L -> 2 * r6(w(3, 2)),
      2L -> (r6(w(1, 1)) + r6(w(0, 4))),
      3L -> 3 * r6(w(0, 4)))
    val out = TextAnalysis.dsirSelect(docs, col("lang") === "en", quota = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // quota=2 keeps the two highest scores: doc 1 (target-heavy) first
    assert(out.map(_._1).toSeq == Seq(1L, 2L), s"selection order wrong: ${out.toSeq}")
    out.foreach { case (id, sc) =>
      assert(math.abs(sc - exp(id)) < 1e-9, s"doc $id: got $sc want ${exp(id)}") }
    // the target rows themselves are never selected
    assert(!out.map(_._1).contains(10L))
  }

  test("bm25Scores matches the closed form; non-matching docs absent; idf always positive") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "join join vector"),   // 2 query terms, repeated join
      (2L, "join table"),
      (3L, "spark"),
      (4L, "other words here")    // no query term: must not appear
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Scores(docs, Seq("join", "vector", "spark"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // closed form mirroring the operator's arithmetic: N=4, avglen=9/4
    val (n, avglen, k1, b) = (4.0, 2.25, 1.2, 0.75)
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Double, df: Double, len: Double) = {
      val raw = idf(df) * tf * (k1 + 1.0) /
        (tf + k1 * (1.0 - b + b * len / avglen))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def score(ts: Double*) = BigDecimal(ts.sum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((2L, score(term(2, 2, 3), term(1, 1, 3)))))
    assert(out(2L) == ((1L, score(term(1, 2, 2)))))
    assert(out(3L) == ((1L, score(term(1, 1, 1)))))
    // hottest possible term (df = N) still contributes positively
    assert(idf(n) > 0)
  }

  test("textRankKeywords: the connector term outranks leaves; minCount prunes; k cuts") {
    import graft.operators.TextAnalysis
    // "hub" is adjacent to p/q/r/s (a star); each leaf only touches hub.
    // "x y" co-occurs often but only with each other (a 2-clique):
    // hub must outrank every leaf (it concentrates their rank mass)
    val docs = Seq(
      (1L, "p hub q hub r hub s hub p hub q hub r hub s"),
      (2L, "hub p hub q hub r hub s hub p hub q hub r"),
      (3L, "x y x y x y x y x y")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.textRankKeywords(docs, minCount = 2, iters = 5, k = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val m = out.toMap
    assert(out.head._1 == "hub", s"top term was ${out.head}")
    Seq("p", "q", "r", "s").foreach(t => assert(m("hub") > m(t), s"hub !> $t"))
    // the 2-clique's members rank equally (symmetric positions)
    assert(m("x") == m("y"))
    // a pair seen once (p-q never adjacent) is pruned by minCount: only
    // the 7 connected terms appear
    assert(out.length == 7, out.toSeq.toString)
  }

  test("bpeMerges learns the textbook merge sequence on a hand corpus") {
    import graft.operators.TextAnalysis
    // word freqs: "low" x3, "lower" x1, "wow" x2
    // round 1 pair counts: (l,o)=4, (o,w)=3+1+2(x2 in wow? no: w-o-w has
    //   (w,o) and (o,w)) -> (o,w)=3+1+2=6, (w,o)=2, (w,e)=1, (e,r)=1
    //   -> best (o,w)=6; merge: low->l,ow  lower->l,ow,e,r  wow->w,ow
    // round 2: (l,ow)=4, (ow,e)=1, (e,r)=1, (w,ow)=2 -> best (l,ow)=4
    //   -> merge: low->low  lower->low,e,r  wow->w,ow
    // round 3: (low,e)=1, (e,r)=1, (w,ow)=2 -> best (w,ow)=2 -> wow->wow
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "low wow"),
      (3L, "wow")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, "o", "w", 6L), (2L, "l", "ow", 4L), (3L, "w", "ow", 2L)))
  }

  test("bpeMerges: repeated-symbol runs merge left-to-right greedily (fold == parity scan)") {
    import graft.operators.TextAnalysis
    // "aaaa" must merge as (aa)(aa), "aaa" as (aa)a — the overlap case the
    // oracle's odd-offset acceptance replays; pair (a,a) counts occurrences
    // at every position: aaaa has 3, aaa has 2, aa has 1
    val docs = Seq((1L, "aaaa aaa aa b")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, merges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // round 1: (a,a) = 3+2+1 = 6 -> aaaa=[aa,aa], aaa=[aa,a], aa=[aa]
    // round 2: (aa,aa)=1, (aa,a)=1 -> tie on count, lex order: (aa,a)
    assert(out == Seq((1L, "a", "a", 6L), (2L, "aa", "a", 1L)))
  }

  test("logisticQualityWeights: iteration-1 closed form, separating direction, partition-stable") {
    import graft.operators.TextAnalysis
    // en docs are long (many tokens), others short — x1 should separate
    val docs = Seq(
      (1L, "a b c d e f g h", "en"), (2L, "a b c d e f", "en"),
      (3L, "a b", "fr"), (4L, "c", "de")
    ).toDF("doc_id", "text", "lang").withColumn("n_chars", length(col("text")))
    val out = TextAnalysis.logisticQualityWeights(docs, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.size == 12)
    // iteration 1 closed form: w=0 -> p=0.5 for every doc, r = y-0.5 =
    // ±0.5; g1 = Σ round(r·x1, 6) = 0.5(.08+.06-.02-.01) = 0.055;
    // w1 after = round(0.1·0.055/4, 6) = 0.001375 (MEAN gradient)
    assert(out((1L, 1L)) == 0.001375, s"w1 iter1 = ${out((1L, 1L))}")
    // bias: r sums to 0.5+0.5-0.5-0.5 = 0 -> bias stays 0 at iter 1
    assert(out((1L, 0L)) == 0.0)
    // the token-count weight keeps growing: en docs are longer
    assert(out((2L, 1L)) > out((1L, 1L)) && out((3L, 1L)) > out((2L, 1L)))
    // exact decimal discipline: bit-identical under re-partitioning
    val rep = TextAnalysis.logisticQualityWeights(docs.repartition(5), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rep == out)
  }

  test("packBySimilarity: same-cluster docs share bins; sub-sharding splits deterministically") {
    import graft.operators.TextAnalysis
    // two orthogonal clusters (seeds 0 and 1); docs 0,2,3 near seed 0,
    // docs 1,4 near seed 1; 3-token docs, budget 6 -> 2 docs per bin
    val emb = Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.8f, 0.2f), 4L -> Seq(0.1f, 0.9f)
    ).toDF("vec_id", "embedding")
    val docs = (0L to 4L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.packBySimilarity(docs, emb, col("vec_id") < 2, 6L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // cluster 0 = {0,2,3}: bins (0,0,1) in doc_id order; cluster 1 = {1,4}: (0,0)
    assert(out == Map(0L -> (0L, 0L), 2L -> (0L, 0L), 3L -> (0L, 1L),
      1L -> (1L, 0L), 4L -> (1L, 0L)), out.toString)
    // subShards=2: cluster recovered identically, bins only ever split finer
    val sub = TextAnalysis.packBySimilarity(docs, emb, col("vec_id") < 2, 6L, subShards = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sub.view.mapValues(_._1).toMap == out.view.mapValues(_._1).toMap,
      "sub-sharding changed cluster attribution")
  }

  test("qualityClassifierScores: median gate splits, score order follows the learned direction") {
    import graft.operators.TextAnalysis
    // en docs are long: the classifier learns length ∝ quality, so the
    // top-half gate keeps the longer docs
    val docs = Seq(
      (1L, "a b c d e f g h", "en"), (2L, "a b c d e f", "en"),
      (3L, "a b", "fr"), (4L, "c", "de")
    ).toDF("doc_id", "text", "lang").withColumn("n_chars", length(col("text")))
    val out = TextAnalysis.qualityClassifierScores(docs, iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out.size == 4)
    // scores are monotone in doc length (x1/x2 weights are positive)
    assert(out(1L)._1 > out(2L)._1 && out(2L)._1 > out(3L)._1 && out(3L)._1 > out(4L)._1)
    // ROUND-4 median of 4 scores: the two above it pass, the two below drop
    assert(out(1L)._2 && out(2L)._2 && !out(3L)._2 && !out(4L)._2,
      s"median gate did not split: $out")
  }

  test("bpeEncode applies the trained chain: pieces match the textbook trace") {
    import graft.operators.TextAnalysis
    // same corpus as the textbook bpeMerges test; after 3 merges
    // (o+w, l+ow, w+ow): low->[low], lower->[low,e,r], wow->[wow]
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "low wow"),
      (3L, "wow")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, merges = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out == Map(
      "low"   -> ((3L, 1L, "low")),
      "lower" -> ((1L, 3L, "low e r")),
      "wow"   -> ((2L, 1L, "wow"))))
  }

  test("bpe loop survives a dried-out corpus: merges stop early, encode keeps the final vocab") {
    import graft.operators.TextAnalysis
    // single word "ab": round 1 merges a+b -> [ab]; round 2 finds NO pair.
    // the loop must break keeping the merged vocab, not empty it
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeMerges(docs, merges = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(m == Seq((1L, "a", "b", 2L)), s"expected 1 merge then dry, got $m")
    val enc = TextAnalysis.bpeEncode(docs, merges = 5).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(enc == Map("ab" -> ((2L, 1L, "ab"))),
      s"dried corpus must keep the final symbol table, got $enc")
  }
}
