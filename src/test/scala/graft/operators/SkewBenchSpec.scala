package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial-SCALE skew harness — the closest local[32] gets to the
  * 100× question. The §8.1 closed forms are fuzz-checked at toy sizes in
  * PropertiesSpec; here the same bounds are asserted on an sf0.1-scale
  * corpus (5,000 docs — the size of the driver's sf0.1 documents table)
  * deliberately shaped like the production nightmare:
  *   - ONE hot boilerplate cluster = 20% of the corpus (1,000 byte-equal
  *     docs — every LSH band bucket is a mega-bucket);
  *   - ONE hot join/graph key (a 1,000-member star component, plus a
  *     700-member chain = the worst DIAMETER case for label propagation);
  *   - a hot fact-join key owning 20% of a 100k-row fact table.
  * Each case asserts the candidate-count / output-size CEILING the §8.1
  * closed form predicts AND a generous wall-clock ceiling (loose enough
  * for a contended sandbox, tight enough that a quadratic or
  * driver-collect regression cannot pass). Measured times are printed
  * via info() and recorded in SURVEY §8.1. */
class SkewBenchSpec extends SparkSpec {
  import spark.implicits._

  private val hotN = 1000
  private val coldN = 4000
  private val pairN = 50 // 50 legitimate 2-doc near-dup clusters

  // 20% boilerplate: 1,000 byte-identical docs; 4,000 unique-token docs;
  // 50 two-doc duplicate clusters that a correct cap must KEEP finding
  private lazy val skewedDocs = graft.Persist.cut((
    (0 until hotN).map(i => (i.toLong,
      "breaking news subscribe to our newsletter terms of service apply today")) ++
    (0 until coldN).map(i => (hotN + i.toLong,
      s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h u${i}i u${i}j")) ++
    (0 until 2 * pairN).map(i => (10000L + i,
      s"p${i / 2}a p${i / 2}b p${i / 2}c p${i / 2}d p${i / 2}e p${i / 2}f p${i / 2}g"))
  ).toDF("doc_id", "text").repartition(32))

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("x08 shape: LSH maxBucket holds candidates to the closed form under a 20% mega-cluster") {
    val (bands, cap) = (4, 16)
    val n = hotN + coldN + 2 * pairN
    val ((capped, uncapped), secs) = timed {
      val c = Dedup.lshCandidatePairs(skewedDocs, n = 3, k = 12,
        bands = bands, maxBucket = cap).count()
      val u = Dedup.lshCandidatePairs(skewedDocs, n = 3, k = 12,
        bands = bands).count()
      (c, u)
    }
    info(f"lsh capped=$capped uncapped=$uncapped in $secs%.1f s")
    // uncapped: the mega-cluster alone is C(1000,2) = 499,500 pairs — the
    // quadratic cost the cap exists to refuse
    assert(uncapped >= hotN.toLong * (hotN - 1) / 2, s"uncapped=$uncapped")
    // capped: every mega-bucket (size 1000 > 16) dropped wholesale; the
    // §8.1 ceiling bands·n·(cap-1)/2 must hold with 20% skew...
    assert(capped <= bands.toLong * n * (cap - 1) / 2, s"capped=$capped")
    // ...while the 50 LEGITIMATE 2-doc clusters (bucket size 2 <= cap)
    // all survive — the cap refuses the mega-bucket, not recall
    assert(capped >= pairN, s"cap ate the legitimate pairs: $capped")
    assert(capped < uncapped / 3, s"cap did not bite: $capped vs $uncapped")
    assert(secs < 120, f"LSH pass took $secs%.1f s on 5k docs")
  }

  test("x21/x47/x92 shape: CC over a 1000-star + 700-chain converges and stays (id,lbl)-sized") {
    // star: hot node 0 pairs with 1..999 (one hot join key in the edges
    // frame); chain: 2000-2699 linked in sequence (max diameter)
    val pairs = (
      (1 until hotN).map(i => (0L, i.toLong)) ++
      (2000 until 2699).map(i => (i.toLong, i.toLong + 1))
    ).toDF("a_id", "b_id").repartition(32)
    val ((dropped, best, split), secs) = timed {
      val d = Dedup.dropNearDuplicatesCC(skewedDocs, pairs).count()
      val b = Dedup.keepBestPerCluster(skewedDocs, pairs,
        Seq(length(col("text")).desc, col("doc_id"))).count()
      val s = Dedup.splitByComponent(skewedDocs, pairs)
        .join(skewedDocs.select(col("doc_id")), Seq("doc_id"))
        .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (d, b, s)
    }
    val total = hotN + coldN + 2L * pairN
    info(f"cc dropped->$dropped keepBest->$best split=$split in $secs%.1f s")
    // total docs - 999 star non-canonicals - 699 chain non-canonicals
    assert(dropped == total - 999 - 699, s"dropped=$dropped")
    assert(best == dropped)
    assert(split.values.sum == total)
    // convergence within default maxIters: error mode must NOT throw
    spark.conf.set("spark.graft.cc.onNonConverged", "error")
    try Dedup.splitByComponent(skewedDocs, pairs).count()
    finally spark.conf.unset("spark.graft.cc.onNonConverged")
    assert(secs < 240, f"CC stack took $secs%.1f s on the skew fixture")
  }

  test("x109 shape: interval-overlap join under ONE hot key equals the naive join, bucket-bounded") {
    // the nightmare: a single user owns 2,000 intervals on EACH side —
    // the equi-key alone degenerates to one 4M-pair reducer; bucketing
    // must split that key across its ~1,000 time buckets instead
    val span = 100000L
    val width = 10L
    val nIv = 2000
    def los = (0 until nIv).map(i => (i.toLong * 7919) % span)
    val left = los.zipWithIndex
      .map { case (lo, i) => (7L, i.toLong, lo, lo + width) }
      .toDF("u", "lid", "llo", "lhi").repartition(32)
    val right = los.zipWithIndex
      .map { case (lo, i) => (7L, 100000L + i, lo, lo + width) }
      .toDF("u", "rid", "rlo", "rhi").repartition(32)
    val (bucketed, secs) = timed {
      graft.operators.Relational.intervalOverlapJoin(
        left, "llo", "lhi", right, "rlo", "rhi",
        bucketWidth = 100L, keys = Seq("u")).count()
    }
    info(f"interval join matched=$bucketed in $secs%.1f s")
    // ground truth from the naive quadratic join (fine at 2k x 2k, and
    // exactly what the rewrite must reproduce pair-for-pair)
    val naive = left.join(right.withColumnRenamed("u", "u2"),
      col("u") === col("u2") && col("llo") <= col("rhi") && col("rlo") <= col("lhi")).count()
    assert(bucketed == naive, s"bucketed=$bucketed naive=$naive")
    assert(bucketed >= nIv, "every identical-interval pair must match")
    assert(secs < 60, f"hot-key interval join took $secs%.1f s")
  }

  test("x104 shape: one giant payload stays an output-sized cut array, full coverage") {
    // 2 MB single payload — the old per-byte formulation would explode
    // ~2M rows and LEAD-window them; the expression path must hold the
    // payload to ONE local pass + ~n/mask cut entries
    val n = 2 * 1024 * 1024
    val bytes = {
      var s = 777L
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) { s = s * 6364136223846793005L + 1442695040888963407L
        a(i) = (s >>> 40).toByte; i += 1 }
      a
    }
    val bin = Seq((1L, bytes)).toDF("doc_id", "content")
      .select(col("doc_id"), col("content"),
        struct(lit("application/octet-stream").as("mime"),
          lit(n.toLong).as("n_bytes")).as("meta"))
    val (rows, secs) = timed {
      Multimodal.cdcChunks(bin, window = 8, mask = 64, maxChunk = 256)
        .agg(count(lit(1)), sum(col("chunk_bytes"))).collect().head
    }
    info(f"giant-payload CDC: ${rows.getLong(0)} chunks in $secs%.1f s")
    assert(rows.getLong(1) == n.toLong, "chunks must cover every byte exactly once")
    // expected chunks ~ max(n/mask cuts, n/maxChunk splits) — sanity band
    assert(rows.getLong(0) >= n / 256 && rows.getLong(0) <= n / 8,
      s"chunk count ${rows.getLong(0)} outside the plausible band")
    assert(secs < 60, f"giant payload took $secs%.1f s")
  }

  test("x86 shape: incremental CC merge touches labels+batch only and equals recompute") {
    val oldPairs = (1 until hotN).map(i => (0L, i.toLong)).toDF("a_id", "b_id")
    // day-2 batch: a bridge from the star into the chain's head + fresh chain
    val newPairs = ((2000 until 2699).map(i => (i.toLong, i.toLong + 1L)) ++
      Seq((999L, 2000L))).toDF("a_id", "b_id")
    val (merged, secs) = timed {
      val oldLabels = Dedup.mergeComponentLabels(
        Seq.empty[(Long, Long)].toDF("id", "lbl"), oldPairs)
      Dedup.mergeComponentLabels(graft.Persist.cut(oldLabels), newPairs)
        .groupBy(col("lbl")).count().collect()
    }
    info(f"incremental merge in $secs%.1f s")
    // the bridge fuses star+chain into ONE 1700-node component, label 0
    assert(merged.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 1700L), merged.mkString(","))
    assert(secs < 240, f"incremental CC took $secs%.1f s")
  }

  test("x114 shape: a 3000-leaf MID-ID star + clique fringe stays wedge-bounded and exact") {
    // under id-orientation the mid-id center owns ~(3000/2)² = 2.25M
    // wedges; rank orientation gives it ZERO (every leaf out-ranks into
    // the center, whose outdeg is 0). The 30-clique fringe keeps the
    // triangle path honest: C(30,3) = 4060 triangles must all surface.
    val center = 1500L
    val leaves = ((0L until 1500L) ++ (1501L to 3000L)).toVector
    val star = leaves.map(l => if (l < center) (l, center) else (center, l))
    val clique = (for (a <- 5000L until 5030L; b <- (a + 1) until 5030L)
      yield (a, b)).toVector
    val (out, secs) = timed {
      Dedup.pairGraphStats((star ++ clique).toDF("a_id", "b_id")).collect()
    }
    info(f"graph stats over ${star.size + clique.size} edges in $secs%.1f s")
    val m = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(center) == ((3000L, 0L)), s"center: ${m(center)}")
    assert(m(5000L) == ((29L, 406L)), s"clique corner: ${m(5000L)}") // C(28,2)
    assert(m.values.map(_._2).sum == 3L * 4060L, "triangle corner conservation")
    assert(secs < 120, f"graph stats took $secs%.1f s")
  }

  test("x77 shape: salted join spreads a 20%-hot fact key and matches the plain join") {
    // 100k-row fact table; key 7 owns 20% of it. dim: 50 keys
    val fact = spark.range(100000).select(
      when(col("id") % 5 === 0, 7L).otherwise(col("id") % 50).as("k"),
      col("id").as("v"))
    val dim = spark.range(50).select(col("id").as("k"), (col("id") * 10).as("w"))
    val ((salted, plain), secs) = timed {
      val s = Relational.saltedJoin(fact, dim, "k", saltBuckets = 8)
      (s.count(), fact.join(dim, Seq("k")).count())
    }
    info(f"salted join $salted rows in $secs%.1f s")
    assert(salted == plain && salted == 100000L)
    val p = Relational.saltedJoin(fact, dim, "k", saltBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p)
    assert(secs < 120, f"salted join took $secs%.1f s")
  }

  test("x122/x133 shape: corpus-wide hot terms are absorbed map-side; fits stay source-bounded") {
    // every hot doc carries the same 9 boilerplate tokens — each becomes a
    // (source, term) hot key that partial aggregation must absorb; the
    // head cut must stay two-phase (no per-source vocabulary window)
    val docs = skewedDocs.withColumn("source",
      concat(lit("src"), pmod(col("doc_id"), lit(20))))
    val ((zipf, terms), secs) = timed {
      (TextAnalysis.zipfSlope(docs, topV = 100).collect(),
       TextAnalysis.sourceTopTerms(docs, k = 5).count())
    }
    info(f"zipf ${zipf.length} sources + top-terms $terms rows in $secs%.1f s")
    assert(zipf.length == 20 && terms == 100L)
    // boilerplate dominance shows as a steep head on every source
    assert(zipf.forall(_.getDouble(2) < 0.0), "hot-term corpora must slope negative")
    assert(secs < 120, f"zipf under hot terms took $secs%.1f s")
  }

  test("x131 shape: a fully-shared vocabulary is the dense worst case and stays |sources|²·V-bounded") {
    // 100 sources, ALL drawing from one 50-term vocabulary: every source
    // pair shares every term — the maximal pair-stage volume V·C(100,2)
    val nSrc = 100
    val vocab = 50
    // the term index walks id DIV nSrc so EVERY source spans the whole
    // vocabulary (j=0 alone covers it: gcd(3, 50) = 1)
    val docs = graft.Persist.cut(spark.range(5000).select(
      col("id").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(nSrc))).as("source"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit("t"),
          pmod(expr(s"id DIV $nSrc") * (j + 3) + j, lit(vocab)))): _*).as("text")))
    val (rows, secs) = timed {
      TextAnalysis.sourceSimilarity(docs, topV = vocab).collect()
    }
    info(f"source-sim ${rows.length} pairs in $secs%.1f s")
    assert(rows.length == nSrc * (nSrc - 1) / 2, s"dense matrix must emit C($nSrc,2)")
    assert(rows.forall(_.getLong(2) == vocab.toLong), "every pair shares the full axis")
    assert(secs < 120, f"dense source-sim took $secs%.1f s")
  }

  test("x137 shape: a 1000-payload byte-identical cluster is refused by the chunk df-cap; real pairs survive") {
    val sets = Multimodal.cdcChunks(Multimodal.asBinaryTable(skewedDocs),
        window = 8, mask = 16, maxChunk = 64)
      .select(col("doc_id"), col("h").as("s")).distinct()
    val (pairs, secs) = timed {
      Dedup.jaccardPairsFromSets(sets, threshold = 0.3, maxDf = 64).collect()
    }
    info(f"cdc-sim ${pairs.length} pairs in $secs%.1f s")
    // the mega-cluster's chunks have df=1000 > 64: blocked wholesale (its
    // members belong to EXACT dedup, which runs first in the cascade);
    // every 2-doc duplicate cluster has df=2 chunks and must survive
    assert(pairs.length == pairN, s"expected the $pairN legit pairs, got ${pairs.length}")
    assert(pairs.forall(_.getDouble(2) == 1.0), "byte-equal pairs must score 1.0")
    assert(secs < 120, f"cdc-sim took $secs%.1f s")
  }

  test("x143 shape: the block-pair bucket cap refuses a 1000-mirror cluster; edited pairs survive") {
    // the hot cluster is byte-identical -> identical fingerprints -> every
    // band bucket is a 1000-member mega-bucket (10^6/2 pairs uncapped);
    // the 50 two-doc clusters have bucket size 2 and must survive
    val bin = Multimodal.asBinaryTable(skewedDocs)
    val (pairs, secs) = timed {
      Multimodal.blockNearDupPairs(bin, blocks = 32, maxHamming = 3,
        maxBucket = 64).collect()
    }
    info(f"block pairs ${pairs.length} in $secs%.1f s")
    // chance hamming<=3 collisions among the 4,000 random cold docs are
    // legitimate detector output; only the REFUSED cluster must be absent
    assert(pairs.forall(r => r.getLong(0) >= hotN && r.getLong(1) >= hotN),
      "no pair may touch the refused mega-cluster")
    // every legit cluster is same-length byte-equal -> hamming 0; the
    // banding must find each (plus any chance collisions among them)
    val zeroPairs = pairs.filter(_.getLong(2) == 0L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until pairN).map(i => (10000L + 2 * i, 10001L + 2 * i)).toSet
    assert(expected.subsetOf(zeroPairs), "a df-2 duplicate pair was lost to the cap")
    assert(secs < 120, f"block pairs took $secs%.1f s")
  }

  test("x138 shape: a fully-contaminated giant doc folds in one pass; hot bench shingles stay broadcast") {
    // bench = ONE 2k-token doc; corpus = 4,000 docs each quoting a bench
    // trigram (every doc matches - the broadcast lookup is df-independent)
    // plus one 20k-token doc that is the bench doc repeated 10x (its
    // matched-position list is its own length - the per-doc state bound)
    val benchText = (0 until 2000).map(i => s"b$i").mkString(" ")
    val bench = Seq((900000L, benchText)).toDF("doc_id", "text")
    val corpus = graft.Persist.cut((
      (0 until 4000).map(i =>
        (i.toLong, s"u${i}a u${i}b b0 b1 b2 u${i}c u${i}d")) ++
      Seq((800000L, ((0 until 10).flatMap(_ => (0 until 2000).map(i => s"b$i"))).mkString(" ")))
    ).toDF("doc_id", "text").repartition(32))
    val (rows, secs) = timed {
      Dedup.contaminationRuns(corpus, bench, n = 3, minRunTokens = 6).collect()
    }
    info(f"contamination runs over ${rows.length} docs in $secs%.1f s")
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // giant doc: 19,998 shingles, every one matched (the wrap trigrams
    // b1999,b0,b1 also occur nowhere in bench - but b1998 b1999 b0 does
    // not match; runs break at each wrap), longest run = 1998 shingles
    val g = byId(800000L)
    assert(g.getLong(1) === 19998L && g.getLong(3) === 1998L, g.toString)
    // every small doc: exactly one matched trigram (b0 b1 b2), run 1
    assert(byId(0L).getLong(2) === 1L && byId(0L).getLong(3) === 1L)
    assert(secs < 120, f"contamination runs took $secs%.1f s")
  }

  test("x161 shape: pair-diff over CAPPED pairs stays pairs-bounded under the boilerplate cluster") {
    // uncapped, the 1,000-doc mega-cluster would feed ~500k pairs into
    // the per-pair diff; the capped generator (the documented contract)
    // keeps the pair frame at the legit clusters
    val pairs = Dedup.lshCandidatePairs(skewedDocs, maxBucket = 16)
    val (rows, secs) = timed {
      Dedup.pairDiffThirds(skewedDocs, pairs).collect()
    }
    info(f"pair-diff ${rows.length} rows in $secs%.1f s")
    // every surviving pair contributes at most 3 thirds per side
    val nPairs = pairs.count()
    assert(rows.length <= 3 * nPairs, s"${rows.length} rows for $nPairs pairs")
    // byte-equal pairs: fully shared in every third
    assert(rows.forall(r => r.getLong(4) === r.getLong(3) &&
      r.getLong(6) === r.getLong(5)), "byte-equal pairs must be fully shared")
    assert(secs < 120, f"pair diff took $secs%.1f s")
  }

  test("x140 shape: a 10k-account farm is ONE group row, never a pair set") {
    val farm = (0 until 10000).flatMap { u =>
      Seq((u.toLong, "view"), (u.toLong, "view"), (u.toLong, "buy"))
    }
    val organic = (0 until 2000).map(u => (20000L + u, s"t${u % 97}"))
    val events = graft.Persist.cut(
      (farm ++ organic).toDF("user_id", "event_type").repartition(32))
    val (rows, secs) = timed {
      Relational.profileTwins(events, col("user_id"), col("event_type"))
        .collect()
    }
    info(f"profile twins ${rows.length} groups in $secs%.1f s")
    val farmRow = rows.find(_.getLong(1) === 10000L)
    assert(farmRow.isDefined, "the farm must collapse to one group of 10,000")
    assert(farmRow.get.getLong(5) === 30000L)
    assert(secs < 60, f"profile twins took $secs%.1f s")
  }
}
