package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 operators: Gopher-rule diagnostics, per-source health,
  * MMR selection, pair-graph structure, inter-arrival profiling, and BPE
  * fertility — each pinned against a hand fixture or an independent
  * driver-side reference implementation. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // Spark's Round(double, 4) semantics for driver-side references
  private def r4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    r4(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
  }

  test("gopherRules: each rule fails on exactly the doc built to break it") {
    val mid = (1 to 50).map(i => s"word$i alpha").mkString(" ") // 100 distinct-ish words
    val docs = Seq(
      // 0: passes everything — 38 distinct 7-char words + 2 stopword hits
      (0L, (1 to 38).map(i => f"toka$i%03d").mkString(" ") + " the office of", "en"),
      // 1: too short (10 words)
      (1L, "the quick brown fox jumps over the lazy dog again", "en"),
      // 2: too long (100 words)
      (2L, mid, "en"),
      // 3: word length below 4.0 — 40 two-char words + "the"
      (3L, (1 to 39).map(i => f"a$i%01d".take(2)).mkString(" ") + " the the", "en"),
      // 4: no stopwords — 40 long words
      (4L, (1 to 40).map(i => f"zok$i%04d").mkString(" "), "en"),
      // 5: low uniqueness — one word 40 times + stopwords
      (5L, Array.fill(38)("template").mkString(" ") + " the them", "en")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getBoolean(9), s"doc 0 should pass: ${out(0L)}")
    def failsOnly(id: Long, idx: Int): Unit = {
      val r = out(id)
      assert(!r.getBoolean(idx), s"doc $id should fail rule at $idx: $r")
      assert(!r.getBoolean(9), s"doc $id should fail the gate: $r")
    }
    failsOnly(1L, 5) // r_words
    failsOnly(2L, 5)
    failsOnly(3L, 6) // r_wordlen
    failsOnly(4L, 7) // r_stop
    failsOnly(5L, 8) // r_uniq
  }

  test("sourceHealth: dup counting, token shares, and the decimal-exact quality mean") {
    val docs = Seq(
      (0L, "the alpha beta gamma delta", "en", "a"),
      (1L, "the alpha beta gamma delta", "en", "a"), // dup of 0, same source
      (2L, "the alpha beta gamma delta", "en", "b"), // dup of 0, other source
      (3L, "one two three four five six", "en", "b"),
      (4L, "unique text entirely its own", "en", "c")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.sourceHealth(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 2 && out("a").getLong(4) == 2) // both docs dup'd
    assert(out("b").getLong(4) == 1, s"b has one dup'd doc: ${out("b")}")
    assert(out("c").getLong(4) == 0)
    val shares = out.values.map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) < 1e-9, s"token shares must sum to 1: $shares")
    // mean quality equals the driver-side mean of the x04 scores
    // (decimal-exact sum, double division, round 6)
    val q = TextAnalysis.quality(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    def wantMean(ids: Seq[Long]): Double = {
      val s = ids.map(i => BigDecimal(q(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      java.math.BigDecimal.valueOf(s.toDouble / ids.size)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    assert(out("a").getDouble(6) == wantMean(Seq(0L, 1L)))
    assert(out("b").getDouble(6) == wantMean(Seq(2L, 3L)))
    assert(out("c").getDouble(6) == wantMean(Seq(4L)))
  }

  test("mmrSelect equals the driver-side greedy reference (fuzz: 3 seeds, varied λ/k)") {
    for (((seed, k, lam), n) <- Seq((1234, 6, 0.7), (77, 4, 0.5), (4096, 8, 0.9))
           .zip(Seq(40L, 25L, 60L))) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0L until n).map(i =>
        (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
      val emb = vecs.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
      val got = Similarity.mmrSelect(emb, col("vec_id") === 0, k, lam).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

      // independent reference: same rounding discipline, pure driver loop
      val q = vecs.head._2
      val cands = vecs.tail.map { case (i, v) => (i, v, cos(v, q)) }
      var sel = Vector.empty[(Long, Array[Float], Double, Double)]
      while (sel.size < k) {
        val rest = cands.filterNot(c => sel.exists(_._1 == c._1))
        val scored = rest.map { case (i, v, rel) =>
          val score = if (sel.isEmpty) rel
            else r4(lam * rel - (1 - lam) * sel.map(s => cos(v, s._2)).max)
          (i, v, rel, score)
        }
        val best = scored.minBy { case (i, _, _, s) => (-s, i) }
        sel :+= ((best._1, best._2, best._3, best._4))
      }
      val want = sel.zipWithIndex.map { case ((i, _, rel, sc), t) =>
        (t + 1L, i, rel, sc) }
      assert(got.toSeq == want, s"seed $seed:\ngot  ${got.toSeq}\nwant $want")
    }
  }

  test("mmrSelect: fewer candidates than k returns all of them, ranks contiguous") {
    val emb = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(emb, col("vec_id") === 0, k = 10).collect()
    assert(out.length == 3, s"must stop at the candidate count: ${out.length}")
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "ranks must stay contiguous")
    assert(out.map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
  }

  test("pairGraphStats equals the naive degree/triangle reference on random graphs") {
    for (seed <- Seq(99, 7, 313)) {
    val rnd = new scala.util.Random(seed)
    val edges = (for (a <- 0L until 20L; b <- (a + 1) until 20L
                      if rnd.nextDouble() < 0.25) yield (a, b)).toVector
    val out = Dedup.pairGraphStats(edges.toDF("a_id", "b_id")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val eset = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.foreach { n =>
      val deg = edges.count(e => e._1 == n || e._2 == n).toLong
      val nbrs = edges.collect { case (a, b) if a == n => b
                                 case (a, b) if b == n => a }
      val tri = (for (i <- nbrs.indices; j <- (i + 1) until nbrs.size
                      if eset.contains((math.min(nbrs(i), nbrs(j)), math.max(nbrs(i), nbrs(j)))))
                 yield 1).size.toLong
      val cl = if (deg >= 2) r4(tri * 2.0 / (deg * (deg - 1.0))) else 0.0
      assert(out(n) == ((deg, tri, cl)), s"node $n: ${out(n)} vs ($deg, $tri, $cl)")
    }
    // global sanity: each triangle counts once per corner
    val triTotal = out.values.map(_._2).sum
    assert(triTotal % 3 == 0, s"corner counts must be divisible by 3: $triTotal")
    }
  }

  test("pairGraphStats: a hot MID-ID star stays triangle-free and exact (rank orientation)") {
    // under id-orientation a center with a mid-range id owns
    // indeg·outdeg ≈ (d/2)² wedges; rank orientation gives it zero.
    // 400 leaves (ids 0..199 and 301..500), center id 250, plus one
    // genuine triangle (600, 601, 602) to keep the count path honest.
    val center = 250L
    val leaves = ((0L until 200L) ++ (301L to 500L)).toVector
    val star = leaves.map(l => if (l < center) (l, center) else (center, l))
    val tri = Vector((600L, 601L), (601L, 602L), (600L, 602L))
    val out = Dedup.pairGraphStats((star ++ tri).toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(center) == ((400L, 0L)), s"center: ${out(center)}")
    leaves.foreach(l => assert(out(l) == ((1L, 0L)), s"leaf $l: ${out(l)}"))
    Seq(600L, 601L, 602L).foreach(n =>
      assert(out(n) == ((2L, 1L)), s"triangle corner $n: ${out(n)}"))
  }

  test("interArrival: gaps, median, bursts, and the single-event null row") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(12), 3L), (1L, ts(100), 4L),
      (2L, ts(50), 5L) // single event — null gap stats
    ).toDF("user_id", "ts", "event_id")
    val out = Relational.interArrival(ev, col("user_id"),
        Seq(col("ts"), col("event_id")), unix_micros(col("ts")),
        burstUs = 5000000L) // 5 s
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = out(1L)
    assert(u1.getLong(1) == 4)
    assert(u1.getLong(2) == 2000000L && u1.getLong(3) == 88000000L)
    // gaps: 10s, 2s, 88s → mean 100/3 s, median 10s, bursts: the 2 s gap
    assert(math.abs(u1.getDouble(4) - 100000000.0 / 3) < 1e-6)
    assert(u1.getDouble(5) == 10000000.0)
    assert(u1.getLong(6) == 1)
    val u2 = out(2L)
    assert(u2.getLong(1) == 1 && u2.isNullAt(2) && u2.isNullAt(4) && u2.isNullAt(5))
    assert(u2.getLong(6) == 0)
  }

  test("report invariants: recall in [0,1], cascade monotone, waterfall conserves the corpus") {
    val s = spark; val dir = sf()
    val rec = graft.queries.ExtensionQueries.x117(s, dir).collect()
    assert(rec.nonEmpty)
    rec.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10, s"matched out of range: $r")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, s"recall out of range: $r")
    }
    val casc = graft.queries.ExtensionQueries.x118(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val total = graft.sources.Tables(s, dir, "documents").count()
    assert(casc(1L) == total)
    assert(casc(1L) >= casc(2L) && casc(2L) >= casc(3L) && casc(3L) >= casc(4L),
      s"cascade must be monotone: $casc")
    val wf = graft.queries.ExtensionQueries.x119(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val dropped = wf.map(_._2).sum
    val keptLast = wf.maxBy(_._1)._3
    assert(dropped + keptLast == total,
      s"waterfall must conserve the corpus: $dropped dropped + $keptLast kept != $total")
    wf.sliding(2).foreach { case Array((_, _, k1), (i2, d2, k2)) =>
      assert(k2 == k1 - d2, s"kept must fall by exactly the rule-$i2 drops")
    case _ => }
  }

  test("crossSourceDups: shared groups and per-side doc counts on a hand provenance fixture") {
    val docs = Seq(
      (0L, "mirrored story one", "en", "a"),
      (1L, "mirrored story one", "en", "b"),   // a↔b share group 1
      (2L, "mirrored story one", "en", "b"),   // b holds it twice
      (3L, "mirrored story two", "en", "a"),
      (4L, "mirrored story two", "en", "c"),   // a↔c share group 2
      (5L, "unshared", "en", "a"),
      (6L, "also unshared", "en", "c")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.crossSourceDups(docs, md5(col("text"))).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      ("a", "b") -> ((1L, 1L, 2L)),
      ("a", "c") -> ((1L, 1L, 1L))), s"got $out")
  }

  test("centroidDrift: zero for identical slices, exact squared-L2 for a known shift, null for empty clusters") {
    // codebook: two unit axes; base sits on them, batch shifts cluster 0
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("c_id", "c_emb")
    val base = Seq(
      (10L, Seq(1f, 0f, 0f, 0f)), (11L, Seq(1f, 0.2f, 0f, 0f)),
      (12L, Seq(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    // identical slices → drift exactly 0 everywhere
    Similarity.centroidDrift(base, base, cents).collect().foreach { r =>
      assert(r.getDouble(3) == 0.0, s"self-drift must be zero: $r")
    }
    // batch only populates cluster 0, mean shifted by (0, 0.1, 0, 0)
    val batch = Seq(
      (20L, Seq(1f, 0.1f, 0f, 0f)), (21L, Seq(1f, 0.3f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.centroidDrift(base, batch, cents).collect()
      .map(r => r.getLong(0) -> r).toMap
    // base cluster 0 mean = (1, 0.1, 0, 0); batch mean = (1, 0.2, 0, 0)
    val want = { val d = 0.1 - 0.2; val sq = BigDecimal(d * d)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble; sq }
    assert(out(0L).getLong(1) == 2 && out(0L).getLong(2) == 2)
    assert(out(0L).getDouble(3) == want, s"cluster 0: ${out(0L).getDouble(3)} vs $want")
    // cluster 1: no batch vectors — drift and n_batch surface as null
    assert(out(1L).getLong(1) == 1 && out(1L).isNullAt(2) && out(1L).isNullAt(3))
  }

  test("bpeFertility equals the driver-side join of bpeEncode over the corpus words") {
    val docs = Seq(
      (0L, "lower lower lowest newer", "en"),
      (1L, "newer newest lowest", "de"),
      (2L, "wider wider wide", "en")
    ).toDF("doc_id", "text", "lang")
    val pieces = TextAnalysis.bpeEncode(docs, merges = 3).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val words = docs.collect().flatMap(r =>
      r.getString(1).split(" ").filter(_.nonEmpty).map(w => (r.getString(2), w)))
    val want = words.groupBy(_._1).map { case (lang, ws) =>
      val nw = ws.length.toLong
      val np = ws.map(w => pieces(w._2)).sum
      (lang, nw, np,
        java.math.BigDecimal.valueOf(np.toDouble / nw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    }.toSet
    val got = TextAnalysis.bpeFertility(docs, merges = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, s"\ngot  $got\nwant $want")
    // fertility ≥ 1: a word is at least one piece
    got.foreach { case (_, _, _, f) => assert(f >= 1.0) }
  }
}
