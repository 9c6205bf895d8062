package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Round-15 scale-knob items: the corpus-relative df cap
  * (`maxDfFraction`) and the pair-recall audit behind SURVEY §8's
  * recall-vs-cap table. The contract surface (x10/x67 absolute-cap
  * defaults) is untouched by construction — `None` resolves to the
  * absolute cap before any plan is built. */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("a_id", "b_id", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("maxDfFraction resolves to ceil(f * nDocs) — row-identical to the equivalent absolute cap") {
    val docs = Tables(spark, sf(), "documents")
    val nDocs = docs.count()
    val f = 0.01
    val capped = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8,
      maxDf = Int.MaxValue, maxDfFraction = Some(f))
    val absEquiv = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8,
      maxDf = math.ceil(f * nDocs).toInt)
    assert(pairSet(capped) == pairSet(absEquiv))
    assert(pairSet(capped).nonEmpty, "fixture lost its near-dup pairs")
    // the containment twin threads the same resolver
    val cf = Dedup.containmentPairs(docs, n = 3, threshold = 0.5,
      maxDf = Int.MaxValue, maxDfFraction = Some(f))
    val ca = Dedup.containmentPairs(docs, n = 3, threshold = 0.5,
      maxDf = math.ceil(f * nDocs).toInt)
    def cset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cset(cf) == cset(ca))
  }

  test("maxDfFraction rejects out-of-range fractions") {
    val docs = Tables(spark, sf(), "documents")
    for (bad <- Seq(0.0, -0.1, 1.5)) {
      val e = intercept[IllegalArgumentException] {
        Dedup.ngramJaccardPairs(docs, maxDfFraction = Some(bad)).count()
      }
      assert(e.getMessage.contains("maxDfFraction"))
    }
  }

  test("the fraction cap is scale-invariant where the absolute cap has a knee") {
    // a template shingle held by 30% of the corpus, unique filler
    // everywhere else, plus 10 engineered 2-doc near-dup clusters whose
    // overlap is RARE shingles. Absolute cap 256: the template's df is
    // UNDER the cap at N=500 (df=150 -> C(150,2)=11,175 candidate pairs,
    // the quadratic knee regime) and OVER it at N=1500 (df=450 -> those
    // pairs vanish). Fraction cap 0.1: 0.3 > 0.1 at EVERY corpus size,
    // so the template never enters blocking and the candidate volume is
    // exactly the engineered pairs at both sizes — the knee is gone.
    def corpus(n: Int) = {
      val hot = (0 until (3 * n) / 10).map(i => (i.toLong,
        s"hot template shingle u${i}x u${i}y u${i}z"))
      val cold = ((3 * n) / 10 until n).map(i => (i.toLong,
        s"c${i}a c${i}b c${i}c c${i}d c${i}e c${i}f"))
      val pairs = (0 until 20).map(i => (100000L + i,
        s"p${i / 2}a p${i / 2}b p${i / 2}c p${i / 2}d p${i / 2}e"))
      (hot ++ cold ++ pairs).toDF("doc_id", "text").repartition(8)
    }
    // threshold 0 turns the output into the full candidate set (every
    // pair sharing a kept shingle survives a 0.0 verify), making the
    // blocking volume directly observable
    def cands(n: Int, maxDf: Int = Int.MaxValue,
              frac: Option[Double] = None): Long =
      Dedup.ngramJaccardPairs(corpus(n), n = 3, threshold = 0.0,
        maxDf = maxDf, maxDfFraction = frac).count()
    val engineered = 10L // 10 disjoint 2-doc clusters
    // absolute cap: quadratic regime at N=500, collapse at N=1500
    val absSmall = cands(500, maxDf = 256)
    val absLarge = cands(1500, maxDf = 256)
    assert(absSmall >= 150L * 149 / 2, s"template pairs missing: $absSmall")
    assert(absLarge == engineered, s"absLarge=$absLarge")
    // fraction cap: engineered pairs only, at BOTH sizes
    assert(cands(500, frac = Some(0.1)) == engineered)
    assert(cands(1500, frac = Some(0.1)) == engineered)
  }

  test("maxBucketFraction resolves to ceil(f * nDocs) — row-identical to the equivalent absolute cap, both cap sites") {
    // a 60-doc byte-identical mega-cluster (every band bucket holds all
    // 60) + 200 unique docs + 10 engineered 2-doc near-dup clusters: at
    // f = 0.05 the derived cap (14) drops the mega-buckets and keeps the
    // 2-doc buckets, exactly like the equivalent absolute cap
    val docsFix = (
      (0 until 60).map(i => (i.toLong,
        "breaking news subscribe to our newsletter terms apply")) ++
      (0 until 200).map(i => (100L + i,
        s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")) ++
      (0 until 20).map(i => (10000L + i,
        s"p${i / 2}a p${i / 2}b p${i / 2}c p${i / 2}d p${i / 2}e"))
    ).toDF("doc_id", "text").repartition(8)
    val n = docsFix.count()
    val f = 0.05
    def lpairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaFrac = lpairs(Dedup.lshCandidatePairs(docsFix, n = 3, k = 12,
      bands = 4, maxBucketFraction = Some(f)))
    val viaAbs = lpairs(Dedup.lshCandidatePairs(docsFix, n = 3, k = 12,
      bands = 4, maxBucket = math.ceil(f * n).toInt))
    assert(viaFrac == viaAbs && viaFrac.nonEmpty)
    // the cap bit: mega-cluster pairs gone, engineered pairs kept
    val uncapped = lpairs(Dedup.lshCandidatePairs(docsFix, n = 3, k = 12, bands = 4))
    assert(viaFrac.size < uncapped.size / 3)
    assert((0 until 10).forall(i =>
      viaFrac.contains((10000L + 2 * i, 10000L + 2 * i + 1))))
    // the pigeonhole site shares the resolver
    val fps = Dedup.simhash(docsFix, bits = 16)
      .select(col("doc_id").as("id"), col("fingerprint"))
    val pFrac = Dedup.pigeonholePairs(fps, bits = 16, maxHamming = 3,
        maxBucketFraction = Some(f))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pAbs = Dedup.pigeonholePairs(fps, bits = 16, maxHamming = 3,
        maxBucket = math.ceil(f * n).toInt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pFrac == pAbs)
    intercept[IllegalArgumentException] {
      Dedup.lshCandidatePairs(docsFix, maxBucketFraction = Some(2.0)).count()
    }
  }

  test("pairRecall: exact on known sets, 1.0 on empty truth, never collects") {
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("a_id", "b_id")
    val found = Seq((1L, 2L), (3L, 4L), (5L, 6L), (9L, 10L)).toDF("a_id", "b_id")
    val r = Dedup.pairRecall(found, truth).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 3 && r.getDouble(2) == 0.75)
    val empty = Dedup.pairRecall(found, truth.filter(col("a_id") > 100))
      .collect()(0)
    assert(empty.getLong(0) == 0 && empty.getDouble(2) == 1.0)
  }

  test("recall floor at the default cap: the capped x10 chain keeps >= 0.9 of the uncapped truth") {
    // the spec-level floor behind SURVEY §8's measured recall-vs-cap
    // table (sf0.3 numbers from graft.BlockingAudit): at the contract
    // default (jaccardMaxDf = 256) the capped chain must keep >= 90% of
    // the >= 0.8 truth pairs on the driver fixture. Capped output is a
    // SUBSET of truth (verification is exact; the cap only drops
    // candidates), so recall is the only axis that can move.
    val docs = Tables(spark, sf(), "documents")
    val truth = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8,
      maxDf = Int.MaxValue)
    val capped = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8,
      maxDf = graft.queries.ExtensionQueries.jaccardMaxDf)
    val r = Dedup.pairRecall(capped, truth).collect()(0)
    info(f"recall@0.8 at abs:256 on ${sf()}: ${r.getDouble(2)}%.4f " +
      s"(${r.getLong(1)}/${r.getLong(0)})")
    assert(r.getLong(0) > 0, "no truth pairs on the fixture")
    assert(r.getDouble(2) >= 0.9,
      s"df-cap recall collapsed: ${r.getDouble(2)} (${r.getLong(1)}/${r.getLong(0)})")
    // and the capped result is truly a subset — no phantom pairs
    val extra = capped.join(truth, Seq("a_id", "b_id"), "left_anti").count()
    assert(extra == 0, s"$extra capped pairs absent from the uncapped truth")
  }

  test("recall floor for the LSH chain: contract-parameter candidates cover >= 0.9 of the >= 0.8 truth") {
    // the x15 chain's blocking stage, audited like the df cap above —
    // banding misses are probabilistic (1-(1-J^r)^b, >= 0.996 at J=0.8
    // for r=3, b=4), and the measured recall is 1.000 at sf0.3/1.0/3.0
    // (logs/recall_r11_*.jsonl); the spec floor guards the driver fixture
    val docs = Tables(spark, sf(), "documents")
    val truth = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8,
      maxDf = Int.MaxValue)
    val cands = Dedup.lshCandidatePairs(docs, n = 3, k = 12, bands = 4)
    val r = Dedup.pairRecall(cands, truth).collect()(0)
    info(f"LSH candidate recall@0.8 on ${sf()}: ${r.getDouble(2)}%.4f " +
      s"(${r.getLong(1)}/${r.getLong(0)})")
    assert(r.getLong(0) > 0 && r.getDouble(2) >= 0.9,
      s"LSH blocking recall collapsed: ${r.getDouble(2)}")
  }
}
