package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x177 semantic cross-split leakage, x178 Cohen's kappa, x179 lag
  * autocorrelation — closed-form fixtures where every output value is
  * hand-derivable. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  test("semanticLeakage: only cross-split over-threshold pairs fold, per eval id") {
    // one centroid (id 0) => one cluster, default block. Near-dup groups:
    // {0, 2, 4} on the x-axis, {1, 5} on the y-axis; 3 is off-axis (no
    // partner above 0.99). Split: eval = id >= 4.
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 0f)),
      (3L, Array(0.7f, 0.7f)), (4L, Array(1f, 0f)), (5L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticLeakage(emb, centroidPred = col("vec_id") < 1L,
        threshold = 0.99, isEval = col("vec_id") >= 4L)
      .orderBy("eval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // eval 4: train near-dups 0 and 2 (pair (0,2) is train-train and
    // (4,5) would be eval-eval if it were similar — it isn't);
    // eval 5: train near-dup 1.
    assert(out == Seq((4L, 2L, 1.0), (5L, 1L, 1.0)))
  }

  test("langAgreementKappa: exact-long kappa agrees with the confusion matrix") {
    // fixture docs across langs; derive expected kappa FROM langConfusion
    // (the matrix is the contract; this pins the fold arithmetic)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "a"),
      (2L, "el rapido zorro marron salta sobre el perro", "es", "a"),
      (3L, "le renard brun rapide saute par dessus le chien", "fr", "a"),
      (4L, "the cat sat on the mat and the dog slept", "es", "a"),
      (5L, "un dos tres cuatro cinco seis siete ocho", "en", "a")
    ).toDF("doc_id", "text", "lang", "source")
    val m = TextAnalysis.langConfusion(docs)
      .select("lang_label", "pred_lang", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = m.map(_._3).sum
    val agree = m.filter(r => r._1 == r._2).map(_._3).sum
    val rowM = m.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colM = m.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val src = rowM.keySet.intersect(colM.keySet).toSeq
      .map(k => rowM(k) * colM(k)).sum
    def det6(x: Double) = math.floor(x * 1.0e6 + 0.5) / 1.0e6
    val out = TextAnalysis.langAgreementKappa(docs).collect().head
    assert(out.getLong(0) == n && out.getLong(1) == agree)
    assert(out.getDouble(2) == det6(agree.toDouble / n))
    assert(out.getDouble(3) == det6(src.toDouble / (n * n)))
    assert(out.getDouble(4) ==
      det6((n * agree - src).toDouble / (n * n - src).toDouble))
    // the matrix must actually be non-trivial for this to pin anything
    assert(m.length > 1 && agree < n)
  }

  test("langAgreementKappa: degenerate one-cell matrix yields NULL kappa") {
    val docs = Seq(
      (1L, "the the the", "en", "a"), (2L, "the dog the", "en", "a")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.langAgreementKappa(docs).collect().head
    // all mass in (en, en): po = pe = 1, kappa undefined
    assert(out.getDouble(2) == 1.0 && out.isNullAt(4))
  }

  test("seasonality: exact ±1 autocorrelation on a perfect period-2 series") {
    // 9 consecutive days alternating 1,3,1,3,... events for one key:
    // lag 1 pairs perfectly anti-correlate (r = -1), lag 2 pairs
    // perfectly correlate (r = +1) — closed-form exact under the
    // decimal-moment fold.
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 9).flatMap { d =>
      val nEv = if (d % 2 == 0) 1 else 3
      (0 until nEv).map(i =>
        (d * 10L + i, new java.sql.Timestamp(base + d * 86400000L + i * 1000L), "k"))
    }
    val df = rows.toDF("event_id", "ts", "event_type")
    val out = Relational.seasonality(df, "event_type", "ts", maxLag = 2)
      .orderBy("lag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq(("k", 1L, 8L, -1.0), ("k", 2L, 7L, 1.0)))
  }

  test("ksDrift: hand-computed sup|F_g - F_all| on disjoint supports; 0 on identical ones") {
    // A={1,2}, B={3,4}: pooled F = (.25,.5,.75,1); F_A=(.5,1,1,1),
    // F_B=(0,0,.5,1) -> KS 0.5 each (at v=2 resp. v=2's gap)
    val df = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L))
      .toDF("src", "len")
    val out = Relational.ksDrift(df, col("src"), col("len"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(("A", 2L, 0.5), ("B", 2L, 0.5)))
    // two groups with IDENTICAL distributions: each equals the pool
    val same = Seq(("X", 1L), ("X", 2L), ("Y", 1L), ("Y", 2L))
      .toDF("src", "len")
    val out2 = Relational.ksDrift(same, col("src"), col("len"))
      .collect().map(_.getDouble(2)).toSeq
    assert(out2 == Seq(0.0, 0.0))
  }

  test("ksDrift: spine cardinality guard rejects high-cardinality domains; quantize is the sanctioned path") {
    // 200 distinct continuous-ish values > maxDistinct=100 -> loud refusal
    // naming the fix, BEFORE any dense-spine work
    val wide = (1 to 200).map(i => (if (i % 2 == 0) "A" else "B", i / 7.0))
      .toDF("src", "score")
    val e = intercept[IllegalArgumentException] {
      Relational.ksDrift(wide, col("src"), col("score"), maxDistinct = 100L)
    }
    assert(e.getMessage.contains("distinct values") &&
      e.getMessage.contains("quantize"))
    // quantize = Some(5.0) buckets the same column under the cap and the
    // result equals ksDrift over the pre-bucketed values (the definition
    // of the quantized KS)
    val q = Relational.ksDrift(wide, col("src"), col("score"),
        maxDistinct = 100L, quantize = Some(5.0))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val pre = Relational.ksDrift(
        wide.select(col("src"), (floor(col("score") / 5.0) * 5.0).as("score")),
        col("src"), col("score"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(q == pre)
  }

  test("concentrationGini: 0 on equal masses, exact 0.4 on a 1:9 split") {
    val eq = Seq(("a", 10L), ("b", 10L)).toDF("src", "w")
    val g1 = Relational.concentrationGini(eq, col("src"), col("w")).collect().head
    assert(g1.getLong(0) == 2L && g1.getLong(1) == 20L && g1.getDouble(2) == 0.0)
    // masses 1 and 9: G = (2*(1*1 + 9*2) - 3*10) / (2*10) = 8/20 = 0.4
    val sk = Seq(("a", 1L), ("b", 9L)).toDF("src", "w")
    assert(Relational.concentrationGini(sk, col("src"), col("w"))
      .collect().head.getDouble(2) == 0.4)
  }

  test("seasonality: empty buckets join as zeros (the spine is load-bearing)") {
    // days 0,2,4 have 2 events, days 1,3 none: counts 2,0,2,0,2 —
    // lag-1 r = -1 exactly only BECAUSE the empty days exist as zeros
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = Seq(0, 2, 4).flatMap { d =>
      Seq((d * 10L, new java.sql.Timestamp(base + d * 86400000L), "k"),
        (d * 10L + 1, new java.sql.Timestamp(base + d * 86400000L + 1000L), "k"))
    }
    val out = Relational.seasonality(rows.toDF("event_id", "ts", "event_type"),
        "event_type", "ts", maxLag = 1).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq((1L, 4L, -1.0)))
  }
}
