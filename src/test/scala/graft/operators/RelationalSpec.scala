package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("resampleCounts zero-fills every empty bucket inside each key's span") {
    val df = Seq(
      (1L, "2024-03-01 10:00:00"), (1L, "2024-03-01 23:59:59"),
      (1L, "2024-03-04 05:00:00"),
      (2L, "2024-03-02 12:00:00")
    ).toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val out = Relational.resampleCounts(df, "user_id", "ts", "day")
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, "2024-03-01 00:00:00.0", 2L),
      (1L, "2024-03-02 00:00:00.0", 0L),  // gap materialized as zero
      (1L, "2024-03-03 00:00:00.0", 0L),
      (1L, "2024-03-04 00:00:00.0", 1L),
      (2L, "2024-03-02 00:00:00.0", 1L))) // single-event key: one bucket
  }

  test("resampleCounts: hourly unit, null keys dropped, bad unit rejected") {
    val df = Seq(
      (Option(7L), "2024-03-01 10:05:00"), (Option(7L), "2024-03-01 12:30:00"),
      (Option.empty[Long], "2024-03-01 11:00:00")
    ).toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val out = Relational.resampleCounts(df, "user_id", "ts", "hour")
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(1).toString, r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-03-01 10:00:00.0", 1L),
      ("2024-03-01 11:00:00.0", 0L),  // the null-key event must NOT land here
      ("2024-03-01 12:00:00.0", 1L)))
    intercept[IllegalArgumentException] {
      Relational.resampleCounts(df, "user_id", "ts", "month")
    }
  }

  test("movingAvg: trailing ROWS window, exact ramp-in, per-key isolation") {
    val df = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L), (2L, 1L, 5L))
      .toDF("k", "t", "v")
    val out = Relational.movingAvg(df, "k", "t", "v", window = 2, as = "ma")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(out == Seq((1L, 1L, 10.0), (1L, 2L, 15.0), (1L, 3L, 25.0), (2L, 1L, 5.0)))
    intercept[IllegalArgumentException] {
      Relational.movingAvg(df, "k", "t", "v", window = 0)
    }
  }

  test("cohortRetention: first-bucket cohorts, exact offsets, offset-0 retention is 1.0") {
    // two users start week of Jan 1 (Mon), one returns two weeks later;
    // one user starts week of Jan 8
    val ev = Seq(
      (1L, "2024-01-02 10:00:00"), (2L, "2024-01-03 10:00:00"),
      (1L, "2024-01-16 10:00:00"),
      (3L, "2024-01-09 10:00:00")
    ).toDF("user_id", "t").select(col("user_id"), to_timestamp(col("t")).as("ts"))
    val out = Relational.cohortRetention(ev, "user_id", "ts", "week")
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 2L, 1L, 2L, 0.5),
      ("2024-01-08", 0L, 1L, 1L, 1.0)))
  }

  test("ewma: offset-weighted trailing average, ramp-in normalizer, no phantom buckets") {
    val counts = Seq(
      ("u", "2024-01-01", 2L), ("u", "2024-01-02", 0L), ("u", "2024-01-03", 4L),
      ("w", "2024-01-05", 9L)
    ).toDF("user_id", "b", "n_events")
      .select(col("user_id"), to_timestamp(col("b")).as("bucket"), col("n_events"))
    val out = Relational.ewma(counts, "user_id", "n_events",
        window = 2, alpha = 0.5, unit = "day")
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSeq
    // weights 1, 0.5: d0 = 2/1; d1 = (0 + 0.5·2)/1.5; d2 = (4 + 0.5·0)/1.5;
    // the singleton key is its own value; votes past each series end vanish
    assert(out == Seq(
      ("u", 2L, 2.0), ("u", 0L, 0.666667), ("u", 4L, 2.666667),
      ("w", 9L, 9.0)))
    intercept[IllegalArgumentException] {
      Relational.ewma(counts, "user_id", "n_events", window = 2, alpha = 0.0)
    }
  }

  test("rollingZscore: spike flags vs noisy history; constant history flags any deviation") {
    val df = Seq(
      (1L, 1L, 10L), (1L, 2L, 12L), (1L, 3L, 10L), (1L, 4L, 11L), (1L, 5L, 30L), (1L, 6L, 11L),
      (2L, 1L, 5L), (2L, 2L, 5L), (2L, 3L, 5L), (2L, 4L, 9L)
    ).toDF("k", "t", "v")
    val out = Relational.rollingZscore(df, "k", "t", "v", window = 4, k = 3)
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, 1L, None, 0L),            // no history at all
      (1L, 2L, None, 0L),            // 1 history row: no baseline, never flagged
      (1L, 3L, Some(-1.0), 0L),      // hist {10,12}: z = -2/sqrt(4)
      (1L, 4L, Some(0.3536), 0L),    // hist {10,12,10}: z = 1/sqrt(8)
      (1L, 5L, Some(23.2164), 1L),   // hist {10,12,10,11}: z = 77/sqrt(11) — flagged
      (1L, 6L, Some(-0.5752), 0L),   // the spike is now HISTORY: variance absorbs it
      (2L, 1L, None, 0L),
      (2L, 2L, None, 0L),
      (2L, 3L, None, 0L),            // constant history, zero deviation: quiet
      (2L, 4L, None, 1L)))           // constant history, ANY deviation = infinite sigmas
    intercept[IllegalArgumentException] {
      Relational.rollingZscore(df, "k", "t", "v", window = 1)
    }
  }

  test("pivotCounts: explicit categories, absent combos are 0, unlisted values ignored") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b"), (2L, "zz")).toDF("k", "c")
    val out = Relational.pivotCounts(df, "k", "c", Seq("a", "b", "unseen"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // the zz row matches no listed category and contributes nowhere
    assert(out == Seq((1L, 2L, 1L, 0L), (2L, 0L, 1L, 0L)))
    assert(Relational.pivotCounts(df, "k", "c", Seq("a", "b", "unseen"))
      .columns.toSeq == Seq("k", "a", "b", "unseen"))
    intercept[IllegalArgumentException] { Relational.pivotCounts(df, "k", "c", Nil) }
  }

  test("rollingDistinct: window-trailing active counts, dedup within bucket, no future buckets") {
    val df = Seq(
      (1L, "2024-03-01 10:00:00"), (1L, "2024-03-01 12:00:00"), // same user+day: ONE vote
      (2L, "2024-03-01 11:00:00"),
      (1L, "2024-03-03 09:00:00"),
      (3L, "2024-03-05 09:00:00")
    ).toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val out = Relational.rollingDistinct(df, "user_id", "ts", "day", window = 3)
      .orderBy("bucket").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1))).toSeq
    assert(out == Seq(
      ("2024-03-01", 2L),   // users 1,2 active today
      ("2024-03-02", 2L),   // still within their 3-day window
      ("2024-03-03", 2L),   // user 2's day-1 activity still counts; user 1 re-active
      ("2024-03-04", 1L),   // only user 1 (day-3) remains in window
      ("2024-03-05", 2L)))  // users 1 (day-3) and 3; NOTHING past the last day
  }

  test("quantileBuckets: exact quartiles of 1..8, threshold ties fall low") {
    val df = (1L to 8L).map(i => (i, i)).toDF("id", "v")
    val out = Relational.quantileBuckets(df, "v", 4)
      .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // thresholds 2.75 / 4.5 / 6.25 → pairs per bucket
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L),
      (5L, 3L), (6L, 3L), (7L, 4L), (8L, 4L)))
    // a value EQUAL to a threshold goes to the LOWER bucket
    val tied = Seq(1L, 2L, 2L, 2L, 9L).map(v => (v, v)).toDF("id", "v")
    val b = Relational.quantileBuckets(tied, "v", 2).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(b(2L) == 1L && b(9L) == 2L) // median 2.0: the 2s stay in bucket 1
    intercept[IllegalArgumentException] { Relational.quantileBuckets(df, "v", 1) }
  }

  test("quantileBucketsBy: thresholds are per group — the same value lands in different buckets") {
    val df = (Seq.tabulate(8)(i => ("a", (i + 1).toLong)) ++
      Seq.tabulate(8)(i => ("b", (i + 101).toLong)) :+ ("b" -> 8L))
      .map { case (g, v) => (g, v) }.toDF("g", "v")
    val out = Relational.quantileBucketsBy(df, "g", "v", 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // v=8 is the MAX of group a (bucket 2) but the minimum of group b (bucket 1)
    assert(out.contains(("a", 8L, 2L)))
    assert(out.contains(("b", 8L, 1L)))
  }

  test("percentRankBy: SQL-standard ranks from the histogram formulation, ties shared") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("a", 30L), ("b", 5L))
      .toDF("g", "v")
    val out = Relational.percentRankBy(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out(("a", 10L)) == 0.0)       // nothing below
    assert(out(("a", 20L)) == 0.333333)  // 1 below / (4-1), both ties share it
    assert(out(("a", 30L)) == 1.0)
    assert(out(("b", 5L)) == 0.0)        // singleton group scores 0
  }

  test("winsorizedMeanBy clips into the percentile band before averaging") {
    val df = (Seq.tabulate(10)(i => ("a", (i + 1).toLong)) ++
      Seq(("b", 1L), ("b", 2L), ("b", 3L), ("b", 1000L))).toDF("g", "v")
    val out = Relational.winsorizedMeanBy(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    // a: 1→1.45, 10→9.55 (R-7 percentiles), sum 55.0 → mean 5.5
    assert(out("a") == (10L, 5.5))
    // b: the 1000 outlier clips to p95 = 850.45, 1 clips to 1.15 →
    // (1.15 + 2 + 3 + 850.45) / 4; a raw mean would be 251.5
    assert(out("b") == (4L, 214.15))
  }

  test("rangeJoinBucketed matches the naive non-equi join and is width-independent") {
    val pts = Seq(1L, 5L, 7L, 12L, 30L).toDF("p")
    val iv = Seq((0L, 6L, "a"), (5L, 5L, "b"), (8L, 20L, "c"), (25L, 24L, "d"))
      .toDF("lo", "hi", "tag") // d has lo > hi: an empty range, dropped
    def run(w: Long) = Relational.rangeJoinBucketed(pts, "p", iv, "lo", "hi", w)
      .select("p", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(naive == Set((1L, "a"), (5L, "a"), (5L, "b"), (12L, "c")))
    // bucket width is a performance knob, never a semantics knob
    assert(run(1) == naive && run(3) == naive && run(100) == naive)
  }

  test("dedupeKeepFirst keeps exactly the first row per key under the order") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 5)).toDF("k", "v", "ts")
    val out = Relational.dedupeKeepFirst(df, Seq(col("k")), Seq(col("ts")))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "c")))
    assert(!out.head.schema.fieldNames.contains("__rn"))
  }

  test("dedupeKeepFirst keep=k retains the first k rows per key") {
    val df = Seq((1, "a", 1), (1, "b", 2), (1, "c", 3), (2, "x", 9)).toDF("k", "v", "ts")
    val out = Relational.dedupeKeepFirst(df, Seq(col("k")), Seq(col("ts")), keep = 2)
      .orderBy("k", "ts").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "a"), (1, "b"), (2, "x")))
  }

  test("upsert: matched update row wins wholesale, including NULL overwrite") {
    val base = Seq((1, Option("old"), Option(10)), (2, Option("keep"), Option(20)))
      .toDF("k", "v", "n")
    val updates = Seq((1, Option.empty[String], Option(11)), (3, Option("new"), Option(30)))
      .toDF("k", "v", "n")
    val out = Relational.upsert(base, updates, "k").orderBy("k").collect()
    // key 1 matched: update's NULL v overwrites "old" (true MERGE semantics)
    assert(out(0) == Row(1, null, 11))
    assert(out(1) == Row(2, "keep", 20))
    assert(out(2) == Row(3, "new", 30))
  }

  test("upsert is idempotent: applying the same delta twice equals once") {
    val base = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val upd = Seq((2, "B"), (3, "c")).toDF("k", "v")
    val once = Relational.upsert(base, upd, "k")
    val twice = Relational.upsert(once, upd, "k")
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("sessionize splits on gap and leaks no helper columns") {
    val df = Seq(
      ("u1", 0L, 1), ("u1", 100L, 2), ("u1", 5000L, 3), ("u2", 0L, 4)
    ).toDF("user", "ts_us", "id")
    val out = Relational.sessionize(df, col("user"), col("ts_us"), col("id"), gapMicros = 1000L)
    assert(out.columns.toSet == Set("user", "ts_us", "id", "session_id"))
    val sess = out.orderBy("user", "ts_us").collect()
      .map(r => (r.getString(0), r.getInt(2), r.getLong(3))).toSeq
    assert(sess == Seq(("u1", 1, 1L), ("u1", 2, 1L), ("u1", 3, 2L), ("u2", 4, 1L)))
  }

  test("intervalOverlapJoin: closed-interval overlap, exactly-once across shared buckets, per-key") {
    val left = Seq(
      ("k1", 1L, 0L, 35L),    // spans buckets 0-3
      ("k1", 2L, 0L, 100L),   // wide: shares MANY buckets with any match
      ("k1", 4L, 50L, 60L),   // touches right 9 at exactly 50 (closed)
      ("k1", 5L, 200L, 210L), // no overlap
      ("k1", 7L, 10L, 5L),    // empty interval: dropped
      ("k2", 6L, 30L, 50L)    // other key: must never pair with k1
    ).toDF("k", "lid", "llo", "lhi")
    val right = Seq(
      ("k1", 9L, 30L, 50L),
      ("k1", 8L, 5L, 95L)
    ).toDF("k", "rid", "rlo", "rhi")
    val out = Relational.intervalOverlapJoin(left, "llo", "lhi",
        right, "rlo", "rhi", bucketWidth = 10L, keys = Seq("k"))
      .groupBy("lid", "rid").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.values.forall(_ == 1L), s"duplicate emission: $out") // exactly-once
    assert(out.keySet == Set(
      (1L, 9L), (1L, 8L),  // [0,35]×[30,50], [0,35]×[5,95]
      (2L, 9L), (2L, 8L),  // the wide interval overlaps both
      (4L, 9L), (4L, 8L))) // boundary touch at 50 counts (closed intervals)
  }

  test("heavyHitters: exact top-k with share and skew ratio; null keys surface") {
    val df = (Seq.fill(6)(Option(7L)) ++ Seq.fill(3)(None) ++
      Seq.fill(2)(Option(1L)) ++ Seq(Option(2L))).toDF("k")
    val out = Relational.heavyHitters(df, col("k"), k = 2).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // tot=12, nk=4, mean=3: key 7 (n=6) share 0.5 skew 2; null (n=3) skew 1
    assert(out.toSeq == Seq(
      (Some(7L), 6L, 0.5, 2.0), (None, 3L, 0.25, 1.0)))
  }

  test("transitionCounts: consecutive-only, per-user, tie broken by the order columns") {
    val df = Seq(
      // u1: A@1 B@2 A@3 C@4 — transitions A→B, B→A, A→C
      ("u1", 1L, 1L, "A"), ("u1", 2L, 2L, "B"), ("u1", 3L, 3L, "A"), ("u1", 4L, 4L, "C"),
      // u2: two same-ts events — event_id tie-break fixes X→Y, never Y→X
      ("u2", 5L, 1L, "X"), ("u2", 5L, 2L, "Y")
    ).toDF("user", "ts", "eid", "etype")
    val out = Relational.transitionCounts(df, col("user"),
        Seq(col("ts"), col("eid")), col("etype"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("A", "B") -> 1L, ("B", "A") -> 1L, ("A", "C") -> 1L,
      ("X", "Y") -> 1L))
    assert(!out.contains(("C", "X")), "transitions must never cross users")
  }

  test("topK plans as TakeOrderedAndProject (no global sort at scale)") {
    val df = spark.range(1000).toDF("x")
    val top = Relational.topK(df, Seq(col("x").desc), 5)
    assert(top.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(top.collect().map(_.getLong(0)).toSeq == Seq(999L, 998L, 997L, 996L, 995L))
  }

  test("saltedJoin equals the plain inner join on a skewed key (salting is invisible)") {
    // 900 of 1000 big rows share key 7 — the hot-reducer shape
    val big = spark.range(1000).select(
      when(col("id") < 900, 7L).otherwise(col("id")).as("k"), col("id").as("v"))
    val small = Seq((7L, "hot"), (950L, "cold"), (999L, "tail"), (1234L, "unmatched"))
      .toDF("k", "name")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(t => (t._1, t._2)).toSeq
    val salted = rows(Relational.saltedJoin(big, small, "k", saltBuckets = 8)
      .select("k", "v", "name"))
    val plain = rows(big.join(small, "k").select("k", "v", "name"))
    assert(salted == plain)
    assert(salted.count(_._1 == 7L) == 900) // the hot key survives wholesale
    // an explicit salt (even a constant) stays correct, only less spread
    val const = rows(Relational.saltedJoin(big, small, "k", 8, Some(lit(3))).select("k", "v", "name"))
    assert(const == plain)
  }

  test("saltedAgg matches plain groupBy on a skewed key distribution") {
    val df = ((1 to 1000).map(i => ("hot", i.toDouble)) ++
      (1 to 10).map(i => ("cold", i.toDouble))).toDF("k", "v")
    val salted = Relational.saltedAgg(df, "k", saltBuckets = 8, aggs = Seq(
      (count(lit(1)), "n", (c: org.apache.spark.sql.Column) => sum(c)),
      (sum(col("v")), "total", (c: org.apache.spark.sql.Column) => sum(c))))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedAgg salt is deterministic: identical per-bucket partials across repartitionings") {
    val df = ((1 to 500).map(i => ("hot", i)) ++ (1 to 5).map(i => ("cold", i)))
      .toDF("k", "v")
    // merge phase = sorted list of per-bucket partial counts: stable ONLY if
    // every row lands in the same bucket regardless of input partitioning
    def buckets(in: org.apache.spark.sql.DataFrame) =
      Relational.saltedAgg(in, "k", saltBuckets = 8, aggs = Seq(
        (count(lit(1)), "parts",
          (c: org.apache.spark.sql.Column) => sort_array(collect_list(c)))))
        .orderBy("k").collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
    assert(buckets(df) == buckets(df.repartition(13)))
    assert(buckets(df) == buckets(df.repartition(3, col("v"))))
  }

  test("saltedAgg default salt tolerates map columns (hash() rejects MapType)") {
    val df = ((1 to 100).map(i => ("hot", i.toDouble, Map("m" -> i))) ++
      (1 to 5).map(i => ("cold", i.toDouble, Map("m" -> i)))).toDF("k", "v", "meta")
    val salted = Relational.saltedAgg(df, "k", saltBuckets = 4, aggs = Seq(
      (count(lit(1)), "n", (c: org.apache.spark.sql.Column) => sum(c)),
      (sum(col("v")), "total", (c: org.apache.spark.sql.Column) => sum(c))))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("asOfJoin: latest at-or-before right row per left row; null when none precedes") {
    val trades = Seq((1L, 10L, "t1"), (1L, 25L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "t", "tag")
    val quotes = Seq((1L, 5L, 1.0), (1L, 10L, 2.0), (1L, 20L, 3.0), (2L, 9L, 9.0))
      .toDF("k", "qt", "px")
    val out = Relational.asOfJoin(trades, quotes, "k", "t", "qt")
      .orderBy("k", "t").collect()
    def px(r: org.apache.spark.sql.Row) =
      if (r.isNullAt(r.fieldIndex("px_asof"))) None else Some(r.getDouble(r.fieldIndex("px_asof")))
    assert(px(out(0)) == Some(2.0)) // equal timestamp is INCLUSIVE
    assert(out(0).getLong(out(0).fieldIndex("qt_asof")) == 10L)
    assert(px(out(1)) == Some(3.0)) // latest preceding, not just any
    assert(px(out(2)) == None)      // k=2 at t=5: quote at 9 is in the future
    // left row count preserved, left columns intact
    assert(out.length == 3 && out.map(_.getString(2)).sorted.toSeq == Seq("t1", "t2", "t3"))
    // JOIN null semantics: a null-key quote matches NO left row
    val nullQuotes = Seq((Option.empty[Long], 1L, 7.0), (Option(2L), 9L, 9.0))
      .toDF("k", "qt", "px")
    val out2 = Relational.asOfJoin(trades, nullQuotes, "k", "t", "qt")
      .orderBy("k", "t").collect()
    assert(px(out2(0)) == None && px(out2(1)) == None) // k=1 rows see nothing
    assert(px(out2(2)) == None)                        // k=2 at t=5: quote at 9 is later
    // null-ts quotes are invisible (t >= NULL is never true), and a
    // matched row arrives WHOLESALE: its null payload value must NOT be
    // backfilled from an older quote (no column tearing)
    val q3 = Seq(
      (Option(1L), Option(5L), Option(1.0)),
      (Option(1L), Option(10L), Option.empty[Double]), // latest at t>=10, px genuinely null
      (Option(1L), Option.empty[Long], Option(99.0))   // null ts: matches nothing
    ).toDF("k", "qt", "px")
    val out3 = Relational.asOfJoin(trades, q3, "k", "t", "qt")
      .orderBy("k", "t").collect()
    def qt(r: org.apache.spark.sql.Row) = r.getLong(r.fieldIndex("qt_asof"))
    assert(qt(out3(0)) == 10L && px(out3(0)) == None) // wholesale row, null px kept
    assert(qt(out3(1)) == 10L && px(out3(1)) == None) // 99.0 never leaks in
  }

  test("snapshotDiff: added/removed/changed, unchanged filtered, null vs empty distinct") {
    val oldSnap = Seq(
      (1L, Option("a"), "en"), // unchanged
      (2L, Option("b"), "en"), // removed
      (3L, Option("c"), "en"), // changed text
      (4L, Option.empty[String], "en"), // null -> "" must surface
      (5L, Option("e"), "en")  // changed lang only
    ).toDF("doc_id", "text", "lang")
    val newSnap = Seq(
      (1L, Option("a"), "en"),
      (3L, Option("c2"), "en"),
      (4L, Option(""), "en"),
      (5L, Option("e"), "es"),
      (6L, Option("f"), "en")  // added
    ).toDF("doc_id", "text", "lang")
    val out = Relational.snapshotDiff(oldSnap, newSnap, Seq("doc_id"), Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "removed", 3L -> "changed", 4L -> "changed",
      5L -> "changed", 6L -> "added"))
    // the join ships digests, never the compared payloads
    val p = Relational.snapshotDiff(oldSnap, newSnap, Seq("doc_id"), Seq("text", "lang"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") || !p.contains("text#"),
      "compared payload columns leaked past the digest projection")
  }

  test("madOutliersBy: robust flag survives the outlier that breaks z-scoring; MAD=0 flags any deviation") {
    // group a: {10,10,10,10,1000} — median 10, MAD 0 (>=half identical):
    // the 1000 flags, the 10s don't. With mean/stddev the 1000 would drag
    // sigma to ~443 and z(1000) ~ 1.8 — a 3-sigma gate would MISS it.
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L), (4L, "a", 10L), (5L, "a", 1000L),
      // group b: {1,2,3,4,100} — median 3, deviations {2,1,0,1,97}, MAD 1:
      // only the 100 exceeds 3*MAD
      (6L, "b", 1L), (7L, "b", 2L), (8L, "b", 3L), (9L, "b", 4L), (10L, "b", 100L)
    ).toDF("id", "g", "v")
    val out = Relational.madOutliersBy(df, "g", "id", "v", k = 3.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 5L -> true,
      6L -> false, 7L -> false, 8L -> false, 9L -> false, 10L -> true))
    // no window, no range partitioning — thresholds broadcast
    val p = Relational.madOutliersBy(df, "g", "id", "v").queryExecution.executedPlan.toString
    assert(!p.contains("Window") && !p.contains("rangepartitioning"), p)
  }

  test("sessionTranscripts: ordered digests; same sequence same digest, order matters") {
    // users 1 and 2 emit the same turns in the same order (different
    // absolute times); user 3 emits them REVERSED. A 2h gap splits
    // user 1's day into two sessions.
    val us = (m: Long) => m * 60L * 1000000L
    val ev = Seq(
      (1L, 1L, "view", us(0)), (1L, 2L, "cart", us(5)), (1L, 3L, "buy", us(10)),
      (1L, 4L, "view", us(200)),                      // second session
      (2L, 5L, "view", us(1000)), (2L, 6L, "cart", us(1005)), (2L, 7L, "buy", us(1010)),
      (3L, 8L, "buy", us(0)), (3L, 9L, "cart", us(5)), (3L, 10L, "view", us(10))
    ).toDF("user_id", "event_id", "event_type", "usec")
    val out = Relational.sessionTranscripts(ev, col("user_id"), col("usec"),
        col("event_id"), gapMicros = us(30), turn = col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L), (3L, 1L)))
    assert(out((1L, 1L))._1 == 3L && out((1L, 2L))._1 == 1L)
    // identical ordered sequences digest identically across users...
    assert(out((1L, 1L))._2 == out((2L, 1L))._2)
    // ...and order is part of the identity
    assert(out((1L, 1L))._2 != out((3L, 1L))._2)
  }

  test("upsert: a NULL-key update row is inserted with its values (MERGE insert branch)") {
    val base = Seq((Option(1), "a")).toDF("k", "v")
    val upd = Seq((Option.empty[Int], "orphan"), (Option(2), "b")).toDF("k", "v")
    val out = Relational.upsert(base, upd, "k")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getString(1))).toSet
    assert(out == Set(Some(1) -> "a", Some(2) -> "b", None -> "orphan"))
  }

  test("psiDrift: identical snapshots score 0 everywhere; a shift moves mass where expected") {
    import spark.implicits._
    val base = (1L to 100L).map(v => Tuple1(v)).toDF("v")
    // identical distributions: every term is exactly 0 (p == q bucket-wise)
    val same = Relational.psiDrift(base, base, "v", buckets = 4).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
    assert(same.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    same.foreach { case (b, (p, q, t)) =>
      assert(p == q && t == 0.0, s"bucket $b: p=$p q=$q term=$t") }
    // recent mass concentrated above the baseline's top quartile: the top
    // bucket over-represents (q > p, term > 0), the bottom under-represents
    val high = (80L to 120L).map(v => Tuple1(v)).toDF("v")
    val drift = Relational.psiDrift(base, high, "v", buckets = 4).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(drift(3L)._2 > drift(3L)._1, s"top bucket: $drift")
    assert(drift(0L)._2 < drift(0L)._1, s"bottom bucket: $drift")
    // every psi term is non-negative by construction ((p-q) and ln(p/q)
    // share sign), and the drifted total is clearly nonzero
    drift.values.foreach { case (_, _, t) => assert(t >= 0.0) }
    assert(drift.values.map(_._3).sum > 0.1)
  }
}
