package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.Tables

class EventStreamSpec extends SparkSpec {

  // A µs-precision copy of the events fixture (the raw file is ns, which
  // streaming's fixed schema can't consume directly).
  private lazy val eventsPath: String = {
    val p = Files.createTempDirectory("graft_stream_src").toString
    Tables(spark, sf(), "events").write.mode("overwrite").parquet(p)
    p
  }

  test("deterministic samplers are streaming-safe: incremental pass = batch decisions") {
    // THE property the md5-draw discipline buys: an incremental
    // (streaming) pass over a growing corpus keeps exactly the documents
    // the batch pass keeps — stateless narrow filters, so they run
    // unchanged under Structured Streaming with no watermark or state
    val docsPath = Files.createTempDirectory("graft_stream_docs").toString
    Tables(spark, sf(), "documents").write.mode("overwrite").parquet(docsPath)
    val schema = Tables(spark, sf(), "documents").schema
    val stream = spark.readStream.schema(schema).parquet(docsPath)
    val frac = Map("en" -> 0.5, "de" -> 0.2)
    val q = graft.operators.TextAnalysis.stratifiedSample(stream, col("lang"), frac)
      .select(col("doc_id"))
      .writeStream.format("memory").queryName("mix_sampled")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("mix_sampled").collect().map(_.getLong(0)).sorted.toSeq
    val batch = graft.operators.TextAnalysis
      .stratifiedSample(Tables(spark, sf(), "documents"), col("lang"), frac)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("hourlyCounts over a file stream equals the batch OQ15 aggregation") {
    val q = EventStream.hourlyCounts(EventStream.readEvents(spark, eventsPath))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly")
      .select("h", "event_type", "c", "s").orderBy("h", "event_type").collect()
    val batch = Tables(spark, sf(), "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("s"))
      .orderBy("h", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("dedupEvents: redelivered events collapse to one row per event_id") {
    // at-least-once delivery: the whole fixture lands TWICE
    val dupPath = Files.createTempDirectory("graft_dup_src").toString
    val once = Tables(spark, sf(), "events")
    once.unionByName(once).write.mode("overwrite").parquet(dupPath)
    val q = EventStream.dedupEvents(EventStream.readEvents(spark, dupPath))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val ids = spark.table("deduped").select("event_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "duplicate event_id survived")
    assert(ids.length.toLong == once.select("event_id").distinct().count(),
      "dedup dropped or missed events vs the batch distinct")
  }

  test("stream-stream interval join equals the batch interval join") {
    val q = EventStream.attributePurchases(EventStream.readEvents(spark, eventsPath),
        windowSeconds = 3600)
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("attributed")
      .orderBy("p_id", "v_id").collect().toSeq
    val e = Tables(spark, sf(), "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    val batch = p.join(v, expr(
        "p_user = v_user AND v_ts >= p_ts - INTERVAL 3600 SECONDS AND v_ts <= p_ts"))
      .select(col("p_user").as("user_id"), col("p_id"), col("p_ts"),
        col("v_id"), col("v_ts"), col("value"))
      .orderBy("p_id", "v_id").collect().toSeq
    assert(streamed.nonEmpty, "no attributed purchases emitted")
    assert(streamed == batch) // inner interval join: stream == batch exactly
  }

  test("RocksDB state store: the stateful engine surfaces run identically under the production provider") {
    // the 100 TB state discipline (conf/cluster-smoke.conf pins this
    // provider for cluster submits): state lives off-heap in RocksDB
    // instead of the executor heap, so w05/w06-shaped state — one
    // (key, window/expiry) entry per live key — is bounded by disk, not
    // by JVM memory. Results must be IDENTICAL; only the store moves.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // w05's engine surface: watermarked tumbling aggregate
      val q1 = EventStream.hourlyCounts(EventStream.readEvents(spark, eventsPath))
        .writeStream.format("memory").queryName("hourly_rocks")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q1.awaitTermination(180000)
      val streamed = spark.table("hourly_rocks")
        .select("h", "event_type", "c", "s").orderBy("h", "event_type").collect()
      val batch = Tables(spark, sf(), "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("s"))
        .orderBy("h", "event_type").collect()
      assert(streamed.length > 0 && streamed.toSeq == batch.toSeq)
      // w06's engine surface: dropDuplicatesWithinWatermark keyed state
      val dupPath = Files.createTempDirectory("graft_dup_rocks").toString
      val once = Tables(spark, sf(), "events")
      once.unionByName(once).write.mode("overwrite").parquet(dupPath)
      val q2 = EventStream.dedupEvents(EventStream.readEvents(spark, dupPath))
        .writeStream.format("memory").queryName("deduped_rocks")
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination(180000)
      val ids = spark.table("deduped_rocks").select("event_id")
        .collect().map(_.getLong(0))
      assert(ids.length == ids.distinct.length, "duplicate event_id survived")
      assert(ids.length.toLong == once.select("event_id").distinct().count())
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stateful sessionizer emits watermark-finalized sessions") {
    import spark.implicits._
    val events = EventStream.readEvents(spark, eventsPath)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val q = EventStream.sessionize(events, gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val sessions = spark.table("sessions").collect()
    assert(sessions.nonEmpty, "no finalized sessions emitted")
    sessions.foreach { r =>
      assert(!r.getTimestamp(2).before(r.getTimestamp(1)), "end < start")
      assert(r.getLong(3) >= 1)
    }
    // sessions must not double-count: per-user event totals bounded by input
    val perUser = spark.table("sessions").groupBy("user_id")
      .agg(sum("n_events").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inputPerUser = Tables(spark, sf(), "events").groupBy("user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    perUser.foreach { case (u, n) => assert(n <= inputPerUser(u)) }
  }
}
