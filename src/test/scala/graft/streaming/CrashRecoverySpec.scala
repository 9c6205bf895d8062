package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.SparkSpec
import graft.sources.Tables

/** Streaming crash-recovery: the property a 100 TB deployment actually
  * risks is not a clean run but a RESTART — an executor loss or deploy
  * kills the query mid-feed and it must resume from the checkpoint with
  * no loss and no double-emission. Each scenario:
  *
  *   1. starts a w05/w06-shaped query over a file source throttled to
  *      ONE file per micro-batch (so every redelivered event_id's two
  *      copies land in DIFFERENT batches, and the kill point always
  *      splits some of them),
  *   2. stops the query after >= 2 committed micro-batches, while files
  *      remain unprocessed — state (seen ids / open windows) spans the
  *      kill,
  *   3. restarts from the SAME checkpoint into the SAME parquet sink
  *      (whose _spark_metadata manifest is the exactly-once ledger: an
  *      uncommitted batch's files are invisible to readers and the
  *      restart reprocesses that batch), and
  *   4. asserts the drained sink equals the batch answer exactly.
  *
  * Both state-store providers are exercised — the default HDFS-backed
  * heap store and the RocksDB provider `conf/cluster-smoke.conf` pins
  * for cluster submits (a provider cannot be switched across a restart
  * of one checkpoint, so each scenario owns one). Watermarks are sized
  * to cover the fixture's 30-day span (90 days) — this is a REPLAY of
  * historical days, the shape where an undersized horizon silently
  * drops re-fed events as late (the [[EventStream.dedupEvents]] doc's
  * trade); the windowed-agg scenario then lands one horizon-crossing
  * sentinel to push the watermark past every real window, which is how
  * an append-mode backfill is flushed in production too. */
class CrashRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider(provider: Option[String])(body: => Unit): Unit = {
    val prior = spark.conf.getOption(providerKey)
    provider.foreach(spark.conf.set(providerKey, _))
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  /** Stop `q` once >= `batches` micro-batches have committed (or it
    * drains first — recorded, not failed: the equality asserts below are
    * the contract either way, and the 1-file-per-batch throttle makes a
    * pre-stop drain practically unreachable). */
  private def killAfter(q: StreamingQuery, batches: Int): Boolean = {
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (q.isActive && q.recentProgress.length < batches &&
           System.nanoTime() < deadline) Thread.sleep(50)
    val midFeed = q.isActive
    q.stop()
    // a restart against the same checkpoint while this query still holds
    // it would fail confusingly downstream — fail HERE if stop() hangs
    assert(q.awaitTermination(120000), "killed query did not stop within 120s")
    midFeed
  }

  private def events: DataFrame = Tables(spark, sf(), "events")

  test("w06 shape: kill mid-feed + restart — deduped sink equals batch distinct under both providers") {
    for ((provider, tag) <- Seq(None -> "heap", Some(rocksdb) -> "rocks")) {
      withProvider(provider) {
        val src = Files.createTempDirectory(s"graft_cr_dsrc_$tag").toString
        val sink = Files.createTempDirectory(s"graft_cr_dsink_$tag").toString
        val ckpt = Files.createTempDirectory(s"graft_cr_dckpt_$tag").toString
        // the whole fixture lands TWICE (at-least-once redelivery), four
        // files per copy: with 1 file/batch every id's duplicate is in a
        // different batch than its first delivery
        events.repartition(4).write.mode("append").parquet(src)
        events.repartition(4).write.mode("append").parquet(src)
        def start(): StreamingQuery = EventStream.dedupEvents(
            EventStream.readEvents(spark, src, maxFilesPerTrigger = Some(1)),
            watermark = "90 days")
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        val midFeed = killAfter(start(), batches = 2)
        info(s"[$tag] killed mid-feed: $midFeed")
        val q2 = start() // recovery: same checkpoint, same sink
        assert(q2.awaitTermination(180000), "restarted query did not drain")
        val ids = spark.read.parquet(sink).select("event_id")
          .collect().map(_.getLong(0))
        assert(ids.length == ids.distinct.length,
          s"[$tag] duplicate event_id crossed the restart")
        val expected = events.select("event_id").distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(ids.sorted.toSeq == expected,
          s"[$tag] lost or phantom events: ${ids.length} vs ${expected.length}")
      }
    }
  }

  test("custom state shape: sessionizer kill mid-feed + restart — flatMapGroupsWithState state recovers, events conserved under both providers") {
    // the riskiest state surface: a USER-DEFINED case-class state
    // (SessionState) serialized by the state store and restored across a
    // restart. Session BOUNDARIES can legitimately depend on micro-batch
    // grouping (the straggler-merge rule), so the restart assertion is
    // the batching-independent conservation law instead: once a
    // horizon-crossing sentinel flushes every open session, the emitted
    // sessions PARTITION each user's events — per-user Σ n_events equals
    // the input event count exactly (nothing lost at the kill, nothing
    // re-emitted by the restart) and every session is well-formed.
    import spark.implicits._
    val gapSeconds = 1800L
    for ((provider, tag) <- Seq(None -> "heap", Some(rocksdb) -> "rocks")) {
      withProvider(provider) {
        val src = Files.createTempDirectory(s"graft_cr_ssrc_$tag").toString
        val sink = Files.createTempDirectory(s"graft_cr_ssink_$tag").toString
        val ckpt = Files.createTempDirectory(s"graft_cr_sckpt_$tag").toString
        events.repartition(6).write.mode("append").parquet(src)
        def start(): StreamingQuery = EventStream.sessionize(
            EventStream.readEvents(spark, src, maxFilesPerTrigger = Some(1))
              .select("event_id", "ts", "user_id", "event_type", "value")
              .as[EventStream.Event],
            gapSeconds = gapSeconds,
            watermark = "90 days") // replay horizon covers the fixture span
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        val midFeed = killAfter(start(), batches = 2)
        info(s"[$tag] killed mid-feed: $midFeed")
        val q2 = start()
        assert(q2.awaitTermination(180000), "restarted query did not drain")
        // flush every open session: sentinel far enough past max(ts) that
        // the final watermark (sentinel - 90d) passes every timeout
        val maxTs = events.agg(max("ts")).collect()(0).getTimestamp(0)
        val sentinelTs = new java.sql.Timestamp(
          maxTs.getTime + (90L * 24 * 3600 + gapSeconds + 3600) * 1000L)
        Seq((-1L, sentinelTs, -1L, "sentinel", 0.0, null: String))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("append").parquet(src)
        val q3 = start()
        assert(q3.awaitTermination(180000), "flush query did not drain")
        val sessions = spark.read.parquet(sink)
          .filter(col("user_id") =!= -1L).collect()
        assert(sessions.nonEmpty, s"[$tag] nothing flushed")
        sessions.foreach { r =>
          assert(!r.getTimestamp(2).before(r.getTimestamp(1)),
            s"[$tag] session end < start")
          assert(r.getLong(3) >= 1)
        }
        // conservation across the kill: the 90-day horizon drops nothing
        // as late, so flushed sessions PARTITION each user's events —
        // exact per-user equality, for EVERY user
        val perUser = spark.read.parquet(sink)
          .filter(col("user_id") =!= -1L)
          .groupBy("user_id").agg(sum("n_events").as("n")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val inputPerUser = events.groupBy("user_id")
          .agg(count(lit(1)).as("n")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(perUser.keySet == inputPerUser.keySet,
          s"[$tag] users lost or invented across the restart")
        inputPerUser.foreach { case (u, n) =>
          assert(perUser(u) == n,
            s"[$tag] user $u not conserved across the restart: ${perUser(u)} vs $n")
        }
      }
    }
  }

  test("w05 shape: kill mid-feed + restart — windowed aggregate state survives; flushed sink equals batch under both providers") {
    for ((provider, tag) <- Seq(None -> "heap", Some(rocksdb) -> "rocks")) {
      withProvider(provider) {
        val src = Files.createTempDirectory(s"graft_cr_asrc_$tag").toString
        val sink = Files.createTempDirectory(s"graft_cr_asink_$tag").toString
        val ckpt = Files.createTempDirectory(s"graft_cr_ackpt_$tag").toString
        events.repartition(6).write.mode("append").parquet(src)
        def start(): StreamingQuery = EventStream.hourlyCounts(
            EventStream.readEvents(spark, src, maxFilesPerTrigger = Some(1)),
            watermark = "90 days")
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        // kill with open windows: every hourly window is inside the
        // 90-day horizon, so ALL aggregate state is live at the stop
        val midFeed = killAfter(start(), batches = 2)
        info(s"[$tag] killed mid-feed: $midFeed")
        val q2 = start() // recovery: remaining files fold into restored state
        assert(q2.awaitTermination(180000), "restarted query did not drain")
        // horizon-crossing sentinel: pushes the watermark past every real
        // window (watermark = sentinel - 90d > max real window end); its
        // own window stays open and never emits
        val maxTs = events.agg(max("ts")).collect()(0).getTimestamp(0)
        val sentinelTs = new java.sql.Timestamp(
          maxTs.getTime + 92L * 24 * 3600 * 1000)
        Seq((-1L, sentinelTs, 0L, "sentinel", 0.0, null: String))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("append").parquet(src)
        val q3 = start() // flush
        assert(q3.awaitTermination(180000), "flush query did not drain")
        val streamed = spark.read.parquet(sink)
          .select("h", "event_type", "c", "s")
          .orderBy("h", "event_type").collect().toSeq
        val batch = events
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("s"))
          .orderBy("h", "event_type").collect().toSeq
        assert(streamed.nonEmpty, s"[$tag] nothing flushed")
        assert(streamed == batch,
          s"[$tag] restart lost or double-counted window state")
      }
    }
  }
}
