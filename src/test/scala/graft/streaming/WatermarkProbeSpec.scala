package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** Pins Spark's exact watermark boundary semantics for append-mode
  * windowed aggregation over a multi-batch file feed — the w05 oracle is
  * written against EXACTLY these three rules, so if a Spark upgrade
  * moves a boundary this spec fails before the contract does:
  *  1. dual watermark (SPARK-40925): batch N's late filter uses the
  *     watermark as of the end of batch N-1 (so drops need >= 3 data
  *     batches; a row arriving in the same batch that evicts its window
  *     still counts);
  *  2. a replay row is dropped iff its window END is STRICTLY below
  *     that watermark (end == watermark survives);
  *  3. append mode emits a window iff its end is AT OR below the final
  *     watermark (end == watermark emits). */
class WatermarkProbeSpec extends SparkSpec {
  import spark.implicits._

  test("probe: late-row drop + emission boundaries") {
    val root = Files.createTempDirectory("wm_probe")
    val streamDir = root.resolve("stream"); Files.createDirectories(streamDir)
    def land(rows: Seq[(Long, String)], name: String, mtimeMs: Long): Unit = {
      val tmp = root.resolve(name + "_tmp")
      rows.toDF("ms", "k").select(timestamp_millis(col("ms")).as("ts"), col("k"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter { p =>
        val f = p.getFileName.toString
        f.startsWith("part-") && f.endsWith(".parquet")
      }.findFirst.get
      val dst = streamDir.resolve(name)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    val H = 3600L * 1000
    // Spark 3.4+ dual watermark: batch N's LATE filter uses the watermark
    // as of the end of batch N-1; EVICTION uses the one from batch N.
    // So drops need 3 data batches: on-time, advancer, replay.
    // batch 0 (on-time): max ts = 9h59 => W0-end = 7h59
    land(Seq((1 * H, "a"), (9 * H + 59 * 60000, "a")), "00_a.parquet", 1000000L)
    // batch 1 (advancer): max ts 10h00 exactly => W1-end = 8h00 sharp
    land(Seq((10 * H, "m")), "01_m.parquet", 2000000L)
    // batch 2 (replay) filtered against W1-end = 8h00:
    //   r1 ts=1h30 -> window end 2h00 < 8h00   => expect DROP
    //   rb ts=7h30 -> window end 8h00 == 8h00  => boundary: drop or keep?
    //   r4 ts=8h30 -> window end 9h00 > 8h00   => expect KEEP
    //   r5 ts=12h00 -> advances wmf to 10h00
    land(Seq((1 * H + 30 * 60000, "r1"), (7 * H + 30 * 60000, "rb"),
      (8 * H + 30 * 60000, "r4"), (12 * H, "r5")), "02_b.parquet", 3000000L)
    // final wmf = 10h00; emission boundary: [9,10) "a" end 10h00 == wmf
    val stream = spark.readStream.schema("ts TIMESTAMP, k STRING")
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val agg = stream.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("k"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("h"), col("k"), col("c"))
    val q = agg.writeStream.format("memory").queryName("wm_probe")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("wm_probe").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1 * H, "a") -> 1L,  // emitted: end 2h00 <= wmf
      (7 * H, "rb") -> 1L, // boundary KEPT: end 8h00 == batch-1 watermark
      (8 * H, "r4") -> 1L, // kept: end 9h00 > batch-1 watermark
      (9 * H, "a") -> 1L   // boundary EMITTED: end 10h00 == final watermark
      // r1 dropped (end 2h00 < 8h00); m's [10,11) and r5's [12,13) never
      // emitted (end > final watermark)
    ), s"watermark boundary semantics moved: $out")
  }

  test("probe: dropDuplicatesWithinWatermark suppression / eviction / late boundaries") {
    val root = Files.createTempDirectory("wm_dedup")
    val streamDir = root.resolve("stream"); Files.createDirectories(streamDir)
    def land(rows: Seq[(Long, Long)], name: String, mtimeMs: Long): Unit = {
      val tmp = root.resolve(name + "_tmp")
      rows.toDF("id", "ms").select(col("id"), timestamp_millis(col("ms")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter { p =>
        val f = p.getFileName.toString
        f.startsWith("part-") && f.endsWith(".parquet")
      }.findFirst.get
      val dst = streamDir.resolve(name)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    val H = 3600L * 1000
    // Same 3-batch discipline probe 1 pinned: batch N's late filter AND
    // the state visible to batch N reflect the watermark computed from
    // batches <= N-2, so drops/evictions need on-time + advancer + replay.
    // batch 0 (on-time): ids 1 (1h00), 5 (6h00), 2 (9h59) all emit.
    // State expiries (ts + 2h): id1 3h00, id5 8h00, id2 11h59.
    land(Seq((1L, 1 * H), (5L, 6 * H), (2L, 9 * H + 59 * 60000)),
      "00_a.parquet", 1000000L)
    // batch 1 (advancer): id9 @ 10h00 emits; watermark after batch 1
    // = 10h00 - 2h = 8h00 sharp.
    land(Seq((9L, 10 * H)), "01_m.parquet", 2000000L)
    // batch 2 (replay), filtered/evicted against wm = 8h00:
    //   id1 @ 9h00 — state EVICTED (expiry 3h00 < 8h00)      => RE-EMIT
    //   id2 @ 9h30 — state alive (expiry 11h59)              => suppressed
    //   id3 @ 1h30 — NEW id, but ts < 8h00                   => late DROP?
    //   id4 @ 9h45 — new                                     => emit
    //   id5 @ 9h50 — expiry 8h00 == watermark: boundary      => suppressed
    //                if eviction is STRICT `expiry < wm`
    //   id6 @ 8h00 — NEW id, ts == watermark exactly        => boundary
    //                (late filter is strict `ts < wm` drop, so == keeps)
    land(Seq((1L, 9 * H), (2L, 9 * H + 30 * 60000), (3L, 1 * H + 30 * 60000),
      (4L, 9 * H + 45 * 60000), (5L, 9 * H + 50 * 60000), (6L, 8 * H)),
      "02_b.parquet", 3000000L)
    val stream = spark.readStream.schema("id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val dd = stream.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("id")
    val q = dd.writeStream.format("memory").queryName("wm_dedup")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("wm_dedup").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSet
    assert(out == Set(
      (1L, 1 * H), (5L, 6 * H), (2L, 9 * H + 59 * 60000), // b0
      (9L, 10 * H),          // b1 advancer
      (1L, 9 * H),           // evicted id re-emits with the retry's ts
      (4L, 9 * H + 45 * 60000), // genuinely new id
      (6L, 8 * H)            // boundary KEPT: ts == watermark survives
    ), s"dropDuplicatesWithinWatermark boundary semantics moved: $out")
  }

  test("sessionizer drops sub-watermark late events end-to-end (x14 semantics + watermark)") {
    val root = Files.createTempDirectory("wm_sess")
    val streamDir = root.resolve("stream"); Files.createDirectories(streamDir)
    def land(rows: Seq[(Long, Long, Long)], name: String, mtimeMs: Long): Unit = {
      val tmp = root.resolve(name + "_tmp")
      rows.toDF("event_id", "ms", "user_id")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
          col("user_id"), lit("view").as("event_type"), lit(1.0).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter { p =>
        val f = p.getFileName.toString
        f.startsWith("part-") && f.endsWith(".parquet")
      }.findFirst.get
      val dst = streamDir.resolve(name)
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    val H = 3600L * 1000
    // batch 0: user 1 opens a session [1h00, 1h10]; user 2's 10h00 row
    // drives the watermark
    land(Seq((1L, 1 * H, 1L), (2L, 1 * H + 10 * 60000, 1L), (3L, 10 * H, 2L)),
      "00_a.parquet", 1000000L)
    // batch 1 (advancer): watermark after it = 10h30 - 2h = 8h30
    land(Seq((4L, 10 * H + 30 * 60000, 2L)), "01_m.parquet", 2000000L)
    // batch 2: user 1 gets a LATE event at 2h00 (< 8h30 -> engine must
    // drop it; were it kept, a spurious [2h00] session would emit when
    // 9h30 closes it) and an in-watermark event at 9h30 (> 8h30 -> kept;
    // gap-closes the open [1h00,1h10] session, which emits inline)
    land(Seq((5L, 2 * H, 1L), (6L, 9 * H + 30 * 60000, 1L)),
      "02_b.parquet", 3000000L)
    val events = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      .as[EventStream.Event]
    val q = EventStream.sessionize(events, gapSeconds = 1800)
      .writeStream.format("memory").queryName("wm_sess")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("wm_sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
    // exactly ONE emitted session: user 1 [1h00, 1h10] n=2. The late 2h00
    // event is watermark-dropped; user 1's [9h30] and user 2's
    // [10h00,10h30] sessions outlive the final watermark and stay open.
    assert(out.toSet == Set((1L, 1 * H, 1 * H + 10 * 60000, 2L)),
      s"late event leaked into the session output: ${out.toSeq}")
  }
}
