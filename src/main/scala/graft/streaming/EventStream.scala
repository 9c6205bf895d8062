package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY §1.2 "Streams" row): the
  * reference is strictly daily batch, but the engine exposes the same
  * event analytics as an incremental pipeline — `readStream` over the
  * day-partitioned lake, watermarked tumbling windows, and a custom
  * stateful sessionizer via flatMapGroupsWithState.
  *
  * Scale notes: the windowed aggregate is the streaming twin of OQ15
  * (hourly buckets) — state is bounded by the watermark; the sessionizer
  * keys state by user_id and expires it with an event-time timeout, so
  * state size tracks ACTIVE users, not history.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp, n_events: Long,
                              total_value: Double)
  // public: Spark's state encoder instantiates this from generated Java
  final case class SessionState(start: Long, last: Long, n: Long, acc: Double)

  /** File-source stream over the events lake (schema fixed — streaming
    * sources must never infer). `maxFilesPerTrigger` bounds each
    * micro-batch's file intake — the production backfill knob (a restart
    * over a month of backlog must not take the whole backlog as one
    * giant batch) and the lever that makes mid-feed kill/recovery
    * testable deterministically. */
  def readEvents(spark: SparkSession, path: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
    maxFilesPerTrigger.foreach(m => r.option("maxFilesPerTrigger", m))
    r.parquet(path)
  }

  /** Deduplicated event feed: drops re-delivered events (at-least-once
    * sources redeliver on retry/failover) by event_id — the streaming
    * twin of Q1's batch dedupe. State is BOUNDED by the watermark:
    * dropDuplicatesWithinWatermark evicts an id once the watermark
    * passes it, unlike plain dropDuplicates whose state grows with all
    * history — the difference between a stream that runs for months and
    * one that OOMs. Rows emit as first seen (append), not
    * watermark-held. The watermark trade cuts BOTH ways, as with any
    * watermarked operator: an event arriving with ts older than the
    * current watermark is dropped even on its FIRST delivery (e.g. a
    * backfilled upstream partition surfacing in a later pass) — size
    * `watermark` to cover the source's worst-case delivery lag, and
    * route older backfills through the batch path. */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked STREAM-STREAM interval join — the streaming attribution
    * query: each purchase pairs with the same user's view events inside
    * the preceding `windowSeconds`. Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark can prove when a
    * buffered row can never match again and EVICT it — state is
    * watermark + interval bounded, not history-bounded (the condition
    * every production stream-stream join must meet or state grows
    * forever). Inner join: a match emits as soon as both rows arrive;
    * purchases with no view in the window simply never emit (use the
    * batch [[graft.operators.Relational.asOfJoin]] for last-touch-or-null
    * attribution). */
  def attributePurchases(events: DataFrame, windowSeconds: Long = 3600): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"), col("value"))
      .withWatermark("p_ts", "2 hours")
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withWatermark("v_ts", "2 hours")
    p.join(v, expr(
      s"""p_user = v_user AND
         |v_ts >= p_ts - INTERVAL $windowSeconds SECONDS AND v_ts <= p_ts""".stripMargin))
      .select(col("p_user").as("user_id"), col("p_id"), col("p_ts"),
        col("v_id"), col("v_ts"), col("value"))
  }

  /** Watermarked hourly tumbling aggregate — streaming OQ15. The
    * `watermark` sizes the late-event horizon (and so the append-mode
    * window-finalization lag and the state bound) — the default covers
    * a live feed; a backfill/replay over historical days needs the
    * horizon to cover the replayed span or re-fed old events drop as
    * late. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("s"))
      .select(col("w.start").as("h"), col("event_type"), col("c"), col("s"))

  /** Gap-based sessionization with explicit state:
    * flatMapGroupsWithState keyed by user, event-time timeout = gap.
    * Emits a session when the gap elapses (or watermark passes).
    * `watermark` sizes the late-event horizon like [[hourlyCounts]]'s —
    * a historical replay needs it to cover the replayed span. */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val gapMs = gapSeconds * 1000
          var out = List.empty[SessionOut]
          var st = state.getOption
          if (state.hasTimedOut) {
            out = st.map(s => SessionOut(user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.acc)).toList
            state.remove()
          } else {
            // stragglers (in-watermark events far BEFORE the open session)
            // accumulate into their own batch-local session so consecutive
            // late events within gapMs merge instead of emitting one
            // singleton each; the open session's span never moves backwards
            // (that would shrink its timeout and could emit end < start)
            var late: Option[SessionState] = None
            def flushLate(): Unit = {
              late.foreach(l => out ::= SessionOut(user,
                new java.sql.Timestamp(l.start), new java.sql.Timestamp(l.last),
                l.n, l.acc))
              late = None
            }
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              st match {
                case Some(s) if t > s.last + gapMs => // after: close, open new
                  out ::= SessionOut(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.acc)
                  st = Some(SessionState(t, t, 1, e.value))
                case Some(s) if t < s.start - gapMs =>
                  late match {
                    case Some(l) if t <= l.last + gapMs =>
                      late = Some(SessionState(l.start, math.max(l.last, t),
                        l.n + 1, l.acc + e.value))
                    case _ =>
                      flushLate()
                      late = Some(SessionState(t, t, 1, e.value))
                  }
                case Some(s) => // overlaps/extends the span on either side
                  st = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1, s.acc + e.value))
                case None =>
                  st = Some(SessionState(t, t, 1, e.value))
              }
            }
            flushLate()
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
          }
          out.reverseIterator
      }
  }
}
