package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event analytics
  * (SURVEY.md §2.1 — the reference has no streaming at all; its @daily
  * Airflow schedule is batch orchestration).
  *
  * Design: `readStream → transform → writeStream` with event-time
  * watermarks bounding state. The tumbling/sliding aggregations reuse
  * the exact expressions of the batch queries (EventQueries) — the plan
  * is identical, only the source/sink differ, which is the Spark
  * promise this engine leans on: one declarative definition, two
  * execution modes.
  *
  * State-scale note: watermark = 2 hours bounds the window state to
  * (#active windows × #event types); sessionization state is one small
  * struct per ACTIVE user, evicted by event-time timeout — both
  * O(active keys), not O(stream length).
  */
object EventStreams {

  case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, session_value: Double)

  /** Internal session accumulator (public: Spark's codegen'd encoder
    * must instantiate and read it from generated Java). Times are epoch
    * MICROSECONDS (`Timestamp.getTime` would truncate to millis and
    * desync session bounds from the batch twin's timestamps); values
    * are accumulated in exact integer CENTS (the events feed is
    * 2-decimal money), so the emitted session_value is bit-identical to
    * the batch twin's decimal(12,2) sum regardless of arrival order —
    * double accumulation would drift by summation order. */
  case class SessionState(
      startUs: Long, endUs: Long, n: Int, cents: Long)

  private def toCents(v: Double): Long = math.round(v * 100)

  /** Timestamp ⇄ epoch-micros, exact for post-1970 instants. */
  private def toMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Tumbling 1-hour counts per event type, 2-hour watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour/30-minute windows, 2-hour watermark. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Built-in gap sessionization: `session_window` (30-min gap). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** STREAM-STREAM interval join — clickstream attribution: every
    * (click, view) pair of the same user within ±30 minutes. ONE
    * declarative definition that runs in both execution modes: on
    * batch frames it is a plain interval join; on streaming frames
    * Spark's stream-stream join engine buffers each side in the state
    * store and the watermark + symmetric time bound make that state
    * EVICTABLE — a click older than watermark − 30 min can never
    * match a future view, so state is bounded by the time bound, not
    * the stream length (the scale story at 100 TB/day event volume).
    * Inputs must carry (click_id, user_id, click_ts) and
    * (view_id, view_user, view_ts); callers add watermarks on the
    * streaming path. */
  def attributionPairs(clicks: DataFrame, views: DataFrame): DataFrame =
    clicks.join(views,
      expr("""user_id = view_user AND
              view_ts BETWEEN click_ts - INTERVAL 30 MINUTES
                          AND click_ts + INTERVAL 30 MINUTES"""))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))

  /** Streaming deduplication by event id: exactly-once event delivery
    * on top of an at-least-once transport, with state bounded by the
    * watermark window (`dropDuplicatesWithinWatermark` evicts seen-keys
    * older than the watermark — unbounded-state-free, unlike plain
    * dropDuplicates on a stream). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * fully-general state machine (the built-in session_window can't
    * e.g. cap session length or emit mid-session updates). One state
    * struct per active user; event-time timeout at watermark + gap
    * closes and emits the session. */
  def statefulSessions(
      spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import spark.implicits._

    val gapUs = gapMs * 1000L

    def update(
        userId: Long, batch: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = batch.toSeq.sortBy(e => toMicros(e.ts))
      var closed = List.empty[Session]
      var cur = state.getOption
      if (sorted.isEmpty) {
        if (state.hasTimedOut) {
          cur.foreach { s =>
            closed ::= Session(userId, fromMicros(s.startUs),
              fromMicros(s.endUs), s.n, s.cents / 100.0)
          }
          state.remove()
        }
      } else {
        sorted.foreach { e =>
          val t = toMicros(e.ts)
          cur match {
            case Some(s) if t - s.endUs <= gapUs =>
              cur = Some(SessionState(s.startUs, math.max(s.endUs, t),
                s.n + 1, s.cents + toCents(e.value)))
            case Some(s) =>
              closed ::= Session(userId, fromMicros(s.startUs),
                fromMicros(s.endUs), s.n, s.cents / 100.0)
              cur = Some(SessionState(t, t, 1, toCents(e.value)))
            case None =>
              cur = Some(SessionState(t, t, 1, toCents(e.value)))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // timeout in millis, rounded UP past end+gap so an event at
          // exactly the gap boundary can never race a fired timeout
          state.setTimeoutTimestamp(math.floorDiv(s.endUs + gapUs, 1000L) + 1L)
        }
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
