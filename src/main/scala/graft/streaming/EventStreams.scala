package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * Scale design: both operators keyed-shuffle once on their state key
  * (window+type / user_id) and hold O(active keys) state in the state
  * store; watermarks bound state growth and late-data buffering. The
  * same code runs against a Kafka/file source in production — tests
  * drive it with MemoryStream.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserSession(
      user_id: Long, n_events: Long, start_ts: Long, end_ts: Long)

  /** public + plain field names: Spark's state-store encoder codegen
    * chokes on private nested classes */
  final case class SessionState(n: Long, startMs: Long, lastMs: Long)

  /** Tumbling-window per-type counts with a watermark: late events beyond
    * the watermark are dropped, window state is evicted once the
    * watermark passes the window end. */
  def windowedTypeCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      win: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("cnt"), col("total_value"))

  /** Streaming exact dedup: keep the first document per content
    * fingerprint, with BOUNDED state. `dropDuplicatesWithinWatermark`
    * evicts a fingerprint once the watermark passes its event time, so
    * state is O(distinct docs within the lateness window) — plain
    * `dropDuplicates` on a non-event-time key would retain every
    * fingerprint for the life of the stream. The trade (inherent to
    * bounded state): a duplicate arriving later than the watermark
    * window re-admits its document; size the watermark to the dedup
    * horizon you need. Same exact-dedup semantics as the batch
    * `Dedup.exactStats`/`keepFirstByKey` pair, applied at ingest. */
  def dedupStream(
      docs: DataFrame, // streaming frame with (ts, doc_id, text)
      textCol: String = "text",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__fp", md5(col(textCol).cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Stream-stream interval self-join: pair each `typeA` event with the
    * same user's `typeB` events that follow within `within` (funnel /
    * attribution join — "purchases within 2h of a click"). Both sides
    * carry event-time watermarks and the join condition carries the
    * time bound, so Spark evicts join state once the watermark passes
    * an event's `ts + within` — state is O(events inside the horizon),
    * not O(stream). Emits one row per (a, b) pair in append mode. */
  def followWithin(events: DataFrame, typeA: String, typeB: String,
      within: String = "2 hours",
      watermark: String = "10 minutes"): DataFrame = {
    val a = events.filter(col("event_type") === typeA)
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = events.filter(col("event_type") === typeB)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b,
      col("b_user") === col("a_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"))
  }

  /** Gap-based sessionization via flatMapGroupsWithState: one state entry
    * per active user; a session closes when a later event arrives more
    * than `gapSecs` after the last one, or when the event-time watermark
    * times the idle user out. */
  def sessionize(events: Dataset[Event], gapSecs: Long): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // idle user: flush the open session
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, s.n, s.startMs, s.lastMs))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapSecs * 1000 =>
                  cur = Some(s.copy(n = s.n + 1, lastMs = math.max(s.lastMs, t)))
                case Some(s) =>
                  closed ::= UserSession(userId, s.n, s.startMs, s.lastMs)
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // time out once the watermark passes last event + gap
              state.setTimeoutTimestamp(s.lastMs + gapSecs * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
