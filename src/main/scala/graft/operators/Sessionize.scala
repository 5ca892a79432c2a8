package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log: a new session starts when the
  * gap to the previous event of the same user exceeds `gapMinutes`.
  *
  * Batch formulation: lag + running sum of session-start flags — one
  * shuffle on user_id, then two windows over the same partitioning (Spark
  * reuses the sort). The streaming equivalent lives in
  * [[graft.streaming.EventSessions]] via flatMapGroupsWithState.
  *
  * Gap comparison is in microseconds (strict >) so batch and the DuckDB
  * oracle's `ts - prev > INTERVAL` agree to the microsecond.
  */
object Sessionize {

  def withSessionIds(events: DataFrame, userCol: String, tsCol: String,
                     tieBreak: String, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val prev = lag(col(tsCol), 1).over(w)
    val gapUs = unix_micros(col(tsCol)) - unix_micros(prev)
    val isStart = when(prev.isNull || gapUs > gapMinutes.toLong * 60L * 1000000L, 1)
      .otherwise(0)
    events.withColumn("session_id",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats: session count + event count. */
  def userSessionStats(events: DataFrame, userCol: String, tsCol: String,
                       tieBreak: String, gapMinutes: Int): DataFrame =
    withSessionIds(events, userCol, tsCol, tieBreak, gapMinutes)
      .groupBy(col(userCol))
      .agg(max(col("session_id")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
}
