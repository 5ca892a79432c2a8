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

  /** Event-rate anomaly detection: per (key, hour) counts z-scored
    * against the TRAILING `window` observed hours of the same key — the
    * ops-side monitor a streaming ingest wants over its own volume
    * ("did 'error' events spike this hour?").
    *
    * Scale shape: the raw log collapses to a per-(key, hour) count
    * FIRST (one lean aggregate — the only pass over the events); the
    * trailing window then runs over that aggregated frame, |keys| ×
    * |hours| rows, partitioned by key — bounded and parallel per key,
    * never a window over raw events.
    *
    * Engine-exact arithmetic: the window computes integer sums (Σn,
    * Σn², observed-hour count) and derives mean/variance/z with one
    * fixed expression tree over exact integers — not the engines'
    * stddev aggregates, whose accumulation order could flip the 6th
    * rounded decimal. Variance from the population formula
    * Σn²/c − mean²; hours with fewer than `minPrior` trailing
    * observations (warm-up) or zero variance emit NULL z. */
  def rateAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                    window: Int = 24, minPrior: Int = 3): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(minPrior >= 1, s"minPrior must be >= 1: $minPrior")
    val hourly = events
      .groupBy(col(keyCol).as("key"),
        date_trunc("hour", col(tsCol)).as("__h"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("key")).orderBy(col("__h"))
      .rowsBetween(-window, -1)
    val s1 = sum(col("n")).over(w)
    val s2 = sum(col("n") * col("n")).over(w)
    val c = count(col("n")).over(w)
    hourly
      .withColumn("__s1", s1).withColumn("__s2", s2).withColumn("__c", c)
      .withColumn("mean_prior",
        col("__s1").cast("double") / col("__c"))
      .withColumn("__var",
        col("__s2").cast("double") / col("__c") - col("mean_prior") * col("mean_prior"))
      .withColumn("z", when(col("__c") >= minPrior && col("__var") > 0,
        (col("n") - col("mean_prior")) / sqrt(col("__var"))))
      .select(col("key"),
        date_format(col("__h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n"),
        round(col("mean_prior"), 6).as("mean_prior"),
        round(col("z"), 6).as("z"),
        (col("z").isNotNull && abs(col("z")) >= 3.0).as("is_anomaly"))
  }

  /** Transition dwell-time quantiles: for each (from → to) event-type
    * step, the exact permille quantiles of the gap in SECONDS — "how
    * long between add-to-cart and purchase, at the median and the
    * tail" — [[eventTransitions]] says WHERE users go, this says HOW
    * FAST. Gaps are exact integer seconds (micros DIV 10⁶); quantiles
    * ride [[graft.operators.TrainingData.quantilesByKey]]'s exact
    * histogram protocol (guarded against continuous blow-up — seconds
    * granularity keeps the histogram small by construction).
    *
    * Scale shape: one user-keyed lead window (the sessionization
    * exchange) → the histogram-shaped quantile pass.
    *
    * @return (transition, q_permille, n, value) — value in seconds. */
  def transitionGapQuantiles(events: DataFrame, userCol: String,
      tsCol: String, tieBreak: String, typeCol: String,
      permille: Seq[Int]): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieBreak))
    val gaps = events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__next_type", lead(col(typeCol), 1).over(w))
      .withColumn("__next_us", lead(col("__us"), 1).over(w))
      .where(col("__next_type").isNotNull)
      .select(concat(col(typeCol), lit(">"), col("__next_type"))
        .as("transition"),
        expr("(__next_us - __us) DIV 1000000").as("__gap_s"))
    TrainingData.quantilesByKey(gaps, "transition", "__gap_s", permille)
      .withColumnRenamed("key", "transition")
  }

  /** Late-arrival audit: per key, how far events arrive BEHIND the
    * newest event time already seen on that key's stream (arrival
    * order = `arrivalCol`, a monotone ingest id) — the measurement
    * that SIZES a watermark before you deploy one. An event whose
    * lateness exceeds `horizonSeconds` is exactly the event
    * `withWatermark(horizon)` would drop; running this audit over a
    * day of history tells you the drop rate every candidate horizon
    * buys, instead of guessing.
    *
    * Exact integer micros throughout (running max per key via one
    * keyed window — the sessionization exchange, never global).
    *
    * @return (key, n_events, n_late, max_lateness_s) per key with at
    *         least one late event... no — EVERY key, zeros included
    *         (the healthy keys are the denominator). */
  def latenessAudit(events: DataFrame, keyCol: String, tsCol: String,
                    arrivalCol: String, horizonSeconds: Long): DataFrame = {
    require(horizonSeconds >= 0,
      s"latenessAudit: horizonSeconds must be >= 0: $horizonSeconds")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(arrivalCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lateUs = max(unix_micros(col(tsCol))).over(w) -
      unix_micros(col(tsCol))
    events
      .withColumn("__late_us", greatest(coalesce(lateUs, lit(0L)), lit(0L)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late_us") > horizonSeconds * 1000000L, 1L)
          .otherwise(0L)).as("n_late"),
        max(expr("__late_us DIV 1000000")).as("max_lateness_s"))
  }

  /** New-entity arrival curve: how many NEVER-BEFORE-SEEN entities
    * (users, hosts, devices) appear each day, plus the cumulative
    * total — the growth/acquisition curve, and running
    * COUNT(DISTINCT entity) restated as a first-seen attribution so
    * it needs no distinct-over-window (which no engine does
    * scalably).
    *
    * Scale shape: one map-side-combined min-aggregate keyed by the
    * entity (the only corpus-sized shuffle) → per-day counts (≤ |days|
    * rows) → one cumulative window over that tiny aggregate (q40's
    * documented exception).
    *
    * @return (epoch_day, day, n_new, cum_entities) ordered by day. */
  def arrivalCurve(events: DataFrame, entityCol: String,
                   tsCol: String): DataFrame = {
    val day = datediff(col(tsCol).cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val firstSeen = events
      .select(col(entityCol).as("__e"), day.as("epoch_day"))
      .where(col("__e").isNotNull)
      .groupBy(col("__e")).agg(min(col("epoch_day")).as("epoch_day"))
    val w = Window.orderBy(col("epoch_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firstSeen.groupBy(col("epoch_day"))
      .agg(count(lit(1)).as("n_new"))
      .withColumn("cum_entities", sum(col("n_new")).over(w))
      .select(col("epoch_day"),
        date_format(date_add(lit("1970-01-01").cast("date"),
          col("epoch_day").cast("int")), "yyyy-MM-dd").as("day"),
        col("n_new"), col("cum_entities"))
  }

  /** Event-type transition matrix (first-order Markov counts): for
    * each user's time-ordered stream, count consecutive
    * (from_type → to_type) steps and the per-from transition share —
    * the "what do users do next" product-analytics primitive behind
    * funnels and pathing. Exact: counts are integers; the share is
    * one IEEE division of exact longs, rounded at 6; same-timestamp
    * order is pinned by `tieBreak`, so the result is deterministic
    * and engine-replayable.
    *
    * Scale shape: one user-keyed window (lead) — the same exchange
    * sessionization pays — then a (from, to)-keyed map-side count;
    * per-from totals are a SECOND-LEVEL aggregate of that result
    * (≤ |type-pairs| rows), never a corpus re-scan.
    *
    * @return (from_type, to_type, n, p). */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
                       tieBreak: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieBreak))
    val steps = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val totals = steps.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"))
    steps.join(totals, Seq("from_type"))
      .withColumn("p", round(col("n").cast("double") /
        col("__tot").cast("double"), 6))
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
  }
}
