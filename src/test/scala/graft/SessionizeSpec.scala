package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

/** Batch event-log operators beyond the oracle-gated sessionization
  * queries: the rate-anomaly monitor's exact arithmetic. */
class SessionizeSpec extends SparkSpec {

  test("rateAnomalies: trailing-window z from integer sums, warm-up and " +
    "zero-variance emit null") {
    import spark.implicits._
    // one key, hours with counts 1, 2, 3, 10 — window 3, minPrior 2:
    //  h0: no prior            -> mean null, z null
    //  h1: prior [1], c=1<2    -> mean 1.0, z null (warm-up)
    //  h2: prior [1,2]         -> mean 1.5, var .25, z (3-1.5)/.5 = 3.0
    //  h3: prior [1,2,3]       -> mean 2.0, var 2/3, z = 9.797959
    val rows = Seq.tabulate(1)(_ => ()).flatMap { _ =>
      def hour(h: Int, n: Int) = Seq.tabulate(n)(i =>
        (f"2024-01-01 0$h%d:${i % 60}%02d:00", "error"))
      hour(0, 1) ++ hour(1, 2) ++ hour(2, 3) ++ hour(3, 10)
    }
    val events = rows.toDF("ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Sessionize
      .rateAnomalies(events, "event_type", "ts", window = 3, minPrior = 2)
      .orderBy("hour").collect()
      .map(r => (r.getString(1).substring(11, 13),
        r.getLong(2),
        if (r.isNullAt(3)) null else Double.box(r.getDouble(3)),
        if (r.isNullAt(4)) null else Double.box(r.getDouble(4)),
        r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("00", 1L, null, null, false),
      ("01", 2L, Double.box(1.0), null, false),
      ("02", 3L, Double.box(1.5), Double.box(3.0), true),
      ("03", 10L, Double.box(2.0), Double.box(9.797959), true)), out.mkString("\n"))
    // constant prior -> zero variance -> null z even past warm-up
    val flat = Seq.tabulate(4)(h => Seq.tabulate(2)(i =>
      (f"2024-01-01 0$h%d:0$i%d:00", "view"))).flatten
      .toDF("ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val fz = Sessionize.rateAnomalies(flat, "event_type", "ts", 3, 2)
      .orderBy("hour").collect()
    assert(fz.forall(r => r.isNullAt(4) && !r.getBoolean(5)))
    intercept[IllegalArgumentException] {
      Sessionize.rateAnomalies(events, "event_type", "ts", window = 0)
    }
  }

  test("arrivalCurve: first-seen attribution gives per-day new counts " +
    "and a running distinct total") {
    import spark.implicits._
    val ev = Seq(
      (1L, "1970-01-01 10:00:00"), (1L, "1970-01-04 09:00:00"),
      (2L, "1970-01-01 23:00:00"), (3L, "1970-01-04 01:00:00"),
      (4L, "1970-01-06 05:00:00"))
      .toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Sessionize.arrivalCurve(ev, "user_id", "ts")
      .orderBy("epoch_day").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, "1970-01-01", 2L, 2L),
      (3L, "1970-01-04", 1L, 3L),
      (5L, "1970-01-06", 1L, 4L)), out.mkString(","))
  }

  test("transitionGapQuantiles: exact per-transition gap quantiles in " +
    "seconds") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "A"),
      (2L, 1L, "2024-01-01 10:05:00", "B"),
      (3L, 1L, "2024-01-01 10:06:00", "A"),
      (4L, 1L, "2024-01-01 10:36:00", "B"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = graft.operators.Sessionize
      .transitionGapQuantiles(ev, "user_id", "ts", "event_id",
        "event_type", Seq(500, 1000))
      .orderBy("transition", "q_permille").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // A>B gaps {300, 1800}: median 300, max 1800; B>A gap {60}
    assert(out.toSeq == Seq(
      ("A>B", 500L, 2L, 300L), ("A>B", 1000L, 2L, 1800L),
      ("B>A", 500L, 1L, 60L), ("B>A", 1000L, 1L, 60L)), out.mkString(","))
  }

  test("latenessAudit: running-max lateness in arrival order, horizon " +
    "threshold, zero rows for in-order keys") {
    import spark.implicits._
    val ev = Seq(
      // user 1: arrival ids 1,2,3 with ts 10:00, 09:30 (30 min late),
      // 11:00 — horizon 600 s flags the 09:30 event
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 09:30:00"),
      (3L, 1L, "2024-01-01 11:00:00"),
      // user 2: strictly in order
      (4L, 2L, "2024-01-01 08:00:00"),
      (5L, 2L, "2024-01-01 09:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = graft.operators.Sessionize
      .latenessAudit(ev, "user_id", "ts", "event_id", horizonSeconds = 600L)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 3L, 1L, 1800L), (2L, 2L, 0L, 0L)),
      out.mkString(","))
    // a bigger horizon clears the flag but keeps the measured max
    val loose = graft.operators.Sessionize
      .latenessAudit(ev, "user_id", "ts", "event_id", 7200L)
      .where(col("user_id") === 1L).collect()(0)
    assert(loose.getLong(2) == 0L && loose.getLong(3) == 1800L)
  }

  test("eventTransitions: per-user consecutive steps, exact shares, " +
    "same-timestamp order pinned by the tiebreak") {
    import spark.implicits._
    val ev = Seq(
      (10L, 1L, "2024-01-01 10:00:00", "A"),
      (11L, 1L, "2024-01-01 10:05:00", "B"),
      (12L, 1L, "2024-01-01 10:10:00", "A"),
      (20L, 2L, "2024-01-01 09:00:00", "A"),
      (21L, 2L, "2024-01-01 09:30:00", "C"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Sessionize
      .eventTransitions(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("A", "B", 1L, 0.5), ("A", "C", 1L, 0.5), ("B", "A", 1L, 1.0)),
      out.mkString(","))
    // tied timestamps: event_id fixes the order (31 before 32)
    val tied = Seq(
      (31L, 9L, "2024-01-01 08:00:00", "X"),
      (32L, 9L, "2024-01-01 08:00:00", "Y"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val t = Sessionize
      .eventTransitions(tied, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(t.toSeq == Seq(("X", "Y")), t.mkString(","))
  }
}
