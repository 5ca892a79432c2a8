package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Bucketed range join == the naive inequality join, without a nested
  * loop in the plan. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("time-neighbor pairs match the naive inequality join exactly") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val got = RangeJoin.timeNeighborPairs(ev, "user_id", "ts", "event_id", 300)
      .select("e1", "e2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = ev.select(col("user_id").as("u1"), col("ts").as("t1"), col("event_id").as("e1"))
    val b = ev.select(col("user_id").as("u2"), col("ts").as("t2"), col("event_id").as("e2"))
    val want = a.join(b, col("u1") === col("u2") &&
        col("t2") >= col("t1") && col("t2") <= col("t1") + expr("INTERVAL 5 MINUTE") &&
        (col("t1") < col("t2") || (col("t1") === col("t2") && col("e1") < col("e2"))))
      .select("e1", "e2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("boundary cases: 0s gap (id tiebreak) and exactly-window gap included") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:00:00")),  // same instant: (10,11) only
      (1L, 12L, ts("2024-01-01 10:05:00")),  // exactly 300s from 10:00: included
      (1L, 13L, ts("2024-01-01 10:05:01")),  // 301s from 10:00: only pairs with 12
      (2L, 20L, ts("2024-01-01 10:00:30")))  // other user: no pairs
      .toDF("user_id", "event_id", "ts")
    val got = RangeJoin.timeNeighborPairs(ev, "user_id", "ts", "event_id", 300)
      .select("e1", "e2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L), (10L, 12L), (11L, 12L), (12L, 13L)))
  }

  test("plan is an equi join: no nested loop, no cartesian") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = RangeJoin.timeNeighborPairs(ev, "user_id", "ts", "event_id", 300)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
