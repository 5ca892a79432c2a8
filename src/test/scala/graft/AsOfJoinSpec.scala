package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Backward as-of join semantics: greatest right ts <= left ts per key,
  * ties match, unmatched stay NULL, payload columns never mix rows. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 09:00:00"), 10.0, "a"),
    (1L, ts("2024-01-01 10:00:00"), 20.0, "b"),
    (1L, ts("2024-01-01 11:00:00"), 30.0, "c"),
    (2L, ts("2024-01-01 10:30:00"), 99.0, "z"))
    .toDF("uid", "qts", "price", "tag")

  private lazy val trades = Seq(
    (100L, 1L, ts("2024-01-01 08:30:00")), // before any quote -> NULL
    (101L, 1L, ts("2024-01-01 10:00:00")), // tie -> matches the 10:00 quote
    (102L, 1L, ts("2024-01-01 10:59:59")), // between -> 10:00 quote
    (103L, 2L, ts("2024-01-01 12:00:00")), // other key -> its own quote
    (104L, 3L, ts("2024-01-01 12:00:00"))) // key with no quotes -> NULL
    .toDF("tid", "uid", "tts")

  test("backward as-of picks greatest right ts <= left ts, per key") {
    val out = AsOfJoin.backward(trades, quotes, Seq("uid"), "tts", "qts",
      payload = Seq("price", "tag"))
      .collect().map(r => r.getAs[Long]("tid") ->
        (Option(r.getAs[Timestamp]("asof_qts")), Option(r.getAs[Any]("asof_price")),
          Option(r.getAs[String]("asof_tag")))).toMap
    assert(out(100L) == ((None, None, None)))
    assert(out(101L) == ((Some(ts("2024-01-01 10:00:00")), Some(20.0), Some("b"))))
    assert(out(102L) == ((Some(ts("2024-01-01 10:00:00")), Some(20.0), Some("b"))))
    assert(out(103L) == ((Some(ts("2024-01-01 10:30:00")), Some(99.0), Some("z"))))
    assert(out(104L) == ((None, None, None)))
    assert(out.size == 5) // left outer: every left row survives
  }

  test("payload comes from ONE matched row even when an attr is NULL there") {
    val q = Seq((1L, ts("2024-01-01 09:00:00"), Some("early"), Some(1.0)),
      (1L, ts("2024-01-01 10:00:00"), None: Option[String], Some(2.0)))
      .toDF("uid", "qts", "tag", "price")
    val t = Seq((200L, 1L, ts("2024-01-01 10:30:00"))).toDF("tid", "uid", "tts")
    val r = AsOfJoin.backward(t, q, Seq("uid"), "tts", "qts", Seq("tag", "price"))
      .collect().head
    // the matched 10:00 row has tag=NULL; a per-column last() would leak "early"
    assert(r.getAs[String]("asof_tag") == null)
    assert(r.getAs[Double]("asof_price") == 2.0)
  }

  test("output-name collisions and reserved names fail fast") {
    val clash = trades.withColumn("asof_price", lit(0.0))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(clash, quotes, Seq("uid"), "tts", "qts", Seq("price"))
    }
    assert(e.getMessage.contains("asof_price"))
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(trades, quotes.withColumn("__x", lit(1)),
        Seq("uid"), "tts", "qts", Seq("price"))
    }
  }

  test("plan shuffles once on the key, no nested loop") {
    val out = AsOfJoin.backward(trades, quotes, Seq("uid"), "tts", "qts", Seq("price"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
