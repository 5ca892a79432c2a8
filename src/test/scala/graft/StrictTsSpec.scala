package graft

import graft.functions.StrictTs
import org.apache.spark.sql.functions._

/** The strict fast-path parse must agree with Spark's formatter parse on
  * every strict-shaped string, and return NULL (falling through) on
  * everything else — fuzzed across shapes and calendar edges. */
class StrictTsSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "2024-03-05 10:20:30", "1999-12-31 23:59:59", "2000-02-29 00:00:00",
    "1900-02-28 12:00:00", "2400-02-29 06:07:08", "0001-01-01 00:00:00",
    // invalid → NULL from the fast path
    "2023-02-29 10:00:00", "2024-13-01 10:00:00", "2024-00-10 10:00:00",
    "2024-01-32 10:00:00", "2024-01-01 24:00:00", "2024-01-01 10:60:00",
    "2024-1-5 10:00:00", "2024-01-05", "garbage", "2024-01-05T10:00:00",
    "2024-01-05 10:00:0x")

  test("strict parse equals formatter parse on strict inputs, NULL otherwise") {
    val df = cases.toDF("t")
    val rows = df.select(
      StrictTs.strictTs($"t").cast("string").as("fast"),
      try_to_timestamp($"t", lit("yyyy-MM-dd HH:mm:ss")).cast("string").as("ref"))
      .collect()
    rows.zip(cases).foreach { case (r, in) =>
      val fast = Option(r.getString(0))
      val ref = Option(r.getString(1))
      if (in.length == 19 && in(4) == '-' && in(10) == ' ')
        assert(fast == ref, s"input=$in fast=$fast ref=$ref")
      else assert(fast.isEmpty, s"input=$in should be NULL, got $fast")
    }
  }

  test("codegen and interpreted agree") {
    // force both paths: literal folding (interpreted eval) vs projection
    val viaProj = cases.toDF("t").select(unix_micros(StrictTs.strictTs($"t")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val viaEval = cases.map { c =>
      val r = StrictTs.parse(org.apache.spark.unsafe.types.UTF8String.fromString(c))
      if (r == Long.MinValue) None else Some(r)
    }
    assert(viaProj == viaEval)
  }
}
