package graft

import graft.operators.Upsert
import org.apache.spark.sql.functions._

/** Idempotent fact append: re-delivering a batch adds nothing; a half-new
  * batch adds only the new grain rows. */
class IdempotentFactSpec extends SparkSpec {
  import spark.implicits._

  private val grain = Seq("order_id", "product_id", "date_id")

  test("re-running the same batch is a no-op; new grain appends") {
    val batch1 = Seq(
      ("O1", 1L, "2024-01-01", 2), ("O2", 2L, "2024-01-01", 1))
      .toDF("order_id", "product_id", "date_id", "units")
    val once = Upsert.idempotentFactAppend(batch1.limit(0), batch1, grain)
    assert(once.count() == 2)
    val twice = Upsert.idempotentFactAppend(once, batch1, grain)
    assert(twice.count() == 2)
    val batch2 = Seq(
      ("O2", 2L, "2024-01-01", 1), // replay
      ("O3", 3L, "2024-01-02", 5)) // new
      .toDF("order_id", "product_id", "date_id", "units")
    val third = Upsert.idempotentFactAppend(twice, batch2, grain)
    assert(third.count() == 3)
    assert(third.agg(sum("units")).first().getLong(0) == 8)
  }
}
