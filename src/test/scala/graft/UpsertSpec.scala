package graft

import graft.operators.Upsert
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment: the distributed (range-partition + offset)
  * formulation must produce the EXACT ids of the single-window reference
  * formulation, without funneling the batch through one task. */
class UpsertSpec extends SparkSpec {

  test("withSurrogateKeys: id parity with the global-window formulation") {
    import spark.implicits._
    // unique business keys, deliberately unsorted and skewed across
    // partitions; enough rows to span several range partitions
    val rows = (1L to 2000L).map(i => (s"sku_${(i * 7919) % 100000}", i))
      .toDF("sku", "payload").repartition(7)
    val windowed = rows.withColumn("product_id",
        row_number().over(Window.orderBy(col("sku"))).cast("long") + 500L)
      .select(col("sku"), col("product_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val distributed = Upsert.withSurrogateKeys(rows, "product_id",
        Seq(col("sku")), 500L, smallBatchRows = 0L) // force the big-batch path
      .select(col("sku"), col("product_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(distributed == windowed)
    // contiguous range starting after the seed
    val ids = distributed.values.toSeq.sorted
    assert(ids == (501L to 2500L))
  }

  test("withSurrogateKeys: big-batch path has no single-partition exchange") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (s"k$i", i)).toDF("sku", "payload")
    val plan = Upsert.withSurrogateKeys(rows, "id", Seq(col("sku")), 0L,
        smallBatchRows = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(800))
  }

  test("withSurrogateKeys: small and big paths assign identical ids") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (s"s${(i * 37) % 1000}", i))
      .toDF("sku", "payload").repartition(5)
    def ids(threshold: Long) =
      Upsert.withSurrogateKeys(rows, "id", Seq(col("sku")), 9L, threshold)
        .select("sku", "id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids(0L) == ids(1L << 20))
  }

  test("withSurrogateKeys: keeps column set and replaces an existing id col") {
    import spark.implicits._
    val rows = Seq(("a", 1L, 99L), ("b", 2L, 98L)).toDF("sku", "payload", "id")
    val out = Upsert.withSurrogateKeys(rows, "id", Seq(col("sku")), 10L)
    assert(out.columns.toSeq == Seq("sku", "payload", "id"))
    assert(out.orderBy("sku").collect().map(_.getLong(2)).toSeq == Seq(11L, 12L))
  }
}
