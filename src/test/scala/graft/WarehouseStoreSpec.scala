package graft

import graft.etl.OrderEtl
import graft.sources.WarehouseStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Warehouse persistence: partitioned layout, round-trip fidelity, and
  * partition pruning actually reaching the scan. */
class WarehouseStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = {
    val fact = Seq(
      (1L, "ORD-1", java.sql.Date.valueOf("2024-01-01"), 1L, 10L, 1L, 2, BigDecimal(0), "NJ"),
      (2L, "ORD-2", java.sql.Date.valueOf("2024-02-15"), 2L, 11L, 1L, 1, BigDecimal(0), "FL"),
      (3L, "ORD-3", java.sql.Date.valueOf("2025-01-03"), 1L, 12L, 2L, 3, BigDecimal(0), "CA"))
      .toDF("fact_id", "order_id", "date_id", "product_id", "customer_id",
        "platform_id", "units", "revenue", "state_code")
    OrderEtl.emptyWarehouse(spark).copy(factSales = fact)
  }

  test("save/load round-trip preserves fact rows; partition dirs exist") {
    val dir = Files.createTempDirectory("graft-wh").toString
    WarehouseStore.save(wh, dir)
    assert(new java.io.File(s"$dir/fact_sales/p_year=2024/p_month=1").exists())
    assert(new java.io.File(s"$dir/fact_sales/p_year=2025/p_month=1").exists())
    val back = WarehouseStore.load(spark, dir)
    assert(back.factSales.count() == 3)
    assert(back.factSales.columns.sorted.toSeq == wh.factSales.columns.sorted.toSeq)
    val units = back.factSales.orderBy("fact_id").select("units").as[Int].collect()
    assert(units.toSeq == Seq(2, 1, 3))
  }

  test("compaction merges appended small files without changing content") {
    import org.apache.spark.sql.SaveMode
    val dir = Files.createTempDirectory("graft-wh3").toString
    // 5 appends of the same fact = 5 small files per touched partition
    WarehouseStore.saveFact(wh.factSales, dir)
    (1 to 4).foreach { i =>
      val batch = wh.factSales.withColumn("fact_id", col("fact_id") + lit(i * 10L))
      WarehouseStore.saveFact(batch, dir, SaveMode.Append)
    }
    def files(sub: String): Int =
      Option(new java.io.File(s"$dir/fact_sales/$sub").listFiles())
        .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert(files("p_year=2024/p_month=1") >= 5)
    val before = spark.read.parquet(s"$dir/fact_sales")
      .orderBy("fact_id").collect().map(_.toSeq).toSeq
    WarehouseStore.compactFact(spark, dir)
    assert(files("p_year=2024/p_month=1") == 1) // tiny data -> one target file
    assert(files("p_year=2025/p_month=1") == 1)
    val after = spark.read.parquet(s"$dir/fact_sales")
      .orderBy("fact_id").collect().map(_.toSeq).toSeq
    assert(after == before)
    // pruning still works over the compacted layout
    assert(spark.read.parquet(s"$dir/fact_sales")
      .where(col("p_year") === 2025).count() == 5)
    // scoped compaction leaves other years alone
    WarehouseStore.compactFact(spark, dir, years = Some(Seq(2024)))
    // crash-window recovery: a month dir gone with its compacted copy
    // staged (crash between the two renames) is promoted at the next
    // compaction's entry — a dot-prefixed stage is never mistaken for
    // a partition by discovery, and the data reads identically
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val live = new org.apache.hadoop.fs.Path(
      s"$dir/fact_sales/p_year=2024/p_month=1")
    val staged = new org.apache.hadoop.fs.Path(
      s"$dir/fact_sales/p_year=2024/.p_month=1.compact_tmp")
    assert(fs.rename(live, staged))
    // discovery ignores the dot dir: the table still reads (minus the
    // torn month), p_month stays integer-typed
    assert(spark.read.parquet(s"$dir/fact_sales")
      .where(col("p_year") === 2024 && col("p_month") === 1).count() == 0)
    WarehouseStore.compactFact(spark, dir)
    assert(files("p_year=2024/p_month=1") == 1)
    assert(spark.read.parquet(s"$dir/fact_sales")
      .orderBy("fact_id").collect().map(_.toSeq).toSeq == before)
    // a stale set-aside next to a live month is dropped
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$dir/fact_sales/p_year=2025/.p_month=1.compact_old"))
    WarehouseStore.compactFact(spark, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/fact_sales/p_year=2025/.p_month=1.compact_old")))
  }

  test("date-range predicates prune partitions at the scan") {
    val dir = Files.createTempDirectory("graft-wh2").toString
    WarehouseStore.save(wh, dir)
    val fact = spark.read.parquet(s"$dir/fact_sales")
    val pruned = fact.where(col("p_year") === 2024 && col("p_month") === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("p_year") || plan.contains("dynamicpruning")), plan)
    assert(pruned.count() == 1)
  }
}
