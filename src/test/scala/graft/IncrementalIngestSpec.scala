package graft

import graft.etl.OrderEtl
import graft.streaming.{EventStreams, IncrementalIngest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming ingest stretch goals: watermarked event dedup and the
  * foreachBatch CSV-drop → warehouse-upsert pipeline. */
class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("dropDuplicatesWithinWatermark suppresses re-delivered events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.dedupedEvents(mem.toDF())
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      val e1 = EventStreams.Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 1.0)
      val e2 = EventStreams.Event(2, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 1, "click", 2.0)
      mem.addData(e1, e2, e1) // duplicate within batch
      q.processAllAvailable()
      mem.addData(e2) // re-delivery across batches, inside horizon
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("deduped").count() == 2)
  }

  test("CSV drops stream into the warehouse via foreachBatch upserts") {
    val csvDir = Files.createTempDirectory("graft-ingest").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    Files.writeString(java.nio.file.Paths.get(s"$csvDir/batch1.csv"),
      """orderNo,commercePlatform,name,oneAddress,postalCode,State,masterSku,sku,submitTime,goodsNumber
        |ORD-1,Amazon,John,1 Main St,07001,NJ,SKU-A,,2024-01-01 10:00:00,2
        |ORD-2,Wayfair,Mary,2 Oak Ave,10001,NY,SKU-B,,2024-01-02 10:00:00,1
        |""".stripMargin)

    @volatile var wh = OrderEtl.emptyWarehouse(spark)
    def run(): Unit = {
      val q = IncrementalIngest.start(spark, csvDir, ckpt,
        fileColumns = Seq("orderNo", "commercePlatform", "name", "oneAddress",
          "postalCode", "State", "masterSku", "sku", "submitTime", "goodsNumber"),
        load = () => wh,
        save = next => wh = OrderEtl.Warehouse(
          // materialize each table so the next batch reads stable state
          next.dimDate.localCheckpoint(true), next.dimCustomer.localCheckpoint(true),
          next.dimProduct.localCheckpoint(true), next.dimPlatform.localCheckpoint(true),
          next.factSales.localCheckpoint(true)))
      q.awaitTermination()
    }
    run()
    assert(wh.dimPlatform.count() == 2)
    assert(wh.factSales.count() == 2)

    // second drop: one replayed platform, one new; dims upsert, facts append
    Files.writeString(java.nio.file.Paths.get(s"$csvDir/batch2.csv"),
      """orderNo,commercePlatform,name,oneAddress,postalCode,State,masterSku,sku,submitTime,goodsNumber
        |ORD-3,Amazon,Bob,3 Pine Rd,33101,FL,SKU-C,,2024-01-03 10:00:00,3
        |""".stripMargin)
    run()
    assert(wh.dimPlatform.count() == 2) // Amazon not duplicated
    assert(wh.dimProduct.count() == 3)
    assert(wh.factSales.count() == 3)
  }
}
