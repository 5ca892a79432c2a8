package graft

import graft.sources.{ExcelDirIngest, ExcelFixture}
import org.apache.spark.sql.functions.col

/** Distributed directory-of-workbooks ingest: per-task parse through the
  * binaryFile source (the driver never reads payload bytes), by-name
  * column alignment across heterogeneous exports, both formats mixed. */
class ExcelDirIngestSpec extends SparkSpec {

  private lazy val dir: java.io.File = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_xldir_${System.nanoTime()}")
    d.mkdirs()
    d.deleteOnExit()
    def at(n: String) = new java.io.File(d, n).getAbsolutePath
    // the agreed drop shape: (sku, qty, state)
    ExcelFixture.writeXlsx(Seq("SKU", "Qty", "State"),
      Seq(Seq("a1", "1", "CA"), Seq("a2", "2", "NY")), at("a.xlsx"))
    // reordered columns — by-name alignment, not positional
    ExcelFixture.writeXlsx(Seq("State", "SKU", "Qty"),
      Seq(Seq("WA", "b1", "3")), at("b.xlsx"))
    // extra column dropped
    ExcelFixture.writeXls(Seq("SKU", "Qty", "State", "Extra"),
      Seq(Seq("c1", "4", "TX", "zzz")), at("c.xls"))
    // missing column -> null
    ExcelFixture.writeXls(Seq("SKU", "State"),
      Seq(Seq("d1", "OR")), at("d.xls"))
    // a non-Excel file the glob must ignore
    java.nio.file.Files.writeString(
      new java.io.File(d, "notes.txt").toPath, "ignore me")
    d
  }

  test("mixed xlsx/xls directory unions by name with provenance") {
    val df = ExcelDirIngest.readDirAllString(spark, dir.getAbsolutePath,
      Seq("SKU", "Qty", "State"))
    assert(df.columns.toSeq == Seq("SKU", "Qty", "State", "_source_file"))
    val got = df.collect().map(r => (r.getString(0), Option(r.getString(1)),
      r.getString(2), r.getString(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a1", Some("1"), "CA", "a.xlsx"),
      ("a2", Some("2"), "NY", "a.xlsx"),
      ("b1", Some("3"), "WA", "b.xlsx"),
      ("c1", Some("4"), "TX", "c.xls"),
      ("d1", None, "OR", "d.xls")))
  }

  test("plan: binaryFile task-side scan, no driver-side local relation") {
    val df = ExcelDirIngest.readDirAllString(spark, dir.getAbsolutePath,
      Seq("SKU", "Qty", "State"))
    val plan = df.queryExecution.executedPlan.toString
    // the single-file readers land a LocalTableScan (driver parse); the
    // distributed variant must scan files in tasks instead
    assert(plan.contains("binaryFile"), s"expected binaryFile scan:\n$plan")
    assert(!plan.contains("LocalTableScan"), s"driver parse leaked in:\n$plan")
  }

  test("macro workbooks (.xlsm/.xlsb) are skipped; uppercase extensions read") {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_xldir_ext_${System.nanoTime()}")
    d.mkdirs(); d.deleteOnExit()
    def at(n: String) = new java.io.File(d, n).getAbsolutePath
    ExcelFixture.writeXlsx(Seq("SKU", "Qty", "State"),
      Seq(Seq("u1", "1", "CA")), at("UPPER.XLSX"))
    // a macro-enabled workbook: hostile bytes behind a near-miss extension
    // — the old '*.xls*' glob routed it to the BIFF parser and failed the
    // whole batch; now it is simply not an input
    java.nio.file.Files.write(new java.io.File(d, "macro.xlsm").toPath,
      Array[Byte](0x50, 0x4b, 0x03, 0x04, 0x00))
    java.nio.file.Files.write(new java.io.File(d, "bin.xlsb").toPath,
      Array[Byte](0x50, 0x4b, 0x03, 0x04, 0x00))
    val df = ExcelDirIngest.readDirAllString(spark, d.getAbsolutePath,
      Seq("SKU", "Qty", "State"))
    val got = df.collect().map(r => (r.getString(0), r.getString(3)))
    assert(got.toSeq == Seq(("u1", "UPPER.XLSX")))
  }

  test("recursive ingest walks nested date partitions with provenance") {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_xldir_rec_${System.nanoTime()}")
    val d1 = new java.io.File(d, "date=2026-08-01")
    val d2 = new java.io.File(d, "date=2026-08-02/region=west")
    d1.mkdirs(); d2.mkdirs(); d.deleteOnExit()
    ExcelFixture.writeXlsx(Seq("SKU", "Qty", "State"),
      Seq(Seq("r1", "1", "CA")),
      new java.io.File(d1, "a.xlsx").getAbsolutePath)
    ExcelFixture.writeXls(Seq("State", "SKU"),
      Seq(Seq("NY", "r2")),
      new java.io.File(d2, "b.xls").getAbsolutePath)
    val df = ExcelDirIngest.readDirAllString(spark, d.getAbsolutePath,
      Seq("SKU", "Qty", "State"), recursive = true)
    val got = df.collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getString(2),
        r.getString(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("r1", Some("1"), "CA", "a.xlsx"),
      ("r2", None, "NY", "b.xls")))
    // non-recursive on the same tree finds no direct children -> refuses
    intercept[IllegalArgumentException] {
      ExcelDirIngest.readDirAllString(spark, d.getAbsolutePath,
        Seq("SKU"))
    }
    // the distributed plan shape survives recursion
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("binaryFile") && !plan.contains("LocalTableScan"))
  }

  test("quarantine: a corrupt workbook yields one visible _error row, " +
      "the batch survives; strict mode still fails") {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_xldir_q_${System.nanoTime()}")
    d.mkdirs(); d.deleteOnExit()
    ExcelFixture.writeXlsx(Seq("SKU", "Qty", "State"),
      Seq(Seq("g1", "1", "CA")),
      new java.io.File(d, "good.xlsx").getAbsolutePath)
    // a truncated upload: right extension, garbage bytes
    java.nio.file.Files.write(new java.io.File(d, "broken.xlsx").toPath,
      Array[Byte](0x50, 0x4b, 0x03, 0x04, 1, 2, 3))
    val q = ExcelDirIngest.readDirAllStringQuarantine(spark,
      d.getAbsolutePath, Seq("SKU", "Qty", "State"))
    assert(q.columns.toSeq ==
      Seq("SKU", "Qty", "State", "_source_file", "_error"))
    val rows = q.collect()
    val good = rows.filter(_.isNullAt(4))
    val bad = rows.filterNot(_.isNullAt(4))
    assert(good.map(r => (r.getString(0), r.getString(3))).toSeq ==
      Seq(("g1", "good.xlsx")))
    assert(bad.length == 1)
    assert(bad.head.getString(3) == "broken.xlsx")
    assert(bad.head.isNullAt(0) && bad.head.isNullAt(1) && bad.head.isNullAt(2))
    assert(bad.head.getString(4).nonEmpty)
    // the strict reader keeps its loud contract on the same directory
    intercept[org.apache.spark.SparkException] {
      ExcelDirIngest.readDirAllString(spark, d.getAbsolutePath,
        Seq("SKU", "Qty", "State")).collect()
    }
    // all-good directory: quarantine adds no error rows
    val clean = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_xldir_clean_${System.nanoTime()}")
    clean.mkdirs(); clean.deleteOnExit()
    ExcelFixture.writeXlsx(Seq("SKU", "Qty", "State"),
      Seq(Seq("c1", "2", "NY")),
      new java.io.File(clean, "a.xlsx").getAbsolutePath)
    assert(ExcelDirIngest.readDirAllStringQuarantine(spark,
        clean.getAbsolutePath, Seq("SKU", "Qty", "State"))
      .where(col("_error").isNotNull).count() == 0L)
  }

  test("empty workbook set refuses loudly, not silently empty") {
    val empty = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_xldir_empty_${System.nanoTime()}")
    empty.mkdirs(); empty.deleteOnExit()
    // binaryFile throws on an empty match set at planning; surface it
    intercept[Exception] {
      ExcelDirIngest.readDirAllString(spark, empty.getAbsolutePath,
        Seq("SKU")).collect()
    }
  }
}
