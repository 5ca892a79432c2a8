package graft

import graft.sources.{ExcelDirIngest, ExcelFixture}

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
