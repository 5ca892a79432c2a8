package graft

import graft.sources.{CsvIngest, XlsxIngest}

import java.util.zip.{ZipEntry, ZipOutputStream}

/** S2: the xlsx read path, on a fixture built from the raw OOXML parts
  * (shared + inline + rich-text strings, numerics, cell gaps, explicit
  * and omitted cell references, un-normalized headers). */
class XlsxIngestSpec extends SparkSpec {

  private def entry(zos: ZipOutputStream, name: String, xml: String): Unit = {
    zos.putNextEntry(new ZipEntry(name))
    zos.write(xml.getBytes("UTF-8"))
    zos.closeEntry()
  }

  /** 2 data rows under a 4-column header; B3 is a gap, D uses an inline
    * string, the header row exercises normalization (spaces, hyphen). */
  private lazy val fixture: String = {
    val f = java.io.File.createTempFile("graft_fixture", ".xlsx")
    f.deleteOnExit()
    val zos = new ZipOutputStream(new java.io.FileOutputStream(f))
    entry(zos, "xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="6" uniqueCount="6">
        |<si><t>MainSkuCode</t></si>
        |<si><t>english-name</t></si>
        |<si><t> category </t></si>
        |<si><t>Qty</t></si>
        |<si><t>SKU-1</t></si>
        |<si><t>Desk </t><t>Lamp</t></si>
        |</sst>""".stripMargin)
    entry(zos, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1">
        |  <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
        |  <c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
        |</row>
        |<row r="2">
        |  <c r="A2" t="s"><v>4</v></c><c r="B2" t="s"><v>5</v></c>
        |  <c r="C2" t="inlineStr"><is><t>Lighting</t></is></c><c r="D2"><v>12</v></c>
        |</row>
        |<row r="3">
        |  <c t="s"><v>4</v></c><c r="C3"><v>3.5</v></c><c r="D3" t="b"><v>1</v></c>
        |</row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    f.getAbsolutePath
  }

  test("xlsx dispatch reads sheet1 all-string with normalized headers") {
    val df = CsvIngest.readAllString(spark, fixture)
    assert(df.columns.toSeq == Seq("MainSkuCode", "english_name", "category", "Qty"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.collect().map(r => (0 until 4).map(r.getString))
    assert(rows.length == 2)
    // rich-text runs concatenate; numerics stay as stored strings
    assert(rows(0) == Seq("SKU-1", "Desk Lamp", "Lighting", "12"))
    // omitted r -> next position; B3 is a gap -> null; boolean renders
    assert(rows(1) == Seq("SKU-1", null, "3.5", "true"))
  }

  test("xlsx feeds the product ETL like a CSV would") {
    val stg = graft.etl.ProductEtl.toStaging(graft.etl.ProductEtl.cleanProducts(
      CsvIngest.readAllString(spark, fixture)))
    val keys = stg.select("main_sku_code").collect().map(_.getString(0)).toSeq
    assert(keys == Seq("SKU-1", "SKU-1"))
  }

  test("malformed inputs fail fast with clear messages") {
    val notZip = java.io.File.createTempFile("graft_bad", ".xlsx")
    notZip.deleteOnExit()
    java.nio.file.Files.writeString(notZip.toPath, "this is not a zip archive")
    val e = intercept[IllegalArgumentException] {
      XlsxIngest.readAllString(spark, notZip.getAbsolutePath)
    }
    assert(e.getMessage.contains("no worksheet"))

    val emptySheet = java.io.File.createTempFile("graft_empty", ".xlsx")
    emptySheet.deleteOnExit()
    val zos = new ZipOutputStream(new java.io.FileOutputStream(emptySheet))
    entry(zos, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData/></worksheet>""")
    zos.close()
    val e2 = intercept[IllegalArgumentException] {
      XlsxIngest.readAllString(spark, emptySheet.getAbsolutePath)
    }
    assert(e2.getMessage.contains("no rows"))
  }

  test("workbook.xml order wins over worksheet part numbering") {
    // sheet2.xml is listed FIRST in the workbook: it must be the one read
    val f = java.io.File.createTempFile("graft_order", ".xlsx")
    f.deleteOnExit()
    val zos = new ZipOutputStream(new java.io.FileOutputStream(f))
    entry(zos, "xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |  <sheet name="Front" sheetId="2" r:id="rId7"/>
        |  <sheet name="Back" sheetId="1" r:id="rId3"/>
        |</sheets></workbook>""".stripMargin)
    entry(zos, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId3" Type="t" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId7" Type="t" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    entry(zos, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>wrong_sheet</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    entry(zos, "xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>front_col</t></is></c></row>
        |<row r="2"><c r="A2"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val df = XlsxIngest.readAllString(spark, f.getAbsolutePath)
    assert(df.columns.toSeq == Seq("front_col"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("42"))
  }

  test("self-closing shared cells stay gaps; bad pool indexes say why") {
    def sheet(xml: String): String = {
      val f = java.io.File.createTempFile("graft_guard", ".xlsx")
      f.deleteOnExit()
      val zos = new ZipOutputStream(new java.io.FileOutputStream(f))
      entry(zos, "xl/sharedStrings.xml",
        """<?xml version="1.0"?><sst><si><t>h</t></si></sst>""")
      entry(zos, "xl/worksheets/sheet1.xml",
        s"""<?xml version="1.0"?><worksheet><sheetData>$xml</sheetData></worksheet>""")
      zos.close()
      f.getAbsolutePath
    }
    // <c t="s"/> with no <v>: a gap, not a NumberFormatException
    val ok = XlsxIngest.readAllString(spark, sheet(
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"/></row>
        |<row r="2"><c r="A2"><v>5</v></c></row>""".stripMargin))
    assert(ok.columns.length == 2 && ok.collect().head.isNullAt(1))
    // out-of-range pool index: descriptive, not a bare AIOOBE
    val e = intercept[IllegalArgumentException] {
      XlsxIngest.readAllString(spark, sheet(
        """<row r="1"><c r="A1" t="s"><v>9</v></c></row>
          |<row r="2"><c r="A2"><v>1</v></c></row>""".stripMargin))
    }
    assert(e.getMessage.contains("out of range"))
  }

  test("data rows wider than the header widen with unnamed columns") {
    val f = java.io.File.createTempFile("graft_wide", ".xlsx")
    f.deleteOnExit()
    val zos = new ZipOutputStream(new java.io.FileOutputStream(f))
    entry(zos, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>only_col</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c><c r="C2"><v>3</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val df = XlsxIngest.readAllString(spark, f.getAbsolutePath)
    assert(df.columns.toSeq == Seq("only_col", "unnamed_1", "unnamed_2"))
    assert(df.collect().head.toSeq == Seq("1", "2", "3"))
  }

  test("column-reference arithmetic covers multi-letter columns") {
    assert(XlsxIngest.colIndex("A1") == 0)
    assert(XlsxIngest.colIndex("Z9") == 25)
    assert(XlsxIngest.colIndex("AA10") == 26)
    assert(XlsxIngest.colIndex("AZ1") == 51)
    assert(XlsxIngest.colIndex("BA1") == 52)
  }
}
