package graft

import graft.sources.{ExcelFixture, XlsIngest, XlsxIngest}

/** The fixture writers must round-trip byte-exactly through the real
  * readers — q115 proves it against the oracle on orders; this pins the
  * writer itself on hostile strings (XML metachars, non-latin, empties)
  * and on both CFB layouts. */
class ExcelFixtureSpec extends SparkSpec {

  private val hdr = Seq("col one", "b", "c")
  private val rows = Seq(
    Seq("a&b", "<tag>", "naïve é"),
    Seq("1", "2.5", "x y z"),
    Seq("", "end", "."))

  test("xlsx writer round-trips through XlsxIngest") {
    val f = java.io.File.createTempFile("graft_fixw", ".xlsx")
    f.deleteOnExit()
    ExcelFixture.writeXlsx(hdr, rows, f.getAbsolutePath)
    val df = XlsxIngest.readAllString(spark, f.getAbsolutePath)
    assert(df.columns.toSeq == Seq("col_one", "b", "c"))
    val got = df.collect().map(r => (0 until 3).map(i =>
      Option(r.getString(i)).getOrElse("")).toSeq).toSeq
    assert(got == rows)
  }

  test("xls writer round-trips through XlsIngest on both CFB layouts") {
    // small: mini-stream layout
    val small = java.io.File.createTempFile("graft_fixw", ".xls")
    small.deleteOnExit()
    ExcelFixture.writeXls(hdr, rows, small.getAbsolutePath)
    val df = XlsIngest.readAllString(spark, small.getAbsolutePath)
    assert(df.columns.toSeq == Seq("col_one", "b", "c"))
    val got = df.collect().map(r => (0 until 3).map(i =>
      Option(r.getString(i)).getOrElse("")).toSeq).toSeq
    assert(got == rows)
    // big: push the stream past the 4096-byte mini cutoff -> main FAT
    val bigRows = (1 to 200).map(i => Seq(s"k$i", s"value_$i" * 3, s"$i"))
    val big = java.io.File.createTempFile("graft_fixw_big", ".xls")
    big.deleteOnExit()
    ExcelFixture.writeXls(hdr, bigRows, big.getAbsolutePath)
    val gotBig = XlsIngest.readAllString(spark, big.getAbsolutePath)
      .collect().map(r => (0 until 3).map(r.getString).toSeq).toSeq
    assert(gotBig == bigRows)
  }

  test("full OOXML parts ship by default and the workbook path resolves " +
      "a non-1 sheet part (advice r9)") {
    val f = java.io.File.createTempFile("graft_fixw_wb", ".xlsx")
    f.deleteOnExit()
    // the data lives in sheet7.xml; only workbook.xml + rels point there,
    // so a green read proves the PRIMARY resolution path ran (the
    // lowest-part-number fallback would find nothing else — there is no
    // sheet1.xml to mask a regression)
    ExcelFixture.writeXlsx(hdr, rows, f.getAbsolutePath, sheetPart = 7)
    val names = {
      val zf = new java.util.zip.ZipFile(f)
      try {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result()
      } finally zf.close()
    }
    assert(names.contains("[Content_Types].xml") &&
      names.contains("_rels/.rels") &&
      names.contains("xl/workbook.xml") &&
      names.contains("xl/_rels/workbook.xml.rels") &&
      names.contains("xl/worksheets/sheet7.xml"))
    val got = XlsxIngest.readAllString(spark, f.getAbsolutePath)
      .collect().map(r => (0 until 3).map(i =>
        Option(r.getString(i)).getOrElse("")).toSeq).toSeq
    assert(got == rows)
    // the no-parts variant still exercises the documented fallback
    val bare = java.io.File.createTempFile("graft_fixw_bare", ".xlsx")
    bare.deleteOnExit()
    ExcelFixture.writeXlsx(hdr, rows, bare.getAbsolutePath,
      workbookParts = false)
    assert(XlsxIngest.readAllString(spark, bare.getAbsolutePath)
      .count() == rows.length.toLong)
  }

  test("property: both writers round-trip adversarial content (verdict r9 #8)") {
    import org.scalacheck.Gen
    // XML-escape boundaries, quotes, whitespace runs, unicode, long
    // cells (past the 255-char Excel display myth, under the BIFF
    // fixture cap), and empty cells mid-row
    val cell: Gen[String] = Gen.oneOf(
      Gen.const(""),
      Gen.const("&"), Gen.const("<"), Gen.const(">"), Gen.const("&amp;"),
      Gen.const("]]>"), Gen.const("a\"b'c"),
      Gen.const(" leading and trailing "),
      Gen.alphaNumStr,
      Gen.listOfN(300, Gen.oneOf('x', '&', '<', '好', ' ')).map(_.mkString),
      Gen.const("多语言 текст"))
    val grid: Gen[(Seq[String], Seq[Seq[String]])] = for {
      w <- Gen.choose(1, 5)
      h <- Gen.choose(1, 8)
      // headers must stay distinct post-normalization for the DataFrame
      hdr0 = (0 until w).map(i => s"h$i")
      data <- Gen.listOfN(h, Gen.listOfN(w, cell).map(_.toSeq))
    } yield (hdr0, data.toSeq)
    val cases = Iterator.continually(grid.sample).flatten.take(12).toSeq
    cases.zipWithIndex.foreach { case ((hdr0, data), k) =>
      val fx = java.io.File.createTempFile(s"graft_prop${k}_", ".xlsx")
      val fs = java.io.File.createTempFile(s"graft_prop${k}_", ".xls")
      fx.deleteOnExit(); fs.deleteOnExit()
      ExcelFixture.writeXlsx(hdr0, data, fx.getAbsolutePath)
      ExcelFixture.writeXls(hdr0, data, fs.getAbsolutePath)
      val w = hdr0.length
      def read(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (0 until w).map(i =>
          Option(r.getString(i)).getOrElse("")).toSeq).toSeq
      assert(read(XlsxIngest.readAllString(spark, fx.getAbsolutePath))
        == data, s"xlsx case $k: $data")
      assert(read(XlsIngest.readAllString(spark, fs.getAbsolutePath))
        == data, s"xls case $k: $data")
    }
  }
}
