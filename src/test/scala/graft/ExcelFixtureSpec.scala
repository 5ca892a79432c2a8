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
}
