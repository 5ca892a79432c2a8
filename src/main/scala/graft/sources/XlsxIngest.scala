package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

/** Minimal xlsx reader (SURVEY.md §2.1 S2) — the reference dispatches
  * `.xls/.xlsx` inputs to pd.read_excel (order_info_etl.py:177-178,
  * product_info_etl.py:179-180); this build has no spreadsheet
  * dependency, so the OOXML container is read directly: a zip holding
  * `xl/sharedStrings.xml` (the string pool) and `xl/worksheets/sheet1.xml`
  * (rows of cells), both parsed with the JDK's StAX.
  *
  * Output contract matches the CSV edge: first sheet, first row is the
  * header (normalized like [[CsvIngest.normalizeColName]]), every value a
  * raw string (shared/inline strings resolved, numerics as stored —
  * the `dtype=str` schema-on-read contract).
  *
  * Scale note: xlsx is a driver-bounded format BY CONSTRUCTION (a zip of
  * XML, hard-capped at 2^20 rows per sheet) used for small commercial
  * exports; it is parsed on the driver into a LocalRelation. Bulk data
  * belongs on the CSV/parquet scan paths, which are distributed.
  */
object XlsxIngest {

  /** `.xlsx` analog of [[CsvIngest.readAllString]]. */
  def readAllString(spark: SparkSession, path: String): DataFrame =
    CsvIngest.gridToDf(spark, parseRows(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))), path)

  /** All cell values of the first worksheet, as raw strings (null = gap). */
  private[sources] def parseRows(bytes: Array[Byte]): Vector[Array[String]] = {
    val parts = readZip(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Array.empty[String])
    // workbook order is defined by xl/workbook.xml (+ its rels), not the
    // worksheet part numbering — a reordered workbook can display
    // sheet2.xml first. Fall back to lowest-numbered part only when the
    // workbook/rels parts are absent or unresolvable.
    val sheetName = firstSheetByWorkbookOrder(parts)
      .filter(parts.contains)
      .orElse(parts.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml"))
        .toSeq.sortBy(n => n.replaceAll("\\D", "").toInt).headOption)
      .getOrElse(throw new IllegalArgumentException("no worksheet found in xlsx"))
    parseSheet(parts(sheetName), shared)
  }

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory && (e.getName.startsWith("xl/worksheets/") ||
        e.getName == "xl/sharedStrings.xml" ||
        e.getName == "xl/workbook.xml" ||
        e.getName == "xl/_rels/workbook.xml.rels"))
        out += e.getName -> zis.readAllBytes()
      e = zis.getNextEntry
    }
    zis.close()
    out.result()
  }

  /** First `<sheet>` of xl/workbook.xml resolved through the workbook
    * rels to its worksheet part path. */
  private def firstSheetByWorkbookOrder(parts: Map[String, Array[Byte]])
  : Option[String] =
    for {
      wb <- parts.get("xl/workbook.xml")
      rels <- parts.get("xl/_rels/workbook.xml.rels")
      rid <- firstAttr(wb, "sheet", "id")
      target <- relTarget(rels, rid)
    } yield
      if (target.startsWith("/")) target.drop(1)
      else "xl/" + target

  /** Value of `attr` (any namespace, e.g. r:id) on the first `elem`. */
  private def firstAttr(bytes: Array[Byte], elem: String, attr: String)
  : Option[String] = {
    val r = newReader(bytes)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == elem) {
          val found = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == attr)
            .map(r.getAttributeValue)
          return found
        }
      }
      None
    } finally r.close()
  }

  /** Target of the `Relationship` whose Id matches `rid`. */
  private def relTarget(bytes: Array[Byte], rid: String): Option[String] = {
    val r = newReader(bytes)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship" &&
          r.getAttributeValue(null, "Id") == rid)
          return Option(r.getAttributeValue(null, "Target"))
      }
      None
    } finally r.close()
  }

  private def newReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // no external entity resolution — the parts are untrusted content
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes), "UTF-8")
  }

  /** `<si>` entries; rich-text runs (multiple `<t>`) concatenate. */
  private def parseSharedStrings(bytes: Array[Byte]): Array[String] = {
    val r = newReader(bytes)
    val pool = ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur.setLength(0)
            case "t" => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => pool += cur.toString
            case "t" => inT = false
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    pool.toArray
  }

  /** Sheet rows: each `<c r="B3" t="...">` lands at its letter-derived
    * column index; `t="s"` resolves through the shared pool, `inlineStr`
    * reads the embedded `<is><t>`, booleans render true/false, everything
    * else (numbers, formula results) is the stored `<v>` text. */
  private def parseSheet(bytes: Array[Byte], shared: Array[String])
  : Vector[Array[String]] = {
    val r = newReader(bytes)
    val rows = Vector.newBuilder[Array[String]]
    var row: ArrayBuffer[String] = null
    var cellIdx = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val v = new java.lang.StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = ArrayBuffer.empty[String]
              cellIdx = -1
            case "c" if row != null =>
              val ref = Option(r.getAttributeValue(null, "r"))
              // no r attribute -> next position (writers may omit it)
              cellIdx = ref.map(colIndex).getOrElse(cellIdx + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              v.setLength(0)
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          v.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              rows += row.toArray
              row = null
            case "c" if row != null =>
              while (row.length <= cellIdx) row += null
              // value resolution stays INSIDE the emptiness guard: a
              // self-closing shared-string cell (<c t="s"/>) has no index
              // to resolve and must stay a gap, not throw on ''.toInt
              if (v.length() > 0 || cellType == "inlineStr") {
                row(cellIdx) = cellType match {
                  case "s" =>
                    val ref = v.toString.trim
                    val idx =
                      try ref.toInt
                      catch {
                        case _: NumberFormatException =>
                          throw new IllegalArgumentException(
                            s"malformed shared-string reference '$ref'")
                      }
                    require(idx >= 0 && idx < shared.length,
                      s"shared-string index $idx out of range " +
                        s"(pool holds ${shared.length})")
                    shared(idx)
                  case "b" => if (v.toString.trim == "1") "true" else "false"
                  case _ => v.toString
                }
              }
            case "v" => inV = false
            case "t" => inIsT = false
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.result()
  }

  /** "B3" → 1 (0-based column from the leading letters). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }
}
