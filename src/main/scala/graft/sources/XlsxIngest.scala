package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
  def readAllString(spark: SparkSession, path: String): DataFrame = {
    val rows = parseRows(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    require(rows.nonEmpty, s"no rows in first sheet of $path")
    val header = rows.head.map(h =>
      CsvIngest.normalizeColName(Option(h).getOrElse("")))
    val width = header.length
    val data: java.util.List[Row] = new java.util.ArrayList[Row]()
    rows.tail.foreach { r =>
      data.add(Row.fromSeq((0 until width).map(i =>
        if (i < r.length) r(i) else null)))
    }
    val schema = StructType(header.map(StructField(_, StringType)).toSeq)
    spark.createDataFrame(data, schema)
  }

  /** All cell values of the first worksheet, as raw strings (null = gap). */
  private[sources] def parseRows(bytes: Array[Byte]): Vector[Array[String]] = {
    val parts = readZip(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Array.empty[String])
    val sheetName = parts.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml"))
      .toSeq.sortBy(n => n.replaceAll("\\D", "").toInt).headOption
      .getOrElse(throw new IllegalArgumentException("no worksheet found in xlsx"))
    parseSheet(parts(sheetName), shared)
  }

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zis.getNextEntry
    while (e != null) {
      if (!e.isDirectory && (e.getName.startsWith("xl/worksheets/") ||
        e.getName == "xl/sharedStrings.xml"))
        out += e.getName -> zis.readAllBytes()
      e = zis.getNextEntry
    }
    zis.close()
    out.result()
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
              val value = cellType match {
                case "s" => shared(v.toString.trim.toInt)
                case "b" => if (v.toString.trim == "1") "true" else "false"
                case _ => v.toString
              }
              while (row.length <= cellIdx) row += null
              if (v.length() > 0 || cellType == "inlineStr")
                row(cellIdx) = value
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
