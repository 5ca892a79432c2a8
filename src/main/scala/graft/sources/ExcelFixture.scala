package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Fixture-staging WRITERS for the Excel ingest surface — the inverse of
  * [[XlsxIngest]]/[[XlsIngest]], here so the oracle harness can stage
  * real workbooks from parquet rows and drive the readers end-to-end
  * (DuckDB reads neither format, so the oracle compares against the same
  * parquet rows the workbook was generated from; see q115).
  *
  * Deliberately minimal, spec-correct output:
  *  - `.xlsx`: a ZIP holding one worksheet part with inlineStr cells
  *    (no sharedStrings, no workbook.xml — the reader's documented
  *    fallback picks sheet1 by part number), values XML-escaped.
  *  - `.xls`: a BIFF8 workbook stream (BOF globals, BOUNDSHEET, EOF,
  *    sheet BOF, LABEL cells in UTF-16, EOF) inside a CFB container.
  *    Streams under 4096 bytes land in the root mini-stream (64-byte
  *    sectors via the miniFAT) as the CFB spec requires; larger ones
  *    chain through the main FAT. One FAT sector bounds the container at
  *    ~64 KB — plenty for a fixture, guarded by require.
  *
  * Reference behavior covered: `/root/reference/etl/order_info_etl.py`
  * lines 177-180 ingest `.xlsx`/`.xls` drops through pandas read_excel;
  * these writers let the Spark readers prove byte-level parity on the
  * same rows without an Excel dependency. Not a general export surface.
  */
object ExcelFixture {

  /** With `workbookParts` (the default), the package carries the full
    * OOXML boilerplate — `[Content_Types].xml`, root rels, `workbook.xml`
    * and its rels — so the fixture drives [[XlsxIngest]]'s PRIMARY
    * workbook-order sheet resolution (and opens in real Excel/pandas);
    * `workbookParts = false` drops them to pin the reader's documented
    * lowest-part-number fallback. `sheetPart` names the worksheet part
    * (a non-1 number + workbook parts proves order resolution beats the
    * part-number heuristic; see XlsxIngestSpec). */
  def writeXlsx(header: Seq[String], rows: Seq[Seq[String]],
                path: String, workbookParts: Boolean = true,
                sheetPart: Int = 1): Unit = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def row(r: Long, cells: Seq[String]): String =
      s"""<row r="$r">""" + cells.map(v =>
        s"""<c t="inlineStr"><is><t>${esc(v)}</t></is></c>""").mkString +
        "</row>"
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
    sb ++= row(1L, header)
    rows.zipWithIndex.foreach { case (r, i) => sb ++= row(i + 2L, r) }
    sb ++= "</sheetData></worksheet>"
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      if (workbookParts) {
        entry("[Content_Types].xml",
          """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
            """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
            """<Default Extension="xml" ContentType="application/xml"/>""" +
            """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
            s"""<Override PartName="/xl/worksheets/sheet$sheetPart.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
            "</Types>")
        entry("_rels/.rels",
          """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
            """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
            "</Relationships>")
        entry("xl/workbook.xml",
          """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
            """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>""" +
            "</workbook>")
        entry("xl/_rels/workbook.xml.rels",
          """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
            """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
            s"""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$sheetPart.xml"/>""" +
            "</Relationships>")
      }
      entry(s"xl/worksheets/sheet$sheetPart.xml", sb.toString)
    } finally zos.close()
  }

  // ---- BIFF8 / CFB ----------------------------------------------------

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32(v: Int): Array[Byte] = u16(v & 0xFFFF) ++ u16(v >>> 16)
  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    u16(id) ++ u16(data.length) ++ data

  /** LABEL (0x0204): inline string cell, uncompressed UTF-16LE. */
  private def label(row: Int, col: Int, s: String): Array[Byte] = {
    require(s.length <= 2048, s"fixture cell too long: ${s.length}")
    rec(0x0204, u16(row) ++ u16(col) ++ u16(0) ++
      u16(s.length) ++ Array(0x01.toByte) ++ s.getBytes("UTF-16LE"))
  }

  private def workbookStream(allRows: Seq[Seq[String]]): Array[Byte] = {
    val bofGlobals = rec(0x0809,
      u16(0x0600) ++ u16(0x0005) ++ Array.fill(12)(0.toByte))
    val eof = rec(0x000A, Array.empty[Byte])
    val sheetName = "Sheet1"
    val boundsheetLen = 4 + 4 + 2 + 2 + sheetName.length
    val globalsLen = bofGlobals.length + boundsheetLen + eof.length
    val boundsheet = rec(0x0085,
      u32(globalsLen) ++ Array(0x00.toByte, 0x00.toByte) ++
        Array(sheetName.length.toByte, 0x00.toByte) ++
        sheetName.getBytes("ISO-8859-1"))
    val bofSheet = rec(0x0809,
      u16(0x0600) ++ u16(0x0010) ++ Array.fill(12)(0.toByte))
    val cells = allRows.zipWithIndex.flatMap { case (r, ri) =>
      r.zipWithIndex.flatMap { case (v, ci) => label(ri, ci, v) }
    }.toArray
    bofGlobals ++ boundsheet ++ eof ++ bofSheet ++ cells ++ eof
  }

  /** CFB container holding one "Workbook" stream. Mini-stream layout for
    * streams under the 4096-byte cutoff, main-FAT chain otherwise. */
  private def cfb(stream: Array[Byte]): Array[Byte] = {
    val SecEnd = 0xFFFFFFFE
    val SecFree = 0xFFFFFFFF
    val SecFat = 0xFFFFFFFD
    def pad(b: Array[Byte], unit: Int): Array[Byte] =
      b ++ Array.fill((unit - b.length % unit) % unit)(0.toByte)
    def dirEntry(name: String, typ: Int, start: Int, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val n = name.getBytes("UTF-16LE")
      b.put(n); b.position(64); b.putShort((n.length + 2).toShort)
      b.put(66, typ.toByte); b.put(67, 1.toByte)
      b.putInt(68, -1); b.putInt(72, -1); b.putInt(76, -1)
      b.putInt(116, start); b.putLong(120, size.toLong)
      b.array()
    }
    val mini = stream.length < 4096
    val (dataSectors, rootStart, rootSize, wbStart, miniFatSector) =
      if (mini) {
        val container = pad(stream, 64)
        val nMini = container.length / 64
        val miniFat = pad((0 until nMini).flatMap(i =>
          u32(if (i == nMini - 1) SecEnd else i + 1)).toArray, 512)
        val containerPadded = pad(container, 512)
        // sectors: 0=FAT 1=dir 2=miniFAT 3..=mini container
        (miniFat ++ containerPadded, 3, container.length, 0, 2)
      } else {
        val padded = pad(stream, 512)
        (padded, SecEnd, 0, 2, SecEnd) // sectors: 0=FAT 1=dir 2..=stream
      }
    val nDataSectors = dataSectors.length / 512
    require(nDataSectors + 2 <= 128,
      s"fixture too large for a single-FAT-sector container: $nDataSectors")
    val fatEntries = Array.fill(128)(SecFree)
    fatEntries(0) = SecFat
    fatEntries(1) = SecEnd // directory
    if (mini) {
      fatEntries(2) = SecEnd // miniFAT sector
      for (i <- 0 until nDataSectors - 1) // mini container chain from 3
        fatEntries(3 + i) = if (i == nDataSectors - 2) SecEnd else 4 + i
    } else {
      for (i <- 0 until nDataSectors)
        fatEntries(2 + i) = if (i == nDataSectors - 1) SecEnd else 3 + i
    }
    val fat = fatEntries.flatMap(u32)
    val dir = pad(dirEntry("Root Entry", 5, rootStart, rootSize) ++
      dirEntry("Workbook", 2, wbStart, stream.length), 512)
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    header.putShort(24, 0x003E.toShort) // minor version
    header.putShort(26, 3.toShort)      // major: 512-byte sectors
    header.putShort(28, 0xFFFE.toShort) // little-endian marker
    header.putShort(30, 9.toShort)      // sector shift
    header.putShort(32, 6.toShort)      // mini sector shift
    header.putInt(44, 1)                // FAT sector count
    header.putInt(48, 1)                // first directory sector
    header.putInt(56, 4096)             // mini stream cutoff
    header.putInt(60, miniFatSector)    // first miniFAT sector
    header.putInt(64, if (mini) 1 else 0)
    header.putInt(68, SecEnd)           // no DIFAT chain
    header.putInt(72, 0)
    header.position(76)
    header.putInt(0) // DIFAT[0] -> FAT at sector 0
    (1 until 109).foreach(_ => header.putInt(SecFree))
    val out = new ByteArrayOutputStream()
    out.write(header.array()); out.write(fat); out.write(dir)
    out.write(dataSectors)
    out.toByteArray
  }

  def writeXls(header: Seq[String], rows: Seq[Seq[String]],
               path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      cfb(workbookStream(header +: rows)))
}
