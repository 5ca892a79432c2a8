package graft

import graft.sources.{CsvIngest, XlsIngest}

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** BIFF8 `.xls` reader against hand-built compound files: the fixtures
  * below write real CFB containers (mini-stream AND FAT layouts) holding
  * real BIFF8 record streams, so every byte the reader touches is
  * exercised — SST CONTINUE splits with encoding switches included. */
class XlsIngestSpec extends SparkSpec {

  // ---- tiny little-endian builders -----------------------------------
  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32(v: Int): Array[Byte] = u16(v & 0xFFFF) ++ u16(v >>> 16)
  private def dbl(d: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.putDouble(d); b.array()
  }
  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    u16(id) ++ u16(data.length) ++ data

  /** Compressed (latin-1) SST entry. */
  private def sstString(s: String): Array[Byte] =
    u16(s.length) ++ Array(0x00.toByte) ++ s.getBytes("ISO-8859-1")

  private def cellHead(row: Int, col: Int): Array[Byte] =
    u16(row) ++ u16(col) ++ u16(0) // ixfe unused

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, cellHead(row, col) ++ u32(isst))
  private def number(row: Int, col: Int, d: Double): Array[Byte] =
    rec(0x0203, cellHead(row, col) ++ dbl(d))
  private def rkInt(v: Int, div100: Boolean = false): Array[Byte] =
    u32((v << 2) | 0x02 | (if (div100) 1 else 0))
  private def rkCell(row: Int, col: Int, rk: Array[Byte]): Array[Byte] =
    rec(0x027E, cellHead(row, col) ++ rk)
  private def mulRk(row: Int, colFirst: Int, rks: Seq[Array[Byte]]): Array[Byte] =
    rec(0x00BD, u16(row) ++ u16(colFirst) ++
      rks.flatMap(r => u16(0) ++ r).toArray ++ u16(colFirst + rks.size - 1))
  private def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x0205, cellHead(row, col) ++
      Array((if (v) 1 else 0).toByte, 0x00.toByte))
  private def formulaString(row: Int, col: Int, s: String): Array[Byte] =
    rec(0x0006, cellHead(row, col) ++
      Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++ u16(0) ++ u32(0) ++ u16(0)) ++
      rec(0x0207, u16(s.length) ++ Array(0x00.toByte) ++ s.getBytes("ISO-8859-1"))

  /** Workbook stream: globals (BOF, BOUNDSHEET, SST [, CONTINUE], EOF)
    * then one sheet substream. `sstParts` lets a test split the string
    * pool across CONTINUE records at exact byte positions. */
  private def workbookStream(sstCount: Int, sstParts: Seq[Array[Byte]],
                             cells: Array[Byte]): Array[Byte] = {
    val bofGlobals = rec(0x0809, u16(0x0600) ++ u16(0x0005) ++ Array.fill(12)(0.toByte))
    val sheetName = "Sheet1"
    val boundsheetLen = 4 + 2 + 2 + sheetName.length // fixed, lets us place the offset
    val sst = rec(0x00FC, u32(sstCount) ++ u32(sstCount) ++ sstParts.head) ++
      sstParts.tail.flatMap(p => rec(0x003C, p))
    val eof = rec(0x000A, Array.empty[Byte])
    val globalsLen = bofGlobals.length + 4 + boundsheetLen + sst.length + eof.length
    val boundsheet = rec(0x0085, u32(globalsLen) ++ Array(0x00.toByte, 0x00.toByte) ++
      Array(sheetName.length.toByte, 0x00.toByte) ++ sheetName.getBytes("ISO-8859-1"))
    val bofSheet = rec(0x0809, u16(0x0600) ++ u16(0x0010) ++ Array.fill(12)(0.toByte))
    bofGlobals ++ boundsheet ++ sst ++ eof ++ bofSheet ++ cells ++ eof
  }

  /** Wrap a stream into a CFB container. Streams under 4096 bytes land in
    * the root entry's mini stream (64-byte sectors via the miniFAT), as
    * the spec requires; larger ones chain through the main FAT. */
  private def cfb(streamName: String, stream: Array[Byte]): Array[Byte] = {
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
          u32(if (i == nMini - 1) SecEnd else i + 1)).toArray ++
          Array.fill(0)(0.toByte), 512)
        val containerPadded = pad(container, 512)
        // sectors: 0=FAT 1=dir 2=miniFAT 3..=mini container
        (miniFat ++ containerPadded, 3, container.length, 0, 2)
      } else {
        val padded = pad(stream, 512)
        (padded, SecEnd, 0, 2, SecEnd) // sectors: 0=FAT 1=dir 2..=stream
      }
    val nDataSectors = dataSectors.length / 512
    val fatEntries = Array.fill(128)(SecFree)
    fatEntries(0) = SecFat
    fatEntries(1) = SecEnd // directory
    if (mini) {
      fatEntries(2) = SecEnd // miniFAT sector
      for (i <- 0 until nDataSectors - 1) // mini container chain from sector 3
        fatEntries(3 + i) = if (i == nDataSectors - 2) SecEnd else 4 + i
    } else {
      for (i <- 0 until nDataSectors)
        fatEntries(2 + i) = if (i == nDataSectors - 1) SecEnd else 3 + i
    }
    val fat = fatEntries.flatMap(u32)
    val dir = pad(dirEntry("Root Entry", 5, rootStart, rootSize) ++
      dirEntry(streamName, 2, wbStart, stream.length), 512)
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    header.putShort(24, 0x003E.toShort) // minor
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

  private def writeTemp(name: String, bytes: Array[Byte]): String = {
    val f = java.io.File.createTempFile("graft_xls_", name)
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, bytes)
    f.getAbsolutePath
  }

  // --------------------------------------------------------------------

  test("mini-stream xls: every BIFF8 cell type lands as the right string") {
    val sstPool = Seq("Order ID", "Qty Sold", "Région", "r1", "naïve")
    val cells =
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
        labelSst(1, 0, 3) ++ number(1, 1, 12.0) ++ number(1, 2, 2.5) ++
        rkCell(2, 0, rkInt(7)) ++ rkCell(2, 1, rkInt(1250, div100 = true)) ++
        mulRk(3, 0, Seq(rkInt(1), rkInt(2), rkInt(3))) ++
        formulaString(4, 0, "calc") ++ boolErr(4, 1, v = true) ++
        labelSst(5, 2, 4) // row with leading gaps
    val stream = workbookStream(sstPool.size,
      Seq(sstPool.flatMap(sstString).toArray), cells)
    assert(stream.length < 4096) // exercises the miniFAT path
    val path = writeTemp(".xls", cfb("Workbook", stream))
    val df = XlsIngest.readAllString(spark, path)
    assert(df.columns.toSeq == Seq("Order_ID", "Qty_Sold", "Région"))
    val rows = df.collect().map(r => (0 until 3).map(r.getString).toSeq)
    assert(rows(0) == Seq("r1", "12", "2.5"))   // int double loses the .0
    assert(rows(1) == Seq("7", "12.5", null))   // RK int + RK div-100
    assert(rows(2) == Seq("1", "2", "3"))       // MULRK run
    assert(rows(3) == Seq("calc", "TRUE", null))// formula string + bool
    assert(rows(4) == Seq(null, null, "naïve")) // gaps stay null
  }

  test("FAT-path xls with SST CONTINUE split and encoding switch") {
    // string 1 splits across SST -> CONTINUE mid-characters with the
    // continuation switching to UTF-16; string 2 starts inside CONTINUE
    val part1 = "A" * 100
    val part2 = "é" * 30 // non-latin forces the uncompressed flag
    val s1 = part1 + part2
    val first = u16(s1.length) ++ Array(0x00.toByte) ++ part1.getBytes("ISO-8859-1")
    val second = Array(0x01.toByte) ++ part2.getBytes("UTF-16LE") ++
      sstString("after")
    // bulk strings push the stream over the 4096 mini cutoff
    val bulk = (0 until 400).map(i => s"bulk_$i")
    val sstParts = Seq(first, second ++ bulk.flatMap(sstString).toArray)
    val cells = labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
      labelSst(1, 0, 2) ++ labelSst(1, 1, 2 + bulk.size - 1)
    val stream = workbookStream(2 + bulk.size, sstParts, cells)
    assert(stream.length >= 4096) // exercises the main FAT chain
    val path = writeTemp(".xls", cfb("Workbook", stream))
    val grid = XlsIngest.parseGrid(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    assert(grid(0)(0) == s1)
    assert(grid(0)(1) == "after")
    assert(grid(1)(0) == "bulk_0" && grid(1)(1) == "bulk_399")
  }

  test("less-common cell records: numeric formula results, LABEL, FALSE") {
    def formulaNumber(row: Int, col: Int, d: Double): Array[Byte] =
      rec(0x0006, cellHead(row, col) ++ dbl(d) ++ u16(0) ++ u32(0) ++ u16(0))
    def label(row: Int, col: Int, s: String): Array[Byte] =
      rec(0x0204, cellHead(row, col) ++ u16(s.length) ++ Array(0x01.toByte) ++
        s.getBytes("UTF-16LE"))
    val cells = labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
      formulaNumber(1, 0, 6.25) ++ label(1, 1, "détaillé") ++
      boolErr(1, 2, v = false)
    val stream = workbookStream(3,
      Seq(Seq("A", "B", "C").flatMap(sstString).toArray), cells)
    val grid = XlsIngest.parseGrid(cfb("Workbook", stream))
    assert(grid(1).toSeq == Seq("6.25", "détaillé", "FALSE"))
  }

  test("CsvIngest dispatch routes .xls to the BIFF8 reader") {
    val cells = labelSst(0, 0, 0) ++ labelSst(1, 0, 1)
    val stream = workbookStream(2,
      Seq(Seq("Batch Number", "b-7").flatMap(sstString).toArray), cells)
    val path = writeTemp(".xls", cfb("Workbook", stream))
    val df = CsvIngest.readAllString(spark, path)
    assert(df.columns.toSeq == Seq("Batch_Number"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("b-7"))
  }

  test("malformed inputs fail with actionable messages") {
    // BIFF5: the stream is named 'Book'
    val biff5 = cfb("Book", rec(0x0809,
      u16(0x0500) ++ u16(0x0005) ++ Array.fill(12)(0.toByte)))
    val e1 = intercept[IllegalArgumentException] {
      XlsIngest.parseGrid(biff5)
    }
    assert(e1.getMessage.contains("BIFF5") && e1.getMessage.contains(".xlsx"))
    // not a compound file at all
    val e2 = intercept[IllegalArgumentException] {
      XlsIngest.parseGrid("plain,csv,content".getBytes("UTF-8"))
    }
    assert(e2.getMessage.contains("OLE2"))
    // OLE2 container without any Excel stream
    val e3 = intercept[IllegalArgumentException] {
      XlsIngest.parseGrid(cfb("NotExcel", Array.fill(64)(0.toByte)))
    }
    assert(e3.getMessage.contains("no Workbook stream"))
  }
}
