package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Minimal legacy `.xls` (BIFF8) reader — the last corner of the
  * reference's ingest dispatch (order_info_etl.py:177-178 accepts both
  * `.xls` and `.xlsx` via pd.read_excel). Like [[XlsxIngest]], no
  * spreadsheet dependency: the OLE2/CFB compound container and the BIFF8
  * record stream are parsed directly.
  *
  * Scope: well-formed BIFF8 (Excel 97+) string/number grids — the CFB
  * FAT and miniFAT chains, the Workbook stream, the SST string pool
  * (compressed + UTF-16 strings, CONTINUE splits with re-stated flag
  * bytes), and the first worksheet's cell records (LABELSST, NUMBER, RK,
  * MULRK, LABEL, FORMULA cached results + STRING, BOOLERR; BLANKs are
  * gaps). BIFF5 (`Book` stream) fails fast with a convert-first message.
  *
  * Output contract matches [[XlsxIngest.readAllString]]: first sheet in
  * workbook (BOUNDSHEET) order, first row is the normalized header,
  * every value a raw string; numerics render minimally (integral doubles
  * without a trailing `.0`), mirroring how xlsx stores them as text.
  *
  * Scale note: like xlsx, `.xls` is driver-bounded BY CONSTRUCTION
  * (64 KiB rows hard cap) and lands in a LocalRelation; bulk data
  * belongs on the distributed CSV/parquet scan paths.
  */
object XlsIngest {

  /** `.xls` analog of [[CsvIngest.readAllString]]. */
  def readAllString(spark: SparkSession, path: String): DataFrame =
    CsvIngest.gridToDf(spark, parseGrid(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))), path)

  /** All cell values of the first worksheet as raw strings (null = gap). */
  private[graft] def parseGrid(bytes: Array[Byte]): Vector[Array[String]] = {
    val workbook = Cfb.streamNamed(bytes, "Workbook").getOrElse {
      if (Cfb.streamNamed(bytes, "Book").isDefined)
        throw new IllegalArgumentException(
          "BIFF5 (Excel 5.0/95) .xls is not supported — re-save the file " +
            "as .xlsx (or Excel 97+ .xls)")
      else throw new IllegalArgumentException(
        "no Workbook stream — not an Excel .xls compound file")
    }
    Biff8.firstSheetGrid(workbook)
  }

  // ---------------------------------------------------------------------
  // OLE2 / MS-CFB compound file: header -> DIFAT -> FAT -> directory;
  // small streams live in the root entry's mini stream via the miniFAT.
  // ---------------------------------------------------------------------
  private object Cfb {
    private val Signature = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte)
    private val EndOfChain = 0xFFFFFFFE
    private val MaxChain = 1 << 22 // cycle guard: 4M sectors ≈ 2 GiB file

    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    private def i32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    private def i64(b: Array[Byte], off: Int): Long =
      (i32(b, off) & 0xFFFFFFFFL) | ((i32(b, off + 4) & 0xFFFFFFFFL) << 32)

    /** The named stream's bytes, if the container holds one. */
    def streamNamed(file: Array[Byte], name: String): Option[Array[Byte]] = {
      require(file.length >= 512 &&
        file.take(8).sameElements(Signature), "not an OLE2 compound file")
      val sectorSize = 1 << u16(file, 30)
      val miniCutoff = i32(file, 56)
      def sector(i: Int): Array[Byte] = {
        val off = 512 + i.toLong * sectorSize
        require(off + sectorSize <= file.length, s"sector $i beyond file end")
        java.util.Arrays.copyOfRange(file, off.toInt, off.toInt + sectorSize)
      }
      // FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
      val fatSectors = ArrayBuffer.empty[Int]
      for (i <- 0 until 109) {
        val s = i32(file, 76 + 4 * i)
        if (s >= 0) fatSectors += s
      }
      var difat = i32(file, 68)
      var difatGuard = 0
      while (difat != EndOfChain && difat >= 0 && difatGuard < MaxChain) {
        val d = sector(difat)
        for (i <- 0 until sectorSize / 4 - 1) {
          val s = i32(d, 4 * i)
          if (s >= 0) fatSectors += s
        }
        difat = i32(d, sectorSize - 4)
        difatGuard += 1
      }
      val fat = fatSectors.toArray.flatMap(s =>
        sector(s).grouped(4).map(g => i32(g, 0)))
      def chain(start: Int, next: Int => Int): Seq[Int] = {
        val out = ArrayBuffer.empty[Int]
        var cur = start
        while (cur != EndOfChain && cur >= 0) {
          require(out.length < MaxChain, "cyclic sector chain")
          out += cur
          cur = next(cur)
        }
        out.toSeq
      }
      def readChain(start: Int, size: Long): Array[Byte] = {
        val buf = chain(start, s => fat(s)).flatMap(sector).toArray
        java.util.Arrays.copyOfRange(buf, 0, math.min(size, buf.length).toInt)
      }
      // directory entries, scanned linearly (no need for the RB tree)
      val dirBytes = chain(i32(file, 48), s => fat(s)).flatMap(sector).toArray
      val entries = dirBytes.grouped(128).filter(_.length == 128).toSeq
      def entryName(e: Array[Byte]): String = {
        val len = math.max(0, u16(e, 64) - 2) // bytes incl UTF-16 terminator
        new String(e, 0, math.min(len, 64), "UTF-16LE")
      }
      val root = entries.find(e => (e(66) & 0xFF) == 5).getOrElse(
        throw new IllegalArgumentException("compound file has no root entry"))
      entries.find(e => (e(66) & 0xFF) == 2 && entryName(e) == name).map { e =>
        val start = i32(e, 116)
        val size = i64(e, 120)
        if (size >= miniCutoff) readChain(start, size)
        else {
          // mini stream: 64-byte sectors inside the root entry's chain
          val miniContainer = readChain(i32(root, 116), i64(root, 120))
          val miniFat = chain(i32(file, 60), s => fat(s))
            .flatMap(sector).toArray.grouped(4).map(g => i32(g, 0)).toArray
          val buf = chain(start, s => miniFat(s)).flatMap { ms =>
            val off = ms * 64
            require(off + 64 <= miniContainer.length, s"mini sector $ms out of range")
            miniContainer.slice(off, off + 64)
          }.toArray
          java.util.Arrays.copyOfRange(buf, 0, math.min(size, buf.length).toInt)
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // BIFF8 record stream: globals substream (BOUNDSHEET order, SST pool)
  // then per-sheet substreams of cell records.
  // ---------------------------------------------------------------------
  private object Biff8 {
    private val RecBof = 0x0809
    private val RecEof = 0x000A
    private val RecBoundSheet = 0x0085
    private val RecSst = 0x00FC
    private val RecContinue = 0x003C
    private val RecLabelSst = 0x00FD
    private val RecLabel = 0x0204
    private val RecNumber = 0x0203
    private val RecRk = 0x027E
    private val RecMulRk = 0x00BD
    private val RecFormula = 0x0006
    private val RecString = 0x0207
    private val RecBoolErr = 0x0205

    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    private def i32(b: Array[Byte], off: Int): Int =
      u16(b, off) | (u16(b, off + 2) << 16)

    private final case class Record(id: Int, data: Array[Byte], offset: Int)

    private def records(stream: Array[Byte], from: Int): Iterator[Record] =
      new Iterator[Record] {
        private var pos = from
        def hasNext: Boolean = pos + 4 <= stream.length
        def next(): Record = {
          val id = u16(stream, pos)
          val len = u16(stream, pos + 2)
          require(pos + 4 + len <= stream.length,
            s"truncated BIFF record 0x${id.toHexString} at $pos")
          val r = Record(id,
            java.util.Arrays.copyOfRange(stream, pos + 4, pos + 4 + len), pos)
          pos += 4 + len
          r
        }
      }

    /** Cursor over a record's payload plus its CONTINUE extensions.
      * Scalar fields never straddle a boundary (writer contract); char
      * data may — each continuation then restates a flags byte for the
      * REMAINING characters. */
    private final class Segments(parts: IndexedSeq[Array[Byte]]) {
      private var seg = 0
      private var off = 0
      private def ensure(): Unit = {
        while (seg < parts.length && off >= parts(seg).length) { seg += 1; off = 0 }
        require(seg < parts.length, "ran past end of SST data")
      }
      def readU8(): Int = { ensure(); val v = parts(seg)(off) & 0xFF; off += 1; v }
      def readU16(): Int = readU8() | (readU8() << 8)
      def readU32(): Int = readU16() | (readU16() << 16)
      def skip(n: Int): Unit = (0 until n).foreach(_ => readU8())
      /** Read `cch` characters, `compressed` per the current flags; at
        * each CONTINUE boundary a fresh flags byte re-states the
        * encoding of the remainder (a string's char data is mid-string by
        * definition here — its header consumed ≥3 bytes already, so
        * landing on off==0 always means a crossed boundary). */
      def readChars(cch: Int, compressedAtStart: Boolean): String = {
        val sb = new java.lang.StringBuilder(cch)
        var remaining = cch
        var compressed = compressedAtStart
        while (remaining > 0) {
          ensure()
          if (off == 0) compressed = (readU8() & 0x01) == 0
          val avail = parts(seg).length - off
          val take = math.min(remaining, if (compressed) avail else avail / 2)
          require(take > 0, "CONTINUE split inside a UTF-16 code unit")
          if (compressed)
            (0 until take).foreach(_ => sb.append((readU8() & 0xFF).toChar))
          else
            (0 until take).foreach(_ => sb.append(readU16().toChar))
          remaining -= take
        }
        sb.toString
      }
      /** XLUnicodeRichExtendedString: cch, flags, optional run/ext sizes,
        * chars, then run/ext payloads skipped. */
      def readSstString(): String = {
        val cch = readU16()
        val flags = readU8()
        val rich = (flags & 0x08) != 0
        val ext = (flags & 0x04) != 0
        val cRun = if (rich) readU16() else 0
        val cbExt = if (ext) readU32() else 0
        val s = readChars(cch, (flags & 0x01) == 0)
        skip(4 * cRun)
        skip(cbExt)
        s
      }
    }

    /** XLUnicodeString inside a single record (STRING, LABEL). */
    private def unicodeString(b: Array[Byte], off: Int): String = {
      val cch = u16(b, off)
      val flags = b(off + 2) & 0xFF
      if ((flags & 0x01) == 0) {
        val chars = new Array[Char](cch)
        (0 until cch).foreach(i => chars(i) = (b(off + 3 + i) & 0xFF).toChar)
        new String(chars)
      } else new String(b, off + 3, 2 * cch, "UTF-16LE")
    }

    /** Integral doubles render without the trailing `.0`, mirroring how
      * xlsx stores numbers as minimal text (XlsxIngest parity). */
    private def numToString(d: Double): String =
      if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 1e15)
        d.toLong.toString
      else d.toString

    private def rkToString(rk: Int): String = {
      val div100 = (rk & 0x01) != 0
      val asInt = (rk & 0x02) != 0
      if (asInt) {
        val v = rk >> 2 // arithmetic: sign-preserving
        if (div100) numToString(v / 100.0) else v.toString
      } else {
        val d = java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
        numToString(if (div100) d / 100.0 else d)
      }
    }

    def firstSheetGrid(stream: Array[Byte]): Vector[Array[String]] = {
      val head = records(stream, 0)
      require(head.hasNext, "empty Workbook stream")
      val bof = head.next()
      require(bof.id == RecBof, "Workbook stream does not start with BOF")
      require(u16(bof.data, 0) == 0x0600,
        s"unsupported BIFF version 0x${u16(bof.data, 0).toHexString} — only " +
          "BIFF8 (Excel 97+) .xls is readable; re-save older files as .xlsx")
      // globals pass: first BOUNDSHEET (workbook order) + SST with CONTINUEs
      var firstSheetOffset = -1
      val sst = ArrayBuffer.empty[String]
      var pendingSst: List[Array[Byte]] = Nil
      var sstCount = 0
      def flushSst(): Unit = if (pendingSst.nonEmpty) {
        val segs = new Segments(pendingSst.reverse.toIndexedSeq)
        segs.skip(8) // total refs + unique count
        (0 until sstCount).foreach(_ => sst += segs.readSstString())
        pendingSst = Nil
      }
      val globals = records(stream, 0)
      var depth = 0
      var done = false
      while (globals.hasNext && !done) {
        val r = globals.next()
        r.id match {
          case RecBof => depth += 1
          case RecEof => depth -= 1; if (depth == 0) done = true
          case RecBoundSheet if depth == 1 && firstSheetOffset < 0 =>
            firstSheetOffset = i32(r.data, 0)
          case RecSst if depth == 1 =>
            sstCount = i32(r.data, 4)
            pendingSst = r.data :: Nil
          case RecContinue if pendingSst.nonEmpty =>
            pendingSst = r.data :: pendingSst
          case _ => if (pendingSst.nonEmpty) flushSst()
        }
      }
      flushSst()
      require(firstSheetOffset >= 0, "no BOUNDSHEET record — sheetless workbook")

      // sheet pass: cell records until the substream's EOF
      val cells = mutable.LongMap.empty[String] // (row << 16 | col) -> value
      var maxRow = -1
      var maxCol = -1
      def put(row: Int, colIdx: Int, v: String): Unit = {
        cells((row.toLong << 16) | colIdx) = v
        if (row > maxRow) maxRow = row
        if (colIdx > maxCol) maxCol = colIdx
      }
      val sheet = records(stream, firstSheetOffset)
      require(sheet.hasNext && stream.length > firstSheetOffset,
        "BOUNDSHEET offset beyond stream")
      val sheetBof = sheet.next()
      require(sheetBof.id == RecBof, "sheet substream does not start with BOF")
      var sheetDepth = 1
      var lastFormulaCell = -1L
      while (sheet.hasNext && sheetDepth > 0) {
        val r = sheet.next()
        r.id match {
          case RecBof => sheetDepth += 1
          case RecEof => sheetDepth -= 1
          case _ if sheetDepth > 1 => // nested (chart) substream: skip
          case RecLabelSst =>
            val idx = i32(r.data, 6)
            require(idx >= 0 && idx < sst.length, s"SST index $idx out of range")
            put(u16(r.data, 0), u16(r.data, 2), sst(idx))
          case RecLabel =>
            put(u16(r.data, 0), u16(r.data, 2), unicodeString(r.data, 6))
          case RecNumber =>
            val bits = java.nio.ByteBuffer.wrap(r.data, 6, 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
            put(u16(r.data, 0), u16(r.data, 2),
              numToString(java.lang.Double.longBitsToDouble(bits)))
          case RecRk =>
            put(u16(r.data, 0), u16(r.data, 2), rkToString(i32(r.data, 6)))
          case RecMulRk =>
            val row = u16(r.data, 0)
            val colFirst = u16(r.data, 2)
            val nCells = (r.data.length - 6) / 6
            (0 until nCells).foreach(i =>
              put(row, colFirst + i, rkToString(i32(r.data, 4 + 6 * i + 2))))
          case RecBoolErr =>
            if ((r.data(7) & 0xFF) == 0) // booleans only; errors stay gaps
              put(u16(r.data, 0), u16(r.data, 2),
                if (r.data(6) != 0) "TRUE" else "FALSE")
          case RecFormula =>
            val row = u16(r.data, 0)
            val colIdx = u16(r.data, 2)
            if (u16(r.data, 12) == 0xFFFF) (r.data(6) & 0xFF) match {
              case 0 => lastFormulaCell = (row.toLong << 16) | colIdx // STRING follows
              case 1 => put(row, colIdx, if (r.data(8) != 0) "TRUE" else "FALSE")
              case 3 => put(row, colIdx, "")
              case _ => // error result: gap
            } else {
              val bits = java.nio.ByteBuffer.wrap(r.data, 6, 8)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
              put(row, colIdx, numToString(java.lang.Double.longBitsToDouble(bits)))
            }
          case RecString if lastFormulaCell >= 0 =>
            put((lastFormulaCell >> 16).toInt, (lastFormulaCell & 0xFFFF).toInt,
              unicodeString(r.data, 0))
            lastFormulaCell = -1L
          case _ => // DIMENSIONS / ROW / formats / window state: irrelevant
        }
      }
      (0 to maxRow).map { r =>
        val width = maxCol + 1
        Array.tabulate(width)(c => cells.getOrElse((r.toLong << 16) | c, null))
      }.toVector
    }
  }
}
