package graft.core

import scala.collection.mutable.ArrayBuffer

/** CCITT Group 4 (ITU-T T.6, 2-D MMR) decode for /CCITTFaxDecode image
  * streams with /K < 0 — beyond reference parity (the reference rejects
  * CCITT, DocumentStructure.hs:305-313), but scanned-PDF crawl corpora are
  * full of it. Run-length tables are the public ITU-T T.4 tables, shared
  * by the decoder and the fixture encoder; a spec test pins them
  * prefix-free and against hand-derived vectors.
  *
  * Output is packed 1-bit rows, MSB-first, rowBytes = ceil(columns/8);
  * bit value for black is 1 when blackIs1, else 0 (ISO 32000-1 7.4.6).
  */
object Ccitt {

  // ---------- ITU-T T.4 run-length code tables (public standard data) ----

  /** "run code" pairs; terminating codes 0-63 + makeup codes 64-1728. */
  private val whiteCodesSpec = """
0 00110101
1 000111
2 0111
3 1000
4 1011
5 1100
6 1110
7 1111
8 10011
9 10100
10 00111
11 01000
12 001000
13 000011
14 110100
15 110101
16 101010
17 101011
18 0100111
19 0001100
20 0001000
21 0010111
22 0000011
23 0000100
24 0101000
25 0101011
26 0010011
27 0100100
28 0011000
29 00000010
30 00000011
31 00011010
32 00011011
33 00010010
34 00010011
35 00010100
36 00010101
37 00010110
38 00010111
39 00101000
40 00101001
41 00101010
42 00101011
43 00101100
44 00101101
45 00000100
46 00000101
47 00001010
48 00001011
49 01010010
50 01010011
51 01010100
52 01010101
53 00100100
54 00100101
55 01011000
56 01011001
57 01011010
58 01011011
59 01001010
60 01001011
61 00110010
62 00110011
63 00110100
64 11011
128 10010
192 010111
256 0110111
320 00110110
384 00110111
448 01100100
512 01100101
576 01101000
640 01100111
704 011001100
768 011001101
832 011010010
896 011010011
960 011010100
1024 011010101
1088 011010110
1152 011010111
1216 011011000
1280 011011001
1344 011011010
1408 011011011
1472 010011000
1536 010011001
1600 010011010
1664 011000
1728 010011011
"""

  private val blackCodesSpec = """
0 0000110111
1 010
2 11
3 10
4 011
5 0011
6 0010
7 00011
8 000101
9 000100
10 0000100
11 0000101
12 0000111
13 00000100
14 00000111
15 000011000
16 0000010111
17 0000011000
18 0000001000
19 00001100111
20 00001101000
21 00001101100
22 00000110111
23 00000101000
24 00000010111
25 00000011000
26 000011001010
27 000011001011
28 000011001100
29 000011001101
30 000001101000
31 000001101001
32 000001101010
33 000001101011
34 000011010010
35 000011010011
36 000011010100
37 000011010101
38 000011010110
39 000011010111
40 000001101100
41 000001101101
42 000011011010
43 000011011011
44 000001010100
45 000001010101
46 000001010110
47 000001010111
48 000001100100
49 000001100101
50 000001010010
51 000001010011
52 000000100100
53 000000110111
54 000000111000
55 000000100111
56 000000101000
57 000001011000
58 000001011001
59 000000101011
60 000000101100
61 000001011010
62 000001100110
63 000001100111
64 0000001111
128 000011001000
192 000011001001
256 000001011011
320 000000110011
384 000000110100
448 000000110101
512 0000001101100
576 0000001101101
640 0000001001010
704 0000001001011
768 0000001001100
832 0000001001101
896 0000001110010
960 0000001110011
1024 0000001110100
1088 0000001110101
1152 0000001110110
1216 0000001110111
1280 0000001010010
1344 0000001010011
1408 0000001010100
1472 0000001010101
1536 0000001011010
1600 0000001011011
1664 0000001100100
1728 0000001100101
"""

  /** Extended makeup 1792-2560 (shared by both colors, T.4). */
  private val extCodesSpec = """
1792 00000001000
1856 00000001100
1920 00000001101
1984 000000010010
2048 000000010011
2112 000000010100
2176 000000010101
2240 000000010110
2304 000000010111
2368 000000011100
2432 000000011101
2496 000000011110
2560 000000011111
"""

  private def parse(spec: String): List[(Int, String)] =
    spec.linesIterator.map(_.trim).filter(_.nonEmpty).map { l =>
      val Array(r, c) = l.split(' ')
      (r.toInt, c)
    }.toList

  /** run -> code string, for the encoder. */
  val whiteEncode: Map[Int, String] = (parse(whiteCodesSpec) ++ parse(extCodesSpec)).toMap
  val blackEncode: Map[Int, String] = (parse(blackCodesSpec) ++ parse(extCodesSpec)).toMap

  /** (bitLength, bits) -> run, for the decoder. */
  private def decodeTable(pairs: List[(Int, String)]): Map[(Int, Int), Int] =
    pairs.map { case (run, code) => (code.length, Integer.parseInt(code, 2)) -> run }.toMap

  val whiteDecode: Map[(Int, Int), Int] = decodeTable(parse(whiteCodesSpec) ++ parse(extCodesSpec))
  val blackDecode: Map[(Int, Int), Int] = decodeTable(parse(blackCodesSpec) ++ parse(extCodesSpec))

  // ---------- bit reader ----------

  private final class BitReader(data: Array[Byte]) {
    var pos = 0 // bit position
    def eof: Boolean = pos >= data.length * 8
    def readBit(): Int =
      if (eof) -1
      else {
        val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1
        pos += 1
        b
      }
    def alignByte(): Unit = if ((pos & 7) != 0) pos = (pos | 7) + 1
  }

  /** One total run length (makeup codes accumulate until a terminating
    * code < 64 arrives, per T.4). Left(-1) = clean EOF, Left(-2) = bad code. */
  private def readRun(br: BitReader, table: Map[(Int, Int), Int]): Int = {
    var total = 0
    var cont = true
    while (cont) {
      var len = 0
      var bits = 0
      var run = -1
      while (run < 0 && len < 14) {
        val b = br.readBit()
        if (b < 0) return -1
        bits = (bits << 1) | b
        len += 1
        run = table.getOrElse((len, bits), -1)
      }
      if (run < 0) return -2
      total += run
      cont = run >= 64
    }
    total
  }

  private val ModeV0 = 0
  private val ModeVR1 = 1
  private val ModeVR2 = 2
  private val ModeVR3 = 3
  private val ModeVL1 = -1
  private val ModeVL2 = -2
  private val ModeVL3 = -3
  private val ModeH = 100
  private val ModeP = 101
  private val ModeEol = 102
  private val ModeEof = 103
  private val ModeBad = 104

  /** 2-D mode codes (T.6 table 1): 1=V0, 011=VR1, 010=VL1, 001=H, 0001=P,
    * 000011=VR2, 000010=VL2, 0000011=VR3, 0000010=VL3, 7+ zeros -> EOL
    * (EOFB = two EOLs terminates a G4 stream). */
  private def readMode(br: BitReader): Int = {
    var zeros = 0
    var b = br.readBit()
    if (b < 0) return ModeEof
    while (b == 0) {
      zeros += 1
      if (zeros >= 11) { // 000000000001 EOL: consume the trailing 1 below
        var z = zeros
        var bb = br.readBit()
        while (bb == 0) { z += 1; bb = br.readBit() }
        return if (bb < 0) ModeEof else ModeEol
      }
      b = br.readBit()
      if (b < 0) return ModeEof
    }
    // b == 1 after `zeros` zeros
    zeros match {
      case 0 => ModeV0
      case 2 => ModeH // 001
      case 3 => ModeP // 0001
      case 1 | 4 | 5 => // 01x / 00001x / 000001x need one more bit
        val z = zeros
        val nb = br.readBit()
        if (nb < 0) ModeEof
        else (z, nb) match {
          case (1, 1) => ModeVR1 // 011
          case (1, 0) => ModeVL1 // 010
          case (4, 1) => ModeVR2 // 000011
          case (4, 0) => ModeVL2 // 000010
          case (5, 1) => ModeVR3 // 0000011
          case (5, 0) => ModeVL3 // 0000010
          case _ => ModeBad
        }
      case _ => ModeBad
    }
  }

  /** Decode a G4 (T.6) stream. `rows = 0` -> decode until EOFB/EOD. */
  def decodeG4(data: Array[Byte], columns: Int, rows: Int,
      blackIs1: Boolean, byteAlign: Boolean): Either[PdfError, Array[Byte]] = {
    if (columns <= 0 || columns > (1 << 20))
      return Left(PdfError.ParseError(s"CCITT: bad /Columns $columns"))
    val rowBytes = (columns + 7) / 8
    val maxRows = if (rows > 0) rows else Int.MaxValue
    val out = new ArrayBuffer[Byte]
    val br = new BitReader(data)
    var ref = Array(columns, columns) // imaginary all-white line above row 0
    var rowCount = 0
    var done = false
    while (!done && rowCount < maxRows && !br.eof) {
      if (byteAlign) br.alignByte()
      decodeRow2D(br, ref, columns, rowCount, "G4") match {
        case Left(e) => return Left(e)
        case Right((cur, term)) =>
          if (term != RowComplete) done = true
          // a complete row is always emitted (an all-white P-mode row has
          // no transitions); an EOL/EOF-mode-terminated partial row is
          // emitted only when it recorded transitions; a run-code EOF
          // drops the partial row (pinned G4 semantics)
          if (term == RowComplete ||
              ((term == RowMarkerEol || term == RowMarkerEof) && cur.nonEmpty)) {
            out ++= packRow(cur, columns, rowBytes, blackIs1)
            rowCount += 1
            cur += columns
            cur += columns
            ref = cur.toArray
          }
      }
    }
    Right(out.toArray)
  }

  private val RowComplete = 0 // a0 reached /Columns
  private val RowRunEof = 1 // clean EOF inside an H-mode run pair
  private val RowMarkerEol = 2 // an EOL code hit inside the row
  private val RowMarkerEof = 3 // clean EOF from the mode reader

  /** Decode ONE 2-D-coded row (shared by T.6 G4 and T.4 G3 /K > 0 rows)
    * against the reference line's transition array. Returns the row's
    * transitions plus how it ended; corruption (bad mode/run code, stalled
    * a0) is a hard Left. */
  private def decodeRow2D(br: BitReader, ref: Array[Int], columns: Int,
      rowCount: Int, label: String): Either[PdfError, (ArrayBuffer[Int], Int)] = {
    val cur = new ArrayBuffer[Int]
    var a0 = -1
    var white = true
    var steps = 0
    while (true) {
      steps += 1
      if (steps > 2 * columns + 16) // malformed stream stalling a0: stay total
        return Left(PdfError.ParseError(s"CCITT $label: no row progress (row $rowCount)"))
      // b1: first ref transition > a0 with the same "to-color" parity as
      // the current color (even index = white->black, odd = black->white)
      var i = if (white) 0 else 1
      while (i < ref.length && ref(i) <= a0) i += 2
      // a0 = -1 start: any transition >= 0 qualifies (handled by <= -1)
      val b1 = if (i < ref.length) ref(i) else columns
      val b2 = if (i + 1 < ref.length) ref(i + 1) else columns
      readMode(br) match {
        case ModeP =>
          a0 = b2 // color unchanged, no transition recorded
          if (a0 >= columns) return Right((cur, RowComplete))
        case ModeH =>
          val a0p = math.max(a0, 0)
          val r1 = readRun(br, if (white) whiteDecode else blackDecode)
          val r2 = if (r1 >= 0) readRun(br, if (white) blackDecode else whiteDecode) else r1
          // -2 = a bit pattern outside the run tables: CORRUPTION, a hard
          // parse error like a bad mode code (a silent short image would
          // misreport a damaged scan as success); -1 = clean EOF, keep
          // the truncation semantics
          if (r1 == -2 || r2 == -2)
            return Left(PdfError.ParseError(
              s"CCITT $label: bad run code at bit ${br.pos} (row $rowCount)"))
          if (r1 < 0 || r2 < 0) return Right((cur, RowRunEof))
          val a1 = math.min(a0p + r1, columns)
          val a2 = math.min(a1 + r2, columns)
          cur += a1
          cur += a2
          a0 = a2
          if (a0 >= columns) return Right((cur, RowComplete))
        case m if m >= ModeVL3 && m <= ModeVR3 => // vertical -3..3
          val a1 = math.min(math.max(b1 + m, 0), columns)
          cur += a1
          a0 = a1
          white = !white
          if (a0 >= columns) return Right((cur, RowComplete))
        case ModeEol => return Right((cur, RowMarkerEol))
        case ModeEof => return Right((cur, RowMarkerEof))
        case _ =>
          return Left(PdfError.ParseError(
            s"CCITT $label: bad mode code at bit ${br.pos} (row $rowCount)"))
      }
    }
    Left(PdfError.ParseError("unreachable"))
  }

  /** Emit one packed row from its transition list (alternating
    * white->black starting white, cumulative positions); !blackIs1 keeps
    * the white=1 convention the image exporter expects. */
  private def packRow(cur: scala.collection.IndexedSeq[Int], columns: Int,
      rowBytes: Int, blackIs1: Boolean): Array[Byte] = {
    val rowBits = new Array[Byte](rowBytes)
    if (!blackIs1) java.util.Arrays.fill(rowBits, 0xff.toByte) // white=1
    var t = 0
    while (t < cur.length) {
      val from = cur(t)
      val to = if (t + 1 < cur.length) cur(t + 1) else columns
      if (t % 2 == 0) { // black span [from, to)
        var x = from
        while (x < to) {
          if (blackIs1) rowBits(x >> 3) = (rowBits(x >> 3) | (1 << (7 - (x & 7)))).toByte
          else rowBits(x >> 3) = (rowBits(x >> 3) & ~(1 << (7 - (x & 7)))).toByte
          x += 1
        }
      }
      t += 1
    }
    rowBits
  }

  /** Consume one EOL (11+ zeros then a 1) at the current position; when the
    * next bits are NOT an EOL the position is restored and this returns
    * false. Zero fill before the EOL is absorbed by the zero count. */
  private def tryConsumeEol(br: BitReader): Boolean = {
    val save = br.pos
    var zeros = 0
    var b = br.readBit()
    while (b == 0) { zeros += 1; b = br.readBit() }
    if (b == 1 && zeros >= 11) true
    else { br.pos = save; false }
  }

  /** True when every bit from the current position to EOF is zero (pad
    * fill); does not consume. Cheap on real data — the scan stops at the
    * first 1 bit. */
  private def remainderIsZeroFill(br: BitReader): Boolean = {
    val save = br.pos
    var b = br.readBit()
    while (b == 0) b = br.readBit()
    br.pos = save
    b < 0
  }

  /** Decode a G3 stream (T.4, the /K >= 0 family). /K = 0: every row is
    * 1-D MH (a white-first alternation of run codes summing to /Columns).
    * /K > 0: mixed mode — each EOL carries a tag bit selecting 1-D (1) or
    * 2-D (0) for the following row; 2-D rows use the same vertical/
    * horizontal/pass codes as G4 against the previous decoded row. Rows
    * are separated by optional EOLs (fill-absorbing); RTC (two consecutive
    * EOLs with no data between), trailing zero fill, or clean EOF ends the
    * image. `rows = 0` -> decode until RTC/EOD (same contract as
    * decodeG4). */
  def decodeG3(data: Array[Byte], columns: Int, rows: Int, k: Int,
      blackIs1: Boolean, byteAlign: Boolean): Either[PdfError, Array[Byte]] = {
    if (columns <= 0 || columns > (1 << 20))
      return Left(PdfError.ParseError(s"CCITT: bad /Columns $columns"))
    val rowBytes = (columns + 7) / 8
    val maxRows = if (rows > 0) rows else Int.MaxValue
    val out = new ArrayBuffer[Byte]
    val br = new BitReader(data)
    var ref = Array(columns, columns) // imaginary all-white line above row 0
    var rowCount = 0
    var done = false
    while (!done && rowCount < maxRows && !br.eof) {
      if (byteAlign) br.alignByte()
      // leading fill + EOL(s); two EOLs back to back = RTC, end of image
      var eols = 0
      var tag1D = true // /K = 0 rows are always 1-D
      var stop = false
      while (!stop && tryConsumeEol(br)) {
        eols += 1
        if (k > 0) {
          // mixed-mode (T.4 2-D) tag bit follows every EOL: 1 = 1-D row
          br.readBit() match {
            case 1 => tag1D = true
            case 0 => tag1D = false
            case _ => done = true; stop = true
          }
        }
        if (eols >= 2) { done = true; stop = true } // RTC
      }
      // a stream with no RTC (/EndOfBlock false writers) may end in >=14
      // zero pad bits: that is EOD, not a bad run code — without this an
      // entirely-decoded no-/Rows image would be dropped over its padding
      if (eols >= 2 || br.eof || remainderIsZeroFill(br)) done = true
      if (!done && !tag1D) {
        // 2-D-coded row against the previous decoded row
        decodeRow2D(br, ref, columns, rowCount, "G3") match {
          case Left(e) => return Left(e)
          case Right((cur, RowComplete)) =>
            out ++= packRow(cur, columns, rowBytes, blackIs1)
            rowCount += 1
            cur += columns
            cur += columns
            ref = cur.toArray
          case Right((_, RowRunEof)) => done = true // drop the partial row
          case Right((_, RowMarkerEof)) =>
            // clean EOF mid-row: drop the partial row, keep the decoded
            // prefix (same truncation semantics as the 1-D branch)
            done = true
          case Right((_, _)) =>
            // an EOL inside a fixed-/Columns 2-D row is a short row
            return Left(PdfError.ParseError(
              s"CCITT G3: premature EOL in 2-D row (row $rowCount)"))
        }
      } else if (!done) {
        val cur = new ArrayBuffer[Int]
        var total = 0
        var white = true
        var rowOk = true
        while (rowOk && !done && total < columns) {
          readRun(br, if (white) whiteDecode else blackDecode) match {
            case -1 => // clean EOF mid-row: drop the partial row (G4 parity)
              done = true
              rowOk = false
            case -2 =>
              return Left(PdfError.ParseError(
                s"CCITT G3: bad run code at bit ${br.pos} (row $rowCount)"))
            case run =>
              total += run
              if (total > columns)
                return Left(PdfError.ParseError(
                  s"CCITT G3: row overrun $total > $columns (row $rowCount)"))
              cur += total
              white = !white
          }
        }
        if (rowOk && total == columns) {
          out ++= packRow(cur, columns, rowBytes, blackIs1)
          rowCount += 1
          // this row is the next row's 2-D reference line
          cur += columns
          cur += columns
          ref = cur.toArray
        }
      }
    }
    Right(out.toArray)
  }

  // ---------- encoder (fixture/test side; shares the tables) ----------

  private final class BitWriter {
    private val buf = new ArrayBuffer[Byte]
    private var acc = 0
    private var n = 0
    def write(code: String): Unit = code.foreach { c =>
      acc = (acc << 1) | (if (c == '1') 1 else 0)
      n += 1
      if (n == 8) { buf += acc.toByte; acc = 0; n = 0 }
    }
    def result(): Array[Byte] = {
      if (n > 0) buf += (acc << (8 - n)).toByte
      buf.toArray
    }
  }

  private[graft] def runCode(run0: Int, white: Boolean): String = {
    val enc = if (white) whiteEncode else blackEncode
    val sb = new StringBuilder
    var run = run0
    while (run >= 64) {
      val makeup = math.min(run / 64 * 64, 2560)
      sb ++= enc(makeup)
      run -= makeup
    }
    sb ++= enc(run)
    sb.toString
  }

  /** Encode a bitmap (true = black) as a G3 1-D stream: EOL before every
    * row (the standard T.4 form), white-first run codes, RTC at the end. */
  def encodeG3(bitmap: Array[Array[Boolean]], columns: Int): Array[Byte] = {
    val bw = new BitWriter
    for (row <- bitmap) {
      bw.write("000000000001")
      encode1DRow(bw, row, columns)
    }
    bw.write("000000000001" * 2) // RTC (two EOLs suffice for the decoder contract)
    bw.result()
  }

  /** White->black transition positions of one bitmap row. */
  private def transitionsOf(row: Array[Boolean], columns: Int): Array[Int] = {
    val cur = new ArrayBuffer[Int]
    var x = 0
    var c = false
    while (x < columns) {
      if (row(x) != c) { cur += x; c = row(x) }
      x += 1
    }
    cur.toArray
  }

  /** Emit one 2-D-coded row (vertical/horizontal/pass modes) against the
    * reference line — shared by the G4 and mixed-G3 encoders. */
  private def encode2DRow(bw: BitWriter, curArr: Array[Int], ref: Array[Int],
      columns: Int): Unit = {
    var a0 = -1
    var white = true
    var ci = 0 // next transition index in curArr
    while (a0 < columns) {
      val a1 = if (ci < curArr.length) curArr(ci) else columns
      var i = if (white) 0 else 1
      while (i < ref.length && ref(i) <= a0) i += 2
      val b1 = if (i < ref.length) ref(i) else columns
      val b2 = if (i + 1 < ref.length) ref(i + 1) else columns
      if (b2 < a1) {
        bw.write("0001") // pass
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) {
        bw.write(a1 - b1 match {
          case 0 => "1"
          case 1 => "011"
          case 2 => "000011"
          case 3 => "0000011"
          case -1 => "010"
          case -2 => "000010"
          case -3 => "0000010"
        })
        a0 = a1
        white = !white
        ci += 1
      } else {
        val a2 = if (ci + 1 < curArr.length) curArr(ci + 1) else columns
        bw.write("001")
        bw.write(runCode(a1 - math.max(a0, 0), white))
        bw.write(runCode(a2 - a1, !white))
        a0 = a2
        ci += 2
      }
    }
  }

  /** Emit one 1-D MH row (white-first runs) — shared by the G3 encoders. */
  private def encode1DRow(bw: BitWriter, row: Array[Boolean], columns: Int): Unit = {
    var x = 0
    var white = true
    while (x < columns) {
      var end = x
      val isBlack = !white
      while (end < columns && row(end) == isBlack) end += 1
      // a black-first row emits the mandatory zero-length white run
      bw.write(runCode(end - x, white))
      white = !white
      x = end
    }
  }

  /** Encode a bitmap (true = black) as a /K > 0 mixed G3 stream: EOL + tag
    * bit before every row; row 0 and every k-th row are 1-D, the rest 2-D
    * against the previous row (the standard K-factor structure). */
  def encodeG3Mixed(bitmap: Array[Array[Boolean]], columns: Int, k: Int): Array[Byte] = {
    require(k > 0)
    val bw = new BitWriter
    var ref = Array(columns, columns)
    for ((row, idx) <- bitmap.zipWithIndex) {
      val oneD = idx % k == 0
      bw.write("000000000001")
      bw.write(if (oneD) "1" else "0")
      val curArr = transitionsOf(row, columns)
      if (oneD) encode1DRow(bw, row, columns)
      else encode2DRow(bw, curArr, ref, columns)
      ref = curArr ++ Array(columns, columns)
    }
    bw.write("0000000000011" * 2) // RTC: two EOL+tag groups
    bw.result()
  }

  /** Encode a bitmap (true = black) as a G4 stream with EOFB. */
  def encodeG4(bitmap: Array[Array[Boolean]], columns: Int): Array[Byte] = {
    val bw = new BitWriter
    var ref = Array(columns, columns)
    for (row <- bitmap) {
      val curArr = transitionsOf(row, columns)
      encode2DRow(bw, curArr, ref, columns)
      ref = curArr ++ Array(columns, columns)
    }
    bw.write("000000000001000000000001") // EOFB
    bw.result()
  }
}
