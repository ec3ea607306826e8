package graft.core

import java.util.zip.Inflater
import scala.collection.immutable.TreeMap
import scala.collection.mutable.ArrayBuffer
import PObj._

/** Stream filters: FlateDecode, DCTDecode (pass-through), ASCII85Decode,
  * PNG predictors 0/1/2 (reference DocumentStructure.hs:273-380). */
object Filters {

  def streamFilterNames(d: TreeMap[String, PObj]): Either[PdfError, List[String]] =
    d.get("/Filter") match {
      case None => Right(Nil)
      case Some(PName(n)) => Right(List(n))
      case Some(PArray(arr)) => Right(arr.collect { case PName(n) => n }.toList)
      case Some(_) => Left(PdfError.UnsupportedFeature(
        "invalid /Filter entry (expected name or array of names)"))
    }

  def decodeStreamBytes(d: TreeMap[String, PObj], s: Array[Byte]): Either[PdfError, Array[Byte]] = {
    val dp = d.get("/DecodeParms").orElse(d.get("/DP")) // /DP: common abbreviation
    streamFilterNames(d).flatMap { filters =>
      if (filters.isEmpty) applyPredictorParms(predictorParmsAt(dp, 0, isLast = true), s)
      else {
        val last = filters.length - 1
        filters.zipWithIndex.foldLeft[Either[PdfError, Array[Byte]]](Right(s)) {
          case (acc, (f, i)) => acc
            .flatMap(decodeWithParms(f, _, fullParmsAt(dp, i)))
            .flatMap(applyPredictorParms(predictorParmsAt(dp, i, i == last), _))
        }
      }
    }
  }

  /** Per-filter /DecodeParms resolution (ISO 32000-1 7.3.8.2): a PArray is
    * parallel to the /Filter array (null entries = no parms); a lone PDict
    * keeps the legacy behavior — /EarlyChange applies to every filter, the
    * predictor runs once after the last filter. */
  /** The filter's own parms dict: single-dict form applies to every filter
    * (legacy behavior), array form is per-index. */
  private def fullParmsAt(dp: Option[PObj], idx: Int): Option[TreeMap[String, PObj]] = dp match {
    case Some(PDict(p)) => Some(p)
    case Some(PArray(a)) if idx < a.length => a(idx) match {
      case PDict(p) => Some(p)
      case _ => None
    }
    case _ => None
  }

  private def earlyChangeOf(parms: TreeMap[String, PObj]): Int =
    parms.get("/EarlyChange") match {
      case Some(PNum(v)) => Util.hsTruncate(v)
      case _ => 1
    }

  private def parmInt(parms: Option[TreeMap[String, PObj]], key: String, dflt: Int): Int =
    parms.flatMap(_.get(key)).collect { case PNum(v) => Util.hsTruncate(v) }.getOrElse(dflt)

  private def parmBool(parms: Option[TreeMap[String, PObj]], key: String): Boolean =
    parms.flatMap(_.get(key)).contains(PBool(true))

  private def decodeWithParms(name: String, s: Array[Byte],
      parms: Option[TreeMap[String, PObj]]): Either[PdfError, Array[Byte]] =
    name match {
      case "/LZWDecode" => lzwDecode(s, parms.map(earlyChangeOf).getOrElse(1))
      case "/CCITTFaxDecode" =>
        // /K < 0 = Group 4 (T.6); /K >= 0 = Group 3 1-D (T.4 MH; /K > 0
        // mixed streams decode while every row's tag selects 1-D — a
        // 2-D-coded row is refused rather than mis-decoded)
        val k = parmInt(parms, "/K", 0)
        val columns = parmInt(parms, "/Columns", 1728)
        val rows = parmInt(parms, "/Rows", 0)
        val blackIs1 = parmBool(parms, "/BlackIs1")
        val byteAlign = parmBool(parms, "/EncodedByteAlign")
        if (k < 0) Ccitt.decodeG4(s, columns, rows, blackIs1, byteAlign)
        else Ccitt.decodeG3(s, columns, rows, k, blackIs1, byteAlign)
      case other => decodeOne(other, s)
    }

  private def predictorParmsAt(dp: Option[PObj], idx: Int,
      isLast: Boolean): Option[TreeMap[String, PObj]] = dp match {
    case Some(PDict(p)) => if (isLast) Some(p) else None
    case Some(PArray(a)) if idx < a.length => a(idx) match {
      case PDict(p) => Some(p)
      case _ => None
    }
    case _ => None
  }

  private def applyPredictorParms(parms: Option[TreeMap[String, PObj]],
      bs: Array[Byte]): Either[PdfError, Array[Byte]] = parms match {
    case Some(p) =>
      def parm(key: String, dflt: Int): Int = p.get(key) match {
        case Some(PNum(n)) => Util.hsTruncate(n)
        case _ => dflt
      }
      p.get("/Predictor") match {
        case Some(PNum(v)) if Util.hsTruncate(v) >= 12 =>
          p.get("/Columns") match {
            case Some(PNum(c)) =>
              decodePngPredictors(bs, Util.hsTruncate(c),
                parm("/Colors", 1), parm("/BitsPerComponent", 8))
            case _ => Right(bs)
          }
        case Some(PNum(v)) if Util.hsTruncate(v) == 2 =>
          decodeTiffPredictor(bs, parm("/Columns", 1),
            parm("/Colors", 1), parm("/BitsPerComponent", 8))
        case _ => Right(bs)
      }
    case None => Right(bs)
  }

  /** TIFF Predictor 2 (horizontal differencing, ISO 32000-1 7.4.4.4 via
    * TIFF 6.0 §14): each sample is the delta from the sample one pixel
    * left; rows reset. 8-bit samples only (sub-byte and 16-bit TIFF
    * differencing act on unpacked samples — refused rather than decoded
    * wrong). A 1-column image differences nothing by definition. */
  def decodeTiffPredictor(bs: Array[Byte], columns: Int, colors: Int,
      bpc: Int): Either[PdfError, Array[Byte]] = {
    if (columns <= 0 || colors <= 0 || bpc <= 0) return Right(Array.emptyByteArray)
    if (bpc != 8)
      return Left(PdfError.UnsupportedFeature(
        s"TIFF predictor with BitsPerComponent=$bpc (only 8 supported)"))
    if (colors > 60)
      return Left(PdfError.UnsupportedFeature(s"TIFF predictor with Colors=$colors"))
    val stride = columns.toLong * colors
    if (stride > Int.MaxValue - 8)
      return Left(PdfError.UnsupportedFeature(s"TIFF predictor row too wide ($stride bytes)"))
    val out = bs.clone()
    val rowLen = stride.toInt
    var rowStart = 0
    while (rowStart < out.length) {
      val end = math.min(rowStart + rowLen, out.length)
      var k = rowStart + colors
      while (k < end) {
        out(k) = (((out(k) & 0xff) + (out(k - colors) & 0xff)) & 0xff).toByte
        k += 1
      }
      rowStart += rowLen
    }
    Right(out)
  }

  def decodeOne(name: String, s: Array[Byte], earlyChange: Int = 1): Either[PdfError, Array[Byte]] =
    name match {
      case "/FlateDecode" => Right(inflate(s))
      case "/DCTDecode" => Right(s)
      case "/ASCII85Decode" => Right(ascii85(s))
      case "/LZWDecode" => lzwDecode(s, earlyChange)
      case "/RunLengthDecode" => runLengthDecode(s)
      case "/ASCIIHexDecode" => Right(asciiHex(s))
      // MMR-coded generic regions only (= T.6, the Ccitt kernel);
      // arithmetic coding stays UnsupportedFeature inside Jbig2
      case "/JBIG2Decode" => Jbig2.decodeEmbedded(s)
      case other => Left(PdfError.UnsupportedFeature(
        s"unsupported stream filter $other (supported: /FlateDecode /DCTDecode " +
          "/ASCII85Decode /ASCIIHexDecode /LZWDecode /RunLengthDecode " +
          "/CCITTFaxDecode /JBIG2Decode[MMR])"))
    }

  /** LZW (TIFF/PDF variant, ISO 32000-1 7.4.4): 9-bit codes growing to 12,
    * clear code 256 resets the table, EOD 257. Beyond reference parity —
    * the reference rejects LZW (DocumentStructure.hs:305-313) — but it is
    * the most common real-world UnsupportedFeature in a crawl corpus. */
  def lzwDecode(s: Array[Byte], earlyChange: Int = 1): Either[PdfError, Array[Byte]] = {
    val Clear = 256
    val Eod = 257
    val out = new ArrayBuffer[Byte]
    // table: entries 0..255 are single bytes; dynamic entries start at 258
    var table = new ArrayBuffer[Array[Byte]]
    def resetTable(): Unit = {
      table = new ArrayBuffer[Array[Byte]]
      var i = 0
      while (i < 256) { table += Array(i.toByte); i += 1 }
      table += Array.emptyByteArray // 256 clear
      table += Array.emptyByteArray // 257 EOD
    }
    resetTable()
    var width = 9
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var prev: Array[Byte] = null
    while (pos < s.length || bitCnt >= width) {
      while (bitCnt < width && pos < s.length) {
        bitBuf = (bitBuf << 8) | (s(pos) & 0xff)
        bitCnt += 8
        pos += 1
      }
      if (bitCnt < width) return Right(out.toArray) // trailing padding bits
      val code = ((bitBuf >> (bitCnt - width)) & ((1 << width) - 1)).toInt
      bitCnt -= width
      if (code == Eod) return Right(out.toArray)
      else if (code == Clear) {
        resetTable()
        width = 9
        prev = null
      } else {
        val entry: Array[Byte] =
          if (code < table.length) table(code)
          else if (code == table.length && prev != null) prev :+ prev(0) // KwKwK
          else return Left(PdfError.ParseError(s"LZW: code $code beyond table (${table.length})"))
        // blowup guard: entries grow with the table, so a small crafted
        // input can demand O(n^2) output (decompression bomb)
        if (out.length + entry.length > (256 << 20))
          return Left(PdfError.ParseError("LZW: decoded output exceeds 256MB"))
        out ++= entry
        if (prev != null && table.length < 4096) table += (prev :+ entry(0))
        prev = entry
        // width bump: with EarlyChange=1 (default) one entry early
        val limit = table.length + (if (earlyChange != 0) 1 else 0)
        if (limit >= (1 << width) && width < 12) width += 1
      }
    }
    Right(out.toArray)
  }

  /** RunLengthDecode (ISO 32000-1 7.4.5): length byte n -> 0..127 copies
    * the next n+1 bytes; 129..255 repeats the next byte 257-n times; 128 is
    * EOD. Beyond reference parity (reference rejects it). */
  def runLengthDecode(s: Array[Byte]): Either[PdfError, Array[Byte]] = {
    val out = new ArrayBuffer[Byte]
    var i = 0
    while (i < s.length) {
      val n = s(i) & 0xff
      if (n == 128) return Right(out.toArray)
      else if (n < 128) {
        val take = math.min(n + 1, s.length - i - 1)
        var k = 0
        while (k < take) { out += s(i + 1 + k); k += 1 }
        i += 1 + n + 1
      } else {
        if (i + 1 >= s.length) return Right(out.toArray) // truncated run
        val b = s(i + 1)
        var k = 0
        while (k < 257 - n) { out += b; k += 1 }
        i += 2
      }
    }
    Right(out.toArray)
  }

  /** zlib inflate, tolerant of trailing garbage. Scratch buffer sized to
    * the input (text deflates ~6x) instead of a fixed 64KB — the kernel
    * inflates many small streams per document. */
  def inflate(s: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(s)
    // ByteArrayOutputStream, not ArrayBuffer[Byte]: this is the hottest
    // decode path (every content/xref/font stream) and the generic buffer
    // boxes each byte and re-copies a buf.take(n) slice per chunk
    val out = new java.io.ByteArrayOutputStream(math.max(64, math.min(s.length * 6, 1 << 20)))
    val buf = new Array[Byte](math.max(1024, math.min(s.length * 6, 1 << 20)))
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (!inf.finished()) return out.toByteArray
      }
      out.toByteArray
    } catch {
      case _: Exception => out.toByteArray
    } finally inf.end()
  }

  def deflate(s: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s); d.finish()
    val out = new ArrayBuffer[Byte]
    val buf = new Array[Byte](65536)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out ++= buf.take(n)
    }
    d.end()
    out.toArray
  }

  /** ASCII85: data class 33..117 plus z/Z for four zero bytes
    * (DocumentStructure.hs:316-339). */
  def ascii85(bs: Array[Byte]): Array[Byte] = {
    val data = bs.iterator.map(_ & 0xff).filter(o =>
      (o >= 33 && o <= 117) || o == 'z' || o == 'Z').toArray
    val out = new ArrayBuffer[Byte]
    var i = 0
    while (i < data.length) {
      if (data(i) == 'z' || data(i) == 'Z') {
        out ++= Array[Byte](0, 0, 0, 0)
        i += 1
      } else {
        val grpLen = math.min(5, data.length - i)
        var n = 0L
        var k = 0
        while (k < 5) {
          val v = if (k < grpLen) data(i + k) - 33 else 'u' - 33
          n = n * 85 + v
          k += 1
        }
        val bytes = Array(
          ((n >> 24) & 0xff).toByte, ((n >> 16) & 0xff).toByte,
          ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
        // reference quirk (DocumentStructure.hs:338): the final PARTIAL
        // group emits the LOW (grpLen-1) bytes — `take (g-1) (reverse
        // bytes)` re-reversed by the accumulator — not Adobe's high bytes.
        // Full groups are unaffected (takeRight 4 = all 4). Byte parity
        // demands the quirk.
        out ++= bytes.takeRight(math.max(0, grpLen - 1))
        i += grpLen
      }
    }
    out.toArray
  }

  /** ASCIIHexDecode (ISO 32000-1 7.4.2): whitespace skipped, `>` is EOD,
    * odd trailing digit padded with 0. Beyond reference parity. */
  def asciiHex(bs: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]
    var hi = -1
    var i = 0
    while (i < bs.length) {
      val c = bs(i) & 0xff
      if (c == '>') {
        if (hi >= 0) out += (hi << 4).toByte
        return out.toArray
      }
      val d = Character.digit(c, 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { out += ((hi << 4) | d).toByte; hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out += (hi << 4).toByte
    out.toArray
  }

  /** PNG row predictors (RFC 2083 §6) as used by PDF DecodeParms. The
    * "left" neighbor is the sample one whole pixel back: bpp =
    * ceil(Colors*BitsPerComponent/8) bytes (1 for sub-byte depths), and a
    * row holds ceil(Columns*Colors*BitsPerComponent/8) bytes — for xref
    * streams (Colors=1, bpc=8) this degenerates to the historical
    * stride=Columns, left=row(k-1) behavior. */
  def decodePngPredictors(bs: Array[Byte], columns: Int, colors: Int = 1,
      bpc: Int = 8): Either[PdfError, Array[Byte]] = {
    if (columns <= 0 || colors <= 0 || bpc <= 0) return Right(Array.emptyByteArray)
    // bound the parms BEFORE the stride math: crafted huge /Colors x
    // /BitsPerComponent would overflow even the Long product below into a
    // negative (or bogus small) stride — PDF sample depths are 1..16 and
    // real color counts single-digit
    if (bpc > 16 || colors > 60)
      return Left(PdfError.UnsupportedFeature(
        s"PNG predictor parms out of range (Colors=$colors BitsPerComponent=$bpc)"))
    val bpp = math.max(1, (colors * bpc + 7) / 8)
    val rowBytes = (columns.toLong * colors * bpc + 7) / 8
    if (rowBytes > Int.MaxValue - 8)
      return Left(PdfError.UnsupportedFeature(s"PNG predictor row too wide ($rowBytes bytes)"))
    val stride = rowBytes.toInt
    val out = new ArrayBuffer[Byte]
    var prev = new Array[Byte](stride)
    var pos = 0
    while (pos < bs.length) {
      val filt = bs(pos) & 0xff
      val rowLen = math.min(stride, bs.length - pos - 1)
      val row = new Array[Byte](rowLen)
      System.arraycopy(bs, pos + 1, row, 0, rowLen)
      filt match {
        case 0 => ()
        case 1 =>
          var k = 0
          while (k < rowLen) {
            val left = if (k >= bpp) row(k - bpp) & 0xff else 0
            row(k) = (((row(k) & 0xff) + left) & 0xff).toByte
            k += 1
          }
        case 2 =>
          var k = 0
          while (k < rowLen) { row(k) = (((row(k) & 0xff) + (prev(k) & 0xff)) & 0xff).toByte; k += 1 }
        case 3 => // Average: raw + floor((left + up) / 2)
          var k = 0
          while (k < rowLen) {
            val left = if (k >= bpp) row(k - bpp) & 0xff else 0
            val up = prev(k) & 0xff
            row(k) = (((row(k) & 0xff) + ((left + up) >> 1)) & 0xff).toByte
            k += 1
          }
        case 4 => // Paeth (RFC 2083 6.6): nearest of left/up/up-left to a+b-c
          var k = 0
          while (k < rowLen) {
            val a = if (k >= bpp) row(k - bpp) & 0xff else 0
            val b = prev(k) & 0xff
            val c = if (k >= bpp) prev(k - bpp) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            row(k) = (((row(k) & 0xff) + pred) & 0xff).toByte
            k += 1
          }
        case other =>
          return Left(PdfError.UnsupportedFeature(s"unsupported PNG predictor $other"))
      }
      out ++= row
      prev = if (rowLen == stride) row else row ++ new Array[Byte](stride - rowLen)
      pos += 1 + stride
    }
    Right(out.toArray)
  }
}
