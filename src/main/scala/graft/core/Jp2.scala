package graft.core

/** JPEG 2000 header facts (ISO/IEC 15444-1). Full JPX DECODE stays
  * UnsupportedFeature (Filters.decodeOne) — wavelet reconstruction is out
  * of scope on both engines (the reference rejects JPXDecode outright,
  * DocumentStructure.hs:305-313) — but this surface makes the refusal
  * OBSERVABLE: the JP2 signature/jp2h/ihdr box walk and the raw-codestream
  * SIZ segment yield dimensions / component count / bit depth, so a crawl
  * pipeline can catalogue the JPX assets it refuses to decode. Total and
  * bounded: every read is length-checked, box loops cannot stall (a
  * non-advancing box length is refused), and absurd dimensions are refused
  * rather than trusted. */
object Jp2 {

  final case class Header(format: String, width: Int, height: Int,
      components: Int, bpc: Int)

  /** Dimensions above this are refused — a 2^30-pixel-wide "image" in a
    * crawl corpus is a crafted header, not a scan. */
  private val MaxDim = 1 << 24

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** Parse header facts from either container: the JP2 box format (file
    * signature box 'jP\x20\x20' first) or a raw JPEG 2000 codestream
    * (SOC marker 0xFF4F first). */
  def headerFacts(bs: Array[Byte]): Either[PdfError, Header] =
    if (bs.length >= 12 && be32(bs, 0) == 12L &&
        be32(bs, 4) == 0x6a502020L && be32(bs, 8) == 0x0d0a870aL)
      jp2Boxes(bs)
    else if (bs.length >= 2 && (bs(0) & 0xff) == 0xff && (bs(1) & 0xff) == 0x4f)
      codestream(bs, 2)
    else Left(PdfError.ParseError(
      "not a JP2 box stream or JPEG 2000 codestream"))

  /** Walk top-level boxes after the signature box for 'jp2h', then its
    * child boxes for 'ihdr' (I.5.3.1: height, width, NC, BPC). */
  private def jp2Boxes(bs: Array[Byte]): Either[PdfError, Header] = {
    var off = 12
    while (off + 8 <= bs.length) {
      val len0 = be32(bs, off)
      val boxType = be32(bs, off + 4)
      // LBox 0 = "to end of file"; 1 = 64-bit XLBox (larger than any sane
      // header container — refuse rather than truncate)
      if (len0 == 1L)
        return Left(PdfError.UnsupportedFeature("JP2 XLBox (64-bit box length)"))
      val end = if (len0 == 0L) bs.length else off + len0
      if (len0 != 0L && (len0 < 8L || end > bs.length))
        return Left(PdfError.ParseError("JP2 box length out of bounds"))
      if (boxType == 0x6a703268L) // 'jp2h'
        return ihdrIn(bs, off + 8, end.toInt)
      off = end.toInt
    }
    Left(PdfError.ParseError("JP2 header box (jp2h) not found"))
  }

  private def ihdrIn(bs: Array[Byte], from: Int, to: Int): Either[PdfError, Header] = {
    var off = from
    while (off + 8 <= to) {
      val len0 = be32(bs, off)
      val boxType = be32(bs, off + 4)
      if (len0 == 1L)
        return Left(PdfError.UnsupportedFeature("JP2 XLBox (64-bit box length)"))
      val end = if (len0 == 0L) to.toLong else off + len0
      if (len0 != 0L && (len0 < 8L || end > to))
        return Left(PdfError.ParseError("JP2 box length out of bounds"))
      if (boxType == 0x69686472L) { // 'ihdr'
        if (end - off < 8 + 14)
          return Left(PdfError.ParseError("JP2 ihdr box too short"))
        val h = be32(bs, off + 8)
        val w = be32(bs, off + 12)
        val nc = be16(bs, off + 16)
        val bpcField = bs(off + 18) & 0xff
        if (w < 1 || h < 1 || w > MaxDim || h > MaxDim)
          return Left(PdfError.UnsupportedFeature(s"JP2 dimensions ${w}x$h"))
        if (nc < 1 || nc > 16384)
          return Left(PdfError.UnsupportedFeature(s"JP2 component count $nc"))
        if (bpcField == 0xff)
          // per-component depths live in a bpcc box — refuse rather than
          // report a depth that is not actually uniform
          return Left(PdfError.UnsupportedFeature("JP2 per-component bit depth (bpcc)"))
        return Right(Header("jp2", w.toInt, h.toInt, nc, (bpcField & 0x7f) + 1))
      }
      off = end.toInt
    }
    Left(PdfError.ParseError("JP2 ihdr box not found in jp2h"))
  }

  /** Raw codestream: SIZ (0xFF51) must immediately follow SOC (A.5.1).
    * Image extent = (Xsiz - XOsiz) x (Ysiz - YOsiz); depth from Ssiz,
    * refused if it differs across components. */
  private def codestream(bs: Array[Byte], off: Int): Either[PdfError, Header] = {
    if (off + 4 > bs.length || be16(bs, off) != 0xff51)
      return Left(PdfError.ParseError("JPEG 2000 SIZ marker not found after SOC"))
    val lsiz = be16(bs, off + 2)
    if (lsiz < 41 || off + 2 + lsiz > bs.length)
      return Left(PdfError.ParseError("JPEG 2000 SIZ segment out of bounds"))
    val p = off + 4 // after marker + Lsiz
    val xsiz = be32(bs, p + 2)
    val ysiz = be32(bs, p + 6)
    val xosiz = be32(bs, p + 10)
    val yosiz = be32(bs, p + 14)
    val csiz = be16(bs, p + 34)
    val w = xsiz - xosiz
    val h = ysiz - yosiz
    if (w < 1 || h < 1 || w > MaxDim || h > MaxDim)
      return Left(PdfError.UnsupportedFeature(s"JPEG 2000 dimensions ${w}x$h"))
    if (csiz < 1 || csiz > 16384)
      return Left(PdfError.UnsupportedFeature(s"JPEG 2000 component count $csiz"))
    if (lsiz != 38 + 3 * csiz)
      return Left(PdfError.ParseError("JPEG 2000 SIZ length inconsistent with Csiz"))
    val depth0 = (bs(p + 36) & 0x7f) + 1
    var c = 1
    while (c < csiz) {
      if (((bs(p + 36 + 3 * c) & 0x7f) + 1) != depth0)
        return Left(PdfError.UnsupportedFeature(
          "JPEG 2000 per-component bit depths differ"))
      c += 1
    }
    Right(Header("j2k", w.toInt, h.toInt, csiz, depth0))
  }
}
