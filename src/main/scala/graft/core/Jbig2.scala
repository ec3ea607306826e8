package graft.core

/** JBIG2 (ITU-T T.88) embedded-stream decode for /JBIG2Decode — the
  * MMR-coded generic-region subset. Beyond reference parity (the reference
  * rejects JBIG2 like it rejects all CCITT, DocumentStructure.hs:305-313),
  * but scanned-PDF corpora carry it, and a generic region with MMR=1 is
  * bit-for-bit a T.6 (Group 4) stream — the Ccitt kernel this repo already
  * has. Arithmetic-coded regions (MMR=0), symbol dictionaries and
  * refinement stay UnsupportedFeature: decoding them wrong would be worse
  * than declining.
  *
  * PDF embeds the "embedded organization" of T.88: a bare sequence of
  * segments with no file header (ISO 32000-1 7.4.7). The decoder walks
  * segment headers (T.88 7.2: number, flags, referred-to list, page
  * association, data length) and decodes the FIRST immediate generic
  * region (type 38/39; 36 intermediate accepted too) whose flags select
  * MMR. Output convention: packed 1-bit rows with 0 = black — JBIG2's
  * native 1-is-black is inverted so a /DeviceGray 1-bit image renders
  * with the same polarity as a default CCITT decode (what mainstream
  * readers do).
  */
object Jbig2 {

  private def be32(p: Array[Byte], o: Int): Long =
    if (o + 4 > p.length) -1L
    else ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)

  /** Decode an embedded JBIG2 stream to packed rows (0 = black). */
  def decodeEmbedded(data: Array[Byte]): Either[PdfError, Array[Byte]] = {
    var off = 0
    var segs = 0
    while (off + 11 <= data.length && segs < 1024) { // segment-count cap: total on garbage
      segs += 1
      val segNum = be32(data, off)
      val flags = data(off + 4) & 0xff
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      var o = off + 5
      // referred-to segment count + retain bits (T.88 7.2.4)
      val rts = data(o) & 0xff
      var refCount = rts >> 5
      if (refCount == 7) {
        val longCount = be32(data, o) & 0x1fffffffL
        if (longCount < 0 || longCount > (1 << 20))
          return Left(PdfError.ParseError("JBIG2: bad referred-segment count"))
        refCount = longCount.toInt
        o += 4 + (refCount + 8) / 8 // 4-byte count + retain-bit bytes
      } else o += 1
      // referred segment numbers: size depends on THIS segment's number
      val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
      o += refCount * refSize
      // page association
      o += (if (pageAssoc4) 4 else 1)
      val dataLen = be32(data, o)
      o += 4
      if (dataLen < 0 || dataLen == 0xffffffffL || o + dataLen > data.length)
        return Left(PdfError.ParseError(s"JBIG2: bad segment length (segment $segNum)"))
      val body = o
      val end = (o + dataLen).toInt
      segType match {
        case 36 | 38 | 39 => // (immediate) generic region
          if (dataLen < 18)
            return Left(PdfError.ParseError("JBIG2: truncated generic region"))
          // region segment info (T.88 7.4.1): w, h, x, y, comb-op flags
          val w = be32(data, body)
          val h = be32(data, body + 4)
          if (w <= 0 || h <= 0 || w > (1 << 20) || w * h > (64L << 20))
            return Left(PdfError.ParseError(s"JBIG2: bad region ${w}x$h"))
          val grFlags = data(body + 17) & 0xff
          if ((grFlags & 1) == 0)
            return Left(PdfError.UnsupportedFeature(
              "JBIG2 arithmetic-coded generic region (MMR=0)"))
          val mmr = java.util.Arrays.copyOfRange(data, body + 18, end)
          // MMR = T.6; JBIG2 1 = black, then invert to the 0-is-black
          // /DeviceGray polarity (see object comment)
          return Ccitt.decodeG4(mmr, w.toInt, h.toInt,
              blackIs1 = true, byteAlign = false)
            .map { rows =>
              var i = 0
              while (i < rows.length) { rows(i) = (~rows(i)).toByte; i += 1 }
              rows
            }
        case 51 => // end of file
          return Left(PdfError.UnsupportedFeature(
            "JBIG2: no MMR generic region before end of file"))
        case _ => () // page info / end-of-page / dictionaries: skip
      }
      off = end
    }
    Left(PdfError.UnsupportedFeature("JBIG2: no MMR generic region found"))
  }

  // ---------- fixture/test-side encoder ----------

  /** Author an embedded JBIG2 stream: one page-info segment plus one
    * immediate generic region (MMR-coded via the shared T.6 encoder). */
  def encodeEmbedded(bitmap: Array[Array[Boolean]], columns: Int): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    def be32(v: Long): Unit = {
      out += ((v >> 24) & 0xff).toByte; out += ((v >> 16) & 0xff).toByte
      out += ((v >> 8) & 0xff).toByte; out += (v & 0xff).toByte
    }
    def segment(num: Long, tpe: Int, body: Array[Byte]): Unit = {
      be32(num)
      out += tpe.toByte // flags: type, 1-byte page association
      out += 0x00.toByte // no referred-to segments
      out += 0x01.toByte // page 1
      be32(body.length.toLong)
      out ++= body
    }
    val h = bitmap.length
    // page info (type 48): w, h, xres, yres, flags, striping
    val page = new scala.collection.mutable.ArrayBuffer[Byte]
    def pbe32(v: Long): Unit = {
      page += ((v >> 24) & 0xff).toByte; page += ((v >> 16) & 0xff).toByte
      page += ((v >> 8) & 0xff).toByte; page += (v & 0xff).toByte
    }
    pbe32(columns.toLong); pbe32(h.toLong); pbe32(0); pbe32(0)
    page += 0x00.toByte; page += 0x00.toByte; page += 0x00.toByte
    segment(0, 48, page.toArray)
    // immediate generic region (type 38): region info + MMR flag + T.6 data
    val mmr = Ccitt.encodeG4(bitmap, columns)
    val reg = new scala.collection.mutable.ArrayBuffer[Byte]
    def rbe32(v: Long): Unit = {
      reg += ((v >> 24) & 0xff).toByte; reg += ((v >> 16) & 0xff).toByte
      reg += ((v >> 8) & 0xff).toByte; reg += (v & 0xff).toByte
    }
    rbe32(columns.toLong); rbe32(h.toLong); rbe32(0); rbe32(0)
    reg += 0x00.toByte // external combination operator: OR
    reg += 0x01.toByte // generic region flags: MMR = 1
    reg ++= mmr
    segment(1, 38, reg.toArray)
    out.toArray
  }
}
