package graft.core

/** JBIG2 (ITU-T T.88) embedded-stream decode for /JBIG2Decode — generic
  * regions, both MMR-coded and arithmetic-coded (MQ, T.88 Annex E).
  * Beyond reference parity (the reference rejects JBIG2 like it rejects
  * all CCITT, DocumentStructure.hs:305-313), but scanned-PDF corpora
  * carry it: a generic region with MMR=1 is bit-for-bit a T.6 (Group 4)
  * stream — the Ccitt kernel this repo already has — and real-world
  * scanners mostly emit MMR=0 arithmetic regions, decoded here with the
  * template/AT-pixel procedure of T.88 6.2.5.7 (GB templates 0-3,
  * TPGDON typical prediction). Symbol dictionaries, text regions and
  * refinement stay UnsupportedFeature: decoding them wrong would be
  * worse than declining.
  *
  * PDF embeds the "embedded organization" of T.88: a bare sequence of
  * segments with no file header (ISO 32000-1 7.4.7). The decoder walks
  * ALL segment headers (T.88 7.2: number, flags, referred-to list, page
  * association, data length) first; a stream with more than one generic
  * region, a region offset from (0,0), a region not covering the page
  * info dimensions, or a non-0 page default pixel is refused as
  * UnsupportedFeature rather than silently decoded partially (a partial
  * bitmap reported as success is a wrong answer). Output convention:
  * packed 1-bit rows with 0 = black — JBIG2's native 1-is-black is
  * inverted so a /DeviceGray 1-bit image renders with the same polarity
  * as a default CCITT decode (what mainstream readers do).
  */
object Jbig2 {

  private def be32(p: Array[Byte], o: Int): Long =
    if (o + 4 > p.length) -1L
    else ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)

  private final case class Region(body: Int, end: Int)

  /** Decode an embedded JBIG2 stream to packed rows (0 = black). */
  def decodeEmbedded(data: Array[Byte]): Either[PdfError, Array[Byte]] = {
    var off = 0
    var segs = 0
    var pageInfo = -1 // body offset of the page-info segment, if any
    var regions = List.empty[Region]
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
          regions ::= Region(body, end)
        case 48 => // page info
          if (dataLen >= 17) pageInfo = body
        case 0 | 4 | 6 | 7 | 16 | 20 | 22 | 23 | 40 | 42 | 43 =>
          // symbol dict / text / pattern dict / halftone / refinement:
          // any of these contributes pixels the generic-region decode
          // below would silently drop — refuse, never partially decode
          return Left(PdfError.UnsupportedFeature(
            s"JBIG2 segment type $segType (symbol/text/halftone/refinement)"))
        case _ => () // end-of-page/-stripe/-file, extensions: skip
      }
      off = end
    }
    regions match {
      case Nil =>
        Left(PdfError.UnsupportedFeature("JBIG2: no generic region found"))
      case _ :: _ :: _ =>
        // a multi-region page needs offset compositing; a partial decode
        // reported as success would be silently wrong
        Left(PdfError.UnsupportedFeature(
          s"JBIG2: ${regions.length} generic regions (compositing unsupported)"))
      case Region(body, end) :: Nil =>
        // region segment info (T.88 7.4.1): w, h, x, y, comb-op flags
        val w = be32(data, body)
        val h = be32(data, body + 4)
        val x = be32(data, body + 8)
        val y = be32(data, body + 12)
        if (w <= 0 || h <= 0 || w > (1 << 20) || w * h > (64L << 20))
          return Left(PdfError.ParseError(s"JBIG2: bad region ${w}x$h"))
        if (x != 0 || y != 0)
          return Left(PdfError.UnsupportedFeature(
            s"JBIG2: offset-composited region at ($x,$y)"))
        if (pageInfo >= 0) {
          val pw = be32(data, pageInfo)
          val ph = be32(data, pageInfo + 4)
          // striped pages carry height 0xffffffff (unknown until end)
          if (pw != w || (ph != h && ph != 0xffffffffL))
            return Left(PdfError.UnsupportedFeature(
              s"JBIG2: region ${w}x$h does not cover page ${pw}x$ph"))
          val pflags = data(pageInfo + 16) & 0xff
          if ((pflags & 0x04) != 0)
            return Left(PdfError.UnsupportedFeature(
              "JBIG2: page default pixel 1 (compositing unsupported)"))
        }
        val grFlags = data(body + 17) & 0xff
        if ((grFlags & 1) == 1) {
          val mmr = java.util.Arrays.copyOfRange(data, body + 18, end)
          // MMR = T.6; JBIG2 1 = black, then invert to the 0-is-black
          // /DeviceGray polarity (see object comment)
          Ccitt.decodeG4(mmr, w.toInt, h.toInt, blackIs1 = true, byteAlign = false)
            .map { rows =>
              var i = 0
              while (i < rows.length) { rows(i) = (~rows(i)).toByte; i += 1 }
              rows
            }
        } else {
          val template = (grFlags >> 1) & 3
          val tpgdon = (grFlags & 0x08) != 0
          // AT pixels follow the flags byte: 2 signed bytes each
          val atCount = if (template == 0) 4 else 1
          val atOff = body + 18
          if (atOff + atCount * 2 > end)
            return Left(PdfError.ParseError("JBIG2: truncated AT pixels"))
          val at = Array.tabulate(atCount)(i =>
            (data(atOff + 2 * i).toInt, data(atOff + 2 * i + 1).toInt))
          decodeGenericArith(data, atOff + atCount * 2, end,
            w.toInt, h.toInt, template, tpgdon, at)
        }
    }
  }

  // ---------- arithmetic generic-region decoding (T.88 6.2.5.7) ----------

  /** Fixed context pixels per GB template (T.88 figures 4-7), BEFORE the
    * AT pixels are appended. The context value is the concatenation of
    * the template+AT pixels sorted by (y, x), first = most significant
    * bit — the ordering the standard's figures define. */
  private val CodingTemplates: Array[Array[(Int, Int)]] = Array(
    Array((-1, -2), (0, -2), (1, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    Array((-1, -2), (0, -2), (1, -2), (2, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
      (-3, 0), (-2, 0), (-1, 0)),
    Array((-1, -2), (0, -2), (1, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1),
      (-2, 0), (-1, 0)),
    Array((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0)))

  /** Nominal AT-pixel positions (T.88 6.2.5.3 defaults). */
  private[core] def nominalAt(template: Int): Array[(Int, Int)] =
    if (template == 0) Array((3, -1), (-3, -1), (2, -2), (-2, -2))
    else if (template == 1) Array((3, -1))
    else Array((2, -1))

  /** TPGDON pseudo-pixel context per template (T.88 6.2.5.7). */
  private val TpgdonContext = Array(0x9b25, 0x0795, 0x00e5, 0x0195)

  private def sortedTemplate(template: Int, at: Array[(Int, Int)]): Array[(Int, Int)] =
    (CodingTemplates(template) ++ at).sortBy { case (x, y) => (y, x) }

  private def decodeGenericArith(data: Array[Byte], start: Int, end: Int,
      w: Int, h: Int, template: Int, tpgdon: Boolean,
      at: Array[(Int, Int)]): Either[PdfError, Array[Byte]] = {
    val coords = sortedTemplate(template, at)
    if (coords.exists { case (cx, cy) => cy > 0 || (cy == 0 && cx >= 0) })
      return Left(PdfError.ParseError("JBIG2: AT pixel refers to undecoded pixels"))
    val dec = new Mq.Decoder(data, start, end)
    val contexts = new Array[Byte](1 << 16)
    // bitmap in JBIG2 sense: true = 1 = black. FLAT h*w array (<= 64 MB
    // under the region guard): a per-row Array[Array[...]] would let a
    // tall-skinny region (w=1, h=64M — w*h passes the area cap) allocate
    // gigabytes of row-object overhead, the WAV-style decode-bomb class
    val bm = new Array[Boolean](h * w)
    var ltp = false
    var yy = 0
    while (yy < h) {
      if (tpgdon) {
        if (dec.decodeBit(contexts, TpgdonContext(template)) == 1) ltp = !ltp
        if (ltp) {
          if (yy > 0) System.arraycopy(bm, (yy - 1) * w, bm, yy * w, w)
          yy += 1
        }
      }
      if (!tpgdon || !ltp) {
        var xx = 0
        while (xx < w) {
          var cx = 0
          var i = 0
          while (i < coords.length) {
            val px = xx + coords(i)._1
            val py = yy + coords(i)._2
            val bit =
              if (px < 0 || px >= w || py < 0) 0
              else if (bm(py * w + px)) 1 else 0
            cx = (cx << 1) | bit
            i += 1
          }
          bm(yy * w + xx) = dec.decodeBit(contexts, cx) == 1
          xx += 1
        }
        yy += 1
      }
    }
    // pack with the 0-is-black convention: black (1 in JBIG2) -> bit 0
    val stride = (w + 7) / 8
    val out = new Array[Byte](stride * h)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        if (!bm(r * w + c)) out(r * stride + (c >> 3)) =
          (out(r * stride + (c >> 3)) | (0x80 >> (c & 7))).toByte
        c += 1
      }
      // pad bits right of the row stay 0 (= black is WRONG for padding);
      // set them to 1 (white) to match the MMR path's inverted padding
      var pb = w
      while (pb < stride * 8) {
        out(r * stride + (pb >> 3)) =
          (out(r * stride + (pb >> 3)) | (0x80 >> (pb & 7))).toByte
        pb += 1
      }
      r += 1
    }
    Right(out)
  }

  /** Encode a bitmap (true = black) as an arithmetic generic region —
    * fixture/test side, mirrors decodeGenericArith exactly. */
  private[core] def encodeGenericArith(bitmap: Array[Array[Boolean]], w: Int,
      template: Int, tpgdon: Boolean): Array[Byte] = {
    val h = bitmap.length
    val coords = sortedTemplate(template, nominalAt(template))
    val enc = new Mq.Encoder
    val contexts = new Array[Byte](1 << 16)
    def bitAt(px: Int, py: Int): Int =
      if (px < 0 || px >= w || py < 0 || py >= h) 0
      else if (bitmap(py)(px)) 1 else 0
    var ltp = false
    var yy = 0
    while (yy < h) {
      var rowTypical = false
      if (tpgdon) {
        rowTypical = yy > 0 && java.util.Arrays.equals(
          bitmap(yy).map(b => if (b) 1.toByte else 0.toByte),
          bitmap(yy - 1).map(b => if (b) 1.toByte else 0.toByte))
        val sltp = if (rowTypical != ltp) 1 else 0
        enc.encodeBit(contexts, TpgdonContext(template), sltp)
        if (sltp == 1) ltp = !ltp
      }
      if (!tpgdon || !ltp) {
        var xx = 0
        while (xx < w) {
          var cx = 0
          var i = 0
          while (i < coords.length) {
            cx = (cx << 1) | bitAt(xx + coords(i)._1, yy + coords(i)._2)
            i += 1
          }
          enc.encodeBit(contexts, cx, if (bitmap(yy)(xx)) 1 else 0)
          xx += 1
        }
      }
      yy += 1
    }
    enc.flush()
    enc.bytes()
  }

  // ---------- fixture/test-side encoders ----------

  private def writeBe32(out: scala.collection.mutable.ArrayBuffer[Byte], v: Long): Unit = {
    out += ((v >> 24) & 0xff).toByte; out += ((v >> 16) & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte; out += (v & 0xff).toByte
  }

  private def segmentBytes(num: Long, tpe: Int, body: Array[Byte]): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    writeBe32(out, num)
    out += tpe.toByte // flags: type, 1-byte page association
    out += 0x00.toByte // no referred-to segments
    out += 0x01.toByte // page 1
    writeBe32(out, body.length.toLong)
    out ++= body
    out.toArray
  }

  private def pageInfoBytes(columns: Int, h: Int): Array[Byte] = {
    val page = new scala.collection.mutable.ArrayBuffer[Byte]
    writeBe32(page, columns.toLong); writeBe32(page, h.toLong)
    writeBe32(page, 0); writeBe32(page, 0)
    page += 0x00.toByte; page += 0x00.toByte; page += 0x00.toByte
    page.toArray
  }

  /** Region segment info prologue (T.88 7.4.1): w, h, x=0, y=0, comb-op
    * OR — shared by both encoders. */
  private def regionInfoBytes(columns: Int, h: Int): scala.collection.mutable.ArrayBuffer[Byte] = {
    val reg = new scala.collection.mutable.ArrayBuffer[Byte]
    writeBe32(reg, columns.toLong); writeBe32(reg, h.toLong)
    writeBe32(reg, 0); writeBe32(reg, 0)
    reg += 0x00.toByte // external combination operator: OR
    reg
  }

  /** Author an embedded JBIG2 stream: one page-info segment plus one
    * immediate generic region (MMR-coded via the shared T.6 encoder). */
  def encodeEmbedded(bitmap: Array[Array[Boolean]], columns: Int): Array[Byte] = {
    val h = bitmap.length
    // immediate generic region (type 38): region info + MMR flag + T.6 data
    val reg = regionInfoBytes(columns, h)
    reg += 0x01.toByte // generic region flags: MMR = 1
    reg ++= Ccitt.encodeG4(bitmap, columns)
    segmentBytes(0, 48, pageInfoBytes(columns, h)) ++ segmentBytes(1, 38, reg.toArray)
  }

  /** Author an embedded JBIG2 stream with an MQ arithmetic-coded generic
    * region (nominal AT pixels) — the dominant real-world encoding. */
  def encodeEmbeddedArith(bitmap: Array[Array[Boolean]], columns: Int,
      template: Int = 0, tpgdon: Boolean = false): Array[Byte] = {
    val h = bitmap.length
    val reg = regionInfoBytes(columns, h)
    reg += (((template & 3) << 1) | (if (tpgdon) 0x08 else 0x00)).toByte // MMR=0
    for ((ax, ay) <- nominalAt(template)) { reg += ax.toByte; reg += ay.toByte }
    reg ++= encodeGenericArith(bitmap, columns, template, tpgdon)
    segmentBytes(0, 48, pageInfoBytes(columns, h)) ++ segmentBytes(1, 38, reg.toArray)
  }
}
