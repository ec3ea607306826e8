package graft.core

/** JBIG2 (ITU-T T.88) embedded-stream decode for /JBIG2Decode — generic
  * regions (MMR and MQ-arithmetic) plus arithmetic SYMBOL-CODED pages
  * (symbol dictionary 6.5 + text region 6.4, REFAGG=0), which is how
  * real-world scanners compress text pages. Beyond reference parity (the
  * reference rejects JBIG2 like it rejects all CCITT,
  * DocumentStructure.hs:305-313): a generic region with MMR=1 is
  * bit-for-bit a T.6 stream — the Ccitt kernel this repo already has —
  * MMR=0 regions use the MQ coder (core/Mq.scala, T.88 Annex E) with the
  * template/AT-pixel procedure of 6.2.5.7 (GB templates 0-3, TPGDON),
  * and symbol-coded pages decode through the arithmetic integer
  * procedures of Annex A (IADH/IADW/IAEX/IADT/IAFS/IADS/IAIT + IAID).
  * Huffman-coded variants, refinement/aggregate coding, halftones and
  * transposed text remain UnsupportedFeature: decoding them wrong would
  * be worse than declining.
  *
  * PDF embeds the "embedded organization" of T.88: a bare sequence of
  * segments with no file header (ISO 32000-1 7.4.7). The decoder walks
  * ALL segment headers (T.88 7.2) first; a stream with more than one
  * region, a region offset from (0,0), a region not covering the page
  * info dimensions, a non-0 page default pixel, or any segment type whose
  * pixels a single-region decode would drop (halftone, refinement) is
  * refused as UnsupportedFeature rather than silently decoded partially.
  * Output convention: packed 1-bit rows with 0 = black — JBIG2's native
  * 1-is-black is inverted so a /DeviceGray 1-bit image renders with the
  * same polarity as a default CCITT decode (what mainstream readers do).
  */
object Jbig2 {

  private def be32(p: Array[Byte], o: Int): Long =
    if (o + 4 > p.length) -1L
    else ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)

  private def u16(p: Array[Byte], o: Int): Int =
    if (o + 2 > p.length) -1 else ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)

  /** Uncompressed bitmap, JBIG2 sense: true = 1 = black. Flat h*w array —
    * a per-row Array[Array[...]] would let a tall-skinny region (w=1,
    * h=64M — the area cap alone passes it) allocate gigabytes of
    * row-object overhead, the WAV-style decode-bomb class. */
  private[graft] final case class Bm(w: Int, h: Int, bits: Array[Boolean])

  private final case class Seg(num: Long, tpe: Int, refs: List[Long], body: Int, end: Int)

  // ---------- MQ integer decoding (T.88 Annex A) ----------

  /** One adaptive-integer procedure's 512 contexts (IADH, IADW, ...). */
  private[graft] final class IntCtx { val cx = new Array[Byte](512) }

  /** Decode one integer; None = OOB. The PREV chain walks a binary tree
    * of contexts capped at 9 bits (A.2). */
  private[graft] def decodeInt(dec: Mq.Decoder, ictx: IntCtx): Option[Long] = {
    var prev = 1
    def bit(): Int = {
      val b = dec.decodeBit(ictx.cx, prev)
      prev = if (prev < 256) (prev << 1) | b else ((((prev << 1) | b) & 511) | 256)
      b
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    val s = bit()
    val v =
      if (bit() == 0) bits(2)
      else if (bit() == 0) bits(4) + 4
      else if (bit() == 0) bits(6) + 20
      else if (bit() == 0) bits(8) + 84
      else if (bit() == 0) bits(12) + 340
      else bits(32) + 4436
    if (s == 1 && v == 0) None
    else Some(if (s == 1) -v else v)
  }

  /** Symbol-ID decode (A.3): codeLen bits through a fresh PREV tree. */
  private def decodeIaid(dec: Mq.Decoder, cx: Array[Byte], codeLen: Int): Int = {
    var prev = 1
    var i = 0
    while (i < codeLen) { prev = (prev << 1) | dec.decodeBit(cx, prev); i += 1 }
    prev - (1 << codeLen)
  }

  /** SBSYMCODELEN = max(1, ceil(log2 n)) (T.88 + published erratum). */
  private def symCodeLenFor(n: Int): Int = {
    var c = 1
    while ((1 << c) < n) c += 1
    c
  }

  // ---------- generic-region decoding (T.88 6.2.5.7) ----------

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

  private def atCount(template: Int): Int = if (template == 0) 4 else 1

  /** Decode one generic bitmap with a SHARED decoder + GB context array
    * (symbol dictionaries decode many bitmaps through one MQ stream). */
  private def decodeGenericBm(dec: Mq.Decoder, contexts: Array[Byte], w: Int, h: Int,
      template: Int, tpgdon: Boolean, at: Array[(Int, Int)]): Either[PdfError, Bm] = {
    val coords = sortedTemplate(template, at)
    if (coords.exists { case (cx, cy) => cy > 0 || (cy == 0 && cx >= 0) })
      return Left(PdfError.ParseError("JBIG2: AT pixel refers to undecoded pixels"))
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
    Right(Bm(w, h, bm))
  }

  /** Pack a JBIG2-sense bitmap into the 0-is-black output rows (invert,
    * white-pad the row tail like the MMR path). */
  private def packBm(bm: Bm): Array[Byte] = {
    val stride = (bm.w + 7) / 8
    val out = new Array[Byte](stride * bm.h)
    var r = 0
    while (r < bm.h) {
      var c = 0
      while (c < bm.w) {
        if (!bm.bits(r * bm.w + c)) out(r * stride + (c >> 3)) =
          (out(r * stride + (c >> 3)) | (0x80 >> (c & 7))).toByte
        c += 1
      }
      var pb = bm.w
      while (pb < stride * 8) {
        out(r * stride + (pb >> 3)) =
          (out(r * stride + (pb >> 3)) | (0x80 >> (pb & 7))).toByte
        pb += 1
      }
      r += 1
    }
    out
  }

  // ---------- symbol dictionary (T.88 6.5, SDHUFF=0 REFAGG=0) ----------

  private val MaxSymbols = 1 << 16
  private val MaxSymbolDim = 1 << 12

  private def decodeSymbolDict(data: Array[Byte], body: Int, end: Int,
      inputSyms: Vector[Bm],
      customs: Vector[Jbig2Huffman.Table] = Vector.empty): Either[PdfError, Vector[Bm]] = {
    val flags = u16(data, body)
    if (flags < 0) return Left(PdfError.ParseError("JBIG2: truncated symbol dict"))
    if ((flags & 2) == 2)
      return Left(PdfError.UnsupportedFeature("JBIG2 refinement/aggregate symbol coding"))
    // bits 8/9: bitmap coding context USED/RETAINED (T.88 7.4.3.1.1) —
    // importing arithmetic contexts from a referred dict; decoding without
    // honoring them would silently mis-decode, so refuse instead
    if ((flags & 0x100) != 0 || (flags & 0x200) != 0)
      return Left(PdfError.UnsupportedFeature("JBIG2 retained bitmap coding contexts"))
    if ((flags & 1) == 1)
      return decodeSymbolDictHuffman(data, body, end, inputSyms, flags, customs)
    val template = (flags >> 10) & 3
    var o = body + 2
    val nAt = atCount(template)
    if (o + nAt * 2 + 8 > end)
      return Left(PdfError.ParseError("JBIG2: truncated symbol dict header"))
    val at = Array.tabulate(nAt)(i => (data(o + 2 * i).toInt, data(o + 2 * i + 1).toInt))
    o += nAt * 2
    val numEx = be32(data, o)
    val numNew = be32(data, o + 4)
    o += 8
    if (numEx < 0 || numNew < 0 || numNew > MaxSymbols ||
        inputSyms.length + numNew > MaxSymbols ||
        numEx > inputSyms.length + numNew)
      return Left(PdfError.ParseError(s"JBIG2: bad symbol counts ($numEx ex, $numNew new)"))
    val dec = new Mq.Decoder(data, o, end)
    val gctx = new Array[Byte](1 << 16)
    val iadh = new IntCtx
    val iadw = new IntCtx
    val iaex = new IntCtx
    val newSyms = Vector.newBuilder[Bm]
    var count = 0
    var hcHeight = 0L
    var hClasses = 0
    var totalArea = 0L
    while (count < numNew) {
      // a garbage stream can decode empty height classes forever: each
      // outer round must be bounded even when no symbol lands
      hClasses += 1
      if (hClasses > MaxSymbols)
        return Left(PdfError.ParseError("JBIG2: runaway height-class loop"))
      val dh = decodeInt(dec, iadh) match {
        case Some(v) => v
        case None => return Left(PdfError.ParseError("JBIG2: OOB height-class delta"))
      }
      hcHeight += dh
      if (hcHeight <= 0 || hcHeight > MaxSymbolDim)
        return Left(PdfError.ParseError(s"JBIG2: bad symbol height $hcHeight"))
      var symWidth = 0L
      var classDone = false
      while (!classDone) {
        decodeInt(dec, iadw) match {
          case None => classDone = true
          case Some(dw) =>
            symWidth += dw
            if (symWidth <= 0 || symWidth > MaxSymbolDim)
              return Left(PdfError.ParseError(s"JBIG2: bad symbol width $symWidth"))
            if (count >= numNew)
              return Left(PdfError.ParseError("JBIG2: more symbols than declared"))
            // aggregate area cap (same bound as a region): per-symbol and
            // count caps alone compose to terabytes of boolean arrays
            totalArea += symWidth * hcHeight
            if (totalArea > (64L << 20))
              return Left(PdfError.ParseError(
                s"JBIG2: symbol dictionary area exceeds ${64 << 20} pixels"))
            decodeGenericBm(dec, gctx, symWidth.toInt, hcHeight.toInt,
                template, tpgdon = false, at) match {
              case Right(bm) => newSyms += bm
              case Left(e) => return Left(e)
            }
            count += 1
        }
      }
    }
    // export flags: alternating IAEX run lengths over input ++ new symbols
    val all = inputSyms ++ newSyms.result()
    val exported = Vector.newBuilder[Bm]
    var flag = false
    var n = 0
    var exRounds = 0
    while (n < all.length) {
      // zero-length runs are legal (the encoder emits one), so the loop
      // needs its own progress cap: an exhausted MQ stream feeds 1-bits
      // forever and can decode 0-runs indefinitely
      exRounds += 1
      if (exRounds > 2 * all.length + 8)
        return Left(PdfError.ParseError("JBIG2: runaway export-run loop"))
      val run = decodeInt(dec, iaex) match {
        case Some(v) => v
        case None => return Left(PdfError.ParseError("JBIG2: OOB export run"))
      }
      if (run < 0 || n + run > all.length)
        return Left(PdfError.ParseError(s"JBIG2: bad export run $run"))
      if (flag) {
        var k = n
        while (k < n + run) { exported += all(k); k += 1 }
      }
      n += run.toInt
      flag = !flag
    }
    Right(exported.result())
  }

  // ---------- symbol dictionary, Huffman-coded (T.88 6.5, SDHUFF=1) ----------

  /** SDHUFF=1 REFAGG=0: heights/widths via the Annex B standard tables
    * (DH: B.4/B.5; DW: B.2/B.3; BMSIZE: B.1) or CUSTOM tables carried in
    * referred type-53 segments (B.2.2) — selectors saying "custom"
    * consume the referred table list in DH, DW, BMSIZE order
    * (7.4.3.1.6). Each height class's symbols are decoded from ONE
    * collective bitmap — byte-aligned uncompressed rows when BMSIZE=0,
    * an embedded T.6 (MMR) stream otherwise — then split by the decoded
    * widths (6.5.9). */
  private def decodeSymbolDictHuffman(data: Array[Byte], body: Int, end: Int,
      inputSyms: Vector[Bm], flags: Int,
      customs: Vector[Jbig2Huffman.Table]): Either[PdfError, Vector[Bm]] = {
    import Jbig2Huffman._
    var tblIdx = 0
    def nextCustom(what: String): Either[PdfError, Table] =
      if (tblIdx < customs.length) { val t = customs(tblIdx); tblIdx += 1; Right(t) }
      else Left(PdfError.ParseError(s"JBIG2: no referred custom table for $what"))
    val dhT = ((flags >> 2) & 3) match {
      case 0 => B4
      case 1 => B5
      case 3 => nextCustom("DH") match {
        case Right(t) => t
        case Left(e) => return Left(e)
      }
      case _ => return Left(PdfError.ParseError("JBIG2: reserved DH table selector"))
    }
    val dwT = ((flags >> 4) & 3) match {
      case 0 => B2
      case 1 => B3
      case 3 => nextCustom("DW") match {
        case Right(t) => t
        case Left(e) => return Left(e)
      }
      case _ => return Left(PdfError.ParseError("JBIG2: reserved DW table selector"))
    }
    // the DW table terminates each height class via OOB — a table without
    // one can never end a class (standard B.2/B.3 both carry it)
    if (!dwT.lines.exists(_.kind == Oob))
      return Left(PdfError.ParseError("JBIG2: DW table has no OOB line"))
    val bmT = if (((flags >> 6) & 1) == 0) B1
      else nextCustom("BMSIZE") match {
        case Right(t) => t
        case Left(e) => return Left(e)
      }
    // AGGINST selection only matters under REFAGG=1, which is refused
    // above — a stream setting it anyway is declaring tables this decode
    // would not honor
    if (((flags >> 7) & 1) == 1)
      return Left(PdfError.UnsupportedFeature("JBIG2 custom Huffman AGGINST table"))
    var o = body + 2 // SDHUFF=1: no AT pixels in the header
    if (o + 8 > end)
      return Left(PdfError.ParseError("JBIG2: truncated symbol dict header"))
    val numEx = be32(data, o)
    val numNew = be32(data, o + 4)
    o += 8
    if (numEx < 0 || numNew < 0 || numNew > MaxSymbols ||
        inputSyms.length + numNew > MaxSymbols ||
        numEx > inputSyms.length + numNew)
      return Left(PdfError.ParseError(s"JBIG2: bad symbol counts ($numEx ex, $numNew new)"))
    val r = new BitReader(data, o, end)
    def intOr(tb: Table, what: String): Either[PdfError, Long] =
      tb.decode(r).flatMap(_.toRight(PdfError.ParseError(s"JBIG2: OOB $what")))
    val newSyms = Vector.newBuilder[Bm]
    var count = 0L
    var hcHeight = 0L
    var hClasses = 0
    var totalArea = 0L
    while (count < numNew) {
      hClasses += 1
      if (hClasses > MaxSymbols)
        return Left(PdfError.ParseError("JBIG2: runaway height-class loop"))
      val dh = intOr(dhT, "height-class delta") match {
        case Right(v) => v
        case Left(e) => return Left(e)
      }
      hcHeight += dh
      if (hcHeight <= 0 || hcHeight > MaxSymbolDim)
        return Left(PdfError.ParseError(s"JBIG2: bad symbol height $hcHeight"))
      var symWidth = 0L
      var totWidth = 0L
      val widths = scala.collection.mutable.ArrayBuffer.empty[Int]
      var classDone = false
      while (!classDone) {
        dwT.decode(r) match {
          case Left(e) => return Left(e)
          case Right(None) => classDone = true
          case Right(Some(dw)) =>
            symWidth += dw
            if (symWidth <= 0 || symWidth > MaxSymbolDim)
              return Left(PdfError.ParseError(s"JBIG2: bad symbol width $symWidth"))
            if (count >= numNew)
              return Left(PdfError.ParseError("JBIG2: more symbols than declared"))
            totWidth += symWidth
            // the collective bitmap's area IS the sum of symbol areas —
            // the same aggregate cap as the arithmetic path
            totalArea += symWidth * hcHeight
            if (totalArea > (64L << 20))
              return Left(PdfError.ParseError(
                s"JBIG2: symbol dictionary area exceeds ${64 << 20} pixels"))
            widths += symWidth.toInt
            count += 1
        }
        if (r.overflowed)
          return Left(PdfError.ParseError("JBIG2: truncated symbol dict data"))
      }
      // height class collective bitmap (6.5.9)
      val bmSize = intOr(bmT, "collective bitmap size") match {
        case Right(v) => v
        case Left(e) => return Left(e)
      }
      r.byteAlign()
      val wTot = totWidth.toInt
      val hc = hcHeight.toInt
      val stride = (wTot + 7) / 8
      val collective: Bm =
        if (bmSize == 0) {
          // uncompressed: byte-aligned rows, MSB-first, 1 = black
          val s = r.bytePos
          r.skipBytes(stride * hc)
          if (r.overflowed)
            return Left(PdfError.ParseError("JBIG2: truncated collective bitmap"))
          val bmBits = new Array[Boolean](hc * wTot)
          var yy = 0
          while (yy < hc) {
            var xx = 0
            while (xx < wTot) {
              bmBits(yy * wTot + xx) =
                ((data(s + yy * stride + (xx >> 3)) >> (7 - (xx & 7))) & 1) == 1
              xx += 1
            }
            yy += 1
          }
          Bm(wTot, hc, bmBits)
        } else {
          if (bmSize < 0 || bmSize > end - r.bytePos)
            return Left(PdfError.ParseError(s"JBIG2: bad collective bitmap size $bmSize"))
          val s = r.bytePos
          r.skipBytes(bmSize.toInt)
          val mmr = java.util.Arrays.copyOfRange(data, s, s + bmSize.toInt)
          Ccitt.decodeG4(mmr, wTot, hc, blackIs1 = true, byteAlign = false) match {
            case Left(e) => return Left(e)
            case Right(rows) =>
              val rstride = (wTot + 7) / 8
              // a truncated MMR stream can decode to FEWER rows than the
              // height class declares (decodeG4 returns what it found) —
              // refuse rather than index past the packed buffer
              if (rows.length < rstride.toLong * hc)
                return Left(PdfError.ParseError(
                  s"JBIG2: collective bitmap decoded short (${rows.length} of ${rstride * hc} bytes)"))
              val bmBits = new Array[Boolean](hc * wTot)
              var yy = 0
              while (yy < hc) {
                var xx = 0
                while (xx < wTot) {
                  bmBits(yy * wTot + xx) =
                    ((rows(yy * rstride + (xx >> 3)) >> (7 - (xx & 7))) & 1) == 1
                  xx += 1
                }
                yy += 1
              }
              Bm(wTot, hc, bmBits)
          }
        }
      // split into symbols left-to-right by the decoded widths
      var x0 = 0
      for (sw <- widths) {
        val sb = new Array[Boolean](hc * sw)
        var yy = 0
        while (yy < hc) {
          var xx = 0
          while (xx < sw) {
            sb(yy * sw + xx) = collective.bits(yy * wTot + x0 + xx)
            xx += 1
          }
          yy += 1
        }
        newSyms += Bm(sw, hc, sb)
        x0 += sw
      }
    }
    // export flags: alternating run lengths via Table B.1 (6.5.10)
    val all = inputSyms ++ newSyms.result()
    val exported = Vector.newBuilder[Bm]
    var flag = false
    var n = 0
    var exRounds = 0
    while (n < all.length) {
      exRounds += 1
      if (exRounds > 2 * all.length + 8)
        return Left(PdfError.ParseError("JBIG2: runaway export-run loop"))
      val run = intOr(B1, "export run") match {
        case Right(v) => v
        case Left(e) => return Left(e)
      }
      if (run < 0 || n + run > all.length)
        return Left(PdfError.ParseError(s"JBIG2: bad export run $run"))
      if (flag) {
        var k = n
        while (k < n + run) { exported += all(k); k += 1 }
      }
      n += run.toInt
      flag = !flag
      if (r.overflowed)
        return Left(PdfError.ParseError("JBIG2: truncated export flags"))
    }
    Right(exported.result())
  }

  // ---------- text region (T.88 6.4, SBHUFF=0 REFAGG=0 TRANSPOSED=0) ----------

  private val MaxInstances = 1 << 20

  /** Clip one symbol blit to the page intersection (an off-page instance
    * must cost nothing), charge the clipped area against the region-wide
    * draw budget, then draw. Returns the updated cumulative count. */
  private[graft] def blitInstance(bits: Array[Boolean], w: Int, h: Int, bm: Bm,
      curS: Long, offT: Long, drawn: Long, maxDrawn: Long): Either[PdfError, Long] = {
    // Fully off-page instances return BEFORE any .toInt: the arithmetic
    // decoder's 32-bit branch can yield |offT|/|curS| up to ~2^32 and the
    // Huffman Lower/Upper lines read 32-bit offsets, so math.max(0L,
    // -offT).toInt would WRAP for such values and index bits/bm.bits
    // negatively (totality violation) or draw wrong pixels. After this
    // guard every clip bound lies in [-bm.h, h] x [-bm.w, w] — Int-safe.
    if (offT <= -bm.h.toLong || offT >= h.toLong ||
        curS <= -bm.w.toLong || curS >= w.toLong) return Right(drawn)
    val ry0 = math.max(0L, -offT).toInt
    val ry1 = math.min(bm.h.toLong, h.toLong - offT).toInt
    val rx0 = math.max(0L, -curS).toInt
    val rx1 = math.min(bm.w.toLong, w.toLong - curS).toInt
    if (ry1 <= ry0 || rx1 <= rx0) Right(drawn)
    else {
      val d = drawn + (ry1 - ry0).toLong * (rx1 - rx0)
      if (d > maxDrawn)
        return Left(PdfError.ParseError(
          s"JBIG2: text region draws more than $maxDrawn pixels"))
      var ry = ry0
      while (ry < ry1) {
        val py = offT + ry
        var rx = rx0
        while (rx < rx1) {
          if (bm.bits(ry * bm.w + rx))
            bits((py * w + curS + rx).toInt) = true
          rx += 1
        }
        ry += 1
      }
      Right(d)
    }
  }

  /** SBHUFF=1 REFAGG=0 TRANSPOSED=0: symbol-ID code lengths via the
    * runcode procedure of 7.4.3.1.7 (35 5-bit runcode lengths, canonical
    * runcode table, codes 32/33/34 = repeat/zero runs, then byte-align),
    * strip deltas via the Annex B standard tables (FS: B.6/B.7, DS:
    * B.8-B.10, DT: B.11-B.13), CURT as LOG2SBSTRIPS raw bits. Placement,
    * draw budget and refusal semantics are shared with the arithmetic
    * path. */
  private[graft] def decodeTextRegionHuffman(data: Array[Byte], body: Int, end: Int,
      w: Int, h: Int, syms: Vector[Bm], flags: Int,
      customs: Vector[Jbig2Huffman.Table]): Either[PdfError, Bm] = {
    import Jbig2Huffman._
    val logStrips = (flags >> 2) & 3
    val refCorner = (flags >> 4) & 3
    val defPixel = (flags >> 9) & 1
    val dsOffset = {
      val raw = (flags >> 10) & 0x1f
      if (raw > 15) raw - 32 else raw
    }
    // mirror the arithmetic path's refusals (the SBHUFF dispatch happens
    // BEFORE them in decodeTextRegion): a transposed or non-OR-composited
    // Huffman text region must refuse loudly, not silently decode with
    // wrong placement/compositing (file policy, line 15)
    val transposed = (flags >> 6) & 1
    val combOp = (flags >> 7) & 3
    if (transposed == 1)
      return Left(PdfError.UnsupportedFeature("JBIG2 transposed text region"))
    if (combOp != 0)
      return Left(PdfError.UnsupportedFeature(s"JBIG2 text region comb op $combOp"))
    if (end - body < 25)
      return Left(PdfError.ParseError("JBIG2: truncated Huffman text region header"))
    val hf = u16(data, body + 19)
    // custom selectors consume the region's referred type-53 tables in
    // FS, DS, DT order (7.4.3.1.6)
    var tblIdx = 0
    def nextCustom(what: String): Either[PdfError, Table] =
      if (tblIdx < customs.length) { val t = customs(tblIdx); tblIdx += 1; Right(t) }
      else Left(PdfError.ParseError(s"JBIG2: no referred custom table for $what"))
    val fsT = (hf & 3) match {
      case 0 => B6
      case 1 => B7
      case 3 => nextCustom("FS") match {
        case Right(t) => t
        case Left(e) => return Left(e)
      }
      case _ => return Left(PdfError.ParseError("JBIG2: reserved FS table selector"))
    }
    val dsT = ((hf >> 2) & 3) match {
      case 0 => B8
      case 1 => B9
      case 2 => B10
      case _ => nextCustom("DS") match {
        case Right(t) => t
        case Left(e) => return Left(e)
      }
    }
    val dtT = ((hf >> 4) & 3) match {
      case 0 => B11
      case 1 => B12
      case 2 => B13
      case _ => nextCustom("DT") match {
        case Right(t) => t
        case Left(e) => return Left(e)
      }
    }
    // DS ends each strip via OOB (standard B.8-B.10 all carry it)
    if (!dsT.lines.exists(_.kind == Oob))
      return Left(PdfError.ParseError("JBIG2: DS table has no OOB line"))
    val numInstances = be32(data, body + 21)
    if (numInstances < 0 || numInstances > MaxInstances)
      return Left(PdfError.ParseError(s"JBIG2: bad instance count $numInstances"))
    val r = new BitReader(data, body + 25, end)
    // symbol-ID code lengths (7.4.3.1.7)
    val runLens = Array.fill(35)(r.bits(5).toInt)
    val runT = fromLengths(runLens)
    if (!runT.valid)
      return Left(PdfError.ParseError("JBIG2: bad symbol runcode lengths"))
    val symLens = new Array[Int](syms.length)
    var si = 0
    var prevLen = 0
    while (si < syms.length) {
      runT.decode(r) match {
        case Left(e) => return Left(e)
        case Right(None) =>
          return Left(PdfError.ParseError("JBIG2: OOB symbol runcode"))
        case Right(Some(c)) =>
          if (c < 32) { symLens(si) = c.toInt; prevLen = c.toInt; si += 1 }
          else {
            val rep = (c match {
              case 32 => 3 + r.bits(2)
              case 33 => 3 + r.bits(3)
              case _ => 11 + r.bits(7)
            }).toInt
            if (si + rep > syms.length)
              return Left(PdfError.ParseError("JBIG2: symbol code-length run overflows"))
            val fill = if (c == 32) prevLen else 0
            var k = 0
            while (k < rep) { symLens(si) = fill; si += 1; k += 1 }
          }
      }
      if (r.overflowed)
        return Left(PdfError.ParseError("JBIG2: truncated symbol code lengths"))
    }
    val symT = fromLengths(symLens)
    if (!symT.valid)
      return Left(PdfError.ParseError("JBIG2: bad symbol code lengths"))
    r.byteAlign() // text-region decoding restarts byte-aligned
    val stripSize = 1 << logStrips
    val bits = new Array[Boolean](h * w)
    if (defPixel == 1) java.util.Arrays.fill(bits, true)
    val maxDrawn = 2L * w * h
    var drawnPixels = 0L
    def intOr(tb: Table, what: String): Either[PdfError, Long] =
      tb.decode(r).flatMap(_.toRight(PdfError.ParseError(s"JBIG2: OOB $what")))
    var stripT = 0L
    intOr(dtT, "initial strip T") match {
      case Right(v) => stripT = -v
      case Left(e) => return Left(e)
    }
    var firstS = 0L
    var i = 0L
    while (i < numInstances) {
      intOr(dtT, "strip T delta") match {
        case Right(v) => stripT += v
        case Left(e) => return Left(e)
      }
      intOr(fsT, "first symbol S") match {
        case Right(v) => firstS += v
        case Left(e) => return Left(e)
      }
      var curS = firstS
      var stripDone = false
      var firstInStrip = true
      while (!stripDone) {
        if (!firstInStrip) {
          dsT.decode(r) match {
            case Left(e) => return Left(e)
            case Right(None) => stripDone = true
            case Right(Some(ds)) => curS += ds + dsOffset
          }
        }
        if (!stripDone) {
          firstInStrip = false
          val curT = if (stripSize == 1) 0L else r.bits(logStrips)
          val t = stripSize * stripT + curT
          val id = symT.decode(r) match {
            case Right(Some(v)) => v.toInt
            case Right(None) =>
              return Left(PdfError.ParseError("JBIG2: OOB symbol id"))
            case Left(e) => return Left(e)
          }
          if (id < 0 || id >= syms.length)
            return Left(PdfError.ParseError(s"JBIG2: symbol id $id of ${syms.length}"))
          val bm = syms(id)
          val offT = t - (if ((refCorner & 1) == 1) 0 else bm.h - 1)
          blitInstance(bits, w, h, bm, curS, offT, drawnPixels, maxDrawn) match {
            case Right(d) => drawnPixels = d
            case Left(e) => return Left(e)
          }
          curS += bm.w - 1
          i += 1
          if (i > numInstances)
            return Left(PdfError.ParseError("JBIG2: more instances than declared"))
        }
        if (r.overflowed)
          return Left(PdfError.ParseError("JBIG2: truncated text region data"))
      }
    }
    Right(Bm(w, h, bits))
  }

  private def decodeTextRegion(data: Array[Byte], body: Int, end: Int,
      w: Int, h: Int, syms: Vector[Bm],
      customs: Vector[Jbig2Huffman.Table] = Vector.empty): Either[PdfError, Bm] = {
    if (syms.isEmpty)
      return Left(PdfError.ParseError("JBIG2: text region with no symbols"))
    if (syms.length > MaxSymbols)
      return Left(PdfError.ParseError(s"JBIG2: ${syms.length} symbols (cap $MaxSymbols)"))
    // a text region's header is 23 bytes (17 region info + 2 flags +
    // 4 instance count); reading past `end` would parse the NEXT
    // segment's bytes as flags and return a garbage bitmap as success
    if (end - body < 23)
      return Left(PdfError.ParseError("JBIG2: truncated text region header"))
    val flags = u16(data, body + 17)
    if (flags < 0) return Left(PdfError.ParseError("JBIG2: truncated text region"))
    if ((flags & 2) == 2)
      return Left(PdfError.UnsupportedFeature("JBIG2 refined text region"))
    if ((flags & 1) == 1)
      return decodeTextRegionHuffman(data, body, end, w, h, syms, flags, customs)
    val logStrips = (flags >> 2) & 3
    val refCorner = (flags >> 4) & 3
    val transposed = (flags >> 6) & 1
    val combOp = (flags >> 7) & 3
    val defPixel = (flags >> 9) & 1
    val dsOffset = {
      val raw = (flags >> 10) & 0x1f // signed 5-bit
      if (raw > 15) raw - 32 else raw
    }
    if (transposed == 1)
      return Left(PdfError.UnsupportedFeature("JBIG2 transposed text region"))
    if (combOp != 0)
      return Left(PdfError.UnsupportedFeature(s"JBIG2 text region comb op $combOp"))
    var o = body + 19
    val numInstances = be32(data, o)
    o += 4
    if (numInstances < 0 || numInstances > MaxInstances)
      return Left(PdfError.ParseError(s"JBIG2: bad instance count $numInstances"))
    val codeLen = symCodeLenFor(syms.length)
    val dec = new Mq.Decoder(data, o, end)
    val iadt = new IntCtx
    val iafs = new IntCtx
    val iads = new IntCtx
    val iait = new IntCtx
    val iaidCx = new Array[Byte](1 << (codeLen + 1))
    val stripSize = 1 << logStrips
    def intOr(ctx: IntCtx, what: String): Either[PdfError, Long] =
      decodeInt(dec, ctx).toRight(PdfError.ParseError(s"JBIG2: OOB $what"))
    val bits = new Array[Boolean](h * w)
    if (defPixel == 1) java.util.Arrays.fill(bits, true)
    // blit-work bound: instance count (2^20) x symbol area (16M) alone
    // allows ~10^13 pixel-draw iterations — cap the CLIPPED pixels
    // actually drawn at twice the region area (real text regions draw at
    // most ~1x the region in ink; overdraw beyond 2x is a decode bomb)
    val maxDrawn = 2L * w * h
    var drawnPixels = 0L
    var stripT = 0L
    intOr(iadt, "initial strip T") match {
      case Right(v) => stripT = -v
      case Left(e) => return Left(e)
    }
    var firstS = 0L
    var i = 0L
    while (i < numInstances) {
      intOr(iadt, "strip T delta") match {
        case Right(v) => stripT += v
        case Left(e) => return Left(e)
      }
      intOr(iafs, "first symbol S") match {
        case Right(v) => firstS += v
        case Left(e) => return Left(e)
      }
      var curS = firstS
      var stripDone = false
      var firstInStrip = true
      while (!stripDone) {
        if (!firstInStrip) {
          decodeInt(dec, iads) match {
            case None => stripDone = true
            case Some(ds) => curS += ds + dsOffset
          }
        }
        if (!stripDone) {
          firstInStrip = false
          val curT =
            if (stripSize == 1) 0L
            else intOr(iait, "instance T") match {
              case Right(v) => v
              case Left(e) => return Left(e)
            }
          val t = stripSize * stripT + curT
          val id = decodeIaid(dec, iaidCx, codeLen)
          if (id < 0 || id >= syms.length)
            return Left(PdfError.ParseError(s"JBIG2: symbol id $id of ${syms.length}"))
          val bm = syms(id)
          // non-transposed placement: S is the left edge; T is the top row
          // for TOP corners, the bottom row for BOTTOM corners (right
          // corners occupy the same [curS, curS+w-1] interval, 6.4.5)
          val offT = t - (if ((refCorner & 1) == 1) 0 else bm.h - 1)
          blitInstance(bits, w, h, bm, curS, offT, drawnPixels, maxDrawn) match {
            case Right(d) => drawnPixels = d
            case Left(e) => return Left(e)
          }
          curS += bm.w - 1
          i += 1
          if (i > numInstances)
            return Left(PdfError.ParseError("JBIG2: more instances than declared"))
        }
      }
    }
    Right(Bm(w, h, bits))
  }

  // ---------- embedded-stream walk ----------

  /** Decode an embedded JBIG2 stream to packed rows (0 = black). */
  def decodeEmbedded(data: Array[Byte]): Either[PdfError, Array[Byte]] = {
    var off = 0
    var segCount = 0
    var pageInfo = -1 // body offset of the page-info segment, if any
    var segs = List.empty[Seg]
    while (off + 11 <= data.length && segCount < 1024) { // segment-count cap: total on garbage
      segCount += 1
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
      if (o + refCount * refSize > data.length)
        return Left(PdfError.ParseError("JBIG2: truncated referred-segment list"))
      val refs = (0 until refCount).map { k =>
        val p = o + k * refSize
        refSize match {
          case 1 => (data(p) & 0xffL)
          case 2 => u16(data, p).toLong
          case _ => be32(data, p)
        }
      }.toList
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
        case 36 | 38 | 39 | 4 | 6 | 7 | 0 | 53 => // regions, symbol dicts, tables
          segs ::= Seg(segNum, segType, refs, body, end)
        case 48 => // page info
          if (dataLen >= 17) pageInfo = body
        case 16 | 20 | 22 | 23 | 40 | 42 | 43 =>
          // pattern dict / halftone / refinement: any of these
          // contributes pixels the decode below would silently drop —
          // refuse, never partially decode
          return Left(PdfError.UnsupportedFeature(
            s"JBIG2 segment type $segType (halftone/refinement)"))
        case _ => () // end-of-page/-stripe/-file, extensions: skip
      }
      off = end
    }
    val ordered = segs.reverse
    val regions = ordered.filter(s => Set(36, 38, 39, 4, 6, 7)(s.tpe))
    regions match {
      case Nil =>
        Left(PdfError.UnsupportedFeature("JBIG2: no region segment found"))
      case _ :: _ :: _ =>
        // a multi-region page needs offset compositing; a partial decode
        // reported as success would be silently wrong
        Left(PdfError.UnsupportedFeature(
          s"JBIG2: ${regions.length} region segments (compositing unsupported)"))
      case region :: Nil =>
        // region segment info (T.88 7.4.1): w, h, x, y, comb-op flags
        val body = region.body
        if (region.end - body < 18)
          return Left(PdfError.ParseError("JBIG2: truncated region segment"))
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
        if (region.tpe >= 4 && region.tpe <= 7) {
          // text region: gather symbols from its referred dictionaries
          // (decoded in stream order; a dict's input symbols are the
          // exports of ITS referred dicts). Only dictionaries REACHABLE
          // from the region's referred list are decoded — unreferenced
          // dicts would amplify a decode bomb for pixels nobody uses.
          val dictByNum = ordered.filter(_.tpe == 0).map(s => s.num -> s).toMap
          // custom Huffman tables (type 53), parsed lazily per segment:
          // a segment's referred type-53 list, in referred order, is its
          // custom-table pool (T.88 7.4.3.1.6 assigns them in selector
          // order — each "custom" selector consumes the next one)
          val tableSegByNum = ordered.filter(_.tpe == 53).map(s => s.num -> s).toMap
          val tableCache = scala.collection.mutable.Map.empty[Long, Jbig2Huffman.Table]
          def customsFor(refs: List[Long]): Either[PdfError, Vector[Jbig2Huffman.Table]] = {
            val b = Vector.newBuilder[Jbig2Huffman.Table]
            for (n <- refs; s <- tableSegByNum.get(n)) {
              tableCache.get(n) match {
                case Some(t) => b += t
                case None =>
                  Jbig2Huffman.parseCustomTable(data, s.body, s.end) match {
                    case Right(t) => tableCache(n) = t; b += t
                    case Left(e) => return Left(e)
                  }
              }
            }
            Right(b.result())
          }
          var needed = Set.empty[Long]
          var frontier = region.refs.filter(dictByNum.contains).toSet
          while (frontier.nonEmpty) {
            needed ++= frontier
            frontier = frontier.flatMap(n =>
              dictByNum(n).refs.filter(dictByNum.contains)).diff(needed)
          }
          var dictSyms = Map.empty[Long, Vector[Bm]]
          for (d <- ordered if d.tpe == 0 && needed(d.num)) {
            val inputs = d.refs.flatMap(r => dictSyms.getOrElse(r, Vector.empty)).toVector
            val customs = customsFor(d.refs) match {
              case Right(ts) => ts
              case Left(e) => return Left(e)
            }
            decodeSymbolDict(data, d.body, d.end, inputs, customs) match {
              case Right(sy) => dictSyms = dictSyms.updated(d.num, sy)
              case Left(e) => return Left(e)
            }
          }
          val syms = region.refs.flatMap(r => dictSyms.getOrElse(r, Vector.empty)).toVector
          val regionCustoms = customsFor(region.refs) match {
            case Right(ts) => ts
            case Left(e) => return Left(e)
          }
          decodeTextRegion(data, body, region.end, w.toInt, h.toInt, syms,
            regionCustoms).map(packBm)
        } else {
          val grFlags = data(body + 17) & 0xff
          if ((grFlags & 1) == 1) {
            val mmr = java.util.Arrays.copyOfRange(data, body + 18, region.end)
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
            val nAt = atCount(template)
            val atOff = body + 18
            if (atOff + nAt * 2 > region.end)
              return Left(PdfError.ParseError("JBIG2: truncated AT pixels"))
            val at = Array.tabulate(nAt)(i =>
              (data(atOff + 2 * i).toInt, data(atOff + 2 * i + 1).toInt))
            val dec = new Mq.Decoder(data, atOff + nAt * 2, region.end)
            decodeGenericBm(dec, new Array[Byte](1 << 16), w.toInt, h.toInt,
              template, tpgdon, at).map(packBm)
          }
        }
    }
  }

  // ---------- arithmetic encoders (fixture/test side) ----------

  private def encodeIntBit(enc: Mq.Encoder, ictx: IntCtx, prev: Int, b: Int): Int = {
    enc.encodeBit(ictx.cx, prev, b)
    if (prev < 256) (prev << 1) | b else ((((prev << 1) | b) & 511) | 256)
  }

  /** Encode one integer (None = OOB), mirroring decodeInt exactly. */
  private[graft] def encodeInt(enc: Mq.Encoder, ictx: IntCtx, value: Option[Long]): Unit = {
    var prev = 1
    def bit(b: Int): Unit = prev = encodeIntBit(enc, ictx, prev, b)
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    value match {
      case None => // OOB = sign 1, bucket 0, value 0
        bit(1); bit(0); bits(0, 2)
      case Some(v) =>
        val s = if (v < 0) 1 else 0
        val m = math.abs(v)
        bit(s)
        if (m <= 3) { bit(0); bits(m, 2) }
        else if (m <= 19) { bit(1); bit(0); bits(m - 4, 4) }
        else if (m <= 83) { bit(1); bit(1); bit(0); bits(m - 20, 6) }
        else if (m <= 339) { bit(1); bit(1); bit(1); bit(0); bits(m - 84, 8) }
        else if (m <= 4435) { bit(1); bit(1); bit(1); bit(1); bit(0); bits(m - 340, 12) }
        else { bit(1); bit(1); bit(1); bit(1); bit(1); bits(m - 4436, 32) }
    }
  }

  private def encodeIaid(enc: Mq.Encoder, cx: Array[Byte], codeLen: Int, id: Int): Unit = {
    var prev = 1
    var i = codeLen - 1
    while (i >= 0) {
      val b = (id >> i) & 1
      enc.encodeBit(cx, prev, b)
      prev = (prev << 1) | b
      i -= 1
    }
  }

  /** Encode a bitmap (true = black) as an arithmetic generic region with a
    * SHARED encoder + context array — mirrors decodeGenericBm exactly. */
  private def encodeGenericInto(enc: Mq.Encoder, contexts: Array[Byte],
      bitmap: Array[Array[Boolean]], w: Int, template: Int, tpgdon: Boolean): Unit = {
    val h = bitmap.length
    val coords = sortedTemplate(template, nominalAt(template))
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
  }

  private[core] def encodeGenericArith(bitmap: Array[Array[Boolean]], w: Int,
      template: Int, tpgdon: Boolean): Array[Byte] = {
    val enc = new Mq.Encoder
    encodeGenericInto(enc, new Array[Byte](1 << 16), bitmap, w, template, tpgdon)
    enc.flush()
    enc.bytes()
  }

  // ---------- fixture/test-side segment builders ----------

  private def writeBe32(out: scala.collection.mutable.ArrayBuffer[Byte], v: Long): Unit = {
    out += ((v >> 24) & 0xff).toByte; out += ((v >> 16) & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte; out += (v & 0xff).toByte
  }

  /** Segment header with up to 4 one-byte referred-segment numbers. */
  private def segmentBytes(num: Long, tpe: Int, refs: Seq[Long], body: Array[Byte]): Array[Byte] = {
    require(refs.length <= 4 && refs.forall(_ <= 256))
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    writeBe32(out, num)
    out += tpe.toByte // flags: type, 1-byte page association
    out += ((refs.length << 5) & 0xff).toByte // referred count + retain bits 0
    refs.foreach(r => out += (r & 0xff).toByte)
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
    * OR — shared by all region encoders. */
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
    segmentBytes(0, 48, Nil, pageInfoBytes(columns, h)) ++
      segmentBytes(1, 38, Nil, reg.toArray)
  }

  /** Author an embedded JBIG2 stream with an MQ arithmetic-coded generic
    * region (nominal AT pixels) — the dominant real-world raster coding. */
  def encodeEmbeddedArith(bitmap: Array[Array[Boolean]], columns: Int,
      template: Int = 0, tpgdon: Boolean = false): Array[Byte] = {
    val h = bitmap.length
    val reg = regionInfoBytes(columns, h)
    reg += (((template & 3) << 1) | (if (tpgdon) 0x08 else 0x00)).toByte // MMR=0
    for ((ax, ay) <- nominalAt(template)) { reg += ax.toByte; reg += ay.toByte }
    reg ++= encodeGenericArith(bitmap, columns, template, tpgdon)
    segmentBytes(0, 48, Nil, pageInfoBytes(columns, h)) ++
      segmentBytes(1, 38, Nil, reg.toArray)
  }

  /** Author an embedded JBIG2 stream with an arithmetic symbol dictionary
    * + one immediate text region — the dominant real-world TEXT coding.
    * All symbols must share one height (one height class keeps symbol ids
    * equal to input order); instances are (symbolId, s = left column,
    * t = top row), composed with OR at REFCORNER=TOPLEFT, SBSTRIPS=1. */
  def encodeEmbeddedSymbolText(symbols: Seq[Array[Array[Boolean]]],
      instances: Seq[(Int, Int, Int)], w: Int, h: Int,
      template: Int = 0): Array[Byte] = {
    require(symbols.nonEmpty && symbols.map(_.length).distinct.length == 1,
      "symbols must share one height")
    val symH = symbols.head.length
    // ---- symbol dictionary segment (type 0) ----
    // flags u16 big-endian: SDHUFF=0 REFAGG=0, SDTEMPLATE in bits 10-11
    val dict = new scala.collection.mutable.ArrayBuffer[Byte]
    val dflags = (template & 3) << 10
    dict += ((dflags >> 8) & 0xff).toByte
    dict += (dflags & 0xff).toByte
    for ((ax, ay) <- nominalAt(template)) { dict += ax.toByte; dict += ay.toByte }
    writeBe32(dict, symbols.length.toLong) // SDNUMEXSYMS
    writeBe32(dict, symbols.length.toLong) // SDNUMNEWSYMS
    locally {
      val enc = new Mq.Encoder
      val gctx = new Array[Byte](1 << 16)
      val iadh = new IntCtx
      val iadw = new IntCtx
      val iaex = new IntCtx
      encodeInt(enc, iadh, Some(symH.toLong)) // one height class at height symH
      var prevW = 0L
      for (sym <- symbols) {
        val sw = sym.head.length
        encodeInt(enc, iadw, Some(sw - prevW))
        prevW = sw
        encodeGenericInto(enc, gctx, sym, sw, template, tpgdon = false)
      }
      encodeInt(enc, iadw, None) // end of height class
      // export all: run of 0 unexported, then all exported
      encodeInt(enc, iaex, Some(0L))
      encodeInt(enc, iaex, Some(symbols.length.toLong))
      enc.flush()
      dict ++= enc.bytes()
    }
    // ---- immediate text region segment (type 6, referring to the dict) ----
    val reg = regionInfoBytes(w, h)
    // text flags: SBHUFF=0 REFAGG=0 LOG2SBSTRIPS=0 REFCORNER=TOPLEFT(1)
    // TRANSPOSED=0 SBCOMBOP=OR SBDEFPIXEL=0 SBDSOFFSET=0 SBRTEMPLATE=0
    val tflags = 1 << 4
    reg += ((tflags >> 8) & 0xff).toByte
    reg += (tflags & 0xff).toByte
    writeBe32(reg, instances.length.toLong) // SBNUMINSTANCES
    locally {
      val enc = new Mq.Encoder
      val iadt = new IntCtx
      val iafs = new IntCtx
      val iads = new IntCtx
      val codeLen = symCodeLenFor(symbols.length)
      val iaidCx = new Array[Byte](1 << (codeLen + 1))
      encodeInt(enc, iadt, Some(0L)) // STRIPT starts at 0
      var prevT = 0L
      var prevFirstS = 0L
      for ((t, insts) <- instances.sortBy(x => (x._3, x._2)).groupBy(_._3).toSeq.sortBy(_._1)) {
        encodeInt(enc, iadt, Some(t - prevT))
        prevT = t
        val sorted = insts.sortBy(_._2)
        encodeInt(enc, iafs, Some(sorted.head._2 - prevFirstS))
        prevFirstS = sorted.head._2
        var curS = sorted.head._2.toLong
        var first = true
        for ((id, s, _) <- sorted) {
          if (!first) encodeInt(enc, iads, Some(s - curS)) // after draw, curS = right edge
          encodeIaid(enc, iaidCx, codeLen, id)
          curS = s.toLong + symbols(id).head.length - 1
          first = false
        }
        encodeInt(enc, iads, None) // end of strip
      }
      enc.flush()
      reg ++= enc.bytes()
    }
    segmentBytes(0, 48, Nil, pageInfoBytes(w, h)) ++
      segmentBytes(1, 0, Nil, dict.toArray) ++
      segmentBytes(2, 6, Seq(1L), reg.toArray)
  }

  /** Author an embedded JBIG2 stream with a HUFFMAN-coded symbol
    * dictionary + text region (SDHUFF=1/SBHUFF=1, standard tables
    * B.4/B.2/B.1 and B.6/B.8/B.11, REFCORNER=TOPLEFT, SBSTRIPS=1). The
    * height class's collective bitmap is uncompressed when `mmr` is
    * false, an embedded T.6 stream otherwise. Same symbol/instance
    * contract as [[encodeEmbeddedSymbolText]]. */
  def encodeEmbeddedSymbolTextHuffman(symbols: Seq[Array[Array[Boolean]]],
      instances: Seq[(Int, Int, Int)], w: Int, h: Int,
      mmr: Boolean = false, customTables: Boolean = false): Array[Byte] = {
    import Jbig2Huffman._
    require(symbols.nonEmpty && symbols.map(_.length).distinct.length == 1,
      "symbols must share one height")
    val symH = symbols.head.length
    // custom-table variant: DW rides a custom table segment tiling
    // [-32, 33) (deltas between successive symbol widths, either sign)
    // with HTOOB, DT a custom table tiling [0, 16); the dict and region
    // select them via selector 3 and refer to the table segments —
    // the same bytes parseCustomTable reads back (dogfooded below)
    val dwCustomBytes = customTableBytes(low = -32, high = 33, rl = 3, prefLen = 4, oob = true)
    val dtCustomBytes = customTableBytes(low = 0, high = 16, rl = 2, prefLen = 3, oob = false)
    val dwCustom = parseCustomTable(dwCustomBytes, 0, dwCustomBytes.length)
      .getOrElse(sys.error("authored DW table failed to parse"))
    val dtCustom = parseCustomTable(dtCustomBytes, 0, dtCustomBytes.length)
      .getOrElse(sys.error("authored DT table failed to parse"))
    val dwT = if (customTables) dwCustom else B2
    val dtT = if (customTables) dtCustom else B11
    // ---- symbol dictionary (type 0): SDHUFF=1 ----
    val dict = new scala.collection.mutable.ArrayBuffer[Byte]
    val dflags = if (customTables) 1 | (3 << 4) else 1 // DW custom vs B.2
    dict += ((dflags >> 8) & 0xff).toByte
    dict += (dflags & 0xff).toByte
    writeBe32(dict, symbols.length.toLong)
    writeBe32(dict, symbols.length.toLong)
    locally {
      val bw = new BitWriter
      B4.encode(bw, Some(symH.toLong)) // one height class
      var prevW = 0L
      for (sym <- symbols) {
        dwT.encode(bw, Some(sym.head.length - prevW))
        prevW = sym.head.length
      }
      dwT.encode(bw, None) // end of height class
      // collective bitmap: the symbols side by side
      val offs = symbols.scanLeft(0)(_ + _.head.length)
      val totW = offs.last
      val coll = Array.tabulate(symH, totW) { (y, x) =>
        val k = offs.indexWhere(_ > x) - 1
        symbols(k)(y)(x - offs(k))
      }
      if (mmr) {
        val enc = Ccitt.encodeG4(coll, totW)
        B1.encode(bw, Some(enc.length.toLong))
        bw.bytes(enc)
      } else {
        B1.encode(bw, Some(0L))
        val stride = (totW + 7) / 8
        val rows = new Array[Byte](stride * symH)
        for (y <- 0 until symH; x <- 0 until totW if coll(y)(x))
          rows(y * stride + (x >> 3)) =
            (rows(y * stride + (x >> 3)) | (0x80 >> (x & 7))).toByte
        bw.bytes(rows)
      }
      // export all: 0 unexported, then all exported (Table B.1 runs)
      B1.encode(bw, Some(0L))
      B1.encode(bw, Some(symbols.length.toLong))
      dict ++= bw.result()
    }
    // ---- immediate text region (type 6): SBHUFF=1 ----
    val reg = regionInfoBytes(w, h)
    val tflags = 1 | (1 << 4) // SBHUFF, REFCORNER=TOPLEFT
    reg += ((tflags >> 8) & 0xff).toByte
    reg += (tflags & 0xff).toByte
    // huffman flags: FS=B.6 DS=B.8, DT=B.11 or custom (bits 4-5 = 3)
    val hf = if (customTables) 3 << 4 else 0
    reg += ((hf >> 8) & 0xff).toByte
    reg += (hf & 0xff).toByte
    writeBe32(reg, instances.length.toLong)
    locally {
      val tw = new BitWriter
      // symbol-ID code lengths: ONE runcode (value = codeLen) of length 1,
      // emitted once per symbol — every symbol gets the same code length
      val codeLen = symCodeLenFor(symbols.length)
      for (i <- 0 until 35) tw.bits(if (i == codeLen) 1L else 0L, 5)
      val runT = fromLengths(Array.tabulate(35)(i => if (i == codeLen) 1 else 0))
      for (_ <- symbols.indices) runT.encode(tw, Some(codeLen.toLong))
      tw.byteAlign()
      val symT = fromLengths(Array.fill(symbols.length)(codeLen))
      dtT.encode(tw, Some(1L)) // initial STRIPT = -1 (B.11's minimum is 1)
      var prevT = -1L
      var prevFirstS = 0L
      for ((t, insts) <- instances.groupBy(_._3).toSeq.sortBy(_._1)) {
        dtT.encode(tw, Some(t - prevT)) // strictly ascending strips: DT >= 1
        prevT = t
        val sorted = insts.sortBy(_._2)
        B6.encode(tw, Some(sorted.head._2 - prevFirstS))
        prevFirstS = sorted.head._2
        var curS = sorted.head._2.toLong
        var first = true
        for ((id, s, _) <- sorted) {
          if (!first) B8.encode(tw, Some(s - curS))
          symT.encode(tw, Some(id.toLong))
          curS = s.toLong + symbols(id).head.length - 1
          first = false
        }
        B8.encode(tw, None) // end of strip
      }
      reg ++= tw.result()
    }
    if (customTables)
      // 1 = DW table, 2 = dict (refers 1), 3 = DT table, 4 = region
      // (refers dict 2 then table 3 — referred order IS assignment order)
      segmentBytes(0, 48, Nil, pageInfoBytes(w, h)) ++
        segmentBytes(1, 53, Nil, dwCustomBytes) ++
        segmentBytes(2, 0, Seq(1L), dict.toArray) ++
        segmentBytes(3, 53, Nil, dtCustomBytes) ++
        segmentBytes(4, 6, Seq(2L, 3L), reg.toArray)
    else
      segmentBytes(0, 48, Nil, pageInfoBytes(w, h)) ++
        segmentBytes(1, 0, Nil, dict.toArray) ++
        segmentBytes(2, 6, Seq(1L), reg.toArray)
  }
}
