package graft.core

/** ITU-T T.88 Annex B Huffman tables and the bit-level reader/writer the
  * JBIG2 Huffman-coded symbol dictionary (6.5, SDHUFF=1) and text region
  * (6.4, SBHUFF=1) paths ride. The table data is Annex B of the public
  * standard — unavoidable constant data, same adjudication as the MQ
  * coder's Table E.1. Each line is (preflen, rangelen, rangelow, kind);
  * prefix codes are assigned by the canonical procedure of B.3
  * (increasing prefix length, table order within a length). Every
  * standard table tiles a contiguous integer range with no gaps — an
  * invariant Jbig2Spec asserts over all 15 tables as a transcription
  * check, together with prefix-code validity.
  */
object Jbig2Huffman {

  sealed trait Kind
  case object Normal extends Kind
  /** Values rangelow, rangelow-1, ... (32-bit offset read downward). */
  case object Lower extends Kind
  /** Values rangelow, rangelow+1, ... (32-bit offset read upward). */
  case object Upper extends Kind
  case object Oob extends Kind

  final case class Line(prefLen: Int, rangeLen: Int, rangeLow: Long, kind: Kind)

  /** MSB-first bit reader over data[start, end). Reads past the end
    * return 0 bits and set `overflowed` — callers check the flag after
    * each decode phase and refuse the stream (totality without exceptions
    * in the hot loop). */
  final class BitReader(data: Array[Byte], start: Int, val end: Int) {
    private var pos = start
    private var bitPos = 0
    var overflowed = false
    def bit(): Int = {
      if (pos >= end) { overflowed = true; return 0 }
      val b = (data(pos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      b
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def byteAlign(): Unit = if (bitPos != 0) { bitPos = 0; pos += 1 }
    /** Byte offset into the underlying array; meaningful when aligned. */
    def bytePos: Int = pos
    def skipBytes(n: Int): Unit = {
      pos += n
      if (pos > end) overflowed = true
    }
  }

  /** MSB-first bit writer (fixture/test side). */
  final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]
    private var cur = 0
    private var nBits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    def byteAlign(): Unit = while (nBits != 0) bit(0)
    def bytes(bs: Array[Byte]): Unit = { byteAlign(); buf ++= bs }
    def result(): Array[Byte] = { byteAlign(); buf.toArray }
  }

  /** A Huffman table with canonically assigned codes. Lines with
    * preflen 0 carry no code (unused symbol-ID slots). */
  final class Table private[Jbig2Huffman] (val lines: Vector[Line]) {
    /** (line, code) with codes assigned per B.3. */
    val coded: Vector[(Line, Int)] = {
      val lenCount = new Array[Int](33)
      lines.foreach(l => if (l.prefLen > 0) lenCount(l.prefLen) += 1)
      val firstCode = new Array[Int](33)
      var fc = 0
      var len = 1
      while (len <= 32) {
        fc = (fc + lenCount(len - 1)) << 1
        firstCode(len) = fc
        len += 1
      }
      val next = firstCode.clone()
      lines.flatMap { l =>
        if (l.prefLen == 0) None
        else {
          val c = next(l.prefLen)
          next(l.prefLen) += 1
          Some((l, c))
        }
      }
    }
    /** Prefix-code validity: within each length, codes must fit the
      * length (no overflow past 2^len). */
    def valid: Boolean = coded.forall { case (l, c) => c < (1 << l.prefLen) }
    private val byLenCode: Map[(Int, Int), Line] =
      coded.map { case (l, c) => (l.prefLen, c) -> l }.toMap

    /** Decode one value; Right(None) = OOB. */
    def decode(r: BitReader): Either[PdfError, Option[Long]] = {
      var len = 0
      var code = 0
      while (len < 32) {
        code = (code << 1) | r.bit()
        len += 1
        byLenCode.get((len, code)) match {
          case Some(l) =>
            return l.kind match {
              case Oob => Right(None)
              case Normal | Upper => Right(Some(l.rangeLow + r.bits(l.rangeLen)))
              case Lower => Right(Some(l.rangeLow - r.bits(l.rangeLen)))
            }
          case None => ()
        }
      }
      Left(PdfError.ParseError("JBIG2: invalid Huffman code"))
    }

    /** Encode one value (None = OOB) — fixture/test side, mirrors decode. */
    def encode(w: BitWriter, value: Option[Long]): Unit = value match {
      case None =>
        val (l, c) = coded.find(_._1.kind == Oob)
          .getOrElse(sys.error("table has no OOB"))
        w.bits(c.toLong, l.prefLen)
      case Some(v) =>
        val normal = coded.filter(_._1.kind == Normal)
        val hit = normal.find { case (l, _) =>
          v >= l.rangeLow && v < l.rangeLow + (1L << l.rangeLen)
        }.orElse(coded.find { case (l, _) => l.kind == Lower && v <= l.rangeLow })
          .orElse(coded.find { case (l, _) => l.kind == Upper && v >= l.rangeLow })
          .getOrElse(sys.error(s"value $v not representable"))
        val (l, c) = hit
        w.bits(c.toLong, l.prefLen)
        l.kind match {
          case Lower => w.bits(l.rangeLow - v, l.rangeLen)
          case _ => w.bits(v - l.rangeLow, l.rangeLen)
        }
    }
  }

  /** Runcode / symbol-ID table from per-index code lengths (7.4.3.1.7):
    * canonical codes over index order; decoded value = the index. */
  def fromLengths(lens: Array[Int]): Table =
    new Table(lens.zipWithIndex.toVector.map { case (len, i) =>
      Line(len, 0, i.toLong, Normal)
    })

  /** Parse a custom-table segment body (T.88 B.2.2, segment type 53):
    * flags (HTOOB, HTPS, HTRS), signed HTLOW/HTHIGH, then bit-packed
    * (preflen, rangelen) pairs tiling [HTLOW, HTHIGH), a lower-range
    * prefix, an upper-range prefix, and an OOB prefix when HTOOB. Total
    * and bounded: the line loop is capped, range lengths above 32 and
    * invalid prefix assignments are refused. */
  def parseCustomTable(data: Array[Byte], body: Int, end: Int): Either[PdfError, Table] = {
    if (end - body < 9)
      return Left(PdfError.ParseError("JBIG2: truncated custom table segment"))
    val flags = data(body) & 0xff
    if ((flags & 0x80) != 0)
      return Left(PdfError.ParseError("JBIG2: reserved custom-table flag bit set"))
    val htoob = (flags & 1) == 1
    val htps = ((flags >> 1) & 7) + 1
    val htrs = ((flags >> 4) & 7) + 1
    def sbe32(o: Int): Long =
      (((data(o) & 0xff) << 24) | ((data(o + 1) & 0xff) << 16) |
        ((data(o + 2) & 0xff) << 8) | (data(o + 3) & 0xff)).toLong
    val low = sbe32(body + 1)
    val high = sbe32(body + 5)
    if (low >= high)
      return Left(PdfError.ParseError(s"JBIG2: custom table range [$low,$high) empty"))
    val r = new BitReader(data, body + 9, end)
    val lines = Vector.newBuilder[Line]
    var cur = low
    var nLines = 0
    while (cur < high) {
      nLines += 1
      if (nLines > 4096)
        return Left(PdfError.ParseError("JBIG2: runaway custom table line count"))
      val pl = r.bits(htps).toInt
      val rl = r.bits(htrs).toInt
      if (rl > 32)
        return Left(PdfError.ParseError(s"JBIG2: custom table range length $rl"))
      lines += Line(pl, rl, cur, Normal)
      cur += 1L << rl
    }
    lines += Line(r.bits(htps).toInt, 32, low - 1, Lower)
    lines += Line(r.bits(htps).toInt, 32, high, Upper)
    if (htoob) lines += Line(r.bits(htps).toInt, 0, 0, Oob)
    if (r.overflowed)
      return Left(PdfError.ParseError("JBIG2: truncated custom table"))
    val t = new Table(lines.result())
    if (!t.valid)
      return Left(PdfError.ParseError("JBIG2: invalid custom table prefix codes"))
    Right(t)
  }

  /** Fixture-side author for [[parseCustomTable]]: tiles [low, high) with
    * lines of range length `rl`, every prefix `prefLen` bits (the caller
    * keeps the line count under 2^prefLen so canonical assignment stays
    * valid). HTPS=4, HTRS=6. */
  def customTableBytes(low: Int, high: Int, rl: Int, prefLen: Int, oob: Boolean): Array[Byte] = {
    require(prefLen >= 1 && prefLen <= 15 && rl >= 0 && rl <= 32)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out += ((if (oob) 1 else 0) | ((4 - 1) << 1) | ((6 - 1) << 4)).toByte
    for (v <- Seq(low, high); s <- Seq(24, 16, 8, 0)) out += ((v >> s) & 0xff).toByte
    val w = new BitWriter
    var cur = low.toLong
    while (cur < high) {
      w.bits(prefLen.toLong, 4)
      w.bits(rl.toLong, 6)
      cur += 1L << rl
    }
    w.bits(prefLen.toLong, 4) // lower range
    w.bits(prefLen.toLong, 4) // upper range
    if (oob) w.bits(prefLen.toLong, 4)
    out ++= w.result()
    out.toArray
  }

  private def n(p: Int, r: Int, lo: Long) = Line(p, r, lo, Normal)
  private def lo(p: Int, low: Long) = Line(p, 32, low, Lower)
  private def up(p: Int, low: Long) = Line(p, 32, low, Upper)
  private def oob(p: Int) = Line(p, 0, 0, Oob)

  // Standard tables B.1-B.15 (T.88 Annex B).
  val B1 = new Table(Vector(n(1, 4, 0), n(2, 8, 16), n(3, 16, 272), up(3, 65808)))
  val B2 = new Table(Vector(n(1, 0, 0), n(2, 0, 1), n(3, 0, 2), n(4, 3, 3),
    n(5, 6, 11), up(6, 75), oob(6)))
  val B3 = new Table(Vector(n(8, 8, -256), n(1, 0, 0), n(2, 0, 1), n(3, 0, 2),
    n(4, 3, 3), n(5, 6, 11), lo(8, -257), up(7, 75), oob(6)))
  val B4 = new Table(Vector(n(1, 0, 1), n(2, 0, 2), n(3, 0, 3), n(4, 3, 4),
    n(5, 6, 12), up(5, 76)))
  val B5 = new Table(Vector(n(7, 8, -255), n(1, 0, 1), n(2, 0, 2), n(3, 0, 3),
    n(4, 3, 4), n(5, 6, 12), lo(7, -256), up(6, 76)))
  val B6 = new Table(Vector(n(5, 10, -2048), n(4, 9, -1024), n(4, 8, -512),
    n(4, 7, -256), n(5, 6, -128), n(5, 5, -64), n(4, 5, -32), n(2, 7, 0),
    n(3, 7, 128), n(3, 8, 256), n(4, 9, 512), n(4, 10, 1024),
    lo(6, -2049), up(6, 2048)))
  val B7 = new Table(Vector(n(4, 9, -1024), n(3, 8, -512), n(4, 7, -256),
    n(5, 6, -128), n(5, 5, -64), n(4, 5, -32), n(4, 9, 0), n(5, 7, 512),
    n(5, 8, 640), n(6, 10, 896), lo(7, -1025), up(7, 1920)))
  val B8 = new Table(Vector(n(8, 3, -15), n(9, 1, -7), n(8, 1, -5), n(9, 0, -3),
    n(7, 0, -2), n(4, 0, -1), n(2, 1, 0), n(5, 0, 2), n(6, 0, 3), n(3, 4, 4),
    n(6, 1, 20), n(4, 4, 22), n(4, 5, 38), n(5, 6, 70), n(5, 7, 134),
    n(6, 7, 262), n(7, 8, 390), n(6, 10, 646), lo(9, -16), up(9, 1670), oob(2)))
  val B9 = new Table(Vector(n(8, 4, -31), n(9, 2, -15), n(8, 2, -11), n(9, 1, -7),
    n(7, 1, -5), n(4, 1, -3), n(3, 1, -1), n(3, 1, 1), n(5, 1, 3), n(6, 1, 5),
    n(3, 5, 7), n(6, 2, 39), n(4, 5, 43), n(4, 6, 75), n(5, 7, 139),
    n(5, 8, 267), n(6, 8, 523), n(7, 9, 779), n(6, 11, 1291),
    lo(9, -32), up(9, 3339), oob(2)))
  val B10 = new Table(Vector(n(7, 4, -21), n(8, 0, -5), n(7, 0, -4), n(5, 0, -3),
    n(2, 2, -2), n(5, 0, 2), n(6, 0, 3), n(7, 0, 4), n(8, 0, 5), n(2, 6, 6),
    n(5, 5, 70), n(6, 5, 102), n(7, 6, 134), n(8, 7, 198), n(9, 8, 326),
    n(9, 9, 582), n(9, 10, 1094), lo(10, -22), up(9, 2118), oob(2)))
  val B11 = new Table(Vector(n(1, 0, 1), n(2, 1, 2), n(4, 0, 4), n(4, 1, 5),
    n(5, 1, 7), n(5, 2, 9), n(6, 2, 13), n(7, 2, 17), n(7, 3, 21), n(7, 4, 29),
    n(7, 5, 45), n(7, 6, 77), up(7, 141)))
  val B12 = new Table(Vector(n(1, 0, 1), n(2, 0, 2), n(3, 1, 3), n(5, 0, 5),
    n(5, 1, 6), n(6, 1, 8), n(7, 0, 10), n(7, 1, 11), n(7, 2, 13), n(7, 3, 17),
    n(7, 4, 25), n(8, 5, 41), up(8, 73)))
  val B13 = new Table(Vector(n(1, 0, 1), n(3, 0, 2), n(4, 0, 3), n(5, 0, 4),
    n(4, 1, 5), n(3, 3, 7), n(6, 1, 15), n(6, 2, 17), n(6, 3, 21), n(6, 4, 29),
    n(6, 5, 45), n(7, 6, 77), up(7, 141)))
  val B14 = new Table(Vector(n(3, 0, -2), n(3, 0, -1), n(1, 0, 0), n(3, 0, 1),
    n(3, 0, 2)))
  val B15 = new Table(Vector(n(7, 4, -24), n(6, 2, -8), n(5, 1, -4), n(4, 0, -2),
    n(3, 0, -1), n(1, 0, 0), n(3, 0, 1), n(4, 0, 2), n(5, 1, 3), n(6, 2, 5),
    n(7, 4, 9), lo(7, -25), up(7, 25)))

  val standardTables: Vector[Table] =
    Vector(B1, B2, B3, B4, B5, B6, B7, B8, B9, B10, B11, B12, B13, B14, B15)
}
