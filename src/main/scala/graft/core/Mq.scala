package graft.core

/** MQ arithmetic coder (ITU-T T.88 Annex E / T.800 Annex C — the same
  * coder is shared by JBIG2 and JPEG 2000). The state table is Table E.1
  * of the public standard: 47 rows of (Qe, NMPS, NLPS, SWITCH).
  *
  * The decoder follows the software conventions of the spec (16-bit
  * C-high/C-low split, BYTEIN with 0xFF stuffing, feed 1-bits past the
  * end of data so truncated streams decode deterministically instead of
  * reading out of bounds). The encoder is the spec's INITENC / CODEMPS /
  * CODELPS / BYTEOUT / SETBITS+FLUSH procedure and exists for
  * fixture-authoring and roundtrip tests only — production decode never
  * calls it.
  */
object Mq {

  // Table E.1: Qe, NMPS, NLPS, SWITCH
  private[graft] val QeTable: Array[Int] = Array(
    0x5601, 0x3401, 0x1801, 0x0ac1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1c01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1c01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0ac1, 0x09c1,
    0x08a1, 0x0521, 0x0441, 0x02a1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private[graft] val Nmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private[graft] val Nlps: Array[Int] = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private[graft] val Switch: Array[Int] = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** Per-context adaptive state: table index + current MPS sense, packed
    * as (index << 1) | mps in a caller-owned Array[Byte]. */
  @inline private def cxIndex(st: Byte): Int = (st & 0xff) >> 1
  @inline private def cxMps(st: Byte): Int = st & 1
  @inline private def cxPack(index: Int, mps: Int): Byte = ((index << 1) | mps).toByte

  /** Streaming MQ decoder over `data[start, end)`. */
  final class Decoder(data: Array[Byte], start: Int, end: Int) {
    private var bp = start
    private var chigh = if (start < end) data(start) & 0xff else 0xff
    private var clow = 0
    private var ct = 0
    private var a = 0
    // INITDEC (software conventions)
    byteIn()
    chigh = ((chigh << 7) & 0xffff) | ((clow >> 9) & 0x7f)
    clow = (clow << 7) & 0xffff
    ct -= 7
    a = 0x8000

    private def byteIn(): Unit = {
      if (bp < end && (data(bp) & 0xff) == 0xff) {
        if (bp + 1 >= end || (data(bp + 1) & 0xff) > 0x8f) {
          clow += 0xff00
          ct = 8
        } else {
          bp += 1
          clow += (data(bp) & 0xff) << 9
          ct = 7
        }
      } else {
        bp += 1
        clow += (if (bp < end) (data(bp) & 0xff) << 8 else 0xff00)
        ct = 8
      }
      if (clow > 0xffff) {
        chigh += clow >> 16
        clow &= 0xffff
      }
    }

    /** DECODE one bit under context slot `cx` of `contexts`. */
    def decodeBit(contexts: Array[Byte], cx: Int): Int = {
      val st = contexts(cx)
      var icx = cxIndex(st)
      var mps = cxMps(st)
      val qe = QeTable(icx)
      a -= qe
      var d = 0
      if (chigh < qe) {
        // LPS exchange path
        if (a < qe) { a = qe; d = mps; icx = Nmps(icx) }
        else {
          a = qe
          d = 1 ^ mps
          if (Switch(icx) == 1) mps = d
          icx = Nlps(icx)
        }
      } else {
        chigh -= qe
        if ((a & 0x8000) != 0) return mps // no renorm, state unchanged
        if (a < qe) {
          d = 1 ^ mps
          if (Switch(icx) == 1) mps = d
          icx = Nlps(icx)
        } else { d = mps; icx = Nmps(icx) }
      }
      // RENORMD
      while ({
        if (ct == 0) byteIn()
        a <<= 1
        chigh = ((chigh << 1) & 0xffff) | ((clow >> 15) & 1)
        clow = (clow << 1) & 0xffff
        ct -= 1
        (a & 0x8000) == 0
      }) ()
      contexts(cx) = cxPack(icx, mps)
      d
    }
  }

  /** MQ encoder (fixture/test side). Collects output bytes internally;
    * call flush() once, then bytes(). */
  final class Encoder {
    // BP starts one byte BEFORE the output (spec BPST-1 convention): keep
    // a dummy 0 byte that carries can propagate into; dropped at flush.
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]
    buf += 0
    private var c = 0L
    private var a = 0x8000
    private var ct = 12

    private def byteOut(): Unit = {
      if ((buf(buf.length - 1) & 0xff) == 0xff) {
        buf += ((c >> 20) & 0xff).toByte
        c &= 0xfffff
        ct = 7
      } else if (c < 0x8000000L) {
        buf += ((c >> 19) & 0xff).toByte
        c &= 0x7ffff
        ct = 8
      } else {
        buf(buf.length - 1) = ((buf(buf.length - 1) & 0xff) + 1).toByte
        if ((buf(buf.length - 1) & 0xff) == 0xff) {
          c &= 0x7ffffff
          buf += ((c >> 20) & 0xff).toByte
          c &= 0xfffff
          ct = 7
        } else {
          buf += ((c >> 19) & 0xff).toByte
          c &= 0x7ffff
          ct = 8
        }
      }
    }

    private def renorm(): Unit = {
      while ({
        a <<= 1
        c <<= 1
        ct -= 1
        if (ct == 0) byteOut()
        (a & 0x8000) == 0
      }) ()
    }

    /** ENCODE one bit `d` under context slot `cx`. */
    def encodeBit(contexts: Array[Byte], cx: Int, d: Int): Unit = {
      val st = contexts(cx)
      var icx = cxIndex(st)
      var mps = cxMps(st)
      val qe = QeTable(icx)
      if (d == mps) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          icx = Nmps(icx)
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(icx) == 1) mps = 1 - mps
        icx = Nlps(icx)
        renorm()
      }
      contexts(cx) = cxPack(icx, mps)
    }

    /** SETBITS + FLUSH (T.800 C.2.9). */
    def flush(): Unit = {
      val tempc = c + a
      c |= 0xffff
      if (c >= tempc) c -= 0x8000
      c <<= ct
      byteOut()
      c <<= ct
      byteOut()
      // trailing 0xFF would be an open marker byte; spec discards it
      if ((buf(buf.length - 1) & 0xff) == 0xff) buf.remove(buf.length - 1)
    }

    /** Finished code stream. A carry on the very first BYTEOUT can
      * propagate INTO the leading dummy byte (c >= 0x8000000 with ct=12);
      * silently dropping it then would corrupt the stream, so a nonzero
      * dummy byte is kept as a real leading byte. */
    def bytes(): Array[Byte] =
      if (buf(0) != 0) buf.toArray else buf.drop(1).toArray
  }
}
