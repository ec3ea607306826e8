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

  def decodeStreamBytes(d: TreeMap[String, PObj], s: Array[Byte]): Either[PdfError, Array[Byte]] =
    for {
      filters <- streamFilterNames(d)
      filtered <- applyFilters(filters, s)
      out <- applyPredictor(d, filtered)
    } yield out

  private def applyFilters(filters: List[String], s: Array[Byte]): Either[PdfError, Array[Byte]] =
    filters match {
      case Nil => Right(s)
      case f :: fs => decodeOne(f, s).flatMap(applyFilters(fs, _))
    }

  def decodeOne(name: String, s: Array[Byte]): Either[PdfError, Array[Byte]] = name match {
    case "/FlateDecode" => Right(inflate(s))
    case "/DCTDecode" => Right(s)
    case "/ASCII85Decode" => Right(ascii85(s))
    case other => Left(PdfError.UnsupportedFeature(
      s"unsupported stream filter $other (supported: /FlateDecode /DCTDecode /ASCII85Decode)"))
  }

  /** zlib inflate, tolerant of trailing garbage. Scratch buffer sized to
    * the input (text deflates ~6x) instead of a fixed 64KB — the kernel
    * inflates many small streams per document. */
  def inflate(s: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(s)
    val out = new ArrayBuffer[Byte]
    val buf = new Array[Byte](math.max(1024, math.min(s.length * 6, 1 << 20)))
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out ++= buf.take(n)
        else if (!inf.finished()) return out.toArray
      }
      out.toArray
    } catch {
      case _: Exception => out.toArray
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
        out ++= bytes.take(math.max(0, grpLen - 1))
        i += grpLen
      }
    }
    out.toArray
  }

  /** /DecodeParms /Predictor >= 12 -> PNG per-row filters (None/Sub/Up only). */
  def applyPredictor(d: TreeMap[String, PObj], bs: Array[Byte]): Either[PdfError, Array[Byte]] =
    d.get("/DecodeParms") match {
      case Some(PDict(parms)) =>
        parms.get("/Predictor") match {
          case Some(PNum(p)) if Util.hsTruncate(p) >= 12 =>
            parms.get("/Columns") match {
              case Some(PNum(c)) => decodePngPredictors(bs, Util.hsTruncate(c))
              case _ => Right(bs)
            }
          case _ => Right(bs)
        }
      case _ => Right(bs)
    }

  def decodePngPredictors(bs: Array[Byte], columns: Int): Either[PdfError, Array[Byte]] = {
    if (columns <= 0) return Right(Array.emptyByteArray)
    val out = new ArrayBuffer[Byte]
    var prev = new Array[Byte](columns)
    var pos = 0
    while (pos < bs.length) {
      val filt = bs(pos) & 0xff
      val rowLen = math.min(columns, bs.length - pos - 1)
      val row = new Array[Byte](rowLen)
      System.arraycopy(bs, pos + 1, row, 0, rowLen)
      filt match {
        case 0 => ()
        case 1 =>
          var k = 0
          var p = 0
          while (k < rowLen) { p = ((row(k) & 0xff) + p) & 0xff; row(k) = p.toByte; k += 1 }
        case 2 =>
          var k = 0
          while (k < rowLen) { row(k) = (((row(k) & 0xff) + (prev(k) & 0xff)) & 0xff).toByte; k += 1 }
        case other =>
          return Left(PdfError.UnsupportedFeature(s"unsupported PNG predictor $other"))
      }
      out ++= row
      prev = if (rowLen == columns) row else row ++ new Array[Byte](columns - rowLen)
      pos += 1 + columns
    }
    Right(out.toArray)
  }
}
