package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Jp2, PdfError}

/** JPEG 2000 header-facts parser (x30 surface): both container forms,
  * refusal semantics, and totality on malformed input. */
class Jp2Spec extends AnyFunSuite {

  private def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def siz(w: Int, h: Int, depths: Seq[Int]): Array[Byte] =
    Array[Byte](0xff.toByte, 0x4f.toByte, 0xff.toByte, 0x51.toByte) ++
      be16(38 + 3 * depths.length) ++ be16(0) ++
      be32(w) ++ be32(h) ++ be32(0) ++ be32(0) ++
      be32(w) ++ be32(h) ++ be32(0) ++ be32(0) ++
      be16(depths.length) ++
      depths.flatMap(d => Seq((d - 1).toByte, 1.toByte, 1.toByte))

  private def jp2(w: Int, h: Int, nc: Int, bpcField: Int): Array[Byte] = {
    val sig = be32(12) ++ "jP  ".getBytes("ISO-8859-1") ++
      Array[Byte](0x0d, 0x0a, 0x87.toByte, 0x0a)
    val ftyp = be32(20) ++ "ftypjp2 ".getBytes("ISO-8859-1") ++
      be32(0) ++ "jp2 ".getBytes("ISO-8859-1")
    val ihdr = be32(22) ++ "ihdr".getBytes("ISO-8859-1") ++
      be32(h) ++ be32(w) ++ be16(nc) ++
      Array(bpcField.toByte, 7.toByte, 0.toByte, 0.toByte)
    val jp2h = be32(8 + ihdr.length) ++ "jp2h".getBytes("ISO-8859-1") ++ ihdr
    sig ++ ftyp ++ jp2h
  }

  test("raw codestream SIZ: dims, components, depth") {
    assert(Jp2.headerFacts(siz(640, 480, Seq(8, 8, 8))) ==
      Right(Jp2.Header("j2k", 640, 480, 3, 8)))
    assert(Jp2.headerFacts(siz(17, 3, Seq(12))) ==
      Right(Jp2.Header("j2k", 17, 3, 1, 12)))
  }

  test("JP2 box container: ihdr fields; boxes before jp2h are skipped") {
    assert(Jp2.headerFacts(jp2(31, 22, 3, 7)) ==
      Right(Jp2.Header("jp2", 31, 22, 3, 8)))
    assert(Jp2.headerFacts(jp2(100, 200, 1, 11)) ==
      Right(Jp2.Header("jp2", 100, 200, 1, 12)))
  }

  test("refusals: bpcc depth, mixed codestream depths, XLBox, absurd dims") {
    assert(Jp2.headerFacts(jp2(10, 10, 3, 0xff)) match {
      case Left(PdfError.UnsupportedFeature(m)) => m.contains("bpcc")
      case _ => false
    })
    assert(Jp2.headerFacts(siz(10, 10, Seq(8, 12, 8))) match {
      case Left(PdfError.UnsupportedFeature(m)) => m.contains("differ")
      case _ => false
    })
    val xl = jp2(10, 10, 1, 7)
    // rewrite the ftyp box LBox to 1 (XLBox form)
    System.arraycopy(be32(1), 0, xl, 12, 4)
    assert(Jp2.headerFacts(xl).isLeft)
    assert(Jp2.headerFacts(siz(1 << 25, 4, Seq(8))).isLeft)
  }

  test("total on malformed input: truncations and garbage never throw") {
    val goods = Seq(jp2(31, 22, 3, 7), siz(640, 480, Seq(8)))
    for (g <- goods; n <- 0 until g.length)
      Jp2.headerFacts(g.take(n)) // must not throw
    assert(Jp2.headerFacts(Array[Byte](1, 2, 3)).isLeft)
    assert(Jp2.headerFacts(Array.emptyByteArray).isLeft)
    // box length that does not advance (len 4 < 8) is refused, not looped
    val stuck = jp2(10, 10, 1, 7)
    System.arraycopy(be32(4), 0, stuck, 12, 4)
    assert(Jp2.headerFacts(stuck).isLeft)
  }

  test("fixture round-trip: jpxFacts are what the kernel parses back") {
    for (i <- 0L until 12L) {
      val (fmt, w, h, nc, bpc) = graft.spark.FixtureGen.jpxFacts(i)
      val doc = graft.spark.FixtureGen.jpxImage(i)
      val kernel = graft.core.DocStructure.openDocument(doc.bytes, None).toOption.get
      val pageRefs = graft.core.DocStructure.pageRefs(kernel).toOption.get
      val hits = graft.core.Interp.interpretPageImageHits(kernel, pageRefs.head).toOption.get
      val bytes = kernel.undecodedStreamByRef(hits.head._1).toOption.get
      assert(Jp2.headerFacts(bytes) == Right(Jp2.Header(fmt, w, h, nc, bpc)), s"i=$i")
      // and the filter chain must refuse the decode
      assert(kernel.rawStreamByRef(hits.head._1) match {
        case Left(PdfError.UnsupportedFeature(_)) => true
        case _ => false
      }, s"i=$i decode not refused")
    }
  }
}
