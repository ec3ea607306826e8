package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.core._

/** Recursion guards: self-referential forms stop at depth 12, ObjStm
  * containers referencing themselves resolve to null instead of looping. */
class DepthSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes(ISO_8859_1)

  test("self-recursive form XObject stops at the depth cap") {
    val inner = "BT /F1 10 Tf 10 10 Td (X) Tj ET\nq /Fm0 Do Q\n" // draws itself
    val content = "q /Fm0 Do Q\n"
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out ++= b("%PDF-1.5\n")
    val offs = scala.collection.mutable.Map[Int, Int]()
    def obj(n: Int, body: String): Unit = {
      offs(n) = out.length
      out ++= b(s"$n 0 obj\n$body\nendobj\n")
    }
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> /XObject << /Fm0 6 0 R >> >> /Contents 4 0 R >>")
    obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    obj(6, "<< /Type /XObject /Subtype /Form /BBox [0 0 100 100] " +
      s"/Resources << /Font << /F1 5 0 R >> /XObject << /Fm0 6 0 R >> >> /Length ${inner.length} >>\nstream\n$inner\nendstream")
    val xrefAt = out.length
    out ++= b("xref\n0 7\n0000000000 65535 f \n")
    for (n <- 1 to 6) out ++= b(f"${offs(n)}%010d 00000 n \n")
    out ++= b(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")

    val text = Extract.extractPdf(out.toArray, None).toOption.get
    // 12 recursion levels -> 12 "X" glyphs on one line
    assert(text == "X" * 12 + "\n")
    // legacy path has its own depth cap and must terminate too
    val doc = DocStructure.openDocument(out.toArray, None).toOption.get
    Legacy.legacyText(doc)
    succeed
  }

  test("cyclic page tree terminates with the visited-set guard") {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out ++= b("%PDF-1.5\n")
    val offs = scala.collection.mutable.Map[Int, Int]()
    def obj(n: Int, body: String): Unit = {
      offs(n) = out.length
      out ++= b(s"$n 0 obj\n$body\nendobj\n")
    }
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    // 2 -> 3 -> 2 cycle
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Pages /Kids [2 0 R] /Count 1 >>")
    val xrefAt = out.length
    out ++= b("xref\n0 4\n0000000000 65535 f \n")
    for (n <- 1 to 3) out ++= b(f"${offs(n)}%010d 00000 n \n")
    out ++= b(s"trailer\n<< /Size 4 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    val r = Extract.extractPdf(out.toArray, None)
    assert(r.isLeft || r.isRight) // terminates
  }

  test("/Prev trailer cycle terminates") {
    val base = graft.spark.FixtureGen.classic(1).bytes
    val s0 = new String(base, ISO_8859_1)
    val xrefAt = s0.substring(s0.lastIndexOf("startxref") + 10).trim.takeWhile(_.isDigit)
    // append a second trailer whose /Prev points at itself
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out ++= base
    val newXrefAt = out.length
    out ++= b(s"xref\n0 1\n0000000000 65535 f \n")
    out ++= b(s"trailer\n<< /Size 6 /Root 1 0 R /Prev $newXrefAt >>\nstartxref\n$newXrefAt\n%%EOF\n")
    val r = Extract.extractPdf(out.toArray, None)
    assert(r.isLeft || r.isRight)
  }

  test("structure-tree /K ref cycle terminates") {
    val para = "BT /F1 12 Tf 72 720 Td (Cycle doc) Tj ET\n"
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out ++= b("%PDF-1.5\n")
    val offs = scala.collection.mutable.Map[Int, Int]()
    def obj(n: Int, body: String): Unit = {
      offs(n) = out.length
      out ++= b(s"$n 0 obj\n$body\nendobj\n")
    }
    obj(1, "<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 6 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    obj(4, s"<< /Length ${para.length} >>\nstream\n$para\nendstream")
    obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    obj(6, "<< /Type /StructTreeRoot /K 7 0 R >>")
    obj(7, "<< /S /Document /K [8 0 R] >>")
    obj(8, "<< /S /P /K 7 0 R >>") // cycle back to 7
    val xrefAt = out.length
    out ++= b("xref\n0 9\n0000000000 65535 f \n")
    for (n <- 1 to 8) out ++= b(f"${offs(n)}%010d 00000 n \n")
    out ++= b(s"trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    val r = Extract.extractPdf(out.toArray, None)
    assert(r == Right("Cycle doc\n"))
  }

  test("ObjStm container referencing itself yields null, not a loop") {
    // xref stream says object 1 lives inside ObjStm 1 (itself)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out ++= b("%PDF-1.5\n")
    val xrefAt = out.length
    val entries = new scala.collection.mutable.ArrayBuffer[Byte]
    def entry(t: Int, f2: Int, f3: Int): Unit = {
      entries ++= Array(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
        ((f3 >> 8) & 0xff).toByte, (f3 & 0xff).toByte)
    }
    entry(0, 0, 0xffff)
    entry(2, 1, 0) // object 1 inside container 1 = itself
    val raw = new String(entries.toArray, ISO_8859_1)
    out ++= b(s"2 0 obj\n<< /Type /XRef /Size 3 /Index [0 2] /W [1 2 2] /Root 1 0 R /Length ${raw.length} >>\nstream\n$raw\nendstream\nendobj\n")
    out ++= b(s"startxref\n$xrefAt\n%%EOF\n")
    // must terminate with an error, not stack overflow / hang
    val r = Extract.extractPdf(out.toArray, None)
    assert(r.isLeft || r.isRight)
  }
}
