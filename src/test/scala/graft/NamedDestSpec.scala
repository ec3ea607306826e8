package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.core._

/** Outline destinations through the /Names/Dests name tree (with /Limits
  * pruning) and /A GoTo actions (reference Outlines.hs:131-214). */
class NamedDestSpec extends AnyFunSuite {

  test("toc resolves named destinations and GoTo actions") {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out ++= ("%PDF-1.5\n").getBytes(ISO_8859_1)
    val offs = scala.collection.mutable.Map[Int, Int]()
    def obj(n: Int, body: String): Unit = {
      offs(n) = out.length
      out ++= s"$n 0 obj\n$body\nendobj\n".getBytes(ISO_8859_1)
    }
    val line = "Named dest document"
    val content = s"BT /F1 12 Tf 72 720 Td ($line) Tj ET\n"
    obj(1, "<< /Type /Catalog /Pages 2 0 R /Outlines 6 0 R /Names << /Dests 9 0 R >> >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    obj(6, "<< /Type /Outlines /First 7 0 R /Last 8 0 R >>")
    // entry 1 via /A GoTo action with a NAMED destination
    obj(7, "<< /Title (Via Named) /A << /S /GoTo /D (chapter.one) >> /Next 8 0 R >>")
    // entry 2 via a direct /Dest array
    obj(8, "<< /Title (Via Array) /Dest [3 0 R /Fit] >>")
    // name tree root with kids + limits
    obj(9, "<< /Kids [10 0 R 11 0 R] >>")
    obj(10, "<< /Limits [(aaa) (bzz)] /Names [(aaa.intro) 12 0 R] >>")
    obj(11, "<< /Limits [(chapter.a) (chapter.z)] /Names [(chapter.one) 12 0 R] >>")
    obj(12, "<< /D [3 0 R /Fit] >>")
    val xrefAt = out.length
    out ++= s"xref\n0 13\n".getBytes(ISO_8859_1)
    out ++= "0000000000 65535 f \n".getBytes(ISO_8859_1)
    for (n <- 1 to 12) out ++= f"${offs(n)}%010d 00000 n \n".getBytes(ISO_8859_1)
    out ++= s"trailer\n<< /Size 13 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n".getBytes(ISO_8859_1)

    val doc = DocStructure.openDocument(out.toArray, None).toOption.get
    val toc = Metadata.toc(doc)
    assert(toc.map(e => (e.depth, e.title, e.destPage)) == List(
      (0, "Via Named", 3), (0, "Via Array", 3)))
    assert(Extract.extractPdf(out.toArray, None) == Right(line + "\n"))
  }
}
