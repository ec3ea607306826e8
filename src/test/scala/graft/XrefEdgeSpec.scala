package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.core._

/** Hybrid-reference files: classic xref table whose trailer carries
  * /XRefStm pointing at an xref stream that locates additional objects
  * (DocumentStructure.hs:451-457), plus incremental /Prev chains where the
  * newest table wins. */
class XrefEdgeSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes(ISO_8859_1)

  test("hybrid /XRefStm supplies objects missing from the classic table") {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out ++= b("%PDF-1.5\n")
    val offs = new scala.collection.mutable.ArrayBuffer[Int]
    def obj(n: Int, body: String): Unit = {
      offs += out.length
      out ++= b(s"$n 0 obj\n$body\nendobj\n")
    }
    val line = "Hybrid xref stream works"
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>")
    val content = s"BT /F1 12 Tf 72 720 Td ($line) Tj ET\n"
    obj(4, s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    obj(5, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    // xref stream object 6 covers objects 4 and 5 ONLY
    val entries = new scala.collection.mutable.ArrayBuffer[Byte]
    def entry(t: Int, f2: Int): Unit = {
      entries += t.toByte
      entries += ((f2 >> 8) & 0xff).toByte
      entries += (f2 & 0xff).toByte
      entries += 0.toByte
      entries += 0.toByte
    }
    entry(1, offs(3)) // obj 4
    entry(1, offs(4)) // obj 5
    val raw = new String(entries.toArray, ISO_8859_1)
    val xrefStmAt = out.length
    out ++= b(s"6 0 obj\n<< /Type /XRef /Size 7 /Index [4 2] /W [1 2 2] /Root 1 0 R /Length ${raw.length} >>\nstream\n$raw\nendstream\nendobj\n")
    // classic table covers only objects 1-3; trailer points at the XRefStm
    val xrefAt = out.length
    out ++= b("xref\n0 4\n")
    out ++= b("0000000000 65535 f \n")
    for (k <- 0 until 3) out ++= b(f"${offs(k)}%010d 00000 n \n")
    out ++= b(s"trailer\n<< /Size 7 /Root 1 0 R /XRefStm $xrefStmAt >>\nstartxref\n$xrefAt\n%%EOF\n")

    val text = Extract.extractPdf(out.toArray, None)
    assert(text == Right(line + "\n"))
  }

  test("incremental update: newest xref wins over /Prev") {
    // base document
    val base = graft.spark.FixtureGen.classic(1).bytes
    val baseStr = new String(base, ISO_8859_1)
    val origStartxref = baseStr.lastIndexOf("startxref")
    // append a replacement content object 4 + new xref with /Prev
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out ++= base
    val newContent = "BT /F1 12 Tf 72 720 Td (Updated body text) Tj ET\n"
    val obj4At = out.length
    out ++= b(s"4 0 obj\n<< /Length ${newContent.length} >>\nstream\n$newContent\nendstream\nendobj\n")
    val xrefAt = out.length
    val prevXref = baseStr.substring(origStartxref + 10).trim.takeWhile(_.isDigit)
    out ++= b(s"xref\n4 1\n")
    out ++= b(f"$obj4At%010d 00000 n \n")
    out ++= b(s"trailer\n<< /Size 6 /Root 1 0 R /Prev $prevXref >>\nstartxref\n$xrefAt\n%%EOF\n")
    assert(Extract.extractPdf(out.toArray, None) == Right("Updated body text\n"))
  }
}
