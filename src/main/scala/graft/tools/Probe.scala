package graft.tools

import java.nio.file.{Files, Paths}
import graft.core._

/** Dev tool: adversarial probes against the extraction kernel — the kernel
  * must return Left(error) and never throw on malformed input. */
object Probe {
  def main(args: Array[String]): Unit = {
    def tryOne(name: String, bytes: Array[Byte]): Unit = {
      val r =
        try Extract.extractPdf(bytes) match {
          case Right(t) => s"Right(${t.replace("\n", "\\n").take(80)})"
          case Left(e) => s"Left(${e.render})"
        }
        catch { case ex: Throwable => s"THROWN: ${ex.getClass.getName}: ${ex.getMessage}" }
      println(s"PROBE $name -> $r")
    }
    tryOne("empty", Array.emptyByteArray)
    tryOne("garbage", "this is not a pdf at all, just words".getBytes)
    tryOne("html", "<html><body><p>hello</p></body></html>".getBytes)
    val classic = Files.readAllBytes(Paths.get("/root/reference/data/fixtures/classic.pdf"))
    tryOne("truncated-half", classic.take(classic.length / 2))
    tryOne("truncated-90pct", classic.take(classic.length * 9 / 10))
    tryOne("no-eof", classic.dropRight(6))
    tryOne("corrupt-startxref", {
      val s = new String(classic, "ISO-8859-1").replace("416", "999")
      s.getBytes("ISO-8859-1")
    })
    tryOne("wrong-password-encrypted", Files.readAllBytes(
      Paths.get("/root/reference/data/fixtures/encrypted-rc4.pdf")))
    // binary noise
    val rnd = new scala.util.Random(42)
    tryOne("random-bytes", Array.fill(10000)(rnd.nextInt(256).toByte))
    // %PDF header then noise
    tryOne("pdf-header-noise", "%PDF-1.5\n".getBytes ++ Array.fill(5000)(rnd.nextInt(256).toByte))
  }
}
