package graft.tools

import java.nio.file.{Files, Paths}
import graft.core._

/** Dev tool: run the extraction kernel over the reference golden fixtures
  * and report byte-exact matches per mode. Not part of the Spark pipeline. */
object GoldenCheck {
  def main(args: Array[String]): Unit = {
    val fixDir = Paths.get(sys.env.getOrElse("GRAFT_FIXTURES", "/root/reference/data/fixtures"))
    val pdfs = Files.list(fixDir).filter(_.toString.endsWith(".pdf")).sorted().toArray.map(_.toString)
    val only = args.headOption
    var pass = 0
    var fail = 0
    for (pdf <- pdfs.map(_.toString)) {
      val name = Paths.get(pdf).getFileName.toString.stripSuffix(".pdf")
      if (only.forall(_ == name)) {
        val bytes = Files.readAllBytes(Paths.get(pdf))
        for ((mode, dir) <- List(("tagged", "expected"), ("geom", "expected-geom"),
                                 ("legacy", "expected-legacy"))) {
          val expPath = fixDir.resolve(dir).resolve(name + ".txt")
          if (Files.exists(expPath)) {
            val expected = new String(Files.readAllBytes(expPath), "UTF-8")
            val pw = if (name.contains("encrypted")) None else None
            val actual = (mode match {
              case "tagged" => Extract.extractPdf(bytes, pw)
              case "legacy" =>
                DocStructure.openDocument(bytes, pw).map(d => Legacy.legacyText(d)._1)
              case _ => Extract.extractPdfGeom(bytes, pw)
            }) match {
              case Right(t) => t + "\n"
              case Left(e) => s"<ERROR: ${e.render}>"
            }
            if (actual == expected) { pass += 1; println(s"PASS $name [$mode]") }
            else {
              fail += 1
              println(s"FAIL $name [$mode]")
              println(s"  expected: ${show(expected)}")
              println(s"  actual  : ${show(actual)}")
            }
          }
        }
      }
    }
    println(s"pass=$pass fail=$fail")
    if (fail > 0) sys.exit(1)
  }

  private def show(s: String): String =
    s.replace("\n", "\\n").take(300)
}
