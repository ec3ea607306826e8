package graft.tools

import graft.core._
import graft.spark.FixtureGen

/** Dev probe: per-page layout text vs the doc-level expectation, used to
  * derive the generator's per-page ground truth for the x5 oracle. */
object PageProbe {
  def main(args: Array[String]): Unit = {
    for (mk <- FixtureGen.kinds) {
      val d = mk(7)
      if (d.kind != "html" && d.kind != "textrow") {
        DocStructure.openDocument(d.bytes, None) match {
          case Right(doc) =>
            val refs = DocStructure.pageRefs(doc).getOrElse(Nil)
            val pages = refs.map { ref =>
              Interp.interpretPageItems(doc, ref) match {
                case Right(items) => Layout.layoutPageText(Layout.defaultOptions, items)
                case Left(e) => s"<ERR $e>"
              }
            }
            val same = pages.length == 1 && pages.head == d.expected
            println(s"== ${d.kind} pages=${pages.length} firstSameAsExpected=$same")
            if (!same) pages.foreach(p => println("  PAGE>" + p.replace("\n", "\\n")))
          case Left(e) => println(s"== ${d.kind} OPEN FAIL $e")
        }
      }
    }
  }
}
