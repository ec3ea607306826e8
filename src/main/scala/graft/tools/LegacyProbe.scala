package graft.tools

import graft.core._
import graft.spark.FixtureGen

/** Dev probe: legacy-mode output per fixture kind, shown against the
  * default expectation — used to hand-verify per-kind legacy ground truth
  * before encoding it in the generator. */
object LegacyProbe {
  def main(args: Array[String]): Unit = {
    for (mk <- FixtureGen.kinds) {
      val d = mk(7)
      if (d.kind != "html" && d.kind != "textrow") {
        DocStructure.openDocument(d.bytes, None) match {
          case Right(doc) =>
            val (txt, _) = Legacy.legacyText(doc)
            val same = txt == d.expected
            println(s"== ${d.kind} (same-as-default=$same)")
            if (!same) println(txt.replace("\n", "\\n\n"))
          case Left(e) => println(s"== ${d.kind} OPEN FAIL $e")
        }
      }
    }
  }
}
