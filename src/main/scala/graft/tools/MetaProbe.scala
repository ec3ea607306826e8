package graft.tools

import graft.core._
import graft.spark.FixtureGen

/** Dev probe: trailer JSON per fixture kind (x4 oracle derivation). */
object MetaProbe {
  def main(args: Array[String]): Unit = {
    for (mk <- FixtureGen.kinds) {
      val d = mk(7)
      if (d.kind != "html" && d.kind != "textrow") {
        DocStructure.openDocument(d.bytes, None) match {
          case Right(doc) => println(s"${d.kind}: ${Metadata.trailerJson(doc)}")
          case Left(e) => println(s"${d.kind}: OPEN FAIL $e")
        }
      }
    }
  }
}
