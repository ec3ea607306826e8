package graft.tools

import graft.core.{DocStructure, Interp, Layout, Page}
import graft.spark.FixtureGen

/** Dev probe: print pageRegions for each fixture kind vs the generator's
  * region ground truth. */
object RegionProbe {
  def main(args: Array[String]): Unit = {
    for (i <- 0L until FixtureGen.kinds.length.toLong) {
      val d = FixtureGen.docFor(i)
      if (d.kind != "html" && d.kind != "textrow") {
        val doc = DocStructure.openDocument(d.bytes, None).toOption.get
        val refs = DocStructure.pageRefs(doc).getOrElse(Nil)
        val got = refs.zipWithIndex.flatMap { case (ref, idx) =>
          val items = Interp.interpretPageItems(doc, ref).getOrElse(Nil)
          Page.pageRegions(idx + 1, Layout.defaultOptions, items)
        }
        val gotStr = got.map(r =>
          s"${r.page}|${r.paragraph}|${r.bbox.x0}|${r.bbox.y0}|${r.bbox.x1}|${r.bbox.y1}")
        val expStr = d.regions
        val ok = gotStr == expStr
        println(s"${d.kind}: ${if (ok) "OK" else "MISMATCH"}")
        if (!ok) {
          println(s"  got: ${gotStr.mkString(" ; ")}")
          println(s"  exp: ${expStr.mkString(" ; ")}")
          println(s"  texts: ${got.map(_.text).mkString(" // ")}")
        }
      }
    }
  }
}
