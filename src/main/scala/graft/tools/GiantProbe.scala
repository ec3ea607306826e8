package graft.tools

import graft.core._
import graft.spark.FixtureGen

/** Dev probe: kernel wall-time of a single giant book at various page
  * counts (sizes the skew-bench giant so one giant ~ a task-stalling unit). */
object GiantProbe {
  def main(args: Array[String]): Unit = {
    for (pages <- Seq(400, 1600, 4000, 8000)) {
      val d = FixtureGen.bookN(7, pages)
      // warm
      Extract.taggedText(DocStructure.openDocument(d.bytes, None).toOption.get)
      val t0 = System.nanoTime()
      val doc = DocStructure.openDocument(d.bytes, None).toOption.get
      val r = Extract.taggedText(doc)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"pages=$pages%5d bytes=${d.bytes.length}%9d secs=$secs%.3f ok=${r.isRight}")
    }
  }
}
