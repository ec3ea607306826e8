package graft.tools

import graft.core._

object AllocProbe {
  def main(args: Array[String]): Unit = {
    val tb = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val d = graft.spark.FixtureGen.book(1)
    def measure(tag: String)(body: => Unit): Unit = {
      body // warm
      val a0 = tb.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      var k = 0
      while (k < 20) { body; k += 1 }
      val ms = (System.nanoTime() - t0) / 20 / 1e6
      val alloc = (tb.getThreadAllocatedBytes(tid) - a0) / 20
      println(f"PHASE $tag: ${alloc / 1024} KB, $ms%.2f ms")
    }
    measure("open") { DocStructure.openDocument(d.bytes, None) }
    val doc = DocStructure.openDocument(d.bytes, None).toOption.get
    val refs = DocStructure.pageRefs(doc).toOption.get
    measure("pageRefs+open") {
      val dd = DocStructure.openDocument(d.bytes, None).toOption.get
      DocStructure.pageRefs(dd)
    }
    // fresh doc each time so caches don't hide stream decode; but to isolate interp:
    val items = refs.map(r => Interp.interpretPageItems(doc, r).toOption.get)
    measure("interpret(cached doc)") {
      refs.foreach(r => Interp.interpretPageItems(doc, r))
    }
    measure("pageLinesRaw") { items.foreach(Layout.pageLinesRaw) }
    val layouts = items.map(Layout.pageLinesRaw)
    measure("docParagraphs") {
      Layout.documentParagraphsFromPageLines(Layout.defaultOptions, layouts)
    }
    measure("structTree") { Structure.structTree(doc) }
    measure("full") { Extract.extractPdf(d.bytes, None) }
  }
}
