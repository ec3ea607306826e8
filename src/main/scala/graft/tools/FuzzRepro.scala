package graft.tools

import graft.core._

object FuzzRepro {
  def main(args: Array[String]): Unit = {
    val bases = (0L until 13L).map(graft.spark.FixtureGen.docFor).map(_.bytes) ++
      Seq(graft.spark.FixtureGen.book(1).bytes) ++ {
        val dir = java.nio.file.Paths.get("/root/reference/data/fixtures")
        val st = java.nio.file.Files.list(dir)
        try st.toArray.map(_.toString).filter(_.endsWith(".pdf")).sorted
          .map(f => java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))).toSeq
        finally st.close()
      }
    println("bases=" + bases.length + " base28 len=" + bases(28).length)
    val t = sys.env.getOrElse("T", "15").toInt
    val rnd = new scala.util.Random(1000 + t)
    val kmax = sys.env.getOrElse("K", "10").toInt
    for (k <- 0 to kmax) {
      val base = bases((t * 7 + k) % bases.length)
      val m = FuzzSoak.mutate(base, rnd)
      if (k == kmax) {
        java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/fuzz_soe.bin"), m)
        println(s"repro input: ${m.length} bytes written")
        for ((mode, f) <- List(
          "tagged" -> (() => Extract.extractPdf(m, None).toString),
          "geom" -> (() => Extract.extractPdfGeom(m, None).toString),
          "legacy" -> (() => DocStructure.openDocument(m, None).map(d => Legacy.legacyText(d)._1).toString))) {
          try {
            val r = f()
            println(s"$mode OK ${r.take(60)}")
          } catch {
            case e: Throwable =>
              println(s"$mode THREW ${e.getClass.getName}")
              e.getStackTrace.take(12).foreach(fr => println("  at " + fr))
          }
        }
      }
    }
  }
}
