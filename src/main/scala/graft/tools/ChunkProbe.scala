package graft.tools

import org.apache.spark.sql.functions._
import graft.spark.{CorpusGen, Pipeline}

/** Dev probe: wall-clock of giant-PDF extraction, row-parallel vs
  * page-range-chunked, on a corpus where one giant dominates the tail. */
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession(16)
    try {
      val giantPages = sys.env.getOrElse("PROBE_GIANT_PAGES", "4000").toInt
      // 200 light docs + 1 giant: the giant IS the job tail
      val corpus = CorpusGen.heavyTailCorpus(spark, rows = 201, partitions = 16,
        giantEvery = 201, giantPages = giantPages).cache()
      corpus.count()
      val input = CorpusGen.inputView(corpus)
      def time(label: String)(body: => Long): Unit = {
        for (rep <- 1 to 3) {
          val t0 = System.nanoTime()
          val n = body
          println(f"$label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
        }
      }
      time("row-parallel geom") {
        Pipeline.extractMode(spark, input, "geom").toDF()
          .agg(sum(when(col("ok"), 1L).otherwise(0L))).collect()(0).getLong(0)
      }
      time("chunked geom (32 chunks/doc cap)") {
        Pipeline.extractGeomChunked(spark, input, maxChunksPerDoc = 32,
          giantThresholdPages = 256).toDF()
          .agg(sum(when(col("ok"), 1L).otherwise(0L))).collect()(0).getLong(0)
      }
    } finally spark.stop()
  }
}
