package graft.tools

import org.apache.spark.sql.functions._
import graft.spark.{CorpusGen, Pipeline}

object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("DOCS", "200000").toLong
    for (cpus <- Seq(8, 32)) {
      val spark = graft.Bench.buildSession(cpus)
      val tmp = java.nio.file.Files.createTempDirectory(s"probe_$cpus").toString
      CorpusGen.corpus(spark, docs, cpus * 4).write.mode("overwrite").parquet(s"$tmp/c")
      val stored = spark.read.parquet(s"$tmp/c")
      var best = Double.MaxValue
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        Pipeline.extract(spark, stored).toDF().agg(sum(when(col("ok"),1).otherwise(0))).collect()
        val secs = (System.nanoTime()-t0)/1e9
        println(f"PROBE cpus=$cpus kernel rep$rep $secs%.2f s -> ${docs/secs}%.0f docs/s")
        best = math.min(best, secs)
      }
      println(f"PROBE cpus=$cpus BEST ${docs/best}%.0f docs/s")
      spark.stop()
    }
  }
}
