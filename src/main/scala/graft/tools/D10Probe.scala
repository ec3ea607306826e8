package graft.tools

/** Dev probe: time d10 alone and surface its convergence behavior. */
object D10Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.buildSession(32)
    val t0 = System.nanoTime()
    try {
      val df = graft.SparkEntry.queries("d10_dedup_components")(spark, dir)
      df.coalesce(1).write.mode("overwrite").parquet("/tmp/d10_out")
      println(f"D10 rows=${spark.read.parquet("/tmp/d10_out").count()} in ${(System.nanoTime()-t0)/1e9}%.1f s")
    } catch { case e: Throwable =>
      println(f"D10 FAILED after ${(System.nanoTime()-t0)/1e9}%.1f s: ${e.getMessage}")
    }
    spark.stop()
  }
}
