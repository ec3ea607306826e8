package graft.tools

import org.apache.spark.sql.functions._
import graft.spark.{CorpusGen, Pipeline}

/** Dev tool: million-row corpus end-to-end smoke at local[32]. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("DOCS", "1000000").toLong
    val spark = graft.Bench.buildSession(32)
    val tmp = java.nio.file.Files.createTempDirectory("smoke").toString
    var t0 = System.nanoTime()
    CorpusGen.corpus(spark, docs, 128).write.mode("overwrite").parquet(s"$tmp/c")
    println(f"SMOKE gen+write ${(System.nanoTime()-t0)/1e9}%.1f s")
    val stored = spark.read.parquet(s"$tmp/c")
    // MODE=tagged (default) | geom | legacy — each mode has its own rare-
    // input code paths (layout heuristics, backtracking parser), so the
    // smoke can exercise all three against their per-mode ground truth
    val mode = sys.env.getOrElse("MODE", "tagged")
    val expectedCol = mode match {
      case "geom" => "expected_geom"
      case "legacy" => "expected_legacy"
      case _ => "expected"
    }
    t0 = System.nanoTime()
    val agg = Pipeline.extractMode(spark, stored, mode).toDF()
      .join(stored.select(col("url"), col(expectedCol).as("expected")), Seq("url"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("text") === col("expected"), 1L).otherwise(0L)).as("m"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("errs"))
      .collect()(0)
    val secs = (System.nanoTime()-t0)/1e9
    println(f"SMOKE [$mode] extract+match $docs docs in $secs%.1f s -> ${docs/secs}%.0f docs/s; matched ${agg.getLong(1)}/${agg.getLong(0)}; errors ${agg.getLong(2)}")
    spark.stop()
  }
}
