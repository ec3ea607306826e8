package graft.tools

import graft.spark.CorpusGen

/** Dev tool: materialize an input-shaped corpus parquet for ExtractJob runs. */
object WriteCorpus {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/ej_in"
    val rows = sys.env.getOrElse("DOCS", "3000").toLong
    val spark = graft.Bench.buildSession(8)
    CorpusGen.inputView(CorpusGen.corpus(spark, rows, 8))
      .write.mode("overwrite").parquet(out)
    println(s"WROTE $rows rows to $out")
    spark.stop()
  }
}
