package graft.tools

import org.apache.spark.sql.functions._
import graft.spark.{CorpusGen, Pipeline}

object FindBad {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession(32)
    val corpus = CorpusGen.corpus(spark, 1000000L, 128).cache()
    val bad = Pipeline.extract(spark, CorpusGen.inputView(corpus)).toDF()
      .join(corpus.select("url", "expected"), Seq("url"))
      .filter(!col("ok") || col("text") =!= col("expected"))
      .select("url", "mode", "error")
      .collect()
    bad.foreach(r => println(s"BAD ${r.getString(0)} mode=${r.getString(1)} err=${r.getString(2)}"))
    spark.stop()
  }
}
