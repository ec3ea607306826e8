package graft.tools

import org.apache.spark.sql.functions._
import graft.spark.{CorpusGen, Pipeline}

/** Dev probe: list the corpus rows (if any) whose extraction does not
  * byte-match the constructed ground truth at smoke scale. */
object SmokeBad {
  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("DOCS", "1000000").toLong
    val spark = graft.Bench.buildSession(32)
    val corpus = CorpusGen.corpus(spark, docs, 128).cache()
    val bad = Pipeline.extract(spark, CorpusGen.inputView(corpus)).toDF()
      .join(corpus.select(col("url"), col("kind"), col("expected")), Seq("url"))
      .filter(!col("ok") || !(col("text") <=> col("expected"))) // null-safe: ok=true with null text must surface
      .select("url", "kind", "ok", "error", "chars")
      .collect()
    println(s"BAD rows: ${bad.length}")
    bad.take(20).foreach(r => println(s"  $r"))
    spark.stop()
  }
}
