package graft.tools

import org.apache.spark.sql.SparkSession
import graft.spark.CorpusGen

/** Dev probe: materialize an input-shape corpus parquet for driving
  * ExtractJob by hand (resume / spark-submit checks). */
object CorpusWrite {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_job_input")
    val rows = sys.env.getOrElse("DOCS", "2000").toLong
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CorpusGen.inputView(CorpusGen.corpus(spark, rows, partitions = 8))
      .write.mode("overwrite").parquet(out)
    println(s"CORPUSWRITE rows=$rows out=$out")
    spark.stop()
  }
}
