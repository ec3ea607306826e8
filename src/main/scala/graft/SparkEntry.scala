package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.spark.{CorpusGen, Pipeline, Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full extraction over the synthetic corpus (PDF + HTML + text rows on
    * one codepath). */
  def entry(spark: SparkSession): DataFrame = {
    val corpus = CorpusGen.corpus(spark, rows = 90, partitions = 4)
    Pipeline.extract(spark, CorpusGen.inputView(corpus)).toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for extraction ops (no SQL oracle
    * can parse PDFs) -> driver records a rows-only check; those are
    * byte-verified against constructed ground truth in the test suite. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
