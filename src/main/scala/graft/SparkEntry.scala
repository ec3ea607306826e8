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

  /** For each key in queries, equivalent SQL runnable by DuckDB: the
    * relational/dedup/similarity suites run on the sf parquet tables, and
    * the extraction/streaming suites compare against the generator
    * ground-truth table Verify.scala materializes (the __AUX__ placeholder
    * is rewritten to its path at dump time) — DuckDB cannot parse PDFs,
    * but it can byte-compare extracted text to what the corpus generator
    * constructed. 37 of 41 queries carry oracles; the 4 omissions
    * (metadata JSON rendering, diff, binary features, frame sampling)
    * compute kernel-side values whose generator-side duplication would be
    * circular, and stay rows-only. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
