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
    * ground-truth tables Verify.scala materializes (the __AUX__ /
    * __AUXDIFF__ placeholders are rewritten to their paths at dump time) —
    * DuckDB cannot parse PDFs, but it can byte-compare extracted text to
    * what the corpus generator constructed, recompute binary features /
    * frame samples from the construction-fact payload bytes, replay the
    * paragraph diff from both corpora's constructed page texts, and check
    * the REAL ImageIO decode (x17) against authored format/dimensions +
    * lossless-PNG pixel md5 and the REAL javax.sound WAV decode (x18)
    * against authored RIFF fields + exact PCM md5 (the resize surface x19
    * oracles its integer geometry and unit-tests exact pixels; the REAL
    * MJPEG/AVI demux x20 against authored per-frame JPEG md5s + container
    * header facts). Every query in the registry carries an oracle. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
