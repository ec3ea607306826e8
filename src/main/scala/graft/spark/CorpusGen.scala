package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Deterministic synthetic extraction corpus in the BASELINE.json
  * input_hint shape: (url, warc_ts, html, text, lang). Row i carries
  * FixtureGen variant (i mod |kinds|); the expected extracted text is known
  * by construction, so match rate is checkable at any scale. */
object CorpusGen {

  final case class CorpusRow(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String,
      expected: String,
      kind: String)

  private val epochMs = 1577836800000L // 2020-01-01T00:00:00Z

  def row(i: Long): CorpusRow = row(i, heavy = false)

  def row(i: Long, heavy: Boolean): CorpusRow = {
    val d = if (heavy) FixtureGen.docForHeavy(i) else FixtureGen.docFor(i)
    CorpusRow(
      url = s"https://corpus.test/${d.kind}/$i",
      warc_ts = new Timestamp(epochMs + i * 1000L),
      html = d.bytes,
      text = if (d.kind == "textrow") d.expected else null,
      lang = d.lang,
      expected = d.expected,
      kind = d.kind)
  }

  /** Build the corpus as a DataFrame. Rows are generated ON THE EXECUTORS
    * from the row index (spark.range), so generation itself scales: no
    * driver-side materialization, any target size. */
  def corpus(spark: SparkSession, rows: Long, partitions: Int = 0,
      heavy: Boolean = false): DataFrame = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, rows, 1, partitions) else spark.range(rows)
    base.as[Long].mapPartitions(_.map(i => row(i, heavy))).toDF()
  }

  /** Input-shape view (drops the ground-truth columns). */
  def inputView(corpus: DataFrame): DataFrame =
    corpus.select("url", "warc_ts", "html", "text", "lang")

  /** Variant corpus: same urls and kinds, different body text (for the
    * document-diff surface). */
  def variantCorpus(spark: SparkSession, rows: Long, partitions: Int): DataFrame = {
    import spark.implicits._
    val base = spark.range(0, rows, 1, partitions)
    base.as[Long].mapPartitions(_.map { i =>
      val d = FixtureGen.kinds((i % FixtureGen.kinds.length).toInt)(i + 1100)
      val orig = row(i)
      orig.copy(html = d.bytes, expected = d.expected,
        text = if (d.kind == "textrow") d.expected else null)
    }).toDF()
  }
}
