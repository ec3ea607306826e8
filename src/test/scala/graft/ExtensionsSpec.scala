package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.spark.CorpusGen

/** The extract_text Catalyst expression through plain SQL. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // needs its own session: extensions only apply at session construction
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("extensions-spec")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("extract_text(html) works in SQL and matches the pipeline") {
    val corpus = CorpusGen.corpus(spark, rows = 24, partitions = 2).cache()
    corpus.createOrReplaceTempView("crawl")
    val rows = spark.sql(
      """SELECT url, extract_text(html) AS text, expected
        |FROM crawl WHERE url NOT LIKE '%textrow%'""".stripMargin).collect()
    assert(rows.length == 22)
    assert(rows.forall(r => r.getString(1) == r.getString(2)))
    // composes with predicates over the extracted text
    val grepped = spark.sql(
      "SELECT count(*) FROM crawl WHERE extract_text(html) RLIKE 'sentence that'")
      .collect()(0).getLong(0)
    assert(grepped == 2)
  }

  test("extract_text generates code (no CodegenFallback wrapper in the plan)") {
    val corpus = CorpusGen.corpus(spark, rows = 6, partitions = 1)
    corpus.createOrReplaceTempView("crawl_cg")
    val df = spark.sql("SELECT url, extract_text(html) AS text FROM crawl_cg")
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage; the projection
    // containing extract_text must carry it
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("extract_text")),
      plan.take(2000))
    // the expression implements doGenCode — it must not be the interpreted
    // CodegenFallback escape hatch
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.spark.ExtractText]))
    assert(df.collect().length == 6) // and the generated code actually runs
  }

  test("extract_text(html, mode) selects the extractor; bad modes fail analysis") {
    val corpus = CorpusGen.corpus(spark, rows = 24, partitions = 2).cache()
    corpus.createOrReplaceTempView("crawl_m")
    // legacy mode matches the generator's stream-order expectations
    val legacy = spark.sql(
      """SELECT url, extract_text(html, 'legacy') AS text, expected_legacy
        |FROM crawl_m WHERE url NOT LIKE '%textrow%'""".stripMargin).collect()
    assert(legacy.length == 22)
    assert(legacy.forall(r => r.getString(1) == r.getString(2)),
      legacy.find(r => r.getString(1) != r.getString(2)).map(_.getString(0)).toString)
    // geom mode and 1-arg default (tagged) both run; on this corpus the
    // tagged default equals `expected`
    val both = spark.sql(
      """SELECT url, extract_text(html) AS t1, extract_text(html, 'tagged') AS t2,
        |       extract_text(html, 'geom') AS tg, expected
        |FROM crawl_m WHERE url NOT LIKE '%textrow%'""".stripMargin).collect()
    assert(both.forall(r => r.getString(1) == r.getString(4) && r.getString(2) == r.getString(4)))
    assert(both.forall(r => r.getString(3) != null))
    // the 2-arg form stays inside WholeStageCodegen like the 1-arg form
    val plan = spark.sql("SELECT extract_text(html, 'legacy') FROM crawl_m")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("extract_text")),
      plan.take(2000))
    // a non-literal or unknown mode is an ANALYSIS error, not a runtime one
    val e1 = intercept[Exception](
      spark.sql("SELECT extract_text(html, 'fancy') FROM crawl_m"))
    assert(e1.getMessage.contains("mode"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT extract_text(html, url) FROM crawl_m"))
    assert(e2.getMessage.contains("literal"), e2.getMessage)
  }
}
