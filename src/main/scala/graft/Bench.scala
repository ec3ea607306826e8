package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{CorpusGen, Pipeline}

/** Per-round benchmark: one JSON line with per-query seconds plus the
  * extraction headline (docs/s + byte-identical match rate) on a corpus
  * whose parquet is materialized outside the timed section. */
object Bench {

  final case class ExtractionResult(docs: Long, secs: Double, docsPerSec: Double, matchRate: Double)

  def buildSession(cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // extraction is CPU-bound per row: keep scan partitions small enough
      // that every core gets work even when the corpus parquet is compact
      // (default 128MB splits would coalesce the whole corpus into a
      // handful of tasks and flatline scaling)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Materialize a corpus parquet (untimed), then time the full extraction
    * + match-rate job end-to-end (scan -> kernel -> join vs ground truth). */
  def extractionBench(spark: SparkSession, docs: Long, partitions: Int, dir: String): ExtractionResult = {
    val corpusPath = s"$dir/corpus"
    CorpusGen.corpus(spark, docs, partitions, heavy = true)
      .write.mode("overwrite").parquet(corpusPath)
    val stored = spark.read.parquet(corpusPath)
    // one untimed pass to warm the JIT (the kernel speeds up ~3x when hot)
    Pipeline.extract(spark, stored).toDF().agg(count(lit(1))).collect()
    // best of 2 timed reps: this VM's vCPU allocation is bursty (~2x
    // between windows) — the better rep is the least-perturbed observation,
    // the same protocol ScalingBench uses
    var best = Double.MaxValue
    var n = 0L
    var matched = 0L
    for (_ <- 0 until 2) {
      val t0 = System.nanoTime()
      val agg = Pipeline.extract(spark, stored).toDF()
        .join(stored.select("url", "expected"), Seq("url"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("text") === col("expected"), 1L).otherwise(0L)).as("matched"))
        .collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      if (secs < best) best = secs
      n = agg.getLong(0)
      matched = agg.getLong(1)
    }
    ExtractionResult(n, best, n / best, matched.toDouble / math.max(n, 1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "20000").toLong
    val spark = buildSession(cpus)

    val tmp = java.nio.file.Files.createTempDirectory("graft_bench").toString
    val ex = extractionBench(spark, benchDocs, cpus * 4, tmp)

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    results("extract_corpus") = ex.secs
    // best of 2 reps per query: this host's vCPU allocation is bursty
    // (CLAUDE.md protocol, same as ScalingBench) — a single-shot timing
    // has manufactured phantom 7x regressions in past rounds. A query
    // that throws is recorded loudly (err map + nonzero exit), never as
    // a fast success.
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      var best = Double.MaxValue
      var rep = 0
      while (rep < 2 && !errors.contains(name)) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          val secs = (System.nanoTime() - t0) / 1e9
          if (secs < best) best = secs
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        rep += 1
      }
      results(name) = if (errors.contains(name)) -1.0 else best
    }
    def fmt(v: Double): String = f"$v%.3f"
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors.map { case (k, v) => "\"" + k + "\":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(
      "{\"metric\":\"total\",\"value\":" + fmt(total) + ",\"unit\":\"sec\"" +
        ",\"queries\":" + qs + errJson +
        ",\"sf\":\"" + sfDir + "\",\"cpus\":" + cpus +
        ",\"extraction\":{\"docs\":" + ex.docs +
        ",\"secs\":" + fmt(ex.secs) +
        ",\"docs_per_sec\":" + f"${ex.docsPerSec}%.1f" +
        ",\"match_rate\":" + ex.matchRate + "}}")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
