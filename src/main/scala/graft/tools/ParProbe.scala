package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.Queries

/** Dev probe (round 7, §2.6 overlap wave): times q12/d11/x31 with the
  * bench's own full-evaluation action, several reps, to validate the
  * parallel-independent-actions change on a bursty-vCPU host. */
object ParProbe {
  private def force(df: DataFrame): Long = {
    val r = df.agg(count(lit(1)),
      sum(pmod(xxhash64(df.columns.map(c => col(c).cast("string")): _*),
        lit(1000000007L)))).collect()(0)
    r.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM on an unrelated kernel query
    force(Queries.queries("d2_minhash_lsh")(spark, sfDir))
    for (name <- Seq("q12_bucketed_join", "d11_incremental_dedup",
        "x31_stream_incremental");
        rep <- 1 to 4) {
      val t0 = System.nanoTime()
      force(Queries.queries(name)(spark, sfDir))
      println(f"$name rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
