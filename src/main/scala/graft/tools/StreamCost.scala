package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe: wall time + micro-batch structure of the streaming queries
  * (x12/x15/x16/x21/x22) at a given SF — where does the fixed cost sit? */
object StreamCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = Option(p.durationMs)
          .map(m => m.entrySet().toArray.map(_.toString).sorted.mkString(" "))
          .getOrElse("")
        println(f"    batch=${p.batchId} in=${p.numInputRows} $dur")
      }
    })
    for (name <- Seq("x12_streaming_extract", "x15_stream_window",
        "x16_stream_sessions", "x21_stream_dedup", "x22_stream_join")) {
      println(s"== $name")
      val t0 = System.nanoTime()
      val n = graft.spark.Queries.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"  total $sec%6.2f s rows=$n")
    }
    spark.stop()
  }
}
