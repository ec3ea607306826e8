package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.Queries

/** Dev probe (round 7): stage decomposition of the remaining expensive
  * queries — where inside d11/x31/q12/s5/d10 does the time actually go?
  * Each stage is forced with a noop-equivalent full evaluation (count of
  * xxhash over all columns, the Bench methodology) so nothing is
  * optimized away. */
object R07Probe {
  private def force(df: DataFrame): Long = {
    val r = df.agg(count(lit(1)),
      sum(pmod(xxhash64(df.columns.map(c => col(c).cast("string")): _*),
        lit(1000000007L)))).collect()(0)
    r.getLong(0)
  }

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
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
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // warm the session (scan + kernel JIT)
    timed("warmup d2")(force(Queries.queries("d2_minhash_lsh")(spark, sfDir)))

    println("== d11 decomposition")
    val sid = "probe_" + System.nanoTime()
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_probe_$sid"
    timed("index build (sigKeyed+bucketed write)") {
      Queries.buildSignatureIndex(docs, s"idx_$sid", s"$base/sig")
    }
    timed("incrementalDedup probe+verify") {
      force(Queries.incrementalDedup(spark, s"idx_$sid",
        Queries.recrawlDelta(docs)))
    }
    timed("d11 end-to-end")(force(Queries.queries("d11_incremental_dedup")(spark, sfDir)))

    println("== x31 decomposition")
    timed("delta write") {
      Queries.recrawlDelta(docs).write.mode("overwrite").parquet(s"$base/delta")
    }
    timed("stream probe (incrementalDedupPairs)") {
      graft.spark.Streaming.incrementalDedupPairs(spark, s"idx_$sid",
        s"$base/delta", "probe_pairs_" + System.nanoTime()).count()
    }
    timed("x31 end-to-end")(force(Queries.queries("x31_stream_incremental")(spark, sfDir)))

    println("== x31 stream internals (listener on the child session)")
    locally {
      val child = graft.spark.Streaming.streamSession(spark)
      child.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
          println(s"    started ${System.nanoTime() / 1000000}")
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val dur = Option(p.durationMs)
            .map(m => m.entrySet().toArray.map(_.toString).sorted.mkString(" "))
            .getOrElse("")
          println(f"    batch=${p.batchId} in=${p.numInputRows} $dur")
        }
      })
      val probe2 = Queries.bandedSigs(Queries.sigKeyed(
        child.readStream.schema(spark.read.parquet(s"$base/delta").schema)
          .parquet(s"$base/delta")))
        .select(col("doc_id").as("doc_b"), col("hs").as("hs_b"),
          col("b0").as("b0b"), col("band"))
      val idx2 = child.table(s"idx_$sid").select(col("band"),
        col("doc_id").as("doc_a"), col("hs").as("hs_a"), col("b0").as("b0a"))
      for (rep <- 1 to 2) timed(s"manual stream run (current code) #$rep") {
        val q = broadcast(probe2).join(idx2, "band")
          .filter(substring(col("band"), 1, 2) === "0:" || col("b0a") =!= col("b0b"))
          .filter(Queries.interSizeUdf(col("hs_a"), col("hs_b")) * 3 >=
            size(col("hs_a")) + size(col("hs_b")))
          .groupBy(col("doc_b"))
          .agg(min(col("doc_a")).as("cluster_old"))
          .writeStream
          .format("memory")
          .queryName("probe_manual_" + rep)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      Thread.sleep(500)
    }

    println("== x22/x15 stream internals (listener on the child session)")
    locally {
      val child = graft.spark.Streaming.streamSession(spark)
      child.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val dur = Option(p.durationMs)
            .map(m => m.entrySet().toArray.map(_.toString).sorted.mkString(" "))
            .getOrElse("")
          println(f"    batch=${p.batchId} in=${p.numInputRows} $dur")
          Option(p.stateOperators).foreach(_.foreach(so =>
            println(s"      state rows=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
              s"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes}")))
        }
      })
      val eventsDir = s"$sfDir/events.parquet"
      // x15 plan on the child, manual run
      val dir15 = {
        val d = java.nio.file.Files.createTempDirectory("probe_ev").toString
        java.nio.file.Files.copy(java.nio.file.Paths.get(eventsDir),
          java.nio.file.Paths.get(d, "events.parquet"))
        d
      }
      timed("x15 manual stream") {
        val q = graft.spark.Streaming.windowedEventCountsPlan(child, dir15)
          .writeStream.format("memory").queryName("probe_x15")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // x22 replica on the child
      val schema = child.read.parquet(dir15).schema
      def src(tpe: String, alias: String) = child.readStream.schema(schema).parquet(dir15)
        .filter(col("event_type") === tpe)
        .select(col("user_id").cast("long").as(s"${alias}_user"),
          col("ts").cast("timestamp").as(s"${alias}_ts"),
          col("event_id").cast("long").as(s"${alias}_id"))
        .withWatermark(s"${alias}_ts", "10 minutes")
      timed("x22 manual stream") {
        val q = src("click", "c").join(src("purchase", "p"),
          col("c_user") === col("p_user") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("interval 1 hour"))
          .writeStream.format("memory").queryName("probe_x22")
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      Thread.sleep(500)
    }

    println("== q12 decomposition")
    timed("q12 end-to-end")(force(Queries.queries("q12_bucketed_join")(spark, sfDir)))
    timed("li bucketed write only") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/li").saveAsTable(s"li_$sid")
    }
    timed("ord bucketed write only") {
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/ord").saveAsTable(s"ord_$sid")
    }
    timed("bucketed join+agg only") {
      force(spark.table(s"li_$sid")
        .join(spark.table(s"ord_$sid"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("line_items"),
          round(sum(col("l_quantity").cast("decimal(18,2)")), 2).cast("double").as("sum_qty"))
        .orderBy("o_orderstatus"))
    }

    println("== s5 decomposition")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
    val cents = timed("kmeansCentroids(3 iters)") {
      val c = Queries.kmeansCentroids(e, iters = 3)
      c.collect()
      c
    }
    timed("final assign + search")(force(Queries.queries("s5_ivf_kmeans")(spark, sfDir)))

    println("== d10 decomposition")
    timed("d10 end-to-end")(force(Queries.queries("d10_dedup_components")(spark, sfDir)))

    println("== streaming batch structure (post wave-1)")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = Option(p.durationMs)
          .map(m => m.entrySet().toArray.map(_.toString).sorted.mkString(" "))
          .getOrElse("")
        println(f"    batch=${p.batchId} in=${p.numInputRows} $dur")
      }
    })
    for (name <- Seq("x15_stream_window", "x16_stream_sessions",
        "x21_stream_dedup", "x22_stream_join")) {
      println(s"-- $name")
      timed(name)(force(Queries.queries(name)(spark, sfDir)))
    }
    spark.stop()
  }
}
