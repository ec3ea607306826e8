package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.spark.{CorpusGen, Pipeline, Queries}

/** Physical-plan assertions: the plans the engine is supposed to produce at
  * scale — broadcasts for dimension joins, no shuffle in the extraction
  * pass, bounded exchanges in the heavy aggregations. */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("plan-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def planOf(name: String): String =
    Queries.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("extraction pass plans with zero shuffles") {
    val corpus = CorpusGen.corpus(spark, rows = 9, partitions = 1)
    val plan = Pipeline.extract(spark, CorpusGen.inputView(corpus))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("dimension joins broadcast (q2)") {
    val plan = planOf("q2_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // orders never shuffles for the join itself
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("knn query broadcasts its query vectors (s1)") {
    val plan = planOf("s1_knn_cosine")
    assert(plan.contains("Broadcast"), plan.take(2000))
  }

  test("minhash signatures are row-local: single exchange (the output sort) in d2") {
    val plan = planOf("d2_minhash_lsh")
    val exchanges = "Exchange".r.findAllIn(plan).length
    // signatures fold per-row; the only exchange is the deterministic sort
    assert(exchanges == 1, s"$exchanges exchanges:\n${plan.take(3000)}")
  }

  test("simhash is row-local: single exchange (the output sort) in d3") {
    val plan = planOf("d3_simhash")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"$exchanges exchanges:\n${plan.take(3000)}")
  }

  test("near-dup verify joins on LSH band keys, never a cartesian (d6)") {
    val plan = planOf("d6_near_dup_verify")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("embedding near-dup joins on sign-LSH band keys, never a cartesian (d7)") {
    val plan = planOf("d7_embed_neardup")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("PII redaction and repetition filters are row-local: single exchange (t6, t7)") {
    for (q <- Seq("t6_pii_redact", "t7_repetition")) {
      val plan = planOf(q)
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges <= 1, s"$q: $exchanges exchanges\n${plan.take(3000)}")
    }
  }

  test("substring-dup shuffles only on the shingle key and the doc rollup (d8)") {
    val plan = planOf("d8_substring_dup")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // shingle-key window + doc_id rollup + output sort — never more
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"$exchanges exchanges\n${plan.take(3000)}")
  }

  test("bucketed fact-fact join runs with no exchange before the join (q12)") {
    // at production scale neither fact side fits a broadcast — simulate by
    // disabling auto-broadcast so the planner must use the bucketed SMJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        Queries.queries("q12_bucketed_join")(spark, sfDir)
          .queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    // the join consumes co-bucketed scans directly: every Exchange in the
    // plan sits ABOVE the join (the groupBy/sort), never between the join
    // and its scans
    val joinIdx = plan.indexOf("SortMergeJoin")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange"), plan.take(3000))
  }

  test("incremental dedup probes the bucketed index shuffle-free on the index side (d11)") {
    // the production claim: the persisted signature index is bucketed by
    // band, so the new<->old candidate join reads it co-partitioned — the
    // only shuffled side is the DELTA. Broadcast is disabled (at corpus
    // scale the index never fits) and AQE off so the static plan tree is
    // walkable.
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    val plan =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        Queries.queries("d11_incremental_dedup")(spark, sfDir)
          .queryExecution.executedPlan
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
        spark.conf.set("spark.sql.adaptive.enabled", prevA)
      }
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    def idxScans(p: SparkPlan) = p.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("graft_sigidx")) => f
    }
    assert(idxScans(plan).nonEmpty, plan.toString.take(3000))
    // the scan-adjacent join side holding the index (no nested join below
    // it) must be exchange-free; upper joins aggregate and may shuffle
    val smjs = plan.collect { case j: SortMergeJoinExec => j }
    val bottomIdxSides = smjs.flatMap(j => Seq(j.left, j.right)).filter(s =>
      idxScans(s).nonEmpty &&
        s.collect { case jj: SortMergeJoinExec => jj }.isEmpty)
    assert(bottomIdxSides.nonEmpty, plan.toString.take(3000))
    for (s <- bottomIdxSides)
      assert(s.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"index side shuffled:\n${s.toString.take(2000)}")
    assert(!plan.toString.contains("CartesianProduct"), plan.toString.take(3000))
  }

  test("fluency model joins by broadcast; sampler is row-local (t10, t8)") {
    val p10 = planOf("t10_lm_score")
    assert(p10.contains("BroadcastHashJoin"), p10.take(3000))
    assert(!p10.contains("CartesianProduct"), p10.take(3000))
    val p8 = planOf("t8_sample_mix")
    // gate + rollup: partial aggregation map-side, one exchange + the sort
    val exchanges = "Exchange".r.findAllIn(p8).length
    assert(exchanges <= 2, s"t8: $exchanges exchanges\n${p8.take(3000)}")
  }

  test("incremental merge joins on url with no cartesian (x23)") {
    val plan = planOf("x23_incremental")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("decontamination joins the benchmark shingle set by broadcast (d9)") {
    val plan = planOf("d9_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("sign-LSH pairing drops degenerate buckets at the cap, counted (d7 guard)") {
    val sp = spark; import sp.implicits._
    // 200 degenerate rows (zero-vector failure mode) whose signatures all
    // collide into ONE bucket in every band, plus one healthy near-dup pair
    // in a bucket of 2
    val degen = (1L to 200L).map(i => (i, Array.fill(4)(0.0f), 7L, 7L, 7L, 7L))
    val healthy = Seq(
      (2001L, Array.fill(4)(1.0f), 1L, 21L, 31L, 41L),
      (2002L, Array.fill(4)(1.0f), 1L, 22L, 32L, 42L),
      // a pair INSIDE the oversize band0 bucket that also shares a healthy
      // 2-row band1 bucket: the cap must not lose it — band1 recovers it
      (301L, Array.fill(4)(2.0f), 7L, 55L, 61L, 71L),
      (302L, Array.fill(4)(2.0f), 7L, 55L, 62L, 72L))
    val allv = (degen ++ healthy).toDF(
      "id", "embedding", "band0", "band1", "band2", "band3")
    // cap 64: the 202-row band0 bucket is excluded from pairing; the
    // healthy band0 pair survives and the oversize-bucket pair is
    // recovered through its healthy band1 bucket
    val capped = Queries.signLshBandPairs(allv, cap = 64L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(capped.toSeq == Seq((301L, 302L), (2001L, 2002L)), capped.mkString(","))
    // cap above the bucket size: uncapped all-pairs-within-bucket semantics
    // (202*201/2 band0 pairs + the healthy band0 pair)
    assert(Queries.signLshBandPairs(allv, cap = 300L).count() == 20302L)
    // the drop counters fire as METRICS ROWS (the x6-style audit surface),
    // not just a stderr line: the degenerate rows collide in every band —
    // band0's bucket holds 202 rows (degen 200 + the 301/302 pair share
    // band0=7), bands 1-3 hold the 200 degen rows each
    val audit = Queries.signLshDropAudit(allv, cap = 64L)
      .orderBy("band").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(audit(0) == ((0, 1L, 202L, 202L * 201L / 2)), audit.mkString(","))
    assert(audit.drop(1).toSeq == (1 to 3).map(j => (j, 1L, 200L, 200L * 199L / 2)),
      audit.mkString(","))
  }

  test("region extraction is shuffle-free up to the output sort (x24)") {
    val plan = planOf("x24_page_regions")
    // pruned scan -> mapPartitions kernel -> sort: exactly one exchange
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"$exchanges exchanges:\n${plan.take(3000)}")
  }

  test("region chunking reuses the url partitioning for its rollup (c2)") {
    val plan = planOf("c2_region_chunks")
    // window shuffles on url; the (url, chunk) groupBy must NOT add a
    // second shuffle (url partitioning co-locates every group); then the
    // output sort — 2 exchanges total
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"$exchanges exchanges:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("greedy chunking shuffles once on url plus the output sort (c3)") {
    val plan = planOf("c3_greedy_chunks")
    // extraction (shuffle-free) -> groupByKey(url) -> per-doc fold -> sort
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"$exchanges exchanges:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("anti-join resume broadcasts the done set when small") {
    val corpus = CorpusGen.corpus(spark, rows = 20, partitions = 2)
    val input = CorpusGen.inputView(corpus)
    val done = input.select("url").limit(5)
    val plan = Pipeline.resumeRemaining(input, done).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan.take(2000))
  }
}
