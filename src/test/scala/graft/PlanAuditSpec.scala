package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit over EVERY SparkEntry query — the 100 TB guard
  * rails as assertions, so a regression that re-introduces an all-pairs
  * stage or loses parquet pushdown fails CI, not the cluster.
  *
  * - No `CartesianProduct` anywhere, ever.
  * - `BroadcastNestedLoopJoin` only where a bounded probe/centroid set is
  *   intentionally broadcast against one corpus scan (k·N / C·N work,
  *   not N²): the brute-force ANN baseline and the IVF assignment pass.
  * - The time-range queries must reach the parquet scan with a pushed
  *   `ts` predicate (VERDICT r1 flagged the `unix_timestamp(ts)` form
  *   that silently defeats row-group pruning). */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  /** Queries allowed to contain a broadcast nested-loop stage: the small
    * side is a constant-bounded set by construction (probe set, centroid
    * set, or a 1-row corpus total). */
  private val broadcastLoopOk = Set("llm_ann_topk", "llm_ann_ivf",
    "llm_semdedup", "llm_vocab", "llm_cluster_sizes", "llm_ann_pq",
    "llm_ann_pq_rr", "llm_temp_mix", "llm_pmi",
    // the append gates SERVE through the same ivfKnnWithIndex /
    // pqKnnWithIndex paths as llm_ann_ivf / llm_ann_pq — the loop's
    // small side is the same bounded probe/centroid/LUT set
    "llm_stream_ann_append", "llm_stream_pq_append")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: no unbounded pair generation in the physical plan") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"cartesian product in $name:\n$plan")
      if (!broadcastLoopOk(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"nested-loop join in $name:\n$plan")
    }
  }

  test("ts_prorated_total pushes the raw ts range into the parquet scan") {
    val plan = SparkEntry.queries("ts_prorated_total")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts)"), plan)
  }

  test("narrow queries prune the documents scan to the used columns") {
    // a scan that reads all 5 document columns for a doc_id-only query
    // is wasted IO at 100 TB — pruning must reach the parquet reader.
    // The parquet scan of a pinned intermediate executes at pin
    // (localCheckpoint) time during query CONSTRUCTION, so capture every
    // plan executed while the query builds and search those: the final
    // plan only shows the checkpointed blocks.
    def plansDuring(build: => Unit): Seq[String] = {
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val l = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            d: Long): Unit = seen.add(qe.executedPlan.toString)
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      try {
        build
        // listener delivery is async: wait until the captured set stops
        // growing (bounded)
        var last = -1
        var spins = 0
        while (seen.size != last && spins < 40) {
          last = seen.size; spins += 1; Thread.sleep(250)
        }
      } finally spark.listenerManager.unregister(l)
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq
    }
    // the per-query audit loop above builds (and pin-memoizes) every
    // query without releasing; clear first so the pin materializations
    // this test must observe actually re-execute
    Pins.releaseAll()
    Pins.scoped {
      var shuffleDf: org.apache.spark.sql.DataFrame = null
      val shufflePlans = plansDuring {
        shuffleDf = SparkEntry.queries("llm_shuffle")(spark, sfDir)
        shuffleDf.count()
      } :+ shuffleDf.queryExecution.executedPlan.toString
      assert(shufflePlans.exists(_.contains("ReadSchema: struct<doc_id:bigint>")),
        shufflePlans.mkString("\n----\n"))
    }
    Pins.scoped {
      var tokDf: org.apache.spark.sql.DataFrame = null
      val tokPlans = plansDuring {
        tokDf = SparkEntry.queries("llm_token_counts")(spark, sfDir)
        tokDf.count()
      } :+ tokDf.queryExecution.executedPlan.toString
      assert(tokPlans.exists(
        _.contains("ReadSchema: struct<doc_id:bigint,text:string>")),
        tokPlans.mkString("\n----\n"))
    }
  }

  test("rel_band_join_auto is actually rewritten (Generate in the plan)") {
    // the no-nested-loop assertion above would also fail if the rule
    // stopped firing, but assert the rewrite's fingerprint directly:
    // the bucket-replication explode only exists if BandJoinRewrite ran
    val plan = SparkEntry.queries("rel_band_join_auto")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Generate explode"), plan)
    assert(plan.contains("__graft_band_bucket"), plan)
  }

  // ---- date-partitioned deployment layout (the 100 TB table shape) ----

  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

  /** Write a `date=YYYY-MM-DD`-partitioned copy of the sf events table
    * (ts normalized through the shared loader branch, as tools.Relayout
    * does — layout-drift-proof). */
  private def writeDatePartitioned(dst: String): Unit = {
    graft.queries.Tables.events(spark, sfDir)
      .withColumn("date", to_date($"ts"))
      .write.partitionBy("date").mode("overwrite")
      .parquet(s"$dst/events.parquet")
  }

  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    // AQE wrappers are leaves to TreeNode.collect — descend explicitly
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans)
  }

  test("eventsBetween on a date-partitioned table prunes partitions " +
      "at the scan node (not just row groups)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-datepart").toString
    try {
      writeDatePartitioned(dir)
      val from = 1704844800L // 2024-01-10 00:00:00 UTC
      val to = 1705320000L   // 2024-01-15 12:00:00 UTC -> 6 of 30 days
      val df = graft.queries.Tables.eventsBetween(spark, dir, from, to)
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 100).cast("long")).as("s_c"))
      val got = df.collect().head
      // same rows as the raw ts-range scan of the single-file original
      val want = graft.queries.Tables.events(spark, sfDir)
        .filter($"ts" >= timestamp_seconds(lit(from)) &&
          $"ts" < timestamp_seconds(lit(to)))
        .agg(count(lit(1)), sum(round($"value" * 100).cast("long")))
        .collect().head
      assert(got.getLong(0) == want.getLong(0) && got.getLong(0) > 0)
      assert(got.getLong(1) == want.getLong(1))
      // the scan must carry the derived date predicate as a PARTITION
      // filter and actually read 6 partitions, not all 30
      // the aggregation query has exactly one file scan: events
      val scan = fileScans(df.queryExecution.executedPlan).headOption
        .getOrElse(fail("no FileSourceScan in plan:\n" +
          df.queryExecution.executedPlan.toString))
      assert(scan.partitionFilters.map(_.toString).exists(_.contains("date")),
        s"no date partition filter in: ${scan.partitionFilters}")
      assert(scan.metrics.contains("numPartitions"),
        s"scan metrics: ${scan.metrics.keySet}")
      val read = scan.metrics("numPartitions").value
      assert(read == 6, s"expected 6 pruned-in partitions of 30, read $read")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("Retention.dropBlocksBefore drops date= partitions by their " +
      "midnight-UTC epoch label") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dateret").toString
    try {
      writeDatePartitioned(dir)
      val evDir = s"$dir/events.parquet"
      val cutoff = java.time.LocalDate.parse("2024-01-05").toEpochDay * 86400L
      val dropped = graft.sources.Retention
        .dropBlocksBefore(spark, evDir, cutoff)
      assert(dropped.size == 4, s"expected 4 dropped days, got $dropped")
      val minDate = spark.read.parquet(evDir)
        .agg(min($"date".cast("string"))).collect().head.getString(0)
      assert(minDate == "2024-01-05", s"min surviving date $minDate")
      // idempotent: nothing left below the cutoff
      assert(graft.sources.Retention
        .dropBlocksBefore(spark, evDir, cutoff).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
