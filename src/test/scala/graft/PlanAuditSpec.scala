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
    "llm_ann_pq_rr")

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
    // is wasted IO at 100 TB — pruning must reach the parquet reader
    val shufflePlan = SparkEntry.queries("llm_shuffle")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(shufflePlan.contains("ReadSchema: struct<doc_id:bigint>"),
      shufflePlan)
    val tokPlan = SparkEntry.queries("llm_token_counts")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(tokPlan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      tokPlan)
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
}
