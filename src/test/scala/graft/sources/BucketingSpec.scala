package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark

/** The co-located-join claim as an assertion: two tables bucketed on the
  * join key must sort-merge join with NO Exchange anywhere in the plan —
  * the write-time shuffle is the only shuffle the key ever pays. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables equi-join and aggregate with zero runtime shuffle") {
    import spark.implicits._
    val a = (1L to 1000L).map(k => (k % 100, k)).toDF("k", "va")
    val b = (1L to 500L).map(k => (k % 100, -k)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bk_a", "k", 4)
    Bucketing.writeBucketed(b, "bk_b", "k", 4)
    // keep the small fixture on the sort-merge path the assertion is about
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle in bucketed join:\n$plan")
      assert(j.count() == 1000L * 5) // each of 1000 a-rows meets 500/100 b-rows

      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("bk_a").groupBy($"k").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(agg.count() == 100)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
