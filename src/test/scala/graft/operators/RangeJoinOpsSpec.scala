package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketed band/interval joins: edge-exact semantics vs a brute-force
  * reference on small synthetic data (the operator must agree with the
  * nested-loop answer it is designed to avoid computing). */
class RangeJoinOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("selfBandJoin matches brute force incl. bucket-boundary pairs") {
    // values straddle bucket edges: 99|100, 199|200|201, duplicates
    val rows = Seq(("g", 1L, 0L), ("g", 2L, 99L), ("g", 3L, 100L),
      ("g", 4L, 199L), ("g", 5L, 201L), ("g", 6L, 301L), ("g", 7L, 301L),
      ("h", 8L, 100L), ("h", 9L, 150L))
    val df = rows.toDF("k", "id", "v")
    val got = RangeJoinOps.selfBandJoin(df, $"k", $"id", $"v", 100L)
      .select("key", "id_a", "id_b").as[(String, Long, Long)]
      .collect().toSet
    val want = (for {
      (ka, ia, va) <- rows; (kb, ib, vb) <- rows
      if ka == kb && ia < ib && math.abs(va - vb) <= 100
    } yield (ka, ia, ib)).toSet
    assert(got == want)
    assert(want.contains(("g", 2L, 3L))) // cross-bucket 99↔100
    assert(want.contains(("g", 4L, 5L))) // cross-bucket 199↔201
    assert(want.contains(("g", 1L, 3L))) // exactly-delta pair 0↔100 kept
  }

  test("intervalJoin matches brute force for bounded intervals") {
    val pts = Seq(("a", 1L, 5L), ("a", 2L, 10L), ("a", 3L, 19L),
      ("a", 4L, 20L), ("b", 5L, 10L)).toDF("k", "pid", "ts")
    val ivs = Seq(("a", 10L, 0L, 10L), ("a", 11L, 10L, 20L),
      ("a", 12L, 15L, 22L), ("b", 13L, 0L, 9L)).toDF("k", "iid", "s", "e")
    val got = RangeJoinOps.intervalJoin(pts, $"k", $"pid", $"ts",
        ivs, $"k", $"iid", $"s", $"e", maxLen = 10L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq
    val want = for {
      (pk, pid, ts) <- Seq(("a", 1L, 5L), ("a", 2L, 10L), ("a", 3L, 19L),
        ("a", 4L, 20L), ("b", 5L, 10L))
      (ik, iid, s, e) <- Seq(("a", 10L, 0L, 10L), ("a", 11L, 10L, 20L),
        ("a", 12L, 15L, 22L), ("b", 13L, 0L, 9L))
      if pk == ik && ts >= s && ts < e && e - s <= 10
    } yield (pid, iid)
    assert(got.sorted == want.sorted) // no duplicate pairs either
  }

  test("selfBandJoin plan contains no nested-loop / cartesian join") {
    val df = Seq(("g", 1L, 0L), ("g", 2L, 50L)).toDF("k", "id", "v")
    val plan = RangeJoinOps.selfBandJoin(df, $"k", $"id", $"v", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
