package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must report failure as failure: a query that throws
  * (at plan construction or during an action) yields the -1 sentinel, not
  * an implausibly fast ~0 s "success" (round-3 advice item). */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a throwing query reports the -1 sentinel") {
    assert(Bench.timeQuery(() =>
      sys.error("broken at construction")) == ((-1.0, -1.0)))
    // analysis-time failure: Datasets analyze eagerly, so the throw
    // happens inside the builder — exactly the Bench construction path
    import spark.implicits._
    assert(Bench.timeQuery(() =>
      Seq(1).toDF("a").selectExpr("no_such_col")) == ((-1.0, -1.0)))
  }

  test("a working query reports non-negative build and exec times") {
    import spark.implicits._
    val (b, e) = Bench.timeQuery(() => Seq(1, 2, 3).toDF("a").filter($"a" > 1))
    assert(e >= 0.0)
    // build covers construction + the first count; on a 3-row local
    // query both sides are milliseconds, so comparing their magnitudes
    // is pure scheduler/JIT jitter — assert only the sign contract
    assert(b >= 0.0, s"build_s ($b) must be non-negative (exec_s $e)")
  }
}
