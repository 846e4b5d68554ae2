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
    // build covers construction + the first count, so it can never be
    // cheaper than a later re-execution by more than timer noise
    assert(b >= 0.0 && b >= e * 0.5,
      s"build_s ($b) must cover construction + first count (exec_s $e)")
  }
}
