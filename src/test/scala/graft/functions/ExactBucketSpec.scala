package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark

/** The shared floor-div bucket must be exact where the naive forms fail:
  * double floor() rounds past 2^53, and pmod-subtract wraps near
  * Long.MinValue. */
class ExactBucketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def buckets(vs: Seq[Long], delta: Long): Seq[Long] =
    vs.toDF("v").select(ExactBucket.col($"v", delta)).as[Long].collect().toSeq

  test("matches BigInt floor division everywhere, including the extremes") {
    val delta = 100L
    val vs = Seq(0L, 1L, 99L, 100L, -1L, -100L, -101L,
      (1L << 53) + 1, (1L << 53) + 99, -(1L << 53) - 1,
      Long.MaxValue, Long.MaxValue - 99,
      Long.MinValue, Long.MinValue + 50, Long.MinValue + 99)
    val want = vs.map(v =>
      (BigInt(v) - (((BigInt(v) % delta) + delta) % delta)) / delta)
    assert(buckets(vs, delta).map(BigInt(_)) == want)
  }

  test("values within delta land in the same or adjacent buckets") {
    // the band-join invariant the operators rely on
    val pairs = Seq((Long.MinValue, Long.MinValue + 73),
      ((1L << 53) + 10, (1L << 53) + 80), (-37L, 40L))
    pairs.foreach { case (a, b) =>
      val Seq(ba, bb) = buckets(Seq(a, b), 100L)
      assert(math.abs(ba - bb) <= 1, s"($a,$b) -> ($ba,$bb)")
    }
  }
}
