package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Contract of the one-pass box-filter resize: must equal a direct
  * per-bucket reference (the form the DuckDB oracle evaluates), with
  * round-half-up means, nearest-neighbor upsampling, and the
  * empty→empty / NULL→NULL edge convention — on both the codegen path
  * (via DataFrame) and the interpreted static. */
class BinaryResizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(bytes: Array[Byte], w: Int): Seq[Int] = {
    val n = bytes.length
    if (n == 0) Seq.empty
    else (0 until w).map { j =>
      val lo = (j.toLong * n / w).toInt
      val hi = math.max(((j + 1).toLong * n / w).toInt, lo + 1)
      val vals = (lo until hi).map(bytes(_) & 0xFF)
      // round-half-up mean, exact rational arithmetic
      ((2L * vals.sum + vals.length) / (2L * vals.length)).toInt
    }
  }

  private def viaExpr(bytes: Array[Byte], w: Int): Seq[Int] = {
    val df = Seq(Tuple1(bytes)).toDF("payload")
    df.select(BinaryResize($"payload", w).as("t")).as[Seq[Int]].head()
  }

  test("codegen path matches the per-bucket reference on random payloads") {
    val rng = new scala.util.Random(11)
    for (n <- Seq(1, 2, 5, 15, 16, 17, 100, 1000, 4093);
         w <- Seq(1, 3, 16)) {
      val bytes = new Array[Byte](n)
      rng.nextBytes(bytes)
      assert(viaExpr(bytes, w) == reference(bytes, w),
        s"mismatch at n=$n w=$w")
    }
  }

  test("interpreted static matches the reference too") {
    val rng = new scala.util.Random(13)
    for (n <- Seq(1, 7, 64, 257); w <- Seq(1, 4, 16)) {
      val bytes = new Array[Byte](n)
      rng.nextBytes(bytes)
      val got = BinaryResize.resize(bytes, w)
      assert(got.toIntArray().toSeq == reference(bytes, w),
        s"mismatch at n=$n w=$w")
    }
  }

  test("known values: downsample averages, round half up") {
    // [0,1,2,3] -> w=2: mean(0,1)=0.5 -> 1; mean(2,3)=2.5 -> 3
    assert(viaExpr(Array[Byte](0, 1, 2, 3), 2) == Seq(1, 3))
    // unsigned byte semantics: 0xFF is 255, not -1
    assert(viaExpr(Array[Byte](-1, -1), 1) == Seq(255))
  }

  test("upsampling replicates the nearest byte") {
    assert(viaExpr(Array[Byte](10), 4) == Seq(10, 10, 10, 10))
    // n=2, w=4: lo = 0,0,1,1 -> [a,a,b,b]
    assert(viaExpr(Array[Byte](3, 9), 4) == Seq(3, 3, 9, 9))
  }

  test("empty payload resizes to an empty array; NULL stays NULL") {
    assert(viaExpr(Array.empty[Byte], 16) == Seq.empty)
    val df = Seq[Option[Array[Byte]]](None).toDF("payload")
    assert(df.select(BinaryResize($"payload", 16).as("t")).head().isNullAt(0))
  }
}
