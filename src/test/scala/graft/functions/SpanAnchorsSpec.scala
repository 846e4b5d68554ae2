package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark

/** Contract of the one-pass span-anchor expression: the rolling
  * polynomial must equal the direct per-position Horner (the form the
  * DuckDB oracle evaluates), anchored spans hash with the DetHash h60,
  * and indexing is codepoint-based like SQL substr/ascii. */
class SpanAnchorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(norm: String, spanLen: Int, anchorMod: Int): Seq[Long] = {
    val cps = norm.codePoints().toArray()
    (0 to cps.length - spanLen).flatMap { j =>
      val h = (0 until SpanAnchors.Window).foldLeft(0L)((acc, k) =>
        (acc * SpanAnchors.PolyB + cps(j + k)) % SpanAnchors.PolyP)
      if (h % anchorMod == 0)
        Some(DetHash.h60Value(new String(cps, j, spanLen)))
      else None
    }
  }

  private def viaExpr(norm: String, spanLen: Int, anchorMod: Int): Seq[Long] = {
    val df = Seq(Tuple1(norm)).toDF("norm")
    df.select(SpanAnchors.column($"norm", spanLen, anchorMod).as("a"))
      .as[Seq[Long]].head()
  }

  test("rolling polynomial matches the direct Horner on random text") {
    val rng = new scala.util.Random(7)
    for (len <- Seq(8, 9, 20, 63, 200, 1000)) {
      val s = (1 to len).map(_ => ('a' + rng.nextInt(27)).toChar)
        .mkString.replace('{', ' ') // include spaces
      for (spanLen <- Seq(8, 12, 60).filter(_ <= len)) {
        assert(viaExpr(s, spanLen, 4) == reference(s, spanLen, 4),
          s"mismatch at len=$len spanLen=$spanLen")
      }
    }
  }

  test("codepoint semantics: multibyte text anchors like SQL substr/ascii") {
    val s = "中文文本重复一段中文文本重复一段和一些 ascii mixed in here too"
    assert(viaExpr(s, 10, 2) == reference(s, 10, 2))
    // surrogate-pair codepoint (🎉 U+1F389) counts as ONE position
    val t = "abc🎉defghij" * 4
    assert(viaExpr(t, 9, 1) == reference(t, 9, 1))
    assert(viaExpr(t, 9, 1).nonEmpty)
  }

  test("short and null inputs") {
    assert(viaExpr("1234567", 8, 1).isEmpty) // shorter than spanLen
    val df = Seq[Option[String]](None).toDF("norm")
    assert(df.select(SpanAnchors.column($"norm", 8, 1).as("a"))
      .head().isNullAt(0))
  }

  test("identical substring anchors identically at different offsets") {
    val region = "the quick brown fox jumps over the lazy dog again and again"
    val a = s"XX$region"
    val b = s"YYYYYYY$region"
    val ha = viaExpr(a, 20, 2).toSet
    val hb = viaExpr(b, 20, 2).toSet
    // every span fully inside the shared region appears in both
    val shared = reference(region, 20, 2).toSet
    assert(shared.subsetOf(ha) && shared.subsetOf(hb))
  }
}
