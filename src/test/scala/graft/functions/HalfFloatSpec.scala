package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ChannelConfig, EtsdSchema, StreamType}
import graft.codec.{BlockCodec, Layout}

/** IEEE binary16 conversion + the FloatS (type 14) block lane — the one
  * stream the reference plans but never implements (README.md:45); we
  * pin the semantics we ship for it. */
class HalfFloatSpec extends AnyFunSuite {

  // ---- known vectors (IEEE 754-2019 binary16) ----
  private val vectors = Seq(
    0.0 -> 0x0000L, 1.0 -> 0x3C00L, -1.0 -> 0xBC00L, 0.5 -> 0x3800L,
    2.0 -> 0x4000L, 65504.0 -> 0x7BFFL, -65504.0 -> 0xFBFFL,
    1.5 -> 0x3E00L, 0.099975585937500 -> 0x2E66L, // nearest half to 0.1
    Math.scalb(1.0, -14) -> 0x0400L,  // smallest normal
    Math.scalb(1.0, -24) -> 0x0001L,  // smallest subnormal
    Math.scalb(1023.0, -24) -> 0x03FFL, // largest subnormal
    Double.PositiveInfinity -> 0x7C00L,
    Double.NegativeInfinity -> 0xFC00L)

  test("known-vector bit patterns") {
    vectors.foreach { case (d, b) =>
      assert(HalfFloat.bits(d) == b, s"bits($d)")
      if (!d.isInfinite || b == 0x7C00L || b == 0xFC00L)
        assert(HalfFloat.value(b) == d, s"value(0x${b.toHexString})")
    }
    assert(HalfFloat.bits(Double.NaN) == 0x7E00L)
    assert(HalfFloat.value(0x7E00L).isNaN)
    assert(HalfFloat.value(0xFFFFL).isNaN) // the codec sentinel is a NaN pattern
  }

  test("rounding: nearest, ties to even; overflow to inf; underflow to zero") {
    assert(HalfFloat.bits(0.1) == 0x2E66L)           // round down
    assert(HalfFloat.bits(1.0009765625) == 0x3C01L)  // 1 + 2^-10 exact
    assert(HalfFloat.bits(1.00048828125) == 0x3C00L) // 1 + 2^-11 tie -> even (0)
    assert(HalfFloat.bits(1.0014648437500) == 0x3C02L) // 1 + 3*2^-11 tie -> even (2)
    assert(HalfFloat.bits(65519.999) == 0x7BFFL)     // just under the inf tie
    assert(HalfFloat.bits(65520.0) == 0x7C00L)       // tie at 65520 -> inf
    assert(HalfFloat.bits(1.0e9) == 0x7C00L)
    assert(HalfFloat.bits(-1.0e9) == 0xFC00L)
    assert(HalfFloat.bits(Math.scalb(1.0, -26)) == 0x0000L)  // < 2^-25 -> 0
    assert(HalfFloat.bits(Math.scalb(1.0, -25)) == 0x0000L)  // tie -> even 0
    assert(HalfFloat.bits(Math.scalb(1.5, -25)) == 0x0001L)  // above tie
    assert(HalfFloat.bits(-0.0) == 0x8000L)
  }

  test("every half value round-trips exactly") {
    (0 until 0x10000).foreach { h =>
      val d = HalfFloat.value(h.toLong)
      if (!d.isNaN)
        assert(HalfFloat.bits(d) == h.toLong, f"0x$h%04x")
    }
  }

  test("bits() is the nearest representable half, sign-symmetric") {
    // the positive representable-magnitude ladder (sign bit handled apart);
    // deterministic pseudo-random doubles spanning the full half range
    val mags = (0 until 0x7C00).map(h => HalfFloat.value(h.toLong)).sorted
    val rnd = new scala.util.Random(0x9E3779B97F4A7C15L)
    (0 until 20000).foreach { _ =>
      // exponent-uniform magnitudes hit subnormals and normals alike
      val a = Math.scalb(1.0 + rnd.nextDouble(), rnd.nextInt(42) - 26)
      val d = if (rnd.nextBoolean()) a else -a
      val got = math.abs(HalfFloat.value(HalfFloat.bits(d)))
      // nearest ladder value via binary search on the sorted magnitudes
      val i = {
        val p = java.util.Arrays.binarySearch(mags.toArray, math.abs(d))
        if (p >= 0) p else math.min(math.max(-p - 1, 1), mags.length - 1)
      }
      val best = Seq(mags(math.max(i - 1, 0)), mags(i))
        .minBy(m => math.abs(m - math.abs(d)))
      if (!got.isInfinite)
        assert(math.abs(got - math.abs(d)) <= math.abs(best - math.abs(d)),
          s"d=$d got=$got best=$best")
      if (d != 0.0)
        assert(HalfFloat.bits(-d) == (HalfFloat.bits(d) ^ 0x8000L), s"sign of $d")
    }
  }

  test("FloatS block lane: patterns round-trip through a real block") {
    val schema = EtsdSchema(Seq(
      ChannelConfig("f0", StreamType.FloatS),
      ChannelConfig("g1", StreamType.FullS)), intervalSec = 60,
      blockIntervals = 24)
    val layout = new Layout(schema)
    val codec = new BlockCodec(layout)
    val buf = codec.newBlock(1704067200L)
    val vals = (1 to 24).map(i => HalfFloat.bits(i + 0.5))
    vals.zipWithIndex.foreach { case (v, i) =>
      codec.writeSample(buf, 0, i + 1, v)
      codec.writeSample(buf, 1, i + 1, 1000L + i)
    }
    vals.zipWithIndex.foreach { case (v, i) =>
      val wire = codec.readSample(buf, 0, i + 1)
      assert(wire == v)
      assert(HalfFloat.value(wire) == i + 1 + 0.5)
      assert(codec.readSample(buf, 1, i + 1) == 1000L + i)
    }
    // sentinel: an unwritten interval reads all-ones = invalid
    val buf2 = codec.newBlock(1704067200L)
    assert(codec.isInvalid(0, codec.readSample(buf2, 0, 1)))
  }

  test("float channels are gauges: counter/signed are rejected") {
    intercept[IllegalArgumentException] {
      ChannelConfig("f", StreamType.FloatS, counter = true)
    }
    intercept[IllegalArgumentException] {
      ChannelConfig("f", StreamType.FloatS, signed = true)
    }
  }
}
