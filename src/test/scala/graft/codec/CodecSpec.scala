package graft.codec

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Minimal property driver over raw ScalaCheck `Gen` (the scalatestplus
  * bridge isn't in the offline artifact cache). Deterministic seeds. */
trait GenDriven {
  def sample[A](g: Gen[A], seed: Long): A = {
    var s = seed
    var r: Option[A] = None
    while (r.isEmpty) { r = g.apply(Gen.Parameters.default.withSize(50), Seed(s)); s += 1 }
    r.get
  }
  def forAll[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach(i => f(sample(g, 7L * i + 1)))
  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 60).foreach(i => f(sample(ga, 11L * i + 3), sample(gb, 13L * i + 5)))
}

object Gens {
  import StreamType._

  /** Storable types (14 reserved, 0 holds no data). */
  val storedTypes: Seq[StreamType] = Seq(TwoBit, QuarterS, ExtQuarter, HalfS,
    ExtHalf, ShortS, ExtShort, FullS, ExtFull, TwentyS, ExtTwenty, LargeS,
    DoubleS, AutoScale)

  val genType: Gen[StreamType] = Gen.oneOf(storedTypes)

  def genChannel(i: Int): Gen[ChannelConfig] = for {
    t <- genType
    counter <- Gen.oneOf(true, false)
    reg <- Gen.oneOf(true, false)
    // signed only meaningful for gauges; autoscale path has no sign decode
    signed <- if (counter || t == AutoScale || t == DoubleS) Gen.const(false)
              else Gen.oneOf(true, false)
  } yield ChannelConfig(s"chan$i", t, counter = counter,
    register = reg && t != DontSave, signed = signed)

  /** Small schemas that always fit a 512-byte block. */
  val genSchema: Gen[EtsdSchema] = for {
    n <- Gen.choose(1, 6)
    bi <- Gen.oneOf(4, 8, 12, 24)
    interval <- Gen.oneOf(1, 10, 60)
    chans <- Gen.sequence[Seq[ChannelConfig], ChannelConfig](
      (0 until n).map(genChannel))
  } yield EtsdSchema(Layout.sortChannels(chans), interval, bi)

  /** A valid (storable) value for a channel's width. */
  def genValue(c: ChannelConfig): Gen[Long] = {
    val t = c.streamType
    val max = t match {
      case AutoScale => 524286L
      case DoubleS   => 0xFFFFFFFFL
      case _         => t.maxValid
    }
    if (c.signed) {
      val m = (1L << (t.totalBits - 1)) - 1
      Gen.choose(-m, m)
    } else Gen.choose(0L, max)
  }
}

class CodecSpec extends AnyFunSuite with GenDriven {
  import Gens._

  test("signed codec round-trips every width") {
    forAll(Gen.choose(2, 32), Gen.choose(-1000000L, 1000000L)) { (bits, v0) =>
      val m = (1L << (bits - 1)) - 1
      val v = v0 % (m + 1)
      val enc = SignedCodec.encode(bits, v)
      assert(enc != SignedCodec.Invalid)
      assert(SignedCodec.decode(bits, enc) == v)
    }
  }

  test("signed codec rejects out-of-range values") {
    assert(SignedCodec.encode(8, 128) == SignedCodec.Invalid)
    assert(SignedCodec.encode(8, -128) == SignedCodec.Invalid)
    assert(SignedCodec.encode(8, 127) != SignedCodec.Invalid)
    assert(SignedCodec.encode(8, -127) != SignedCodec.Invalid)
  }

  test("header block round-trips (schema <-> 512 bytes)") {
    forAll(genSchema) { schema =>
      val bytes = HeaderCodec.encode(schema)
      assert(bytes.length == 512)
      assert(HeaderCodec.decode(bytes) == schema)
    }
  }

  test("every stream type round-trips a sample through block bytes") {
    forAll(genSchema, Gen.choose(0L, Long.MaxValue)) { (schema, seed) =>
      val layout = new Layout(schema)
      val codec = new BlockCodec(layout)
      val buf = codec.newBlock(1700000000L)
      val rnd = new scala.util.Random(seed)
      val values = schema.channels.zipWithIndex.map { case (c, ci) =>
        (1 to schema.blockIntervals).map { i =>
          val v = sample(genValue(c.copy(signed = false)), rnd.nextLong()) // wire: unsigned
          codec.writeSample(buf, ci, i, v)
          v
        }
      }
      // NOTE: autoscale is deliberately lossy when scale grows after a
      // write; replay expected values through the scale factor
      schema.channels.zipWithIndex.foreach { case (c, ci) =>
        val scale =
          if (c.streamType == StreamType.AutoScale)
            (buf.scaling >>> (2 * layout.addr(ci).ascIdx)) & 3
          else 0
        (1 to schema.blockIntervals).foreach { i =>
          val got = codec.readSample(buf, ci, i)
          val want = values(ci)(i - 1)
          if (c.streamType == StreamType.AutoScale) {
            val stored = math.min(want >> scale, 0xFFFEL)
            assert(got == (stored << scale),
              s"autoscale ${c.streamType} i=$i want=$want scale=$scale")
          } else assert(got == want, s"${c.streamType} chan=$ci i=$i")
        }
      }
    }
  }

  test("out-of-range writes clamp to the invalid sentinel") {
    import StreamType._
    for (t <- storedTypes if t != DoubleS && t != AutoScale) {
      val schema = EtsdSchema(Seq(ChannelConfig("c0", t)), 10, 4)
      val codec = new BlockCodec(new Layout(schema))
      val buf = codec.newBlock(0L)
      codec.writeSample(buf, 0, 1, t.maxValid + 1)
      codec.writeSample(buf, 0, 2, 0xFFFFFFFFL)
      codec.writeSample(buf, 0, 3, t.maxValid)
      assert(codec.isInvalid(0, codec.readSample(buf, 0, 1)), s"$t clamp")
      assert(codec.isInvalid(0, codec.readSample(buf, 0, 2)), s"$t invalid")
      assert(codec.readSample(buf, 0, 3) == t.maxValid, s"$t max-valid")
    }
  }

  test("an untouched block reads all-invalid (cleared to ones)") {
    forAll(genSchema) { schema =>
      val codec = new BlockCodec(new Layout(schema))
      val buf = codec.newBlock(123456789L)
      schema.channels.indices.foreach { ci =>
        if (schema.channels(ci).streamType != StreamType.DoubleS)
          assert(codec.isInvalid(ci, codec.readSample(buf, ci, 1)))
      }
      assert(buf.timestamp == 123456789L)
    }
  }

  test("registers round-trip from the block tail") {
    val schema = EtsdSchema(Seq(
      ChannelConfig("a", StreamType.FullS, counter = true, register = true),
      ChannelConfig("b", StreamType.HalfS, counter = true, register = true)), 10, 8)
    val codec = new BlockCodec(new Layout(schema))
    val buf = codec.newBlock(0L)
    codec.writeRegister(buf, 0, 0xDEADBEEFL)
    codec.writeRegister(buf, 1, 42L)
    assert(codec.readRegister(buf, 0) == 0xDEADBEEFL)
    assert(codec.readRegister(buf, 1) == 42L)
    // last 8 bytes of the block hold the two registers, first channel last
    assert(BlockBuffer(buf.bytes).longD(127) == 0xDEADBEEFL)
    assert(BlockBuffer(buf.bytes).longD(126) == 42L)
  }

  test("autoscale rescales earlier intervals when the scale grows") {
    val schema = EtsdSchema(Seq(ChannelConfig("a", StreamType.AutoScale)), 10, 8)
    val codec = new BlockCodec(new Layout(schema))
    val buf = codec.newBlock(0L)
    codec.writeSample(buf, 0, 1, 1000L)   // scale 0
    codec.writeSample(buf, 0, 2, 100000L) // forces scale 1
    assert(codec.readSample(buf, 0, 1) == 1000L)
    assert(codec.readSample(buf, 0, 2) == 100000L)
    codec.writeSample(buf, 0, 3, 524286L) // forces scale 3
    // 524286>>3 = 65535 dodges the sentinel as 65534 (etsdSave.c:178-181)
    assert(codec.readSample(buf, 0, 3) == 65534L << 3)
    // earlier values now quantized at the grown scale
    assert(math.abs(codec.readSample(buf, 0, 1) - 1000L) <= 7)
    assert(math.abs(codec.readSample(buf, 0, 2) - 100000L) <= 7)
  }

  test("encoder: gauges store absolute values, invalid status stores the sentinel") {
    val schema = EtsdSchema(Seq(
      ChannelConfig("g", StreamType.FullS),
      ChannelConfig("s", StreamType.HalfS, signed = true)), 10, 4)
    val enc = new EtsdEncoder(schema)
    enc.feed(1000L, IndexedSeq(Reading(500), Reading(-5)))
    enc.feed(1010L, IndexedSeq(Reading(0, status = 1), Reading(100)))
    val Seq(block) = enc.blocks()
    val rows = EtsdDecoder.decodeBlock(schema, block)
    val g = rows.filter(s => s.chan == 0 && !s.isRegister).map(_.value)
    val s = rows.filter(s => s.chan == 1 && !s.isRegister).map(_.value)
    assert(g == Seq(Some(500L), None))
    assert(s == Seq(Some(-5L), Some(100L)))
    assert(rows.filter(s => s.chan == 0 && !s.isRegister).map(_.tsEpoch)
      == Seq(1010L, 1020L)) // sample k covers [ts+(k-1)·T, ts+k·T)
  }

  test("encoder: counter deltas, rollover, and register anchoring") {
    val schema = EtsdSchema(Seq(
      ChannelConfig("c", StreamType.FullS, counter = true, register = true)), 10, 4)
    val enc = new EtsdEncoder(schema)
    val odo = Seq(0xFFFFFF00L, 0xFFFFFFF0L, 0x10L, 0x40L, 0x80L, 0x90L)
    odo.foreach(v => enc.feed(0L, IndexedSeq(Reading(v))))
    val blocks = enc.blocks()
    assert(blocks.size == 2)
    val rows = blocks.flatMap(EtsdDecoder.decodeBlock(schema, _))
    val regs = rows.filter(_.isRegister).map(_.value)
    assert(regs == Seq(None, Some(0x40L))) // block 2 anchored at last reading
    val deltas = rows.filterNot(_.isRegister).map(_.value)
    // first reading has no prior -> invalid; then diffs with uint32 wrap
    assert(deltas == Seq(None, Some(0xF0L), Some(0x20L), Some(0x30L),
      Some(0x40L), Some(0x10L)))
    val abs = EtsdDecoder.reconstructCounters(schema, rows)
      .filterNot(_.isRegister).map(_.value)
    // block-1 rows have no anchor (its register is invalid); block 2 is
    // anchored at its register and matches the odometer mod 2^32
    assert(abs.take(4).forall(_.isEmpty))
    assert(abs.drop(4) == odo.drop(4).map(v => Some(v & 0xFFFFFFFFL)))
  }

  test("encoder: missed counter intervals backfill with the averaged delta") {
    val schema = EtsdSchema(Seq(
      ChannelConfig("c", StreamType.FullS, counter = true)), 10, 8)
    val enc = new EtsdEncoder(schema)
    enc.feed(0L, IndexedSeq(Reading(1000)))
    enc.feed(0L, IndexedSeq(Reading(1100)))      // delta 100
    enc.feed(0L, IndexedSeq(Reading(0, status = 1))) // miss
    enc.feed(0L, IndexedSeq(Reading(0, status = 1))) // miss
    enc.feed(0L, IndexedSeq(Reading(1400)))      // accumulated 300 over 3
    val rows = EtsdDecoder.decodeBlock(schema, enc.blocks().head)
      .filterNot(_.isRegister)
    // short block: valid-interval count (data[2]&127) stops the read at 5
    assert(rows.map(_.value) == Seq(None, Some(100L), Some(100L), Some(100L),
      Some(100L)))
  }

  test("encoder: source reset invalidates the counter baseline") {
    val schema = EtsdSchema(Seq(
      ChannelConfig("c", StreamType.FullS, counter = true)), 10, 4)
    val enc = new EtsdEncoder(schema)
    enc.feed(0L, IndexedSeq(Reading(1000)))
    enc.feed(0L, IndexedSeq(Reading(1100)))
    enc.feed(0L, IndexedSeq(Reading(0, status = 2)))  // reset
    enc.feed(0L, IndexedSeq(Reading(50)))             // new epoch: no baseline
    val rows = EtsdDecoder.decodeBlock(schema, enc.blocks().head)
      .filterNot(_.isRegister)
    assert(rows.map(_.value) == Seq(None, Some(100L), None, None))
  }

  test("full file round-trip: random schema, random good gauge readings") {
    forAll(genSchema, Gen.choose(1L, 1700000000L)) { (schema0, t0) =>
      // gauges only: counters transform values (delta) by design
      val schema = schema0.copy(channels =
        schema0.channels.map(_.copy(counter = false)))
      val enc = new EtsdEncoder(schema)
      val rnd = new scala.util.Random(t0)
      val nIv = schema.blockIntervals + 2 // spill into a short second block
      val fed = (0 until nIv).map { k =>
        val row = schema.channels.map { c =>
          val m = c.streamType match {
            case StreamType.AutoScale => 524286L
            case StreamType.DoubleS => 0xFFFFFFFFL
            case t => t.maxValid
          }
          if (c.signed) {
            val half = (1L << (c.streamType.totalBits - 1)) - 1
            Reading((rnd.nextLong() % (half + 1)))
          } else Reading(math.abs(rnd.nextLong()) % (m + 1))
        }.toIndexedSeq
        enc.feed(t0 + k * schema.intervalSec, row)
        row
      }
      val bytes = enc.toFileBytes()
      val (schema2, samples) = EtsdDecoder.decodeFile(bytes)
      assert(schema2 == schema)
      schema.channels.zipWithIndex.foreach { case (c, ci) =>
        val got = samples.filter(s => s.chan == ci && !s.isRegister).map(_.value)
        assert(got.size == nIv)
        val want = fed.map { row =>
          val v = row(ci).data
          if (c.streamType == StreamType.AutoScale) None // checked separately
          else Some(v)
        }
        if (c.streamType != StreamType.AutoScale)
          assert(got == want, s"chan $ci ${c.streamType} signed=${c.signed}")
        else // autoscale: equal after quantization at the block's final scale
          got.zip(fed.map(_.apply(ci).data)).foreach { case (g, w) =>
            assert(g.exists(gv => gv <= w && w - gv <= 16)) // ≤2^3 + sentinel-dodge
          }
      }
    }
  }
}
