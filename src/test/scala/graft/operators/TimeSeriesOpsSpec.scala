package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark
import graft.codec._
import graft.model.{ChannelConfig, EtsdSchema, StreamType}

/** Distributed operators vs sequential reference ports. */
class TimeSeriesOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("anchoredReconstruct matches the sequential LastReading/readReg loop") {
    import spark.implicits._
    // encode a counter with registers through real blocks: rollover start,
    // invalid stretches, a couple of hundred intervals over many blocks
    val schema = EtsdSchema(Seq(
      ChannelConfig("odo", StreamType.FullS, counter = true, register = true)),
      intervalSec = 10, blockIntervals = 6)
    val t0 = 1700000035L // deliberately unaligned to segment boundaries
    val rnd = new scala.util.Random(7)
    val enc = new EtsdEncoder(schema)
    var odo = 0xFFFFFE00L // forces a 2^32 rollover early
    (0 until 200).foreach { k =>
      odo = (odo + rnd.nextInt(300)) & 0xFFFFFFFFL
      val status = if (rnd.nextInt(10) == 0) 1 else 0
      enc.feed(t0 + k * 10L, IndexedSeq(Reading(odo, status)))
    }
    val (_, samples) = EtsdDecoder.decodeFile(enc.toFileBytes())
    val seq = EtsdDecoder.reconstructCounters(schema, samples)

    val df = samples.zipWithIndex.map { case (s, i) =>
      (s.tsEpoch * 1000000L, "odo", s.value, s.isRegister, i.toLong)
    }.toDF("ts_us", "channel", "value", "is_register", "tb")
    val got = TimeSeriesOps.anchoredReconstruct(df, $"channel",
        timestamp_micros($"ts_us"), $"value", $"is_register", $"tb",
        segmentSec = 100L) // misaligned with the 60 s blocks on purpose
      .select($"tb", $"abs").as[(Long, Option[Long])].collect()
      .sortBy(_._1).map(_._2)

    val want = seq.map(_.value)
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i: distributed=$g sequential=$w")
    }
    // sanity: the series really exercised rollover + invalids + anchors
    assert(want.flatten.nonEmpty && want.contains(None))
    assert(samples.count(_.isRegister) > 20)
  }

  test("anchoredReconstruct: invalid registers are skipped, not anchors") {
    import spark.implicits._
    // hand-built long rows: invalid register, valid anchor, deltas, gap
    val rows = Seq(
      // (ts_us, value, is_register, tb)
      (1000000L, None: Option[Long], true, 0L),  // invalid register: skip
      (2000000L, Some(5L), false, 1L),           // unanchored -> null
      (3000000L, Some(100L), true, 2L),          // anchor = 100
      (4000000L, Some(7L), false, 3L),           // 107
      (5000000L, None, false, 4L),               // invalid sample: null, chain survives
      (6000000L, Some(3L), false, 5L),           // 110
      (200000000L, Some(10L), false, 6L)         // later segment: carry -> 120
    ).map { case (ts, v, r, tb) => (ts, "c", v, r, tb) }
      .toDF("ts_us", "channel", "value", "is_register", "tb")
    val got = TimeSeriesOps.anchoredReconstruct(rows, $"channel",
        timestamp_micros($"ts_us"), $"value", $"is_register", $"tb",
        segmentSec = 10L)
      .select($"tb", $"abs").as[(Long, Option[Long])].collect()
      .sortBy(_._1).map(_._2).toSeq
    assert(got == Seq(None, None, Some(100L), Some(107L), None, Some(110L),
      Some(120L)))
  }
}
