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

  test("amtVerb: case-insensitive substring, total is the default (etsdQuery.c:374-395)") {
    assert(TimeSeriesOps.amtVerb("maximum") == "max")
    assert(TimeSeriesOps.amtVerb("MINI") == "min")
    assert(TimeSeriesOps.amtVerb("Average") == "ave")
    assert(TimeSeriesOps.amtVerb("avg") == "ave")
    assert(TimeSeriesOps.amtVerb("tot") == "tot")
    assert(TimeSeriesOps.amtVerb("anything-else") == "tot")
  }

  test("proration fenceposts (etsdQuery.c:232-287 semantics)") {
    import spark.implicits._
    // one channel, value 36.0 in each of three hour buckets h0,h1,h2
    val h0 = 1704067200L // 2024-01-01 00:00
    val rows = Seq(h0, h0 + 3600, h0 + 7200)
      .map(t => (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t)), "c", 36.0))
      .toDF("ts", "ch", "v")
    def tot(s: Long, e: Long): Double =
      TimeSeriesOps.proratedTotal(rows, $"ch", $"ts", $"v", s, e, 3600L)
        .head.getDouble(1)
    // exact bucket bounds: no proration
    assert(tot(h0, h0 + 3 * 3600) == 108.0)
    // start half into bucket 0: half of its 36 is kept
    assert(tot(h0 + 1800, h0 + 3 * 3600) == 90.0)
    // end a quarter into bucket 2: quarter of its 36 is kept
    assert(tot(h0, h0 + 2 * 3600 + 900) == 81.0)
    // both partial: 0.5*36 + 36 + 0.25*36
    assert(tot(h0 + 1800, h0 + 2 * 3600 + 900) == 63.0)
    // range inside a single bucket: that fraction only
    assert(tot(h0 + 600, h0 + 1500) == 9.0) // 900s of 3600 = 36/4
    // degenerate: start == end -> zero coverage
    assert(tot(h0 + 600, h0 + 600) == 0.0)
  }

  test("counter rollover at exactly 2^32 (etsdQuery.c:332-336)") {
    import spark.implicits._
    val t0 = 1704067200L
    // odometer mod 2^32: ..., 2^32-2, 2^32-1, 0, 5 -> deltas 1, 1, 5
    val odo = Seq(4294967294L, 4294967295L, 0L, 5L)
    val rows = odo.zipWithIndex.map { case (v, i) =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t0 + i)), "c", v, i.toLong)
    }.toDF("ts", "ch", "raw", "tb")
    val got = TimeSeriesOps.counterTotal(rows, $"ch", $"ts", $"raw", $"tb")
      .head
    assert(got.getLong(1) == 4L)  // n samples
    assert(got.getLong(2) == 7L)  // 1 + 1 (wraps to 0) + 5
    // a single sample has no delta: channel omitted entirely
    val one = rows.filter($"tb" === 0)
    assert(TimeSeriesOps.counterTotal(one, $"ch", $"ts", $"raw", $"tb").isEmpty)
  }

  test("gap-fill backfill edges: missed = 0, 1, and a long gap") {
    import spark.implicits._
    val h0 = 1704067200L
    // buckets h0, h2 (one missing), then h258 (255 missing)
    val rows = Seq(h0 -> 10.0, (h0 + 2 * 3600) -> 30.0, (h0 + 258 * 3600) -> 512.0)
      .map { case (t, v) =>
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t)), "c", v) }
      .toDF("ts", "ch", "v")
    val got = TimeSeriesOps.gapFillAverage(rows, $"ch", $"ts", $"v", 3600L)
      .orderBy("bucket_epoch").collect()
    assert(got.length == 1 + 2 + 256) // h0; h1+h2 averaged; h3..h258 averaged
    assert(got.head.getLong(1) == h0 && got.head.getDouble(2) == 10.0
      && !got.head.getBoolean(3)) // missed=0: value kept, not a backfill
    val h1 = got.find(_.getLong(1) == h0 + 3600).get
    assert(h1.getDouble(2) == 15.0 && h1.getBoolean(3)) // 30/(1+1)
    val h2 = got.find(_.getLong(1) == h0 + 2 * 3600).get
    assert(h2.getDouble(2) == 15.0 && !h2.getBoolean(3))
    val far = got.find(_.getLong(1) == h0 + 258 * 3600).get
    assert(far.getDouble(2) == 2.0 && !far.getBoolean(3)) // 512/256
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

  test("statOutliers flags exactly the brute-force 3-sigma set") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two channels: "a" has one planted spike, "b" is flat (variance 0 —
    // nothing may be flagged, and the guard must not divide by zero)
    val aVals = (1 to 50).map(_.toDouble % 7 + 10.0) :+ 500.0
    val rows = (aVals.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) } ++
      (0 until 20).map(i => (100L + i, "b", 42.0)))
      .toDF("sec", "channel", "value")
      .select(timestamp_seconds($"sec").as("ts"), $"channel", $"value")
    val got = TimeSeriesOps.statOutliers(rows, $"channel", $"ts", $"value")
      .as[(String, Long, Double, Double)].collect().toSet
    // brute force in the same cents-integer space
    val vc = aVals.map(v => math.round(v * 100))
    val n = vc.length
    val mu = vc.sum.toDouble / n
    val vr = vc.map(x => x.toDouble * x).sum / n - mu * mu
    val expect = vc.zipWithIndex.collect {
      case (x, i) if (x - mu) * (x - mu) > 9.0 * vr =>
        ("a", i.toLong * 1000000L, x / 100.0, (x - mu) / math.sqrt(vr))
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty && got.forall(_._4 > 3.0))
    assert(!got.exists(_._1 == "b"), "zero-variance channel must not flag")
  }

  test("changePoints finds a planted level shift at the shift boundary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // mean jumps 10 -> 20 at index 60: |CUSUM| peaks at the last
    // pre-shift sample (the classic estimator property)
    val vals = Seq.fill(60)(10.0) ++ Seq.fill(40)(20.0)
    val rows = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v, i.toLong) }
      .toDF("sec", "channel", "value", "tb")
      .select(timestamp_seconds($"sec").as("ts"), $"channel", $"value", $"tb")
    val got = TimeSeriesOps.changePoints(rows, $"channel", $"ts", $"value",
        $"tb")
      .as[(String, Long, Long, Double)].collect()
    assert(got.length == 1)
    val (ch, n, tsUs, peak) = got(0)
    assert(ch == "a" && n == 100L)
    assert(tsUs == 59L * 1000000L, s"change point at $tsUs, expected t=59s")
    // peak = sum_{i<=59} (10 - 14) in value units = 60 * (10 - 14) = -240
    assert(math.abs(peak - -240.0) < 1e-9, s"peak $peak")
  }

  test("percentiles picks the ceil(p% of n)-th order statistic per channel") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = ((1 to 10).map(i => ("a", i.toDouble, i.toLong)) :+
      (("b", 7.0, 99L)))
      .toDF("channel", "value", "event_id")
    val got = Pins.scoped {
      TimeSeriesOps.percentiles(ev, $"channel", $"value", $"event_id",
          Seq(50, 95, 99))
        .as[(String, Long, Double, Long)].collect().toSeq.sorted
    }
    assert(got == Seq(
      ("a", 50L, 5.0, 10L),  // ceil(5.0)  -> 5th smallest
      ("a", 95L, 10.0, 10L), // ceil(9.5)  -> 10th
      ("a", 99L, 10.0, 10L), // ceil(9.9)  -> 10th
      ("b", 50L, 7.0, 1L), ("b", 95L, 7.0, 1L), ("b", 99L, 7.0, 1L)), got)
  }

  test("timeWeightedAvg integrates trapezoids; bursts don't over-weight") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = 1700000000L
    val ev = Seq(
      ("a", t0, 0.0, 1L), ("a", t0 + 10L, 10.0, 2L), ("a", t0 + 11L, 10.0, 3L),
      ("lonely", t0, 42.0, 4L)) // < 2 samples: no trapezoid, excluded
      .toDF("channel", "sec", "value", "event_id")
      .select($"channel", timestamp_seconds($"sec").as("ts"), $"value",
        $"event_id")
    val got = TimeSeriesOps.timeWeightedAvg(ev, $"channel", $"ts", $"value",
        $"event_id")
      .as[(String, Long, Double)].collect().toSeq
    // trapezoids: (0+10)/2·10 + (10+10)/2·1 = 60 value·s over 11 s
    // (a naive AVG says 6.67 — the burst at t+11 over-weights). The
    // expectation replays the op's exact division chain (cents·µs
    // numerator, then /2 /span /100) — a rearranged 60.0/11.0 differs
    // by one ULP, which is precisely why the oracle uses one chain.
    val num = (0L + 1000L) * 10000000L + (1000L + 1000L) * 1000000L
    assert(got == Seq(("a", 3L, num.toDouble / 2.0 / 11000000L / 100.0)), got)
  }

  test("derivative emits dv/dt per second, skips first samples and " +
      "zero-dt duplicates") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = 1700000000L
    val ev = Seq(
      ("a", t0, 0.0, 1L), ("a", t0 + 10L, 5.0, 2L), ("a", t0 + 30L, 4.0, 3L),
      ("a", t0 + 30L, 9.0, 4L), // duplicate ts: no defined rate, dropped
      ("b", t0, 7.0, 5L))       // single sample: no rate
      .toDF("channel", "sec", "value", "event_id")
      .select($"channel", timestamp_seconds($"sec").as("ts"), $"value",
        $"event_id")
    val got = TimeSeriesOps.derivative(ev, $"channel", $"ts", $"value",
        $"event_id")
      .as[(String, Long, Double)].collect().toSeq.sortBy(_._2)
    assert(got == Seq(
      ("a", (t0 + 10L) * 1000000L, 0.5),    // +5 over 10 s
      ("a", (t0 + 30L) * 1000000L, -0.05))) // -1 over 20 s
  }

  test("channelCorrelation: exact r = ±1 on linear pairs, constant " +
      "channels excluded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = 1700000000L
    val ev = (0 until 4).flatMap { h =>
      val t = t0 + h * 3600L
      Seq(("x", t, 1.0 + h), ("y", t, 2.0 + 2 * h), // y = 2x: r = 1
        ("z", t, 9.0 - h),                          // z = 10 - x: r = -1
        ("const", t, 5.0))                          // zero variance
    }.zipWithIndex.map { case ((c, t, v), i) => (c, t, v, i.toLong) }
      .toDF("channel", "sec", "value", "event_id")
      .select($"channel", timestamp_seconds($"sec").as("ts"), $"value",
        $"event_id")
    val got = Pins.scoped {
      TimeSeriesOps.channelCorrelation(ev, $"channel", $"ts", $"value", 3600L)
        .as[(String, String, Long, Double)].collect().toSeq.sorted
    }
    assert(got.map(r => (r._1, r._2)) ==
      Seq(("x", "y"), ("x", "z"), ("y", "z")), got)
    val r = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(math.abs(r(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(r(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(r(("y", "z")) + 1.0) < 1e-12)
  }

  test("funnelSteps counts only STRICTLY ordered conversions") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = 1700000000L
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, t0, "view"), (1L, t0 + 10, "click"), (1L, t0 + 20, "purchase"),
      // user 2: purchase BEFORE click — reaches step 2 only
      (2L, t0, "view"), (2L, t0 + 5, "purchase"), (2L, t0 + 10, "click"),
      // user 3: click at the SAME instant as view — strict > rejects it
      (3L, t0, "view"), (3L, t0, "click"),
      // user 4: never views — not even step 1
      (4L, t0, "click"), (4L, t0 + 5, "purchase"))
      .toDF("user_id", "sec", "event_type")
      .select($"user_id", timestamp_seconds($"sec").as("ts"), $"event_type")
    val got = Pins.scoped {
      TimeSeriesOps.funnelSteps(ev, $"user_id", $"ts", $"event_type",
          Seq("view", "click", "purchase"))
        .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    }
    assert(got == Seq((1L, "view", 3L), (2L, "click", 2L),
      (3L, "purchase", 1L)), got)
  }

  test("gridInterpolate: exact linear values at covered grid points only") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = Seq(
      // samples at 0.5h and 2.5h: grid hours 1 and 2 interpolate
      ("a", 1800L, 10.0, 1L), ("a", 9000L, 30.0, 2L),
      // a sample exactly ON the grid reproduces itself (frac = 1)
      ("b", 3600L, 10.0, 3L), ("b", 7200L, 20.0, 4L))
      .toDF("channel", "sec", "value", "event_id")
      .select($"channel", timestamp_seconds($"sec").as("ts"), $"value",
        $"event_id")
    val got = TimeSeriesOps.gridInterpolate(ev, $"channel", $"ts", $"value",
        $"event_id", 3600L)
      .as[(String, Long, Double)].collect().toSeq.sorted
    assert(got == Seq(
      ("a", 3600000000L, 15.0),  // 1/4 of the way from 10 to 30
      ("a", 7200000000L, 25.0),  // 3/4
      // b: hour 2 covered by the pair, reproducing the sample; hour 1
      // is b's FIRST sample - no pair covers it, so it is absent
      ("b", 7200000000L, 20.0)), got)
  }

  test("lastTouchAttribution skips earlier targets and uses the LATEST " +
      "prior source; first-event purchases attribute to none") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = 1700000000L
    val ev = Seq(
      // user 1: click then view then purchase -> view (latest wins)
      (1L, t0, "click"), (1L, t0 + 1, "view"), (1L, t0 + 2, "purchase"),
      // user 1 again: second purchase right after the first - the
      // intervening PURCHASE is skipped, view still attributes
      (1L, t0 + 3, "purchase"),
      // user 2: purchase with no prior events at all
      (2L, t0, "purchase"),
      // user 3: view AFTER the purchase must not attribute
      (3L, t0, "purchase"), (3L, t0 + 1, "view"))
      .toDF("user_id", "sec", "event_type")
      .select($"user_id", timestamp_seconds($"sec").as("ts"), $"event_type",
        monotonically_increasing_id().as("event_id"))
    val got = TimeSeriesOps.lastTouchAttribution(ev, $"user_id", $"ts",
        $"event_type", "purchase", $"event_id")
      .as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 2L, "none" -> 2L), got)
  }

  test("cohortRetention: first-anchor cohorts, pre-signup activity and " +
      "never-signed users excluded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val week = 604800L
    val t0 = 1700000000L - (1700000000L % week) // week-aligned
    def at(w: Long, off: Long = 10L) = t0 + w * week + off
    val ev = Seq(
      (1L, at(0), "signup"), (1L, at(0, 20), "view"), (1L, at(2), "click"),
      (2L, at(0, 30), "signup"),
      (3L, at(1), "signup"), (3L, at(2, 40), "purchase"),
      (4L, at(0), "view"),              // never signs up: no cohort
      (5L, at(0), "view"), (5L, at(1), "signup")) // week-0 activity
                                                  // predates the cohort
      .toDF("user_id", "sec", "event_type")
      .select($"user_id", timestamp_seconds($"sec").as("ts"), $"event_type")
    val got = Pins.scoped {
      TimeSeriesOps.cohortRetention(ev, $"user_id", $"ts", $"event_type",
          "signup", week)
        .as[(Long, Long, Long)].collect().toSeq.sorted
    }
    assert(got == Seq(
      (t0, t0, 2L),                          // users 1+2 in week 0
      (t0, t0 + 2 * week, 1L),               // user 1 returns in week 2
      (t0 + week, t0 + week, 2L),            // users 3+5 (5's week-0
                                             // view never counts)
      (t0 + week, t0 + 2 * week, 1L)), got)  // user 3 in week 2
  }

  test("madOutliers flags the moderate spike a wild spike masks from " +
      "the 3-sigma rule") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = 1700000000L
    // baseline 10.0/10.1, one moderate (50) and one wild (1000) spike:
    // the wild spike inflates sigma so 3-sigma misses the moderate one;
    // median 10.1 and MAD 0.10 flag both
    val vals = (Seq.fill(10)(10.0) ++ Seq.fill(10)(10.1)) :+ 50.0 :+ 1000.0
    val ev = vals.zipWithIndex.map { case (v, i) =>
      ("a", t0 + i * 60L, v, i.toLong)
    }.toDF("channel", "sec", "value", "event_id")
      .select($"channel", timestamp_seconds($"sec").as("ts"), $"value",
        $"event_id")
    val mad = Pins.scoped {
      TimeSeriesOps.madOutliers(ev, $"channel", $"ts", $"value", $"event_id")
        .as[(String, Long, Double, Long, Long)].collect().toSeq.sortBy(_._2)
    }
    assert(mad.map(_._3) == Seq(50.0, 1000.0), mad)
    assert(mad.forall(_._5 == 10L), s"MAD should be 10 cents: $mad")
    val sigma = TimeSeriesOps.statOutliers(ev, $"channel", $"ts", $"value")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(sigma.map(_._3) == Seq(1000.0),
      s"3-sigma should be masked into flagging only the wild spike: $sigma")
  }

  test("movingAverage: RANGE frame over sparse buckets, missing hours " +
      "neither dilute nor extend the window") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = 1700000000L - (1700000000L % 3600L) // bucket-aligned
    val ev = Seq((t0, 10.0, 1L), (t0 + 3600L, 20.0, 2L),
      (t0 + 25L * 3600L, 30.0, 3L))
      .map { case (t, v, id) => ("a", t, v, id) }
      .toDF("channel", "sec", "value", "event_id")
      .select($"channel", timestamp_seconds($"sec").as("ts"), $"value",
        $"event_id")
    val got = TimeSeriesOps.movingAverage(ev, $"channel", $"ts", $"value",
        3600L, windowBuckets = 24)
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._2)
    assert(got == Seq(
      ("a", t0, 1L, 10.0),           // only itself in frame
      ("a", t0 + 3600L, 2L, 15.0),   // hours 0+1 present -> (10+20)/2
      // hour 25's frame starts at hour 2: hours 0/1 aged out, the 22
      // EMPTY hours between do not appear as zeros
      ("a", t0 + 25L * 3600L, 1L, 30.0)), got)
  }

  test("sessionize splits on inactivity gaps, exact-gap events stay " +
      "in-session, tie timestamps are ordered by the tie-break") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t0 = 1700000000L
    val ev = Seq(
      // user 1: two sessions — gap of exactly 1800s stays (strict >),
      // the 1801s gap splits
      (1L, t0, 1L), (1L, t0 + 1800L, 2L), (1L, t0 + 3601L, 3L),
      (1L, t0 + 3602L, 4L),
      // user 2: one single-event session; same ts as user 1's first
      (2L, t0, 5L),
      // user 1: a duplicate timestamp — tie-break keeps the order total
      (1L, t0, 6L))
      .toDF("user_id", "sec", "event_id")
      .select($"user_id", timestamp_seconds($"sec").as("ts"), $"event_id")
    val got = TimeSeriesOps.sessionize(ev, $"user_id", $"ts", $"event_id",
        gapSec = 1800L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, 1L, t0 * 1000000L, (t0 + 1800L) * 1000000L, 3L),
      (1L, 2L, (t0 + 3601L) * 1000000L, (t0 + 3602L) * 1000000L, 2L),
      (2L, 1L, t0 * 1000000L, t0 * 1000000L, 1L)), got.toSeq)
  }
}
