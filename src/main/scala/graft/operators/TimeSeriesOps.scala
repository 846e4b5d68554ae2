package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._

/** The reference's analytical query surface (`etsdAMT` etsdQuery.c:218-401,
  * `etsdVAT` etsdQuery.c:206-215, planned `ETSD_KS` etsdQuery.h:25-55,
  * missed-interval backfill etsdSave.c:394-402, RRD consolidation ladder
  * `ECM-1240 storage format 2.txt:126-148`) re-expressed as declarative
  * DataFrame transforms.
  *
  * Scale notes (100 TB stance):
  *  - every op is a single groupBy/window shuffle keyed on the channel
  *    column; no driver-side iteration, no collect;
  *  - time-range filters are plain `ts` predicates → pushed to the parquet
  *    scan and prunable by partition/row-group stats, which is exactly the
  *    reference's `etsdFindBlock` sector pruning (etsdRead.c:300-353) done
  *    by the storage layer instead of hand-rolled arithmetic;
  *  - double-typed measures are aggregated in scaled-integer space
  *    (`round(x*100)` cents) so partial-aggregate order can't change the
  *    result — required both for cross-engine reproducibility and for
  *    deterministic re-runs on a real cluster.
  */
object TimeSeriesOps {

  /** Verb resolution: case-insensitive substring match, mirroring the
    * reference (`q=maximum` works; etsdQuery.c:374-395). Total is the
    * default verb. */
  def amtVerb(cmd: String): String = {
    val c = cmd.toLowerCase
    if (c.contains("ave") || c.contains("avg")) "ave"
    else if (c.contains("min")) "min"
    else if (c.contains("max")) "max"
    else "tot"
  }

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Total/Ave/Min/Max per channel over a time range — the `etsdAMT` family
    * in one pass. Gauge semantics (sum of samples, etsdQuery.c:337-339).
    * Output: channel, n, tot, ave, vmin, vmax. */
  def amt(df: DataFrame, chan: Column, ts: Column, value: Column,
          start: Column, end: Column): DataFrame = {
    df.filter(ts >= start && ts <= end)
      .groupBy(chan.as("channel"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents(value)).as("tot_c"),
        min(value).as("vmin"),
        max(value).as("vmax"))
      .select($"channel", $"n",
        ($"tot_c".cast("double") / 100.0).as("tot"),
        ($"tot_c".cast("double") / $"n" / 100.0).as("ave"),
        $"vmin", $"vmax")
  }

  /** Head/tail proration (etsdQuery.c:232-287): samples cover fixed
    * intervals; a query whose bounds fall inside an interval takes a linear
    * fraction of that interval's value. Here the "interval" is a tumbling
    * `intervalSec` bucket of the raw stream and the bucket value is the
    * (exact, cents-scaled) sum of samples in it.
    * Output: channel, prorated total. */
  def proratedTotal(df: DataFrame, chan: Column, ts: Column, value: Column,
                    startEpoch: Long, endEpoch: Long, intervalSec: Long): DataFrame = {
    val b = (floor(unix_timestamp(ts) / intervalSec) * intervalSec).cast("long")
    val lo = (startEpoch / intervalSec) * intervalSec // bucket containing start
    // raw-ts predicates (not unix_timestamp(ts)) so the range reaches the
    // parquet scan as PushedFilters / row-group pruning — the Spark analog
    // of the reference's etsdFindBlock sector pruning (etsdRead.c:300-353).
    // Equivalent for whole-second bounds: floor(ts)>=lo ⟺ ts>=lo, and
    // floor(ts)<E ⟺ ts<E when lo,E are integers.
    df.filter(ts >= timestamp_seconds(lit(lo)) && ts < timestamp_seconds(lit(endEpoch)))
      .groupBy(chan.as("channel"), b.as("bucket"))
      .agg(sum(cents(value)).as("s_c"))
      // overlap of [bucket, bucket+interval) with [start, end) in whole
      // seconds: the prorated sum stays in exact integer space (cents ×
      // seconds), divided through by the common denominator only once.
      .select($"channel",
        ($"s_c" * (least(lit(endEpoch), $"bucket" + intervalSec) -
                   greatest(lit(startEpoch), $"bucket"))).as("num"))
      .groupBy($"channel")
      .agg(sum($"num").as("num"))
      .select($"channel",
        ($"num".cast("double") / intervalSec / 100.0).as("prorated_tot"))
  }

  /** Segment length for two-phase prefix sums (one day). The reference
    * bounds counter-decode state the same way: per-block 32-bit register
    * snapshots re-anchor the running `LastReading` so no reader ever scans
    * from t0 (README.md:25, etsdRead.c:276-285). A day segment keeps every
    * window task bounded at 100 TB regardless of channel cardinality. */
  val SegmentSec = 86400L

  private def segOf(ts: Column): Column =
    floor(unix_timestamp(ts) / SegmentSec).cast("long")

  /** Counter-with-rollover total (etsdQuery.c:332-336,379-388): given a raw
    * monotonic-mod-2^32 odometer reading per sample, total consumption =
    * sum of deltas, where a negative delta means the 32-bit counter rolled
    * over and gets bumped by 2^32.
    *
    * Two-phase at scale: adjacent-pair deltas inside bounded day segments
    * (window keyed channel×segment), plus one boundary delta per segment
    * pair computed over the tiny per-segment summary — no task ever sorts a
    * full channel history. Channels with a single sample have no delta and
    * are omitted (reference behavior: no pairs → no total).
    * Output: channel, n, counter_total. */
  def counterTotal(df: DataFrame, chan: Column, ts: Column, raw: Column,
                   tieBreak: Column): DataFrame = {
    val twoPow32 = 4294967296L
    def bump(cur: Column, prev: Column): Column =
      when(cur >= prev, cur - prev).otherwise(cur - prev + twoPow32)
    val wIn = Window.partitionBy("channel", "seg").orderBy("ts_o", "tb")
    val perSeg = df
      .select(chan.as("channel"), ts.as("ts_o"), tieBreak.as("tb"), raw.as("raw"))
      .withColumn("seg", segOf($"ts_o"))
      .withColumn("prev", lag($"raw", 1).over(wIn))
      .groupBy($"channel", $"seg")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"prev".isNotNull, bump($"raw", $"prev"))).as("in_sum"),
        min(struct($"ts_o", $"tb", $"raw")).as("first_s"),
        max(struct($"ts_o", $"tb", $"raw")).as("last_s"))
    val wSeg = Window.partitionBy("channel").orderBy("seg")
    perSeg
      .withColumn("prev_last", lag($"last_s.raw", 1).over(wSeg))
      .withColumn("boundary",
        when($"prev_last".isNotNull, bump($"first_s.raw", $"prev_last"))
          .otherwise(lit(0L)))
      .groupBy($"channel")
      .agg(sum($"n_rows").as("n"),
        (sum(coalesce($"in_sum", lit(0L))) + sum($"boundary")).as("counter_total"))
      .filter($"n" > 1)
  }

  /** Cumulative counter reconstruction (`LastReading` decode loop,
    * etsdRead.c:270-285): running sum of deltas per channel. Adds column
    * `cum`.
    *
    * Two-phase prefix sum: (1) running sum inside bounded day segments;
    * (2) exclusive prefix over per-segment totals (tiny: channels × days),
    * joined back on (channel, seg) — AQE broadcasts the summary side. This
    * is the register-anchor design of the reference applied to Spark: no
    * single task materializes a full channel history. */
  def counterReconstruct(df: DataFrame, chan: Column, ts: Column, delta: Column,
                         tieBreak: Column): DataFrame = {
    val wIn = Window.partitionBy("channel", "seg").orderBy("ts", "tb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = df
      .select(chan.as("channel"), ts.as("ts"), tieBreak.as("tb"), delta.as("delta"))
      .withColumn("seg", segOf($"ts"))
      .withColumn("cum_in_seg", sum($"delta").over(wIn))
    val wSeg = Window.partitionBy("channel").orderBy("seg")
      .rowsBetween(Window.unboundedPreceding, -1)
    val segPrefix = rows.groupBy($"channel", $"seg")
      .agg(sum($"delta").as("seg_sum"))
      .withColumn("seg_prefix", coalesce(sum($"seg_sum").over(wSeg), lit(0L)))
      .select($"channel", $"seg", $"seg_prefix")
    rows.join(segPrefix, Seq("channel", "seg"))
      .select($"channel", $"ts", $"tb", $"delta",
        ($"seg_prefix" + $"cum_in_seg").as("cum"))
  }

  /** Register-anchored counter reconstruction (`readReg` + the
    * `LastReading` loop, etsdRead.c:276-285, README.md:25): absolute
    * 32-bit snapshots re-anchor the running delta sum, bounding both
    * accumulated drift and — here — the work any one task does.
    *
    * Input is the canonical long form: register rows carry the absolute
    * snapshot (null = invalid register, skipped), sample rows carry the
    * stored delta (null = invalid sample — emits null but does NOT break
    * the chain, matching the reference's skip-on-E_DATA). Output adds
    * `abs` = reconstructed absolute value mod 2^32, null until the first
    * valid anchor is seen.
    *
    * Scale shape: windows run inside bounded (channel × `segmentSec`)
    * partitions; cross-segment carry is a prefix over the tiny per-segment
    * summary (channels × segments) joined back — no task ever sorts a full
    * channel history, the same two-phase design as [[counterReconstruct]]
    * but seeded by anchors. */
  def anchoredReconstruct(df: DataFrame, chan: Column, ts: Column, value: Column,
                          isRegister: Column, tieBreak: Column,
                          segmentSec: Long = SegmentSec): DataFrame = {
    val twoPow32 = 4294967296L
    val rows = df
      .select(chan.as("channel"), unix_micros(ts).as("ts_us"),
        isRegister.as("is_reg"), value.as("v"), tieBreak.as("tb"))
      .withColumn("seg", floor($"ts_us" / 1000000L / segmentSec).cast("long"))
      // sequential decode order: a block's trailing samples precede the
      // next block's register at the same timestamp
      .withColumn("ro", when($"is_reg", 1).otherwise(0))
      .withColumn("d", when(!$"is_reg" && $"v".isNotNull, $"v").otherwise(lit(0L)))
      .withColumn("av", when($"is_reg", $"v")) // valid-anchor value else null
    val w = Window.partitionBy("channel", "seg").orderBy("ts_us", "ro", "tb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inSeg = rows
      .withColumn("run_d", sum($"d").over(w))
      .withColumn("a_val", last($"av", ignoreNulls = true).over(w))
      .withColumn("a_run", last(when($"av".isNotNull, $"run_d"),
        ignoreNulls = true).over(w))
    // per-segment summary: total delta + state at the segment's last anchor
    val segSum = inSeg.groupBy($"channel", $"seg")
      .agg(sum($"d").as("tot_d"),
        max(when($"av".isNotNull,
          struct($"ts_us", $"ro", $"tb", $"a_val", $"a_run"))).as("lastA"))
    val wSeg = Window.partitionBy("channel").orderBy("seg")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = segSum
      .withColumn("cum_tot", sum($"tot_d").over(wSeg))
      // absolute value at segment end, propagated from the latest
      // anchored segment: base + deltas of the anchor-free segments since
      .withColumn("base", last(when($"lastA".isNotNull,
        $"lastA.a_val" + ($"tot_d" - $"lastA.a_run")), ignoreNulls = true).over(wSeg))
      .withColumn("cum_at_base", last(when($"lastA".isNotNull, $"cum_tot"),
        ignoreNulls = true).over(wSeg))
      .withColumn("seg_end_abs", $"base" + ($"cum_tot" - $"cum_at_base"))
      .withColumn("carry_in", lag($"seg_end_abs", 1).over(
        Window.partitionBy("channel").orderBy("seg")))
      .select($"channel", $"seg", $"carry_in")
    inSeg.join(carry, Seq("channel", "seg"))
      .withColumn("abs0",
        coalesce($"a_val" + ($"run_d" - $"a_run"), $"carry_in" + $"run_d"))
      .select($"channel", $"ts_us", $"is_reg".as("is_register"), $"tb", $"v",
        when($"is_reg", $"v")
          .when($"v".isNotNull, pmod($"abs0", lit(twoPow32)))
          .otherwise(lit(null).cast("long")).as("abs"))
  }

  /** Value-at-time / as-of lookup (`etsdVAT` etsdQuery.c:206-215 — the
    * reference's is stub-quality; we implement the documented intent):
    * for each channel, the latest sample at or before `t`.
    * Deterministic tie-break via (ts, tieBreak) struct-max.
    * Output: channel, ts_us, value_at. */
  def valueAtTime(df: DataFrame, chan: Column, ts: Column, value: Column,
                  tieBreak: Column, t: Column): DataFrame = {
    df.filter(ts <= t)
      .groupBy(chan.as("channel"))
      .agg(max(struct(unix_micros(ts).as("t"), tieBreak.as("tb"),
        value.as("v"))).as("s"))
      .select($"channel", $"s.t".as("ts_us"), $"s.v".as("value_at"))
  }

  /** General as-of join (SURVEY.md §2.3 — the reference's `etsdVAT` point
    * lookup generalized to a keyed table join): each left row picks the
    * latest right row with `rightTs <= leftTs` for the same key.
    *
    * Shape: union + running `last` over a window keyed by the join key —
    * ONE shuffle on the key, no range-join pair explosion. Right-row ties
    * at the same timestamp resolve by the deterministic `rTb` tie-break.
    * Scale note: the window partitions by the real join key (user/device/
    * series id — high cardinality), not a low-cardinality channel, so
    * per-task history stays bounded by one key's rows.
    * Output: k, lid, l_ts_us, r_ts_us, r_tb, r_val (nulls when no right
    * row precedes the left row). */
  def asofJoin(left: DataFrame, lKey: Column, lTs: Column, lId: Column,
               right: DataFrame, rKey: Column, rTs: Column, rTb: Column,
               rVal: Column): DataFrame = {
    val r = right.select(rKey.as("k"), unix_micros(rTs).as("t"),
      lit(0).as("side"), rTb.as("rtb"), rVal.as("rv"))
    val l = left.select(lKey.as("k"), unix_micros(lTs).as("t"),
      lit(1).as("side"), lId.as("lid"))
    val w = Window.partitionBy("k").orderBy("t", "side", "rtb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l, allowMissingColumns = true)
      .withColumn("m", last(when($"side" === 0,
        struct($"t".as("rt"), $"rtb", $"rv")), ignoreNulls = true).over(w))
      .filter($"side" === 1)
      .select($"k", $"lid", $"t".as("l_ts_us"),
        $"m.rt".as("r_ts_us"), $"m.rtb".as("r_tb"), $"m.rv".as("r_val"))
  }

  /** The planned kitchen-sink single-pass stats struct (`ETSD_KS`,
    * etsdQuery.h:25-55): count, invalid count, min/max/avg/total,
    * time-of-min/max, first/count/conditional-average of over/under
    * threshold crossings — one `agg` pass, all built-ins. Invalid
    * intervals are counted (`errCnt`) but EXCLUDED from every value
    * statistic, the reference's skip-on-invalid semantics
    * (etsdQuery.c:320-324). Timestamps out as epoch micros; averages as
    * exact-integer ratios over the VALID count. `intervalSec` feeds the
    * struct's per-second triple (etsdQuery.h:40-42: `min/max/ave` per
    * second alongside the per-interval `iMin/iMax/iAve`): each
    * per-interval figure divided by the sampling interval. */
  def kitchenSink(df: DataFrame, chan: Column, ts: Column, value: Column,
                  invalid: Column, over: Double, under: Double,
                  equal: Double = Double.NaN, intervalSec: Long = 1L): DataFrame = {
    val eq = if (equal.isNaN) over else equal // default: crossing the over line
    // a NULL flag means "not invalid" — without the coalesce, three-valued
    // logic would drop the row from the value stats while n_invalid did
    // not count it, skewing the average's denominator
    val inv = coalesce(invalid, lit(false))
    val v = when(!inv, value) // null for invalid rows → aggs skip them
    val tus = unix_micros(ts)
    df.groupBy(chan.as("channel")).agg(
      count(lit(1)).as("n"),
      count_if(inv).as("n_invalid"),
      min(v).as("vmin"),
      max(v).as("vmax"),
      sum(cents(v)).as("tot_c"),
      min(when(v.isNotNull, struct(v.as("v"), tus.as("t")))).as("smin"),
      max(when(v.isNotNull, struct(v.as("v"), tus.as("t")))).as("smax"),
      count_if(v > over).as("n_over"),
      count_if(v < under).as("n_under"),
      // equality in exact cents space — doubles compare reliably there
      count_if(cents(v) === cents(lit(eq))).as("n_equal"),
      min(when(v > over, tus)).as("first_over_us"),
      min(when(v < under, tus)).as("first_under_us"),
      min(when(cents(v) === cents(lit(eq)), tus)).as("first_equal_us"),
      sum(when(v > over, cents(v))).as("over_c"),
      sum(when(v < under, cents(v))).as("under_c"))
    .select($"channel", $"n", $"n_invalid", $"vmin", $"vmax",
      ($"tot_c".cast("double") / 100.0).as("tot"),
      ($"tot_c".cast("double") / ($"n" - $"n_invalid") / 100.0).as("ave"),
      // per-second triple (etsdQuery.h:40-42): interval stats ÷ interval
      ($"vmin" / lit(intervalSec.toDouble)).as("min_ps"),
      ($"vmax" / lit(intervalSec.toDouble)).as("max_ps"),
      ($"tot_c".cast("double") / ($"n" - $"n_invalid") / 100.0 /
        lit(intervalSec.toDouble)).as("ave_ps"),
      $"smin.t".as("t_min_us"), $"smax.t".as("t_max_us"),
      $"n_over", $"n_under", $"n_equal",
      $"first_over_us", $"first_under_us", $"first_equal_us",
      ($"over_c".cast("double") / nullif($"n_over", lit(0)) / 100.0).as("ave_over"),
      ($"under_c".cast("double") / nullif($"n_under", lit(0)) / 100.0).as("ave_under"))
  }

  /** AMT clock-skew correction (etsdQuery.c:384-390): the reference scales
    * the raw total from the span it actually covered to the requested span
    * — `Tot = (Tot·(end−start) + 1) / coveredSec` (its exact integer
    * arithmetic, +1 included) where covered = valid intervals × interval
    * time. Here an "interval" is a tumbling `intervalSec` bucket and a
    * bucket is covered when it has ≥1 valid sample.
    * Output: channel, n_buckets, covered_sec, skew_tot. */
  def skewCorrectedTotal(df: DataFrame, chan: Column, ts: Column, value: Column,
                         valid: Column, startEpoch: Long, endEpoch: Long,
                         intervalSec: Long): DataFrame = {
    val requested = endEpoch - startEpoch
    df.filter(ts >= timestamp_seconds(lit(startEpoch)) &&
        ts < timestamp_seconds(lit(endEpoch)) && valid)
      .groupBy(chan.as("channel"),
        (floor(unix_timestamp(ts) / intervalSec) * intervalSec).cast("long").as("bucket"))
      .agg(sum(cents(value)).as("s_c"))
      .groupBy($"channel")
      .agg(sum($"s_c").as("tot_c"), count(lit(1)).as("n_buckets"))
      .withColumn("covered_sec", $"n_buckets" * intervalSec)
      // integer DIV keeps the big product exact (cents × seconds overflows
      // the double mantissa at scale); divide to double only at the end
      .selectExpr("channel", "n_buckets", "covered_sec",
        s"CAST((tot_c * $requested + 1) DIV covered_sec AS DOUBLE)/100.0 AS skew_tot")
  }

  /** Missed-interval average backfill (etsdSave.c:394-402,445-459): when a
    * source misses k intervals and then recovers with an accumulated delta,
    * the reference writes delta/(1+k) into each missed slot and the current
    * one. Batch form: bucket the stream, and for every present bucket with
    * k empty buckets since the previous present one, emit k+1 rows carrying
    * the averaged value.
    * Output: channel, bucket_epoch, filled_value, is_backfill. */
  def gapFillAverage(df: DataFrame, chan: Column, ts: Column, value: Column,
                     intervalSec: Long): DataFrame = {
    val w = Window.partitionBy("channel").orderBy("bucket")
    df.groupBy(chan.as("channel"),
        (floor(unix_timestamp(ts) / intervalSec) * intervalSec).cast("long").as("bucket"))
      .agg(sum(cents(value)).as("s_c"))
      .withColumn("prev", lag($"bucket", 1).over(w))
      .withColumn("gap",
        when($"prev".isNull, lit(0L))
          // buckets are exact multiples of intervalSec → exact long division
          .otherwise((($"bucket" - $"prev") / intervalSec).cast("long") - 1))
      // give-up cap (etsdSave.c:450-453, mirrored by the encoder and
      // counterDeltas): past 255 missed intervals the baseline is
      // abandoned — the bucket re-enters unaveraged with NO backfill,
      // instead of one row exploding into millions of fill rows
      .withColumn("missed", when($"gap" > 255L, lit(0L)).otherwise($"gap"))
      .select($"channel", $"bucket", $"s_c", $"missed",
        explode(sequence(lit(0L), $"missed")).as("i"))
      .select($"channel",
        ($"bucket" - $"i" * intervalSec).as("bucket_epoch"),
        // exact: integer cents divided once; same op order in any engine
        ($"s_c".cast("double") / ($"missed" + 1) / 100.0).as("filled_value"),
        ($"i" > 0).as("is_backfill"))
  }

  /** RRD-style consolidation ladder (edoRRD mirror + RRA ladder,
    * `ECM-1240 storage format 2.txt:126-148`): for each resolution,
    * AVERAGE/MIN/MAX/LAST per tumbling window per channel.
    * Output: resolution_sec, channel, bucket_epoch, n, ave, vmin, vmax, last. */
  def rollupLadder(df: DataFrame, chan: Column, ts: Column, value: Column,
                   tieBreak: Column, resolutions: Seq[Long]): DataFrame = {
    // one scan + one shuffle: aggregate at the finest resolution only, then
    // derive every coarser rung from the finest aggregate (n/sum/min/max/
    // last-struct all compose) — RRA consolidation (`ECM-1240 storage
    // format 2.txt:126-148`) without re-scanning the raw table per rung.
    // Catalyst plans the shared base subtree as one ReusedExchange.
    val sorted = resolutions.sorted
    val finest = sorted.head
    require(sorted.forall(_ % finest == 0),
      "ladder resolutions must be multiples of the finest rung")
    val base = df.groupBy(chan.as("channel"),
        (floor(unix_timestamp(ts) / finest) * finest).cast("long").as("bucket_epoch"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents(value)).as("s_c"),
        min(value).as("vmin"),
        max(value).as("vmax"),
        max(struct(unix_micros(ts).as("t"), tieBreak.as("tb"),
          value.as("v"))).as("s"))
    sorted.map { res =>
      val level =
        if (res == finest) base
        else base.groupBy($"channel",
            (floor($"bucket_epoch" / res) * res).cast("long").as("bucket_epoch"))
          .agg(sum($"n").as("n"), sum($"s_c").as("s_c"),
            min($"vmin").as("vmin"), max($"vmax").as("vmax"),
            max($"s").as("s"))
      level.select(lit(res).as("resolution_sec"), $"channel", $"bucket_epoch",
        $"n", ($"s_c".cast("double") / $"n" / 100.0).as("ave"),
        $"vmin", $"vmax", $"s.v".as("last"))
    }.reduce(_ unionByName _)
  }

  /** Statistical outlier detection — the n-sigma rule as a distributed
    * two-pass: per-channel moments (sum, sum-of-squares, count — EXACT
    * partial aggs that collapse map-side; cents cast to DECIMAL(20,0),
    * so Spark's sum widening lands the total at DECIMAL(30,0) and the
    * sum of squares at the DECIMAL(38,0) precision cap — room for 10¹⁸
    * rows of 10¹⁰-cent values, and an overflow past the cap raises
    * in-plan rather than nulling the channel out of flagging (the
    * DuckDB twin sums in HUGEINT, which likewise errors on overflow),
    * then one flag scan against the broadcast per-channel
    * (mu, variance). Mean and variance are single-rounded IEEE doubles
    * derived from the exact integers, so the flag decision (and z
    * itself) is bit-identical across engines and partitionings — the
    * extension of the reference's static threshold predicates
    * (`etsdQuery.h:30-33`) to a data-driven threshold. Channels whose
    * computed variance is ≤ 0 (constant, or a near-constant whose true
    * variance sits below the double's cancellation error) flag nothing —
    * without that guard a tiny negative `vr` would pass EVERY row with
    * z = NaN. Output: channel, ts_us, value, z (flagged rows only). */
  def statOutliers(df: DataFrame, chan: Column, ts: Column, value: Column,
                   nSigma: Double = 3.0): DataFrame = {
    require(nSigma > 0)
    val dec = org.apache.spark.sql.types.DecimalType(20, 0)
    val v = df.filter(value.isNotNull)
      .select(chan.as("channel"), unix_micros(ts).as("ts_us"),
        cents(value).as("vc"))
    val m = v.groupBy($"channel")
      .agg(sum($"vc".cast(dec)).as("s"),
        sum($"vc".cast(dec) * $"vc".cast(dec)).as("sq"),
        count(lit(1)).as("n"))
      // n >= 1 by construction and vc is never null here, so a NULL sum
      // can only be a decimal-overflow marker (non-ANSI Spark nulls the
      // aggregate past the 38-digit cap) — fail loudly like the oracle
      .select($"channel", expr("IF(s IS NULL OR sq IS NULL," +
          " raise_error('graft statOutliers: decimal(38,0) moment-sum" +
          " overflow - pre-scale the input'), s)").as("s"),
        $"sq", $"n")
      .select($"channel", ($"s".cast("double") / $"n").as("mu"),
        ($"sq".cast("double") / $"n" -
          ($"s".cast("double") / $"n") * ($"s".cast("double") / $"n"))
          .as("vr"))
    v.join(broadcast(m), "channel")
      .filter($"vr" > 0 &&
        ($"vc" - $"mu") * ($"vc" - $"mu") > lit(nSigma * nSigma) * $"vr")
      .select($"channel", $"ts_us", ($"vc".cast("double") / 100.0).as("value"),
        (($"vc" - $"mu") / sqrt($"vr")).as("z"))
  }

  /** CUSUM change-point estimation per channel: the time where the
    * cumulative deviation from the channel mean peaks — the classic
    * level-shift detector. Exact integers throughout the heavy path: the
    * running statistic is the prefix sum of `n·vc − T` (value scaled by
    * the channel count minus the channel total), which equals
    * `n · Σ(vc_j − μ)` without ever touching a fractional mean, and the
    * prefix runs through [[counterReconstruct]]'s two-phase segment
    * design — no task materializes a full channel history. The argmax of
    * |S_i| (ties → earliest point) is a per-channel struct max; the
    * reported peak is `S / n / 100` — the mean-deviation CUSUM in value
    * units, one deterministic double division at the very end.
    *
    * The statistic is DECIMAL(20,0)·long capped at DECIMAL(38,0) and
    * its prefix sums at the same 38-digit cap (the DuckDB twin sums in
    * HUGEINT): the worst case grows as n²·deviation — a long would
    * silently wrap at only a few million rows for the very level shifts
    * the detector exists to find. Decimal holds exactly to 10³⁸, and a
    * prefix that overflows past the cap raises in-plan instead of
    * silently dropping out of the argmax.
    * Output: channel, n, change_ts_us, peak. */
  def changePoints(df: DataFrame, chan: Column, ts: Column, value: Column,
                   tieBreak: Column): DataFrame = {
    val v = df.filter(value.isNotNull)
      .select(chan.as("channel"), ts.as("ts"), tieBreak.as("tb"),
        cents(value).as("vc"))
    val m = Pins.pin(v.groupBy($"channel")
      .agg(sum($"vc").as("t"), count(lit(1)).as("n")))
    val dec = org.apache.spark.sql.types.DecimalType(20, 0)
    val rec = counterReconstruct(v.join(broadcast(m), "channel"),
      $"channel", $"ts", $"n".cast(dec) * $"vc" - $"t", $"tb")
    rec.select($"channel", $"ts", $"tb",
        // inputs are non-null, so NULL cum == decimal overflow: loud
        expr("IF(cum IS NULL, raise_error('graft changePoints:" +
          " decimal(38,0) prefix overflow - pre-scale the input'), cum)")
          .as("cum"))
      .groupBy($"channel")
      .agg(max(struct(abs($"cum").as("a"), (-unix_micros($"ts")).as("nt"),
        (-$"tb").as("ntb"), $"cum".as("s"))).as("b"))
      .join(broadcast(m), "channel")
      .select($"channel", $"n", (-$"b.nt").as("change_ts_us"),
        ($"b.s".cast("double") / $"n" / 100.0).as("peak"))
  }

  /** Exact per-channel order statistics (p50/p95/p99-style): the value
    * whose rank is ceil(pct·n/100) under the total order (value,
    * tieBreak). Extends the reference's AMT min/max (etsdQuery.c:
    * 326-331) to arbitrary ranks — the threshold-analytics primitive a
    * static-predicate engine can't express. Ranking runs through the
    * two-phase [[TextAnalysisOps.rankedByRange]] prefix, so one hot
    * channel never serializes into a single window task (the same
    * reason a naive PARTITION BY channel sort is wrong at 100 TB), and
    * the per-channel counts/targets broadcast. NULL values are
    * excluded, like the AMT family. Output: channel, pct, value, n —
    * one row per requested percentile per channel. */
  def percentiles(df: DataFrame, chan: Column, value: Column,
                  tieBreak: Column, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val v = Pins.pin(df.filter(value.isNotNull)
      .select(chan.as("shard"), cents(value).as("vc"), tieBreak.as("tb")))
    val targets = v.groupBy($"shard").agg(count(lit(1)).as("n"))
      .select($"shard", $"n",
        explode(array(pcts.map(p => lit(p)): _*)).as("p"))
      .select($"shard", $"n", $"p", expr("(n * p + 99) DIV 100").as("k"))
    TextAnalysisOps.rankedByRange(v, lit(1L), Seq($"vc", $"tb"))
      .join(broadcast(targets), Seq("shard"))
      .filter($"cum" === $"k")
      .select($"shard".as("channel"), $"p".cast("long").as("pct"),
        ($"vc".cast("double") / 100.0).as("value"), $"n")
  }

  /** Winsorized channel statistics — the robust-preprocessing readout:
    * clip every sample to the channel's [p_lo, p_hi] (type-1 order
    * statistics through the same two-phase rank as [[percentiles]],
    * so a hot channel never serializes into one window task), then the
    * per-channel census: how many samples clipped each side, exact
    * cents totals before/after. The clip bounds are a channel-count
    * table broadcast back — the clip itself is a map-side comparison,
    * no second shuffle of the data.
    * Output: channel, n, n_lo, n_hi, total_raw, total_wins. */
  def winsorizedStats(df: DataFrame, chan: Column, value: Column,
                      tieBreak: Column, pLo: Int, pHi: Int): DataFrame = {
    require(pLo >= 1 && pHi <= 100 && pLo < pHi)
    val bounds = percentiles(df, chan, value, tieBreak, Seq(pLo, pHi))
      .groupBy($"channel")
      .agg(min(when($"pct" === pLo, $"value")).as("lo"),
        min(when($"pct" === pHi, $"value")).as("hi"))
      .select($"channel", round($"lo" * 100).cast("long").as("lo_c"),
        round($"hi" * 100).cast("long").as("hi_c"))
    df.filter(value.isNotNull)
      .select(chan.as("channel"), cents(value).as("vc"))
      .join(broadcast(bounds), "channel")
      .groupBy($"channel")
      .agg(count(lit(1)).as("n"),
        sum(when($"vc" < $"lo_c", 1L).otherwise(0L)).as("n_lo"),
        sum(when($"vc" > $"hi_c", 1L).otherwise(0L)).as("n_hi"),
        sum($"vc").as("raw_c"),
        sum(greatest(least($"vc", $"hi_c"), $"lo_c")).as("wins_c"))
      .select($"channel", $"n", $"n_lo", $"n_hi",
        ($"raw_c".cast("double") / 100.0).as("total_raw"),
        ($"wins_c".cast("double") / 100.0).as("total_wins"))
  }

  /** Time-weighted average over irregular samples — trapezoidal
    * integration per channel: Σ (v_i + v_{i+1})·(t_{i+1} − t_i) /
    * (2·(t_last − t_first)), the honest mean of a signal whose sampling
    * cadence drifts (a plain AVG over-weights bursts; the reference's
    * interval grid sidesteps this only because its cadence is fixed,
    * etsd.c:113-121). The numerator accumulates exactly in
    * DECIMAL(38,0) (cents × µs products overflow a long on big
    * channels; the DuckDB twin sums in HUGEINT), and only the final
    * division is IEEE double, so results are engine- and
    * partitioning-identical. Channels with < 2 samples have no
    * trapezoid and are excluded. Lag runs per channel — bounded by one
    * channel's history, the same shape as every per-channel op here.
    * Output: channel, n, twa. */
  def timeWeightedAvg(df: DataFrame, chan: Column, ts: Column,
                      value: Column, tieBreak: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(20, 0)
    val w = Window.partitionBy($"channel").orderBy($"t", $"tb")
    df.filter(value.isNotNull)
      .select(chan.as("channel"), unix_micros(ts).as("t"),
        cents(value).as("vc"), tieBreak.as("tb"))
      .withColumn("pt", lag($"t", 1).over(w))
      .withColumn("pv", lag($"vc", 1).over(w))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n"),
        sum((($"vc" + $"pv").cast(dec)) * ($"t" - $"pt")).as("num"),
        (max($"t") - min($"t")).as("span"))
      .filter($"n" >= 2)
      .select($"channel", $"n",
        ($"num".cast("double") / 2.0 / $"span" / 100.0).as("twa"))
  }

  /** Per-channel derivative — the PromQL-style `deriv`/`rate` for gauge
    * series: (v_i − v_{i−1}) / (t_i − t_{i−1}) in value units per
    * second at every sample after a channel's first. The division runs
    * on exact cents/µs integers cast once to double with a fixed
    * expression order, so rates are engine-identical. Lag per channel —
    * bounded by one channel's history, like every per-channel op here.
    * Output: channel, ts_us, rate. */
  def derivative(df: DataFrame, chan: Column, ts: Column, value: Column,
                 tieBreak: Column): DataFrame = {
    val w = Window.partitionBy($"channel").orderBy($"t", $"tb")
    df.filter(value.isNotNull)
      .select(chan.as("channel"), unix_micros(ts).as("t"),
        cents(value).as("vc"), tieBreak.as("tb"))
      .withColumn("pt", lag($"t", 1).over(w))
      .withColumn("pv", lag($"vc", 1).over(w))
      .filter($"pt".isNotNull && $"t" > $"pt")
      .select($"channel", $"t".as("ts_us"),
        ((($"vc" - $"pv").cast("double") / 100.0) /
          (($"t" - $"pt").cast("double") / 1000000.0)).as("rate"))
  }

  /** Cross-channel Pearson correlation over aligned time buckets — the
    * "which signals move together" analytic (load vs temperature, …):
    * per-channel bucket totals in exact cents, buckets inner-joined per
    * channel pair (a < b), then one pass of exact integer moment sums
    * widened to DECIMAL(38,0); r is assembled from the moments with a
    * fixed double expression order, so it is bit-identical across
    * engines. Channel-pair count is channels², which for a telemetry
    * deployment (≤63 channels here, per the reference's cap) is tiny —
    * the corpus-sized work is the one bucket aggregation; the pair join
    * runs on channels × buckets rows. Zero-variance pairs are excluded
    * (r undefined). Output: chan_a, chan_b, n, r. */
  def channelCorrelation(df: DataFrame, chan: Column, ts: Column,
                         value: Column, bucketSec: Long): DataFrame = {
    require(bucketSec > 0)
    val dec = org.apache.spark.sql.types.DecimalType(20, 0)
    val b = Pins.pin(df.filter(value.isNotNull)
      .select(chan.as("channel"),
        (floor(unix_micros(ts) / 1000000L / bucketSec) * bucketSec)
          .cast("long").as("bucket"),
        cents(value).as("vc"))
      .groupBy($"channel", $"bucket").agg(sum($"vc").as("x")))
    val r = b.select($"channel".as("chan_b"), $"bucket", $"x".as("y"))
    val m = b.join(r, Seq("bucket")).filter($"channel" < $"chan_b")
      .groupBy($"channel".as("chan_a"), $"chan_b")
      .agg(count(lit(1)).as("n"),
        sum($"x".cast(dec)).as("sx"), sum($"y".cast(dec)).as("sy"),
        sum($"x".cast(dec) * $"y".cast(dec)).as("sxy"),
        sum($"x".cast(dec) * $"x".cast(dec)).as("sxx"),
        sum($"y".cast(dec) * $"y".cast(dec)).as("syy"))
    val nD = $"n".cast("double")
    val (sx, sy) = ($"sx".cast("double"), $"sy".cast("double"))
    val cov = nD * $"sxy".cast("double") - sx * sy
    val vx = nD * $"sxx".cast("double") - sx * sx
    val vy = nD * $"syy".cast("double") - sy * sy
    m.filter(vx > 0.0 && vy > 0.0)
      .select($"chan_a", $"chan_b", $"n", (cov / sqrt(vx * vy)).as("r"))
  }

  /** Ordered funnel analysis — how many users complete step 1, then
    * step 2 STRICTLY AFTER their step 1, … (the product-analytics
    * conversion funnel; out-of-order events don't count, which a plain
    * "did both" semi-join gets wrong). Stage i is one conditional
    * aggregate per user joined back on user_id — every stage's join and
    * groupBy share the same key, so after the first shuffle the chain
    * is co-partitioned; per-user state is one timestamp per stage.
    * Strict `>` means a same-microsecond pair does not convert, on
    * both engines identically. Output: step_idx (1-based), step,
    * n_users — one row per step, monotonically non-increasing. */
  def funnelSteps(df: DataFrame, user: Column, ts: Column, typ: Column,
                  steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps, "distinct steps")
    val base = Pins.pin(df.select(user.as("user_id"),
      unix_micros(ts).as("t"), typ.as("et")))
    val stages = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var cur = base.filter($"et" === steps.head).groupBy($"user_id")
      .agg(min($"t").as("prev_t"))
    stages += cur
    for (s <- steps.tail) {
      cur = base.filter($"et" === s)
        .join(cur, "user_id")
        .filter($"t" > $"prev_t")
        .groupBy($"user_id")
        .agg(min($"t").as("prev_t"))
      stages += cur
    }
    stages.zip(steps).zipWithIndex.map { case ((st, name), i) =>
      st.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step_idx"), lit(name).as("step"),
          $"n_users")
    }.reduce(_ unionByName _)
  }

  /** Linear interpolation onto a fixed grid — the alignment step before
    * cross-series math on irregular samples (the gauge complement of
    * [[valueAtTime]]'s last-before rule): every grid point strictly
    * inside a consecutive-sample pair (pt, t] gets the linearly
    * interpolated value. NARROW by construction: each sample pair
    * explodes exactly the grid points it covers (half-open intervals,
    * so a point lands in one pair; a point equal to a sample time
    * reproduces that sample exactly), so work is O(samples + grid
    * points), never samples × grid. Points before a channel's first
    * sample or after its last are undefined and absent. The fraction
    * and value are a fixed double expression over exact cents/µs longs
    * — engine-identical. Output: channel, grid_us, value. */
  def gridInterpolate(df: DataFrame, chan: Column, ts: Column,
                      value: Column, tieBreak: Column,
                      stepSec: Long): DataFrame = {
    require(stepSec > 0)
    val stepUs = stepSec * 1000000L
    val w = Window.partitionBy($"channel").orderBy($"t", $"tb")
    df.filter(value.isNotNull)
      .select(chan.as("channel"), unix_micros(ts).as("t"),
        cents(value).as("vc"), tieBreak.as("tb"))
      .withColumn("pt", lag($"t", 1).over(w))
      .withColumn("pv", lag($"vc", 1).over(w))
      .filter($"pt".isNotNull && $"t" > $"pt")
      .select($"channel", $"pt", $"pv", $"t", $"vc", explode(expr(
        s"IF(t DIV $stepUs >= pt DIV $stepUs + 1," +
          s" sequence(pt DIV $stepUs + 1, t DIV $stepUs)," +
          " CAST(array() AS ARRAY<BIGINT>))")).as("gi"))
      .select($"channel", ($"gi" * stepUs).as("grid_us"),
        (($"pv".cast("double") + ($"vc" - $"pv").cast("double") *
          (($"gi" * stepUs - $"pt").cast("double") /
            ($"t" - $"pt").cast("double"))) / 100.0).as("value"))
  }

  /** Last-touch attribution — for every `targetType` event, the type of
    * the same user's LATEST strictly-earlier event of any other type
    * (the marketing-attribution readout; `'none'` when the target is
    * the user's first event). One per-user ordered window with an
    * ignore-nulls running last over the preceding frame — state bounded
    * by one user's history — then a tiny count by attributed type.
    * Output: attributed_type, n — one row per source type. */
  def lastTouchAttribution(df: DataFrame, user: Column, ts: Column,
                           typ: Column, targetType: String,
                           tieBreak: Column): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"t", $"tb")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(user.as("user_id"), unix_micros(ts).as("t"), typ.as("et"),
        tieBreak.as("tb"))
      .withColumn("attr", last(
        when($"et" =!= targetType, $"et"), ignoreNulls = true).over(w))
      .filter($"et" === targetType)
      .groupBy(coalesce($"attr", lit("none")).as("attributed_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Cohort retention — the companion readout to [[funnelSteps]]: users
    * bucketed by the period of their FIRST `anchorType` event (the
    * cohort), counted as active in every later period they produce any
    * event in. One per-user anchor aggregate, one (user, period)
    * distinct, then a user-keyed join (co-partitioned with both
    * aggregates) and a tiny (cohort × period) count — nothing
    * corpus-sized ever groups on a non-user key. Periods are
    * `bucketSec` epochs (not calendar-aligned; deterministic).
    * Output: cohort_epoch, bucket_epoch (≥ cohort), n_active. */
  def cohortRetention(df: DataFrame, user: Column, ts: Column, typ: Column,
                      anchorType: String, bucketSec: Long): DataFrame = {
    require(bucketSec > 0)
    val e = Pins.pin(df.select(user.as("user_id"), unix_micros(ts).as("t"),
      typ.as("et")))
    val cohort = e.filter($"et" === anchorType).groupBy($"user_id")
      .agg((floor(min($"t") / 1000000L / bucketSec) * bucketSec)
        .cast("long").as("cohort_epoch"))
    val active = e.select($"user_id",
        (floor($"t" / 1000000L / bucketSec) * bucketSec)
          .cast("long").as("bucket_epoch"))
      .distinct()
    cohort.join(active, "user_id")
      .filter($"bucket_epoch" >= $"cohort_epoch")
      .groupBy($"cohort_epoch", $"bucket_epoch")
      .agg(count(lit(1)).as("n_active"))
  }

  /** Robust outliers — median/MAD flagging, the n-sigma detector's
    * robust sibling ([[statOutliers]]): one wild spike inflates a
    * mean/σ threshold and masks everything after it, while the
    * median/MAD pair ignores any <50% contamination. Median = the
    * ceil(n/2)-th order statistic per channel, MAD = the same statistic
    * over |v − median| — both through the two-phase rank (no hot-channel
    * sort task) — and the flag rule `|v − median| > k·MAD` compares
    * exact cents integers end to end: no doubles anywhere, so
    * cross-engine parity is trivial. Channels with MAD = 0 (≥ half the
    * samples identical) flag nothing, mirroring statOutliers'
    * degenerate-variance guard. Output: channel, ts_us, value, dev_c,
    * mad_c (flagged rows only). */
  def madOutliers(df: DataFrame, chan: Column, ts: Column, value: Column,
                  tieBreak: Column, k: Long = 3L): DataFrame = {
    require(k > 0)
    val v = Pins.pin(df.filter(value.isNotNull)
      .select(chan.as("shard"), unix_micros(ts).as("ts_us"),
        cents(value).as("vc"), tieBreak.as("tb")))
    def medianOf(in: DataFrame, col: Column): DataFrame = {
      val n = in.groupBy($"shard").agg(count(lit(1)).as("n"))
        .select($"shard", expr("(n + 1) DIV 2").as("target"))
      TextAnalysisOps.rankedByRange(in.select($"shard", col.as("m"), $"tb"),
          lit(1L), Seq($"m", $"tb"))
        .join(broadcast(n), "shard")
        .filter($"cum" === $"target")
        .select($"shard", $"m")
    }
    val med = medianOf(v, $"vc").withColumnRenamed("m", "med_c")
    val dev = Pins.pin(v.join(broadcast(med), "shard")
      .withColumn("dev_c", abs($"vc" - $"med_c")))
    val mad = medianOf(dev, $"dev_c").withColumnRenamed("m", "mad_c")
    dev.join(broadcast(mad), "shard")
      .filter($"mad_c" > 0 && $"dev_c" > lit(k) * $"mad_c")
      .select($"shard".as("channel"), $"ts_us",
        ($"vc".cast("double") / 100.0).as("value"), $"dev_c", $"mad_c")
  }

  /** Sliding moving average over bucketed totals — the RRD-style
    * consolidation readout (e.g. "24-hour average at every hour"): one
    * bucket aggregation (cents-exact, map-side partial), then a RANGE
    * frame over the per-channel bucket series, so SPARSE series average
    * over the buckets that exist (a missing hour does not dilute), and
    * frame state is bounded by `windowBuckets` rows. The division is
    * the single double op at the end. Output: channel, bucket_epoch,
    * n_buckets (present buckets in the frame), ma. */
  def movingAverage(df: DataFrame, chan: Column, ts: Column, value: Column,
                    bucketSec: Long, windowBuckets: Int): DataFrame = {
    require(bucketSec > 0 && windowBuckets > 0)
    val b = df.filter(value.isNotNull)
      .select(chan.as("channel"),
        (floor(unix_micros(ts) / 1000000L / bucketSec) * bucketSec)
          .cast("long").as("bucket_epoch"),
        cents(value).as("vc"))
      .groupBy($"channel", $"bucket_epoch").agg(sum($"vc").as("s_c"))
    val w = Window.partitionBy($"channel").orderBy($"bucket_epoch")
      .rangeBetween(-(windowBuckets - 1L) * bucketSec, 0L)
    b.select($"channel", $"bucket_epoch",
      count(lit(1)).over(w).as("n_buckets"),
      (sum($"s_c").over(w).cast("double") /
        count(lit(1)).over(w) / 100.0).as("ma"))
  }

  /** Rolling (windowed) median — the robust smoother a moving average
    * can't be (one spike poisons a mean for `window` rows; the median
    * shrugs it off). Type-1 lower median (rank ⌈n/2⌉) of the last
    * `window` values per channel in (ts, tieBreak) order, computed as a
    * sorted-array order statistic over a bounded ROWS frame — frame
    * state is `window` cents values, never a channel's history, so the
    * task survives any series length; exact integers until the final
    * /100 readout. Output: channel, ts_us, event_id, med. */
  def rollingMedian(df: DataFrame, chan: Column, ts: Column, value: Column,
                    tieBreak: Column, window: Int): DataFrame = {
    require(window > 0)
    val w = Window.partitionBy($"channel").orderBy($"ts_us", $"event_id")
      .rowsBetween(-(window - 1L), 0L)
    df.filter(value.isNotNull)
      .select(chan.as("channel"), unix_micros(ts).as("ts_us"),
        tieBreak.as("event_id"), cents(value).as("vc"))
      .select($"channel", $"ts_us", $"event_id",
        sort_array(collect_list($"vc").over(w)).as("vs"))
      .select($"channel", $"ts_us", $"event_id",
        (element_at($"vs",
            floor((size($"vs") + 1) / 2).cast("int")).cast("double")
          / 100.0).as("med"))
  }

  /** Sessionization — split each key's event stream into sessions at
    * inactivity gaps > `gapSec` (the classic clickstream/telemetry
    * operator; the reference's nearest notion is the block boundary,
    * which is time-aligned rather than activity-aligned). Lag + running
    * flag-sum per key, then one per-session aggregate. The windows are
    * keyed by `key`, so task state is bounded by one key's HISTORY, not
    * the corpus — the honest per-key form (a degenerate key with
    * billions of events would need the two-phase rankedByRange prefix
    * instead; user streams don't have that shape). `tieBreak` makes the
    * order total when timestamps collide, so session indices are
    * deterministic under any partitioning.
    * Output: key, session_idx (1-based per key), start_us, end_us,
    * n_events. */
  def sessionize(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
                 gapSec: Long): DataFrame = {
    require(gapSec > 0)
    val w = Window.partitionBy($"key").orderBy($"ts_us", $"tb")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(key.as("key"), unix_micros(ts).as("ts_us"), tieBreak.as("tb"))
      .withColumn("prev", lag($"ts_us", 1).over(w))
      .withColumn("ns", ($"prev".isNull ||
        $"ts_us" - $"prev" > gapSec * 1000000L).cast("long"))
      .withColumn("session_idx", sum($"ns").over(run))
      .groupBy($"key", $"session_idx")
      .agg(min($"ts_us").as("start_us"), max($"ts_us").as("end_us"),
        count(lit(1)).as("n_events"))
  }

  /** M4 downsampling — the dashboard-rendering reduction (Jugel et al.,
    * VLDB 2014): per (channel, bucket), the first, last, minimum and
    * maximum samples WITH their timestamps, which is exactly the set a
    * line-plot rasterizer needs to draw the bucket pixel-perfectly (an
    * avg-only rollup erases the extremes operators page on). Four
    * struct min/max aggregates in ONE partial-agg pass — map-side
    * combine collapses the corpus, the shuffle carries channels ×
    * buckets rows, no window sort anywhere. Tie-breaks: first/last by
    * (t, tieBreak), min/max by (value, t, tieBreak) — total orders, so
    * the kept samples are engine- and partitioning-independent.
    * Output: channel, bucket_epoch, t_first_us, v_first, t_last_us,
    * v_last, t_min_us, v_min, t_max_us, v_max. */
  def m4Downsample(df: DataFrame, chan: Column, ts: Column, value: Column,
                   tieBreak: Column, bucketSec: Long): DataFrame = {
    require(bucketSec > 0)
    val v = df.filter(value.isNotNull)
      .select(chan.as("channel"),
        (floor(unix_micros(ts) / 1000000L / bucketSec) * bucketSec)
          .cast("long").as("bucket_epoch"),
        unix_micros(ts).as("t"), cents(value).as("vc"), tieBreak.as("tb"))
    v.groupBy($"channel", $"bucket_epoch")
      .agg(min(struct($"t", $"tb", $"vc")).as("f"),
        max(struct($"t", $"tb", $"vc")).as("l"),
        min(struct($"vc", $"t", $"tb")).as("lo"),
        max(struct($"vc", $"t", $"tb")).as("hi"))
      .select($"channel", $"bucket_epoch",
        $"f.t".as("t_first_us"), ($"f.vc".cast("double") / 100.0).as("v_first"),
        $"l.t".as("t_last_us"), ($"l.vc".cast("double") / 100.0).as("v_last"),
        $"lo.t".as("t_min_us"), ($"lo.vc".cast("double") / 100.0).as("v_min"),
        $"hi.t".as("t_max_us"), ($"hi.vc".cast("double") / 100.0).as("v_max"))
  }

  /** Local-maximum (peak) detection: a sample strictly above both its
    * neighbors in the per-channel (t, tieBreak) order, with prominence
    * over the higher neighbor of at least `minDelta` — the alerting
    * primitive behind "did the signal spike?", which threshold
    * predicates (etsdQuery.h:30-33) can't ask because a high plateau
    * isn't a spike. One per-channel lag/lead window (state = 3 rows),
    * exact cents comparisons, so the flagged set is engine-identical;
    * plateau tops (equal neighbors) deliberately don't flag.
    * Output: channel, ts_us, value, prominence (flagged rows only). */
  def peakDetect(df: DataFrame, chan: Column, ts: Column, value: Column,
                 tieBreak: Column, minDelta: Double = 0.0): DataFrame = {
    require(minDelta >= 0)
    val deltaC = math.round(minDelta * 100)
    val w = Window.partitionBy($"channel").orderBy($"t", $"tb")
    df.filter(value.isNotNull)
      .select(chan.as("channel"), unix_micros(ts).as("t"),
        cents(value).as("vc"), tieBreak.as("tb"))
      .withColumn("pv", lag($"vc", 1).over(w))
      .withColumn("nv", lead($"vc", 1).over(w))
      .filter($"pv".isNotNull && $"nv".isNotNull &&
        $"vc" > $"pv" && $"vc" > $"nv" &&
        $"vc" - greatest($"pv", $"nv") >= deltaC)
      .select($"channel", $"t".as("ts_us"),
        ($"vc".cast("double") / 100.0).as("value"),
        (($"vc" - greatest($"pv", $"nv")).cast("double") / 100.0)
          .as("prominence"))
  }

  /** Lag-`lagBuckets` autocorrelation of each channel's bucketed totals —
    * the self-correlation readout that makes [[channelCorrelation]]'s
    * machinery answer "is this series periodic / trending?" (a seasonality
    * probe the reference's AMT verbs cannot express). One bucket
    * aggregation, then a per-channel equi-join of the series against
    * itself shifted by `lagBuckets` (bucket keys are exact epoch longs, so
    * the shift is a join predicate, not a window over the whole series),
    * then the same exact DECIMAL(38,0) moment sums and fixed double
    * Pearson assembly as channelCorrelation — bit-identical across
    * engines. Only consecutive-in-grid pairs correlate; missing buckets
    * drop out of the pair set on both engines identically. Zero-variance
    * channels are excluded (r undefined).
    * Output: channel, n (pairs), r. */
  def autocorrelation(df: DataFrame, chan: Column, ts: Column,
                      value: Column, bucketSec: Long,
                      lagBuckets: Int = 1): DataFrame = {
    require(bucketSec > 0 && lagBuckets > 0)
    val dec = org.apache.spark.sql.types.DecimalType(20, 0)
    val b = Pins.pin(df.filter(value.isNotNull)
      .select(chan.as("channel"),
        (floor(unix_micros(ts) / 1000000L / bucketSec) * bucketSec)
          .cast("long").as("bucket"),
        cents(value).as("vc"))
      .groupBy($"channel", $"bucket").agg(sum($"vc").as("x")))
    val shifted = b.select($"channel",
      ($"bucket" + lagBuckets * bucketSec).as("bucket"), $"x".as("y"))
    val m = b.join(shifted, Seq("channel", "bucket"))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n"),
        sum($"x".cast(dec)).as("sx"), sum($"y".cast(dec)).as("sy"),
        sum($"x".cast(dec) * $"y".cast(dec)).as("sxy"),
        sum($"x".cast(dec) * $"x".cast(dec)).as("sxx"),
        sum($"y".cast(dec) * $"y".cast(dec)).as("syy"))
    val nD = $"n".cast("double")
    val (sx, sy) = ($"sx".cast("double"), $"sy".cast("double"))
    val cov = nD * $"sxy".cast("double") - sx * sy
    val vx = nD * $"sxx".cast("double") - sx * sx
    val vy = nD * $"syy".cast("double") - sy * sy
    m.filter(vx > 0.0 && vy > 0.0)
      .select($"channel", $"n", (cov / sqrt(vx * vy)).as("r"))
  }

  /** Per-channel availability/SLA readout: how many `bucketSec` intervals
    * between a channel's first and last bucket actually carry data, and
    * the longest dead stretch — the monitoring question behind the
    * reference's missed-interval bookkeeping (`MissedUpdate`,
    * etsdSave.c:445-459) asked of the whole archive rather than one
    * block. One distinct-bucket aggregation (map-side partial collapses
    * the corpus to channels × buckets), then a per-channel lag window
    * over the bucket GRID — task state is bounded by one channel's bucket
    * count, never its raw samples. Expected/observed are exact integers;
    * coverage is the one double division. Channels with a single bucket
    * report coverage 1.0 and gap 0.
    * Output: channel, observed, expected, coverage, longest_gap_sec. */
  def uptime(df: DataFrame, chan: Column, ts: Column,
             bucketSec: Long): DataFrame = {
    require(bucketSec > 0)
    val b = df.select(chan.as("channel"),
        (floor(unix_micros(ts) / 1000000L / bucketSec) * bucketSec)
          .cast("long").as("bucket"))
      .groupBy($"channel", $"bucket").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"channel").orderBy($"bucket")
    b.select($"channel", $"bucket",
        ($"bucket" - lag($"bucket", 1).over(w) - bucketSec).as("gap"))
      .groupBy($"channel")
      .agg(count(lit(1)).as("observed"),
        (expr("(max(bucket) - min(bucket))") / bucketSec + 1L)
          .cast("long").as("expected"),
        coalesce(max($"gap"), lit(0L)).as("longest_gap_sec"))
      .select($"channel", $"observed", $"expected",
        ($"observed".cast("double") / $"expected".cast("double"))
          .as("coverage"),
        $"longest_gap_sec")
  }

  /** Exponentially-weighted moving average over bucketed totals with
    * DYADIC weights (decay ½ per bucket over a finite `horizon`): at
    * every present bucket, ewma = Σ s_c(age)·2^(horizon−1−age) /
    * Σ 2^(horizon−1−age) over the present buckets in the lookback. The
    * power-of-two weights are the whole trick: numerator and denominator
    * are exact 128-bit integer sums (DECIMAL(38,0); the DuckDB twin uses
    * HUGEINT), so unlike a float EWMA the result is independent of
    * partitioning and engine — the recursive form is unimplementable as
    * a parallel fold precisely because float decay isn't associative.
    * Each source bucket explodes into its ≤ `horizon` future grid slots
    * (narrow, like [[gridInterpolate]]), one (channel, slot) partial-agg
    * shuffle, then a semi-join back onto present buckets so the readout
    * grid matches the series. Sparse-aware: missing buckets contribute
    * nothing and don't dilute the denominator.
    * Output: channel, bucket_epoch, w_den (present weight mass), ewma. */
  def dyadicEwma(df: DataFrame, chan: Column, ts: Column, value: Column,
                 bucketSec: Long, horizon: Int = 24): DataFrame = {
    require(bucketSec > 0 && horizon > 0 && horizon <= 62)
    val dec = org.apache.spark.sql.types.DecimalType(20, 0)
    val b = Pins.pin(df.filter(value.isNotNull)
      .select(chan.as("channel"),
        (floor(unix_micros(ts) / 1000000L / bucketSec) * bucketSec)
          .cast("long").as("bucket"),
        cents(value).as("vc"))
      .groupBy($"channel", $"bucket").agg(sum($"vc").as("s_c")))
    val contrib = b
      .select($"channel", $"bucket", $"s_c",
        explode(sequence(lit(0), lit(horizon - 1))).as("age"))
      .select($"channel",
        ($"bucket" + $"age".cast("long") * bucketSec).as("bucket"),
        expr(s"shiftleft(CAST(1 AS BIGINT), ${horizon - 1} - age)").as("w"),
        $"s_c")
    val agg = contrib.groupBy($"channel", $"bucket")
      .agg(sum($"s_c".cast(dec) * $"w".cast(dec)).as("num"),
        sum($"w").as("w_den"))
      // inputs non-null ⇒ NULL num is the decimal(38,0) overflow marker
      .select($"channel", $"bucket",
        expr("IF(num IS NULL, raise_error('graft dyadicEwma: decimal" +
          "(38,0) weighted-sum overflow - shrink horizon or pre-scale')," +
          " num)").as("num"),
        $"w_den")
    b.select($"channel", $"bucket")
      .join(agg, Seq("channel", "bucket"))
      .select($"channel", $"bucket".as("bucket_epoch"), $"w_den",
        ($"num".cast("double") / $"w_den".cast("double") / 100.0)
          .as("ewma"))
  }

  /** Seasonal anomalies — [[statOutliers]] with the baseline keyed by
    * phase-of-period (e.g. hour-of-day) instead of the whole channel: a
    * value is anomalous against what this channel USUALLY does at this
    * time of day, the standard shape for diurnal telemetry where a
    * global σ either masks rush-hour structure or flags all of it. Same
    * exact-integer moment sums (DECIMAL(20,0) inputs, 38-digit cap,
    * loud overflow), same single-rounded (μ, σ²) per (channel, phase)
    * broadcast back over one flag scan, same degenerate-variance guard.
    * Phases with fewer than `minN` samples flag nothing (a 2-sample
    * phase would flag both points or neither, pure noise).
    * Output: channel, phase, ts_us, value, z (flagged rows only). */
  def seasonalOutliers(df: DataFrame, chan: Column, ts: Column,
                       value: Column, bucketSec: Long = 3600L,
                       periodSec: Long = 86400L, nSigma: Double = 3.0,
                       minN: Long = 12L): DataFrame = {
    require(bucketSec > 0 && periodSec > 0 && periodSec % bucketSec == 0)
    require(nSigma > 0)
    val dec = org.apache.spark.sql.types.DecimalType(20, 0)
    val v = df.filter(value.isNotNull)
      .select(chan.as("channel"), unix_micros(ts).as("ts_us"),
        ((unix_micros(ts) / 1000000L % periodSec) / bucketSec)
          .cast("long").as("phase"),
        cents(value).as("vc"))
    val m = v.groupBy($"channel", $"phase")
      .agg(sum($"vc".cast(dec)).as("s"),
        sum($"vc".cast(dec) * $"vc".cast(dec)).as("sq"),
        count(lit(1)).as("n"))
      .filter($"n" >= minN)
      .select($"channel", $"phase", expr("IF(s IS NULL OR sq IS NULL," +
          " raise_error('graft seasonalOutliers: decimal(38,0)" +
          " moment-sum overflow - pre-scale the input'), s)").as("s"),
        $"sq", $"n")
      .select($"channel", $"phase",
        ($"s".cast("double") / $"n").as("mu"),
        ($"sq".cast("double") / $"n" -
          ($"s".cast("double") / $"n") * ($"s".cast("double") / $"n"))
          .as("vr"))
    v.join(broadcast(m), Seq("channel", "phase"))
      .filter($"vr" > 0 &&
        ($"vc" - $"mu") * ($"vc" - $"mu") > lit(nSigma * nSigma) * $"vr")
      .select($"channel", $"phase", $"ts_us",
        ($"vc".cast("double") / 100.0).as("value"),
        (($"vc" - $"mu") / sqrt($"vr")).as("z"))
  }
}
