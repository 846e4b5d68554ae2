package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.DetHash

/** Bounded-memory cardinality sketching (the theta/KMV family) — the
  * "how many distinct X" question asked at a scale where an exact
  * `count(DISTINCT item)` would shuffle every distinct value.
  *
  * The fixed-threshold theta sketch: keep an item iff its 60-bit md5
  * hash falls below `2^(60 − logInvFrac)` — a deterministic
  * 1/2^logInvFrac sample of HASH SPACE (not of rows: all copies of an
  * item share one hash, so a kept item is kept everywhere) — then count
  * the distinct survivors and scale back up. Standard error is
  * ~1/√n_kept, the dial is `logInvFrac`.
  *
  * Why this sketch and not HyperLogLog: the estimate is a pure integer
  * function of md5, so it is bit-identical across engines (the DuckDB
  * oracle reproduces it exactly), partitionings, and re-runs — and the
  * kept-hash SETS are mergeable by plain union, which makes incremental
  * corpus growth a union + re-count, never a re-scan. An engine-native
  * HLL (`approx_count_distinct`) estimates well but reproduces nowhere.
  *
  * Scale shape: one narrow hash projection, the threshold filter drops
  * ~(1 − 1/2^f) of rows BEFORE the only shuffle, and the distinct then
  * runs over ~distinct/2^f survivors with map-side partial dedup.
  * Cited against the reference's fixed per-block `uCnt` valid-sample
  * counting (etsd.h:104-117) — counting is the one statistic it keeps
  * per block; this is the corpus-scale generalization. */
object SketchOps {

  /** The sketch STATE: the distinct sub-threshold hashes per group.
    * This is what a 100 TB deployment persists — two states merge by
    * plain union-distinct ([[mergeKept]]), so growing the corpus never
    * re-scans history. Output: grp, h. */
  def thetaKept(df: DataFrame, group: Column, item: Column,
                logInvFrac: Int, salt: String = "theta:"): DataFrame = {
    require(logInvFrac >= 0 && logInvFrac < 60)
    val thr = 1L << (60 - logInvFrac)
    df.select(group.as("grp"),
        DetHash.h60(concat(lit(salt), item)).as("h"))
      .filter($"h" < thr)
      .distinct()
  }

  /** Merge sketch states (same logInvFrac/salt required): union +
    * distinct — a kept hash is kept in any superset corpus, so the
    * merged state equals the state of the combined corpus exactly. */
  def mergeKept(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _).distinct()

  /** The estimate readout over a sketch state from [[thetaKept]]. */
  def thetaEstimate(kept: DataFrame, logInvFrac: Int): DataFrame =
    kept.groupBy($"grp")
      .agg(count(lit(1)).as("n_kept"))
      .select($"grp", $"n_kept",
        ($"n_kept" * (1L << logInvFrac)).as("est_distinct"))

  /** Per-group theta-sketch distinct estimate (build + readout in one).
    * Output: grp, n_kept (exact distinct survivors), est_distinct
    * (= n_kept · 2^logInvFrac, the cardinality estimate). Groups whose
    * survivors are empty are absent (their estimate is 0 with the same
    * confidence). */
  def thetaDistinct(df: DataFrame, group: Column, item: Column,
                    logInvFrac: Int = 10,
                    salt: String = "theta:"): DataFrame =
    thetaEstimate(thetaKept(df, group, item, logInvFrac, salt), logInvFrac)

  // ---- quantile sketch (KMV row-sample order statistics) ----

  /** The quantile-sketch STATE: a deterministic 1/2^logInvFrac
    * hash-space sample of ROWS — keep a row iff the 60-bit md5 of its
    * unique `key` falls under the threshold — carrying the sampled
    * integer `value`. Output: grp, h, v.
    *
    * Same merge algebra as [[thetaKept]]: a row kept in any corpus part
    * is kept in every superset, so two states over disjoint parts merge
    * by plain union (+ distinct for idempotence under re-ingest), and
    * growing the corpus is a union + re-read, never a re-scan. Unlike
    * engine-native `approx_percentile` (a GK/KLL sketch whose output
    * depends on merge order and engine internals), the readout is a
    * pure integer function of md5 — bit-identical in the DuckDB oracle,
    * across partitionings, and across re-runs. */
  def quantileKept(df: DataFrame, group: Column, key: Column,
                   value: Column, logInvFrac: Int,
                   salt: String = "qsk:"): DataFrame = {
    require(logInvFrac >= 0 && logInvFrac < 60)
    val thr = 1L << (60 - logInvFrac)
    df.select(group.as("grp"),
        DetHash.h60(concat(lit(salt), key.cast("string"))).as("h"),
        value.cast("long").as("v"))
      .filter($"h" < thr)
      .distinct()
  }

  /** Merge quantile-sketch states (same logInvFrac/salt required). */
  def mergeQuantileKept(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _).distinct()

  /** Readout: type-1 (lower) order statistics of the sampled values at
    * the given percentiles — rank ⌈n·p/100⌉ over the sorted sample, the
    * same rank rule as [[TimeSeriesOps.percentiles]], in exact integer
    * arithmetic. The per-group `collect_list` is safe BY CONSTRUCTION:
    * the sketch state holds ~rows/2^logInvFrac survivors per group (the
    * accuracy/memory dial), so the list is bounded no matter the corpus
    * size. Output: grp, n_kept, p<p1>, p<p2>, … */
  def quantileEstimate(kept: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val g = kept.groupBy($"grp")
      .agg(sort_array(collect_list($"v")).as("vs"),
        count(lit(1)).as("n_kept"))
    val cols = $"grp" +: $"n_kept" +: pcts.map { p =>
      // integer ceiling-rank: (n*p + 99) div 100, 1-based element_at
      element_at($"vs",
        floor(($"n_kept" * p + 99L) / 100L).cast("int")).as(s"p$p")
    }
    g.select(cols: _*)
  }

  /** Per-group quantile-sketch estimate (build + readout in one). */
  def quantileSketch(df: DataFrame, group: Column, key: Column,
                     value: Column, pcts: Seq[Int],
                     logInvFrac: Int = 10,
                     salt: String = "qsk:"): DataFrame =
    quantileEstimate(quantileKept(df, group, key, value, logInvFrac, salt),
      pcts)

  // ---- HyperLogLog (fixed-size registers) ----

  /** The HLL STATE: per (group, register) the longest trailing-zero run
    * (+1) seen among hashed items landing in that register — at most
    * 2^b rows per group NO MATTER THE CARDINALITY. That fixed size is
    * exactly what [[thetaKept]] lacks: a theta state grows as
    * ~distinct/2^logInvFrac, so at trillions of distinct items the
    * state itself becomes a dataset, while HLL registers stay a few KB
    * per group forever. The trade is the readout: a bias-corrected
    * float estimate instead of theta's exact scaled count.
    *
    * Determinism note (why this is NOT `approx_count_distinct`): the
    * register index is `h60 mod 2^b` and the run length is an exact
    * integer function of the remaining 60−b hash bits (`bit_count` of
    * the isolated lowest set bit minus one) — both pure md5 integer
    * arithmetic, reproduced bit-for-bit by the DuckDB oracle. Engine-
    * native HLLs hash with engine internals and merge with engine-
    * private register codecs; this one is portable state.
    *
    * Merge ([[mergeHllRegisters]]): per-register MAX — associative,
    * commutative, idempotent, so incremental corpus growth is a
    * register-table upsert, never a re-scan.
    * Output: grp, reg, max_rho. */
  def hllRegisters(df: DataFrame, group: Column, item: Column,
                   b: Int = 10, salt: String = "hll:"): DataFrame = {
    require(b >= 4 && b <= 16, s"register bits must be in [4,16], got $b")
    val m = 1L << b
    val maxRho = 60 - b + 1 // all remaining bits zero
    val h = DetHash.h60(concat(lit(salt), item))
    // NULL items count nothing (policy shared with the dedup family) —
    // without the mouth filter they would land a null register whose
    // null rho skews n_regs vs s_run inconsistently
    df.filter(item.isNotNull)
      .select((h % m).as("reg"), shiftright(h, b).as("w"), group.as("grp"))
      .select($"grp", $"reg",
        when($"w" === 0L, lit(maxRho))
          .otherwise(bit_count($"w".bitwiseAND(-$"w") - 1L) + 1)
          .cast("int").as("rho"))
      .groupBy($"grp", $"reg")
      .agg(max($"rho").as("max_rho"))
  }

  /** Merge HLL register states (same b/salt required): per-register max
    * — the combined state equals the state of the combined corpus. */
  def mergeHllRegisters(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy($"grp", $"reg").agg(max($"max_rho").as("max_rho"))

  /** The estimate readout over a register state from [[hllRegisters]]:
    * the standard HLL harmonic mean with the small-range linear-counting
    * correction (Flajolet et al. 2007). The harmonic sum is carried as
    * an EXACT integer (Σ 2^(P−rho) over a 2^P scale, P = 62−b… well
    * inside int64 for b ≥ 4), so on the harmonic branch the only
    * floating-point steps are one division and the final round —
    * bit-reproducible in the oracle. CAVEAT: the linear-counting branch
    * evaluates a transcendental, m·ln(m/v), whose low bits are NOT
    * guaranteed to agree across engines in general; at the gate's b = 10
    * the minimum distance of 1024·ln(1024/v) to a .5 rounding boundary
    * over all v ∈ [1, 1023] is ~6.6e-6 (≫ any plausible ulp drift in a
    * correctly-rounded-ish ln), so the rounded estimate is stable there.
    * A different b moves those margins — re-verify the sweep (or assert
    * the margin) before relying on cross-engine hash equality at new b.
    * Output: grp, n_regs (non-empty registers), est_distinct. */
  def hllEstimate(regs: DataFrame, b: Int): DataFrame = {
    val m = 1L << b
    val p = hllScaleBits(b)
    val num = hllNumerator(b)
    regs.groupBy($"grp")
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $p - max_rho)")).as("s_run"))
      .select($"grp", $"n_regs",
        (lit(m) - $"n_regs").as("v"),
        (lit(num) / ((lit(m) - $"n_regs") * lit(1L << p) + $"s_run")
          .cast("double")).as("raw"))
      .select($"grp", $"n_regs",
        when($"raw" <= 2.5 * m && $"v" > 0L,
            round(lit(m.toDouble) * log(lit(m.toDouble) / $"v")))
          .otherwise(round($"raw"))
          .cast("long").as("est_distinct"))
  }

  /** Per-group HLL distinct estimate (build + readout in one). */
  def hllDistinct(df: DataFrame, group: Column, item: Column,
                  b: Int = 10, salt: String = "hll:"): DataFrame =
    hllEstimate(hllRegisters(df, group, item, b, salt), b)

  /** Harmonic-sum exponent scale: 2^(P − rho) terms with rho ∈ [1,
    * 60−b+1] stay positive-exponent integers. Shared with the SQL
    * oracles so both sides carry the identical exact sum. */
  def hllScaleBits(b: Int): Int = (60 - b + 1) + 1

  /** The readout numerator alpha_m·m²·2^P as ONE double, computed once
    * here and embedded as a literal on BOTH sides (Scala's
    * Double.toString round-trips, so the SQL text parses back to the
    * identical bits — the division is then deterministic everywhere). */
  def hllNumerator(b: Int): Double = {
    val m = (1L << b).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m * math.pow(2.0, hllScaleBits(b))
  }

  // ---- count-min sketch (fixed d×w counters) ----

  /** The CMS STATE: d hash rows × w buckets of plain counts — a fixed
    * d·w-cell table no matter how many distinct items flow through,
    * mergeable by per-cell SUM (so per-partition / per-day states
    * combine without re-scanning). The readout for any item is the MIN
    * of its d bucket counts: always ≥ the true count (every occurrence
    * landed in all d cells), within εN with probability 1−δ for
    * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ (Cormode & Muthukrishnan 2005). Entirely
    * integer md5 arithmetic — the oracle reproduces the ESTIMATES, not
    * just their error bound. Output: j, bucket, cnt. */
  def cmsCounts(df: DataFrame, item: Column, d: Int = 4, w: Int = 512,
                salt: String = "cms"): DataFrame = {
    require(d >= 1 && w >= 2)
    df.filter(item.isNotNull) // NULL items count nothing (dedup-family policy)
      .select(item.cast("string").as("it"))
      .select(explode(array((0 until d).map(lit): _*)).as("j"), $"it")
      .select($"j",
        (DetHash.h60(concat(lit(salt), $"j".cast("string"), lit(":"),
          $"it")) % w).as("bucket"))
      .groupBy($"j", $"bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge CMS states (same d/w/salt required): per-cell sum. */
  def mergeCms(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy($"j", $"bucket").agg(sum($"cnt").as("cnt"))

  /** Frequency estimates for a (small, broadcastable) probe set against
    * a CMS state: min over the d rows, 0 for never-seen items (their
    * buckets may be absent from the state — LEFT join + coalesce).
    * Output: it, est_cnt. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, item: Column,
                  d: Int = 4, w: Int = 512,
                  salt: String = "cms"): DataFrame =
    probes.filter(item.isNotNull)
      .select(item.cast("string").as("it")).distinct()
      .select($"it", explode(array((0 until d).map(lit): _*)).as("j"))
      .select($"it", $"j",
        (DetHash.h60(concat(lit(salt), $"j".cast("string"), lit(":"),
          $"it")) % w).as("bucket"))
      .join(cms, Seq("j", "bucket"), "left")
      .groupBy($"it")
      .agg(min(coalesce($"cnt", lit(0L))).as("est_cnt"))

  /** Sliding distinct count — "distinct users in the trailing 24 h, at
    * every hour" — the query mergeable sketches exist for: an EXACT
    * sliding distinct would re-shuffle every window's full item set,
    * but theta states union by construction, so each time bucket keeps
    * its survivor-hash SET once and the window frame merges
    * sketch-sized arrays (array_distinct over ≤ windowBuckets ·
    * n_kept elements — bounded by the sketch dial, never by traffic).
    * The estimate is the same pure-integer md5 readout as
    * [[thetaDistinct]]: bit-identical across engines and re-runs.
    * Output: grp, bucket_epoch, n_kept, est_distinct. */
  def slidingDistinct(df: DataFrame, group: Column, ts: Column,
                      item: Column, bucketSec: Long, windowBuckets: Int,
                      logInvFrac: Int, salt: String = "sd:"): DataFrame = {
    require(bucketSec > 0 && windowBuckets > 0)
    require(logInvFrac >= 0 && logInvFrac < 60)
    val thr = 1L << (60 - logInvFrac)
    val kept = df.select(group.as("grp"),
        (floor(unix_micros(ts) / 1000000L / bucketSec) * bucketSec)
          .cast("long").as("bucket_epoch"),
        DetHash.h60(concat(lit(salt), item.cast("string"))).as("h"))
      .filter($"h" < thr)
      .distinct()
      .groupBy($"grp", $"bucket_epoch")
      .agg(collect_set($"h").as("hs"))
    val w = Window.partitionBy($"grp").orderBy($"bucket_epoch")
      .rangeBetween(-(windowBuckets - 1L) * bucketSec, 0L)
    kept.select($"grp", $"bucket_epoch",
        array_distinct(flatten(collect_list($"hs").over(w))).as("allh"))
      .select($"grp", $"bucket_epoch",
        size($"allh").cast("long").as("n_kept"),
        (size($"allh").cast("long") * (1L << logInvFrac))
          .as("est_distinct"))
  }
}
