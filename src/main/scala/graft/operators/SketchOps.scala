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
