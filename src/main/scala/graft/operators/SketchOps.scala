package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
