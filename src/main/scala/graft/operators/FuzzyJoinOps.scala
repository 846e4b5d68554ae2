package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft._

/** Edit-distance (Levenshtein) similarity join — the record-linkage /
  * fuzzy-dedup primitive: all (left, right) pairs whose keys are within
  * edit distance `k`, WITHOUT an all-pairs stage.
  *
  * Candidate generation is the PassJoin pigeonhole (Li, Deng, Feng:
  * "PASS-JOIN: a partition-based method for similarity joins", PVLDB
  * 2011 — public algorithm): split every RIGHT key of length L into
  * k+1 contiguous chunks; if ed(l, r) ≤ k, some chunk of r survives
  * error-free and appears EXACTLY inside l, at a start shifted from its
  * home position by d where |d| + |Δ − d| ≤ k (Δ = |l| − L: at least
  * |d| indels must precede the intact chunk and |Δ − d| must follow).
  * So the LEFT side probes only substrings at those (length-delta,
  * chunk, shift) combinations — a FIXED ≤ (2k+1)·(k+1)² explode factor
  * per row, independent of corpus size — and candidates come from one
  * equality join on (L, chunk, piece). No false negatives: the probe
  * set enumerates every length L within k of |l| and every feasible
  * shift of every chunk.
  *
  * The right side's chunk table is a PERSISTABLE INDEX
  * ([[buildChunkIndex]] → parquet), probed by batches via
  * [[fuzzyJoinWithIndex]] — the production linkage shape at 100 TB: the
  * historical key set is chunked ONCE, and each new batch pays only its
  * own probe explode plus the candidate equality join. Sub-bucket
  * splits are sized over the INDEX alone (the probe side replicates),
  * so an indexed run over a probe batch equals the from-scratch
  * [[editDistanceJoin]] restricted to that batch PAIR FOR PAIR — the
  * same parity contract [[DedupOps.incrementalDedupAgainstIndex]]
  * carries. [[editDistanceJoin]] delegates through the index path, and
  * [[streamingFuzzyLink]] composes the same private probe/chunk/short-
  * zone builders, so all three forms share every line of candidate
  * logic. Each index row records the `k` it was chunked with, and the
  * serving forms assert it in-plan — probing a persisted index with a
  * different threshold fails loudly instead of silently losing pairs.
  *
  * Skew: a hot piece (boilerplate prefix shared by millions of keys)
  * is salted, not dropped — index members of an over-cap (L, chunk,
  * piece) bucket spread into ⌈c/maxBucket⌉ member-hash sub-buckets
  * ([[DedupOps.withSubBucket]], the engine-wide split contract) and the
  * probe side replicates across them, so join volume is unchanged but
  * lands on nsub tasks instead of one. Unlike the LSH/contamination
  * generators (many shared grams per true pair), a true pair here may
  * share exactly ONE error-free chunk, so sub-bucketing BOTH sides
  * independently would lose recall — replication is the only sound cap.
  *
  * Keys shorter than k+1 chars cannot host k+1 non-empty chunks; any
  * match of such a key has length ≤ 2k, so the short zone (right keys
  * ≤ k chars vs left keys ≤ 2k chars) pairs through one constant-key
  * equality bucket — bounded by the zone size, which a corpus of real
  * keys keeps trivial (pre-filter empties upstream if not).
  *
  * The confirm step is Spark's codegen'd banded `levenshtein(l, r, k)`
  * (O(k·|key|) per candidate, early-exit above the threshold), fetched
  * by pair-level joins so the candidate join never carries key text.
  * Distances are CODEPOINT-based (so is the chunk slicing — `substr`
  * counts characters), pinned by `FuzzyJoinOpsSpec`; note DuckDB's
  * `levenshtein` counts BYTES, so SQL oracles agree only on ASCII keys.
  *
  * The reference has no fuzzy matching (channel names resolve by exact
  * substring, etsdQuery.c:69-77); this is part of the training-data
  * extension surface. Output: left_id, right_id, dist (0 ≤ dist ≤ k).
  */
object FuzzyJoinOps {

  /** chunk i of a length-`len` key: even split, first (len mod (k+1))
    * chunks one char longer — the ONE boundary formula the index build,
    * the probe side, and the SQL oracles share. Returns (start, length)
    * in 1-based substr coordinates. */
  private def boundaries(k: Int, len: Column, i: Column): (Column, Column) = {
    val base = (len - pmod(len, lit(k + 1))) / lit(k + 1)
    val rem = pmod(len, lit(k + 1))
    val clen = (base + when(i < rem, 1).otherwise(0)).cast("int")
    val start = (lit(1) + i * base + least(i, rem)).cast("int")
    (start, clen)
  }

  /** The feasible (dl = L − |l|, chunk i, shift d) probe triples under
    * the pigeonhole: |d| indels before the intact chunk, |Δ − d| after.
    * ONE enumeration for every serving form. */
  private def comboArr(k: Int): Column = {
    val combos = for {
      dl <- -k to k; i <- 0 to k; d <- -k to k
      if math.abs(d) + math.abs(-dl - d) <= k
    } yield (dl, i, d)
    array(combos.map { case (dl, i, d) =>
      struct(lit(dl).as("dl"), lit(i).as("i"), lit(d).as("d"))
    }: _*)
  }

  /** Shifted-substring probe rows for a (lid, lk, carry...) left table:
    * lid, carry..., L, i, piece. No dedup here — the batch form
    * distincts (coinciding shifted probes of one row), the streaming
    * form cannot (stateless) and lets the pair dedup absorb them. */
  private def probeRows(base: DataFrame, k: Int,
                        carry: Seq[String]): DataFrame = {
    val withC = base.withColumn("mlen", length($"lk"))
      .withColumn("c", explode(comboArr(k)))
      .withColumn("L", ($"mlen" + $"c.dl").cast("int"))
      .filter($"L" >= k + 1)
    val (start, clen) = boundaries(k, $"L", $"c.i")
    val p = (start + $"c.d").cast("int")
    withC.filter(p >= 1 && p + clen - lit(1) <= $"mlen")
      .select($"lid" +: carry.map(col) :+ $"L" :+ $"c.i".as("i") :+
        $"lk".substr(p, clen).as("piece"): _*)
  }

  /** Exploded (rid[, rk], L, i, piece) view of a chunk index. */
  private def chunkRows(index: DataFrame, k: Int,
                        carryKey: Boolean): DataFrame = {
    val cols = if (carryKey) Seq($"rid", $"rk") else Seq($"rid")
    index.filter($"L" >= k + 1)
      .select(cols :+ $"L" :+ explode($"pieces").as("p"): _*)
      .select(cols :+ $"L" :+ $"p.i".as("i") :+ $"p.piece".as("piece"): _*)
  }

  /** Short-zone side of the index: right keys of ≤ k chars match only
    * left keys of length within k — one (rid[, rk], ml) row per
    * matchable left length, joined on LENGTH (a real column, so the
    * optimizer cannot fold the join into a nested loop; a constant key
    * here would constant-fold `z = z` to `true` and plan a
    * BroadcastNestedLoopJoin). */
  private def shortZone(index: DataFrame, k: Int,
                        carryKey: Boolean): DataFrame = {
    val cols = if (carryKey) Seq($"rid", $"rk") else Seq($"rid")
    index.filter($"L" <= k)
      .select(cols :+ explode(sequence(
        greatest($"L" - k, lit(0)), $"L" + k)).as("ml"): _*)
  }

  /** In-plan guard at the serving mouths: every index row must carry
    * the probe's k. `assert_true` raises at the first mismatched row —
    * a persisted k=2 index probed with k=3 would otherwise chunk
    * lengths 4 ways against 3-way pieces and silently lose most pairs.
    * The filter is row-cheap (one int compare) and cannot be pruned
    * (the predicate is load-bearing). */
  private def kGuard(index: DataFrame, k: Int): DataFrame =
    index.filter(assert_true($"k" === lit(k),
      concat(lit("chunk index built with k="), $"k".cast("string"),
        lit(s", probed with k=$k"))).isNull)

  /** The persistable chunk index over the RIGHT (historical) key set —
    * one row per key carrying everything a later probe batch needs: the
    * key itself (for the banded-Levenshtein confirm), its length, the
    * threshold it was chunked with, and its k+1 PassJoin chunks. This
    * is the table a 100 TB linkage corpus materializes ONCE (parquet)
    * and appends each ingested batch to (rows are independent, so
    * append == rebuild), so [[fuzzyJoinWithIndex]] runs never re-slice
    * the historical keys. Keys shorter than k+1 chars get an empty
    * chunk array and pair through the short zone (they are still index
    * rows — the index is the COMPLETE right side). NULL ids/keys are
    * dropped at the mouth (policy shared with the dedup family: a NULL
    * key matches nothing).
    * Output: rid, rk, L, k, pieces array<struct<i int, piece string>>. */
  def buildChunkIndex(right: DataFrame, rightId: Column, rightKey: Column,
                      k: Int): DataFrame = {
    require(k >= 0, s"edit-distance threshold must be >= 0, got $k")
    val base = right
      .filter(rightId.isNotNull && rightKey.isNotNull)
      .select(rightId.as("rid"), rightKey.as("rk"),
        length(rightKey).as("L"))
    val pieces = array((0 to k).map { i =>
      val (start, clen) = boundaries(k, $"L", lit(i))
      struct(lit(i).as("i"), $"rk".substr(start, clen).as("piece"))
    }: _*)
    // slice-to-empty keeps the element type without a cast: short keys
    // (L ≤ k) carry no chunks, only their (rid, rk, L) short-zone row
    base.select($"rid", $"rk", $"L", lit(k).as("k"),
      when($"L" >= k + 1, pieces).otherwise(slice(pieces, 1, 0)).as("pieces"))
  }

  /** Probe a (typically persisted) [[buildChunkIndex]] table with a
    * batch of left keys — the serving form: per batch, the only
    * index-sized work is the chunk explode feeding the bucket-size
    * count and the candidate equality join; the probe explode, the
    * candidate set, and the confirm are all batch-bounded. Sub-bucket
    * splits are sized over the index ALONE, so the result equals
    * [[editDistanceJoin]] over (batch, full right side) pair for pair —
    * probing with a subset of the left side yields exactly the full
    * run's pairs restricted to that subset. The index must have been
    * built with the same `k` (asserted in-plan per row).
    * Output: left_id, right_id, dist (0 ≤ dist ≤ k). */
  def fuzzyJoinWithIndex(index0: DataFrame,
                         left: DataFrame, leftId: Column, leftKey: Column,
                         k: Int, maxBucket: Int = 50): DataFrame = {
    require(k >= 0, s"edit-distance threshold must be >= 0, got $k")
    require(maxBucket >= 2)
    // index pinned: three consumers (chunk explode → counts + join side,
    // short zone, confirm-side key fetch); probe batch pinned: probe
    // explode + confirm-side key fetch
    val index = Pins.pin(kGuard(index0, k))
    val l = Pins.pin(left
      .filter(leftId.isNotNull && leftKey.isNotNull)
      .select(leftId.as("lid"), leftKey.as("lk")))

    val idx = chunkRows(index, k, carryKey = false)
    val probes = probeRows(l, k, carry = Nil)
      .distinct() // shifted probes of one row can coincide
    // hot pieces: split the index into member-hash sub-buckets and
    // REPLICATE the probe across them (recall-exact; see scaladoc).
    // Counts over the INDEX alone — the probe batch never influences
    // the split, which is what makes indexed == full-run-restricted.
    val keys = Seq("L", "i", "piece")
    val counts = Pins.pin(DedupOps.subSizedCounts(idx, keys,
      "fuzzy_join", maxBucket, minCount = 1))
    val idxSub = DedupOps.withSubBucket(idx.join(counts, keys), keys,
      idCol = "rid", prefix = "fz:")
    val probeSub = probes.join(counts, keys)
      .withColumn("sub", explode(sequence(lit(0L), $"nsub" - 1)))
    val candMain = probeSub.join(idxSub, keys :+ "sub")
      .select($"lid", $"rid")
    val candShort = l.filter(length($"lk") <= 2 * k)
      .select($"lid", length($"lk").as("ml"))
      .join(shortZone(index, k, carryKey = false), "ml")
      .select($"lid", $"rid")

    // ---- confirm: banded Levenshtein on the distinct candidates only
    val cand = Pins.pin(candMain.unionByName(candShort).distinct())
    cand
      .join(l.withColumnRenamed("lid", "left_id"),
        cand("lid") === $"left_id")
      .join(index.select($"rid".as("right_id"), $"rk"),
        cand("rid") === $"right_id")
      .select($"left_id", $"right_id",
        levenshtein($"lk", $"rk", k).cast("long").as("dist"))
      .filter($"dist" >= 0)
  }

  /** STREAMING fuzzy linkage — [[fuzzyJoinWithIndex]] applied at
    * ingest, following [[DedupOps.streamingContamination]]'s
    * stream-static template: arriving keys probe the STATIC chunk index
    * through a stateless equality join, with the banded-Levenshtein
    * confirm in the same projection (the stream row carries its own
    * key, the index row carries rk — no pair-level fetch join, which a
    * stream cannot re-join). A pair matching on several (L, chunk,
    * piece, sub) combos emits identical rows, collapsed by the
    * watermarked pair dedup — so the ONLY streaming state is one row
    * per emitted pair inside the lateness horizon (true links are rare
    * by construction at a sane k). The probe explode is per-row
    * stateless work bounded by the fixed combo factor; the static side
    * (chunk rows, bucket counts, sub-bucket assignment, short zone) is
    * derived ONCE and pinned — the in-memory stand-in for the parquet
    * tables a production pipeline materializes — because a
    * stream-static join re-executes the static plan every micro-batch.
    * No candidate cap is needed on the stream side: per-row fan-out is
    * bounded by the index's sub-bucket structure, and the batch
    * [[fuzzyJoinWithIndex]] over the landed corpus stays the backstop.
    * Candidate construction composes the SAME private builders as the
    * batch form (comboArr/probeRows/chunkRows/shortZone), so the two
    * cannot drift. `stream` must be a streaming DataFrame; `ts` is its
    * event-time. Output: left_id, ts, right_id, dist (0 ≤ dist ≤ k). */
  def streamingFuzzyLink(stream: DataFrame, id: Column, ts: Column,
                         key: Column, index0: DataFrame, k: Int,
                         maxBucket: Int = 50,
                         maxLatenessSec: Long): DataFrame = {
    require(k >= 0, s"edit-distance threshold must be >= 0, got $k")
    require(maxBucket >= 2)
    val index = Pins.pin(kGuard(index0, k))
    val keys = Seq("L", "i", "piece")
    val idx = chunkRows(index, k, carryKey = true)
    val counts = Pins.pin(DedupOps.subSizedCounts(idx, keys,
      "fuzzy_stream", maxBucket, minCount = 1))
    val idxSub = Pins.pin(DedupOps.withSubBucket(idx.join(counts, keys),
      keys, idCol = "rid", prefix = "fz:"))
    val rShort = Pins.pin(shortZone(index, k, carryKey = true))

    // ignore-don't-crash on poison records, the streaming-family policy:
    // a NULL key would NPE in the probe explode, a NULL event time would
    // break the watermarked pair dedup
    val base = stream.filter(id.isNotNull && ts.isNotNull && key.isNotNull)
      .select(id.as("lid"), ts.as("ts"), key.as("lk"))
    // join strategy deliberately left to the planner (no broadcast
    // hints): the pinned static sides carry materialized size stats, so
    // a fixture-scale index auto-broadcasts under the threshold, while
    // a 100 TB historical index — which cannot fit in one executor —
    // plans a shuffled stream-static equi-join instead. Both are
    // stateless; the pin already amortizes per-micro-batch re-execution
    // of the static plan either way.
    val candMain = probeRows(base, k, carry = Seq("ts", "lk"))
      .join(counts, keys)
      .withColumn("sub", explode(sequence(lit(0L), $"nsub" - 1)))
      .join(idxSub, keys :+ "sub")
      .select($"lid", $"ts", $"lk", $"rid", $"rk")
    val candShort = base.filter(length($"lk") <= 2 * k)
      .select($"lid", $"ts", $"lk", length($"lk").as("ml"))
      .join(rShort, "ml")
      .select($"lid", $"ts", $"lk", $"rid", $"rk")
    candMain.unionByName(candShort)
      .select($"lid".as("left_id"), $"ts", $"rid".as("right_id"),
        levenshtein($"lk", $"rk", k).cast("long").as("dist"))
      .filter($"dist" >= 0)
      .withWatermark("ts", s"$maxLatenessSec seconds")
      .dropDuplicatesWithinWatermark("left_id", "right_id")
  }

  /** All (left, right) pairs with `levenshtein(leftKey, rightKey) ≤ k`
    * — the from-scratch form, delegating through [[buildChunkIndex]] +
    * [[fuzzyJoinWithIndex]] with the index derived in-plan. Ids must
    * uniquely identify keys on each side — the engine-wide `doc_id`
    * contract; a duplicated id with differing keys emits one row per
    * matching KEY pair (same id pair, different dist), since the id no
    * longer names one string. */
  def editDistanceJoin(left: DataFrame, leftId: Column, leftKey: Column,
                       right: DataFrame, rightId: Column, rightKey: Column,
                       k: Int, maxBucket: Int = 50): DataFrame =
    fuzzyJoinWithIndex(buildChunkIndex(right, rightId, rightKey, k),
      left, leftId, leftKey, k, maxBucket)

  /** Self-join form for fuzzy dedup: unordered pairs (a < b) within
    * edit distance k over one corpus. */
  def editDistancePairs(df: DataFrame, id: Column, key: Column,
                        k: Int, maxBucket: Int = 50): DataFrame =
    editDistanceJoin(df, id, key, df, id, key, k, maxBucket)
      .filter($"left_id" < $"right_id")
      .select($"left_id".as("doc_a"), $"right_id".as("doc_b"), $"dist")
}
