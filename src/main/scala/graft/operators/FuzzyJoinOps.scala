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

  /** All (left, right) pairs with `levenshtein(leftKey, rightKey) ≤ k`.
    * NULL ids/keys are dropped at the mouth (policy shared with the
    * dedup family: a NULL key matches nothing). Ids must uniquely
    * identify keys on each side — the engine-wide `doc_id` contract; a
    * duplicated id with differing keys emits one row per matching KEY
    * pair (same id pair, different dist), since the id no longer names
    * one string. */
  def editDistanceJoin(left: DataFrame, leftId: Column, leftKey: Column,
                       right: DataFrame, rightId: Column, rightKey: Column,
                       k: Int, maxBucket: Int = 50): DataFrame = {
    require(k >= 0, s"edit-distance threshold must be >= 0, got $k")
    require(maxBucket >= 2)
    val l = Pins.pin(left
      .filter(leftId.isNotNull && leftKey.isNotNull)
      .select(leftId.as("lid"), leftKey.as("lk")))
    val r = Pins.pin(right
      .filter(rightId.isNotNull && rightKey.isNotNull)
      .select(rightId.as("rid"), rightKey.as("rk")))

    // ---- main path: PassJoin chunks (right) vs shifted probes (left)
    // (dl = L − |l|, chunk i, shift d) triples feasible under the
    // pigeonhole: |d| indels before the intact chunk, |Δ − d| after
    val combos = for {
      dl <- -k to k; i <- 0 to k; d <- -k to k
      if math.abs(d) + math.abs(-dl - d) <= k
    } yield (dl, i, d)
    val comboArr = array(combos.map { case (dl, i, d) =>
      struct(lit(dl).as("dl"), lit(i).as("i"), lit(d).as("d"))
    }: _*)

    // chunk i of a length-L key: even split, first (L mod (k+1)) chunks
    // one char longer — the ONE boundary formula both sides (and the
    // SQL oracles) share
    def boundaries(len: Column, i: Column): (Column, Column) = {
      val base = (len - pmod(len, lit(k + 1))) / lit(k + 1)
      val rem = pmod(len, lit(k + 1))
      val clen = (base + when(i < rem, 1).otherwise(0)).cast("int")
      val start = (lit(1) + i * base + least(i, rem)).cast("int")
      (start, clen)
    }

    val idx = {
      val withI = r.withColumn("L", length($"rk"))
        .filter($"L" >= k + 1)
        .withColumn("i", explode(array((0 to k).map(lit): _*)))
      val (start, clen) = boundaries($"L", $"i")
      withI.select($"rid", $"L", $"i", $"rk".substr(start, clen).as("piece"))
    }
    val probes = {
      val withC = l.withColumn("mlen", length($"lk"))
        .withColumn("c", explode(comboArr))
        .withColumn("L", ($"mlen" + $"c.dl").cast("int"))
        .filter($"L" >= k + 1)
      val (start, clen) = boundaries($"L", $"c.i")
      val p = (start + $"c.d").cast("int")
      withC
        .filter(p >= 1 && p + clen - lit(1) <= $"mlen")
        .select($"lid", $"L", $"c.i".as("i"), $"lk".substr(p, clen).as("piece"))
        .distinct() // shifted probes of one row can coincide
    }
    // hot pieces: split the index into member-hash sub-buckets and
    // REPLICATE the probe across them (recall-exact; see scaladoc)
    val keys = Seq("L", "i", "piece")
    val counts = Pins.pin(DedupOps.subSizedCounts(idx, keys,
      "fuzzy_join", maxBucket, minCount = 1))
    val idxSub = DedupOps.withSubBucket(idx.join(counts, keys), keys,
      idCol = "rid", prefix = "fz:")
    val probeSub = probes.join(counts, keys)
      .withColumn("sub", explode(sequence(lit(0L), $"nsub" - 1)))
    val candMain = probeSub.join(idxSub, keys :+ "sub")
      .select($"lid", $"rid")

    // ---- short zone: right keys of ≤ k chars match only left keys of
    // length within k of theirs — an equality bucket on LENGTH (a real
    // column, so the optimizer cannot fold it into a nested loop; a
    // constant key here constant-folds `z = z` to `true` and plans a
    // BroadcastNestedLoopJoin)
    val candShort = {
      val rShort = r.filter(length($"rk") <= k)
        .select($"rid", explode(sequence(
          greatest(length($"rk") - k, lit(0)),
          length($"rk") + k)).as("ml"))
      l.filter(length($"lk") <= 2 * k)
        .select($"lid", length($"lk").as("ml"))
        .join(rShort, "ml")
        .select($"lid", $"rid")
    }

    // ---- confirm: banded Levenshtein on the distinct candidates only
    val cand = Pins.pin(candMain.unionByName(candShort).distinct())
    cand
      .join(l.withColumnRenamed("lid", "left_id"),
        cand("lid") === $"left_id")
      .join(r.withColumnRenamed("rid", "right_id"),
        cand("rid") === $"right_id")
      .select($"left_id", $"right_id",
        levenshtein($"lk", $"rk", k).cast("long").as("dist"))
      .filter($"dist" >= 0)
  }

  /** Self-join form for fuzzy dedup: unordered pairs (a < b) within
    * edit distance k over one corpus. */
  def editDistancePairs(df: DataFrame, id: Column, key: Column,
                        k: Int, maxBucket: Int = 50): DataFrame =
    editDistanceJoin(df, id, key, df, id, key, k, maxBucket)
      .filter($"left_id" < $"right_id")
      .select($"left_id".as("doc_a"), $"right_id".as("doc_b"), $"dist")
}
