package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft._

/** Range/band joins without an O(n²) stage.
  *
  * Spark has no IEJoin-style range-join operator; a naive
  * `a.join(b, abs(a.v - b.v) <= delta)` plans as BroadcastNestedLoopJoin
  * (all pairs — disqualifying at 100 TB). The standard scale shape,
  * implemented here: quantize the join value into buckets of width
  * `delta`, replicate ONE side into its own and the next bucket, then an
  * ordinary equi shuffle join on (key, bucket) + residual filter. Each
  * matching pair lands in exactly one or two buckets, so the join's
  * partitions are bucket-sized — bounded by data density, never by n². */
object RangeJoinOps {

  /** Exact floor-division bucket, shared with the optimizer rule —
    * see [[graft.functions.ExactBucket]] for why neither double `floor`
    * nor the pmod-subtract form is safe at the extremes. */
  private def bucketOf(v: Column, delta: Long): Column =
    graft.functions.ExactBucket.col(v, delta)

  /** Self band join: unordered pairs of rows agreeing on `key` with
    * `|value_a - value_b| <= delta`, `id_a < id_b`. `delta` must be > 0;
    * values must be integral (compared exactly — pass an integer-scaled
    * column for money to keep the pairing deterministic).
    * Output: key, id_a, id_b, v_a, v_b. */
  def selfBandJoin(df: DataFrame, key: Column, id: Column, value: Column,
                   delta: Long): DataFrame = {
    val base = df.select(key.as("key"), id.as("id"), value.as("v"))
      .withColumn("bucket", bucketOf($"v", delta))
    // replicate the probe side into (bucket, bucket+1): the partner with
    // the equal-or-higher bucket is always found at one of the two
    val probe = base.select($"key", $"id".as("id_a"), $"v".as("v_a"),
        explode(array($"bucket", $"bucket" + 1)).as("bucket"))
    val build = base.select($"key", $"id".as("id_b"), $"v".as("v_b"), $"bucket")
    probe.join(build, Seq("key", "bucket"))
      .filter($"id_a" =!= $"id_b" && abs($"v_a" - $"v_b") <= delta)
      .select($"key",
        least($"id_a", $"id_b").as("id_a"), greatest($"id_a", $"id_b").as("id_b"),
        when($"id_a" < $"id_b", $"v_a").otherwise($"v_b").as("v_a"),
        when($"id_a" < $"id_b", $"v_b").otherwise($"v_a").as("v_b"))
      .distinct()
  }

  /** Interval join: each left row (point `ts`) matched to right rows whose
    * `[start, end)` interval contains it, where intervals are bounded by
    * `maxLen`. Buckets of width `maxLen`: a point's interval starts in the
    * point's own or the previous bucket, so the left side replicates ×2
    * and the join is an ordinary equi join on (key, bucket) + residual —
    * no nested loop. Output: left row + right row (columns prefixed). */
  def intervalJoin(points: DataFrame, pKey: Column, pId: Column, pTs: Column,
                   intervals: DataFrame, iKey: Column, iId: Column,
                   iStart: Column, iEnd: Column, maxLen: Long): DataFrame = {
    val p = points.select(pKey.as("key"), pId.as("p_id"), pTs.as("p_ts"))
      .withColumn("bucket",
        explode(array(bucketOf($"p_ts", maxLen), bucketOf($"p_ts", maxLen) - 1)))
    val iv = intervals.select(iKey.as("key"), iId.as("i_id"),
        iStart.as("i_start"), iEnd.as("i_end"))
      .withColumn("bucket", bucketOf($"i_start", maxLen))
    // each interval lives in exactly one bucket and the two point replicas
    // land in distinct buckets, so every matching pair appears once — no
    // dedup pass needed
    p.join(iv, Seq("key", "bucket"))
      .filter($"p_ts" >= $"i_start" && $"p_ts" < $"i_end" &&
        $"i_end" - $"i_start" <= maxLen)
      .select($"key", $"p_id", $"i_id", $"p_ts", $"i_start", $"i_end")
  }

  /** Salted equi join — the manual skew guard for a fact⋈dimension join
    * whose hottest key overflows one shuffle partition (at 100 TB a
    * single hot customer/domain can hold billions of fact rows, and
    * AQE's skew split only helps the sort-merge stages it can see).
    * The fact side scatters each row into one of `salts` sub-keys by a
    * deterministic row hash; the dimension replicates `salts`×
    * (explode — its row count must tolerate the multiplier, the recipe's
    * stated cost); the join then shuffles on (key, salt), spreading the
    * hot key over `salts` partitions. Result set is identical to the
    * plain join — salting changes the partitioning, never the answer.
    * Output: the joined frame (join key once, then both sides' columns). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factRowId: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val f = fact.withColumn("_salt",
      pmod(graft.functions.DetHash.h60(
        concat(lit("salt:"), factRowId.cast("string"))), lit(salts.toLong)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  /** Bloom-pruned join — the runtime-filter pattern, spelled out: when
    * the dimension side is selective but too big to broadcast-join, its
    * key set still fits a Bloom BITMAP (mBits/8 bytes regardless of row
    * width), so build the bitmap once, ship it to every fact task as a
    * literal, and drop non-matching fact rows BEFORE the join shuffle —
    * the dominant cost at 100 TB is exactly those shuffled-then-
    * discarded rows. The filter is conservative (false positives pass,
    * false negatives impossible), and the inner join behind it removes
    * the survivors' false positives — the answer is the plain join's,
    * bit for bit, which is what the oracle asserts. Driver state is the
    * mBits/64-word bitmap (a constant, like a centroid catalog), never
    * dimension rows. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                      mBits: Int = 1 << 17,
                      numHashes: Int = 3): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0 && numHashes > 0)
    def positions(k: Column): Seq[Column] =
      (0 until numHashes).map(j => pmod(hash(lit(j), k), lit(mBits)))
    val words = dim.select(explode(array(positions(col(key)): _*)).as("bit"))
      .distinct()
      .groupBy(($"bit" / 64).cast("int").as("w"))
      .agg(bit_or(expr("shiftleft(1L, CAST(bit % 64 AS INT))")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bitmap = Array.tabulate(mBits / 64)(i => words.getOrElse(i, 0L))
    val bm = typedLit(bitmap.toSeq)
    val pows = typedLit(Array.tabulate(64)(i => 1L << i).toSeq)
    val member = positions(col(key)).map { p =>
      (element_at(bm, (p / 64).cast("int") + 1)
        .bitwiseAND(element_at(pows, (p % 64).cast("int") + 1))) =!= 0L
    }.reduce(_ && _)
    fact.filter(member).join(dim, key)
  }
}
