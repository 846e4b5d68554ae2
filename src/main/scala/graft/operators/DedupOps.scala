package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft._
import graft.functions.DetHash

/** Deduplication operators for LLM training-data pipelines: exact
  * (normalize+hash groupBy), MinHash+LSH near-dup (shingle → minhash →
  * band → bucket join — never all-pairs), SimHash fingerprints with banded
  * Hamming pairs, and exact-phrase-bucketed n-gram Jaccard.
  *
  * Scale stance (100 TB): every candidate-pair generator goes through an
  * equality bucket join with a bucket-size cap — the plan contains no
  * cartesian/all-pairs stage, and skewed mega-buckets (a near-constant
  * shingle or band) are dropped by the cap rather than exploding one task.
  * All hashes are [[DetHash]] md5-derived integers, so dedup decisions are
  * reproducible across engines and re-runs.
  */
object DedupOps {

  /** Whitespace-collapsing lowercase normalization shared by all text ops. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** SQL fragment equivalent of [[normText]] for the DuckDB oracle. */
  def normTextSql(e: String): String =
    s"regexp_replace(lower(trim($e)), '\\s+', ' ', 'g')"

  /** Exact duplicate grouping: md5 over normalized text, keep the lowest
    * doc id per group. Single hash-shuffle; the canonical first dedup pass
    * of any corpus pipeline. Output: text_hash, keeper_doc_id, n_docs. */
  def exactDedup(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), md5(normText(text)).as("text_hash"))
      .groupBy($"text_hash")
      .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_docs"))

  /** Per-(doc, distinct 5-char-shingle) 31-bit hashes — the shared base of
    * MinHash and true-Jaccard computation. Output: doc_id, h31 (distinct).
    *
    * The compact (id, norm) projection is spread by doc before the
    * generator: explode multiplies rows ~n_chars×, so parallelism must not
    * depend on the input file layout (a single small parquet file is one
    * partition — and one core doing all the hashing). */
  def shingleHashes(docs: DataFrame, id: Column, text: Column,
                    shingleLen: Int = 5): DataFrame =
    docs.select(id.as("doc_id"), normText(text).as("norm"))
      .repartition($"doc_id")
      .select($"doc_id", explode(expr(
        s"transform(sequence(1, greatest(length(norm)-${shingleLen - 1}, 1)), " +
          s"i -> substring(norm, i, $shingleLen))")).as("sh"))
      .select($"doc_id", DetHash.h31($"sh").as("h31"))
      .distinct()

  /** MinHash signatures: one row per doc with m0..m15 (min of each affine
    * permutation over the doc's shingle-hash set). Bounded state per doc
    * (16 longs) regardless of doc length. */
  def minHashSignatures(sh: DataFrame): DataFrame =
    sh.groupBy($"doc_id")
      .agg(
        min(DetHash.perm(0, $"h31")).as("m0"),
        (1 until DetHash.NumHashes).map(i =>
          min(DetHash.perm(i, $"h31")).as(s"m$i")): _*)

  /** LSH band rows: (doc_id, band, bkey) with bkey a polynomial combine of
    * the band's 4 minhash rows. Docs agreeing on any band collide. */
  def bandRows(mh: DataFrame): DataFrame = {
    val bandStructs = (0 until DetHash.NumBands).map { b =>
      val ms = (0 until DetHash.RowsPerBand).map(i => col(s"m${b * DetHash.RowsPerBand + i}"))
      val key = ms.reduceLeft((acc, m) => acc * 31 + m)
      struct(lit(b).as("band"), key.as("bkey"))
    }
    mh.select($"doc_id", explode(array(bandStructs: _*)).as("bb"))
      .select($"doc_id", $"bb.band".as("band"), $"bb.bkey".as("bkey"))
  }

  /** Candidate pairs from an equality bucket join over (band, bkey), with
    * buckets capped at [2, maxBucket] — the LSH skew guard that keeps any
    * single key from generating a quadratic task. Output: doc_a < doc_b. */
  def candidatePairs(bands: DataFrame, maxBucket: Int): DataFrame = {
    val caps = bands.groupBy($"band", $"bkey").count()
      .filter($"count" >= 2 && $"count" <= maxBucket)
      .select($"band", $"bkey")
    val a = bands.join(caps, Seq("band", "bkey")).select($"band", $"bkey", $"doc_id".as("doc_a"))
    val b = bands.join(caps, Seq("band", "bkey")).select($"band", $"bkey", $"doc_id".as("doc_b"))
    a.join(b, Seq("band", "bkey")).filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
  }

  /** True Jaccard over the candidate pairs only (set semantics on shingle
    * hashes): |A∩B| via an equality join on the hash, sizes joined back.
    * Output: doc_a, doc_b, n_common, jaccard. */
  def trueJaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select($"doc_id".as("doc_a"), $"h31"), "doc_a")
      .join(sh.select($"doc_id".as("doc_b"), $"h31"), Seq("doc_b", "h31"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select($"doc_id".as("doc_a"), $"sz".as("sz_a")), "doc_a")
      .join(sizes.select($"doc_id".as("doc_b"), $"sz".as("sz_b")), "doc_b")
      .select($"doc_a", $"doc_b", $"n_common",
        ($"n_common".cast("double") / ($"sz_a" + $"sz_b" - $"n_common")).as("jaccard"))
  }

  /** MinHash+LSH near-duplicate detection end-to-end: shingle → signature →
    * band bucket join (capped) → exact Jaccard on candidates → threshold.
    * No all-pairs stage anywhere in the plan.
    *
    * The shingle-hash set feeds three consumers (signatures, both Jaccard
    * joins); it is persisted so the md5 explode — the one corpus-sized
    * scan — runs once, which is exactly the "materialize the shingle table
    * first" shape a 100 TB dedup run uses. */
  def minHashDedup(docs: DataFrame, id: Column, text: Column,
                   minJaccard: Double, maxBucket: Int = 20): DataFrame = {
    val sh = shingleHashes(docs, id, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // signatures are one tiny row per doc but feed three join branches in
    // candidatePairs — pin them so each branch reads 16 longs/doc, not the
    // corpus-sized shingle aggregation
    val mh = minHashSignatures(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = candidatePairs(bandRows(mh), maxBucket)
    trueJaccard(cand, sh).filter($"jaccard" >= minJaccard)
  }

  /** 32-bit SimHash fingerprint per doc over whitespace tokens (multiset):
    * bit j of the fingerprint is the sign of sum over tokens of
    * (2*bit_j(h60(token)) - 1). Output: doc_id, simhash. */
  def simHash(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = docs.select(id.as("doc_id"), normText(text).as("norm"))
      .repartition($"doc_id") // explode-wide parallelism (see shingleHashes)
      .select($"doc_id", explode(split($"norm", " ")).as("w"))
      .select($"doc_id", DetHash.h60($"w").as("h"))
    val sums = tok.groupBy($"doc_id").agg(
      bitSum(0).as("s0"), (1 until 32).map(j => bitSum(j).as(s"s$j")): _*)
    val fp = (0 until 32).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select($"doc_id", fp.as("simhash"))
  }

  private def bitSum(j: Int): Column =
    sum(when(shiftright($"h", j).bitwiseAND(1) === 1, 1).otherwise(-1))

  /** Near-dup pairs by SimHash: band the 32-bit fingerprint into 4 bytes,
    * bucket-join docs agreeing on any byte (capped), keep pairs within
    * `maxHamming` bits. Output: doc_a, doc_b, hamming. */
  def simHashPairs(fp: DataFrame, maxHamming: Int, maxBucket: Int = 50): DataFrame = {
    // fp's three consumers below resolve to identical aggregation subtrees
    // that Catalyst de-duplicates via ReusedExchange — pinning it instead
    // measurably hurts (cache materialization blocks the fused plan)
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"), shiftright($"simhash", 8 * b).bitwiseAND(255).as("bkey")))
    val bands = fp.select($"doc_id", $"simhash", explode(array(bandStructs: _*)).as("bb"))
      .select($"doc_id", $"simhash", $"bb.band".as("band"), $"bb.bkey".as("bkey"))
    val caps = bands.groupBy($"band", $"bkey").count()
      .filter($"count" >= 2 && $"count" <= maxBucket).select($"band", $"bkey")
    val a = bands.join(caps, Seq("band", "bkey"))
      .select($"band", $"bkey", $"doc_id".as("doc_a"), $"simhash".as("fp_a"))
    val b = bands.join(caps, Seq("band", "bkey"))
      .select($"band", $"bkey", $"doc_id".as("doc_b"), $"simhash".as("fp_b"))
    a.join(b, Seq("band", "bkey")).filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        bit_count($"fp_a".bitwiseXOR($"fp_b")).cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= maxHamming)
  }

  /** Word n-gram Jaccard near-dup: candidates bucketed by shared exact
    * word-5-gram (capped), similarity = Jaccard of distinct word-3-gram
    * hash sets. Output: doc_a, doc_b, n_common, jaccard. */
  def ngramJaccard(docs: DataFrame, id: Column, text: Column,
                   minJaccard: Double, maxBucket: Int = 20): DataFrame = {
    val words = docs.select(id.as("doc_id"), split(normText(text), " ").as("ws"))
      .filter(size($"ws") >= 5)
      .repartition($"doc_id") // explode-wide parallelism (see shingleHashes)
    def grams(n: Int): DataFrame = words.select($"doc_id", explode(expr(
      s"transform(sequence(1, size(ws)-${n - 1}), i -> concat_ws(' ', " +
        (0 until n).map(k => s"element_at(ws, i+$k)").mkString(", ") + "))")).as("g"))
      .select($"doc_id", DetHash.h31($"g").as("h31")).distinct()
    val buckets = grams(5).select($"doc_id", $"h31".as("bkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val caps = buckets.groupBy($"bkey").count()
      .filter($"count" >= 2 && $"count" <= maxBucket).select($"bkey")
    val a = buckets.join(caps, "bkey").select($"bkey", $"doc_id".as("doc_a"))
    val b = buckets.join(caps, "bkey").select($"bkey", $"doc_id".as("doc_b"))
    val cand = a.join(b, "bkey").filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
    trueJaccard(cand, grams(3)).filter($"jaccard" >= minJaccard)
  }
}
