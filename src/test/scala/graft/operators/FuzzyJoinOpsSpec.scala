package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** FuzzyJoinOps must equal the brute-force all-pairs Levenshtein join —
  * the PassJoin pigeonhole (chunk partitioning + shift window) is only a
  * candidate FILTER, so any false negative is a correctness bug, not an
  * accuracy trade. Exercised across mixed lengths, the short zone
  * (keys ≤ k chars, which cannot host k+1 chunks), over-cap hot pieces,
  * and the k = 0 degenerate (exact join). */
class FuzzyJoinOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Textbook O(nm) DP — the spec's independent ground truth. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Deterministic word-salad corpus with planted near-misses: id →
    * key, lengths from 0 to ~40 chars. */
  private def corpus(n: Int, tag: Int): Seq[(Long, String)] = {
    val words = Seq("spark", "table", "scan", "agg", "row", "key", "a", "")
    (0 until n).map { i =>
      val r = new scala.util.Random(1000L * tag + i)
      val base = Seq.fill(r.nextInt(7))(words(r.nextInt(words.size)))
        .mkString(" ")
      // plant mutated copies of earlier rows so nonzero distances exist
      val s = if (i % 3 == 2 && base.length > 3)
        base.substring(0, base.length - 1) + "#"
      else base
      (i.toLong, s)
    }
  }

  private def run(ls: Seq[(Long, String)], rs: Seq[(Long, String)], k: Int,
                  maxBucket: Int = 50): Set[(Long, Long, Long)] = {
    import spark.implicits._
    graft.Pins.scoped {
      FuzzyJoinOps.editDistanceJoin(
          ls.toDF("id", "k"), $"id", $"k",
          rs.toDF("id", "k"), $"id", $"k", k, maxBucket)
        .as[(Long, Long, Long)].collect().toSet
    }
  }

  private def brute(ls: Seq[(Long, String)], rs: Seq[(Long, String)],
                    k: Int): Set[(Long, Long, Long)] =
    (for ((li, lk) <- ls; (ri, rk) <- rs; d = lev(lk, rk) if d <= k)
      yield (li, ri, d.toLong)).toSet

  test("equals brute force across mixed lengths (k = 2)") {
    val ls = corpus(60, tag = 1)
    val rs = corpus(60, tag = 1).map { case (i, s) => (i + 1000, s) } ++
      corpus(30, tag = 2).map { case (i, s) => (i + 2000, s) }
    val got = run(ls, rs, k = 2)
    val want = brute(ls, rs, k = 2)
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.exists(_._3 == 1L) && want.exists(_._3 == 2L),
      "fixture must exercise nonzero distances")
  }

  test("short zone: keys of length <= k pair correctly") {
    val ls = Seq((1L, ""), (2L, "ab"), (3L, "abcd"), (4L, "xyzzy"))
    val rs = Seq((10L, ""), (11L, "a"), (12L, "ab"), (13L, "abc"))
    val got = run(ls, rs, k = 2)
    assert(got == brute(ls, rs, k = 2), got)
    assert(got.contains((1L, 11L, 1L)) && got.contains((3L, 12L, 2L)))
  }

  test("over-cap hot piece: probe replication keeps recall exact") {
    // every key shares the same first chunk ("aaaaaaaaaa…"), so the
    // (L, 0, piece) bucket holds the whole corpus — far over a cap of 2.
    // The index splits, the probe replicates, and the result must still
    // equal brute force (a true pair may share ONLY that hot chunk).
    val ls = (0 until 24).map(i => (i.toLong, "aaaaaaaaaaaa" + ('b' + i % 6).toChar))
    val rs = (0 until 24).map(i => (100L + i, "aaaaaaaaaaaa" + ('b' + (i + 1) % 6).toChar))
    val got = run(ls, rs, k = 1, maxBucket = 2)
    assert(got == brute(ls, rs, k = 1), got)
  }

  test("k = 0 degenerates to the exact equality join") {
    val ls = Seq((1L, "same"), (2L, "other"))
    val rs = Seq((10L, "same"), (11L, "Same"))
    assert(run(ls, rs, k = 0) == Set((1L, 10L, 0L)))
  }

  test("non-ASCII keys: distances are codepoint-based, not byte-based") {
    // Spark's levenshtein counts CODEPOINTS ('héllo' vs 'hello' = 1);
    // DuckDB's counts BYTES (= 2 there), so the SQL oracle only agrees
    // on ASCII keys — the gate corpus is ASCII, and this pins the
    // ENGINE's (correct) semantics so a drift in either direction
    // fails loudly. The PassJoin chunking must also slice by codepoint
    // (substr does), or a chunk boundary inside a multibyte char would
    // break candidate generation.
    val ls = Seq((1L, "héllo wörld abc"), (2L, "日本語のテキスト例"))
    val rs = Seq((10L, "hello world abc"), (11L, "日本語のテキスト丁"))
    val got = run(ls, rs, k = 2)
    assert(got == brute(ls, rs, k = 2), got) // scala String DP == codepoints
    assert(got.contains((1L, 10L, 2L)) && got.contains((2L, 11L, 1L)), got)
  }

  test("persisted chunk index: parquet round-trip serves identical pairs") {
    // the production linkage shape: the right side exists only as its
    // buildChunkIndex parquet; probing it must equal the from-scratch
    // join — and probing with a BATCH (subset of the left side) must
    // equal the full run restricted to that batch, pair for pair (the
    // incrementalDedup parity contract: sub-bucket splits are sized
    // over the index alone, so the probe set can't perturb them)
    import spark.implicits._
    val ls = corpus(60, tag = 4)
    val rs = corpus(60, tag = 4).map { case (i, s) => (i + 1000, s) } ++
      corpus(30, tag = 5).map { case (i, s) => (i + 2000, s) }
    val dir = java.nio.file.Files.createTempDirectory("fuzzyidx").toString
    try {
      graft.Pins.scoped {
        FuzzyJoinOps.buildChunkIndex(rs.toDF("id", "k"), $"id", $"k", 2)
          .write.mode("overwrite").parquet(s"$dir/chunks.parquet")
      }
      val index = spark.read.parquet(s"$dir/chunks.parquet")
      val full = graft.Pins.scoped {
        FuzzyJoinOps.fuzzyJoinWithIndex(index, ls.toDF("id", "k"),
            $"id", $"k", k = 2)
          .as[(Long, Long, Long)].collect().toSet
      }
      assert(full == brute(ls, rs, k = 2),
        s"missing=${(brute(ls, rs, 2) -- full).take(5)}")
      val batchIds = ls.map(_._1).filter(_ % 3 == 0).toSet
      val batch = ls.filter(p => batchIds(p._1))
      val got = graft.Pins.scoped {
        FuzzyJoinOps.fuzzyJoinWithIndex(index, batch.toDF("id", "k"),
            $"id", $"k", k = 2)
          .as[(Long, Long, Long)].collect().toSet
      }
      assert(got == full.filter(p => batchIds(p._1)),
        "indexed batch probe must equal the full run restricted to the batch")
      assert(got.nonEmpty, "fixture must produce batch pairs")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("probing a persisted index with a different k fails loudly") {
    // a k=2 index probed at k=3 splits lengths 4 ways against 3-way
    // pieces — without the in-plan guard this silently loses most
    // pairs, which is worse than any crash on the exact workflow the
    // persisted index exists for (cross-session parquet reuse)
    import spark.implicits._
    val rs = corpus(20, tag = 6).toDF("id", "k")
    val ls = corpus(10, tag = 6).toDF("id", "k")
    val idx = FuzzyJoinOps.buildChunkIndex(rs, $"id", $"k", 2)
    val e = intercept[Exception] {
      graft.Pins.scoped {
        FuzzyJoinOps.fuzzyJoinWithIndex(idx, ls, $"id", $"k", k = 3).count()
      }
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("chunk index built with k=2")), e)
  }

  test("self-join pairs form: unordered, a < b") {
    val c = corpus(40, tag = 3)
    import spark.implicits._
    val got = graft.Pins.scoped {
      FuzzyJoinOps.editDistancePairs(c.toDF("id", "k"), $"id", $"k", 2)
        .as[(Long, Long, Long)].collect().toSet
    }
    val want = (for ((a, ak) <- c; (b, bk) <- c if a < b;
                     d = lev(ak, bk) if d <= 2) yield (a, b, d.toLong)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }
}
