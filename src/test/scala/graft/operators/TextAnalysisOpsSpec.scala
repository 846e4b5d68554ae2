package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark

/** Corpus-curation text ops on planted fixtures (the driver's synthetic
  * docs have no shared sentences at small sf, so the oracle's 0-row pass
  * is backed by a non-trivial case here). */
class TextAnalysisOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val shared = "this exact boilerplate sentence appears in many documents"
  private val docs = Seq(
    (1L, s"Unique opening words. $shared. More unique tail one."),
    (2L, s"Other beginning here! $shared. Different ending two."),
    (3L, s"$shared. Totally separate content for document three."),
    (4L, "No shared material at all in this one. Truly original."),
    (5L, "tiny doc")).toDF("doc_id", "text")

  test("boilerplate finds the sentence shared across 3 docs") {
    val got = TextAnalysisOps.boilerplate(docs, $"doc_id", $"text", minDocs = 2)
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 3L) // n_docs
    assert(got(0).getLong(2) == 1L) // first_doc
    // threshold above the plant: nothing survives
    assert(TextAnalysisOps.boilerplate(docs, $"doc_id", $"text", minDocs = 4)
      .isEmpty)
  }

  test("piiRedact counts and scrubs URLs, emails, and IPv4 literals") {
    // the fixture corpus is PII-free, so the oracle only proves parity —
    // this is the test that proves DETECTION on real matches
    val d = Seq(
      (1L, "mail me at Bob.Smith+x@Example.org or visit " +
        "https://ex.org/a?b=c@d from 10.0.0.1"),
      (2L, "no pii here at all"),
      (3L, "ips 192.168.1.254 and 8.8.8.8")).toDF("doc_id", "text")
    val got = TextAnalysisOps.piiRedact(d, $"doc_id", $"text")
      .orderBy("doc_id").collect()
    // doc 1: the @ inside the URL is consumed by the URL match (order)
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 1L &&
      got(0).getLong(3) == 1L)
    assert(got(1).getLong(1) == 0L && got(1).getLong(2) == 0L &&
      got(1).getLong(3) == 0L)
    assert(got(2).getLong(3) == 2L)
    // redaction really replaces: the hash equals md5 of the normalized
    // text with every match substituted
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("mail me at <EMAIL> or visit <URL> from <IP>"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0).getString(4) == want)
  }

  test("repetition ratio: 0 for all-distinct grams, high for a loop") {
    val d2 = Seq(
      (1L, "a b c d e f g"),                  // all 5 trigrams distinct
      (2L, "spam spam spam spam spam spam"),  // 1 distinct of 4
      (3L, "x y")).toDF("doc_id", "text")     // <3 words: excluded
    val got = TextAnalysisOps.repetition(d2, $"doc_id", $"text")
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 5L && got(0).getLong(2) == 5L &&
      got(0).getDouble(3) == 0.0)
    assert(got(1).getLong(1) == 4L && got(1).getLong(2) == 1L &&
      got(1).getDouble(3) == 0.75)
  }

  test("shardShuffle: a partition-independent permutation into shards") {
    val ids = (1L to 200L).toDF("doc_id")
    val got = TextAnalysisOps.shardShuffle(ids, $"doc_id", nShards = 4)
      .as[(Long, Long, Long)].collect()
    // a permutation: every id exactly once, shards in range
    assert(got.map(_._1).sorted.toSeq == (1L to 200L))
    assert(got.forall(r => r._2 >= 0 && r._2 < 4))
    // positions are contiguous 1..n within each shard
    got.groupBy(_._2).values.foreach { s =>
      assert(s.map(_._3).sorted.toSeq == (1L to s.length))
    }
    // same result under a different physical layout
    val again = TextAnalysisOps.shardShuffle(
      ids.repartition(7), $"doc_id", nShards = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // it actually shuffles: within-shard order is not id order
    val byPos = got.filter(_._2 == got.head._2).sortBy(_._3).map(_._1)
    assert(byPos.toSeq != byPos.sorted.toSeq)
  }

  test("packSequences: one giant shard — two-phase prefix sum matches " +
       "the brute-force running sum and spans sequence boundaries") {
    // shards = 1 forces everything into a single logical shard: the old
    // single-window form would serialize this into one task; the
    // two-phase form must spread it over range partitions AND still
    // produce the exact running sum
    val docs = (1L to 300L)
      .map(i => (i, ("tok " * (1 + (i % 7)).toInt).trim))
      .toDF("doc_id", "text")
    val got = TextAnalysisOps
      .packSequences(docs, $"doc_id", $"text", budget = 10, shards = 1)
      .select($"doc_id", $"n_tokens", $"start_seq", $"start_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    for ((id, n, seq0, off) <- got) {
      assert(n == 1 + (id % 7), s"doc $id token count")
      assert(seq0 == cum / 10 && off == cum % 10, s"doc $id placement")
      cum += n
    }
    // docs do cross sequence boundaries (GPT-style packing)
    assert(got.exists(r => r._4 + r._2 > 10))
    Pins.releaseAll()
  }

  test("vocabulary: brute-force counts, rank order, cumulative coverage") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "a cat and a dog")).toDF("doc_id", "text")
    val got = TextAnalysisOps.vocabulary(d, $"doc_id", $"text", topN = 4)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // brute force: the=3, a=2, cat=2, dog=2, sat=2, ... ties break by token
    assert(got.map(r => (r._2, r._3)).toSeq ==
      Seq(("the", 3L), ("a", 2L), ("cat", 2L), ("dog", 2L)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // 14 tokens total: cum_pm = cum*1000 div 14
    assert(got.map(_._4).toSeq ==
      Seq(3000L / 14, 5000L / 14, 7000L / 14, 9000L / 14))
  }

  test("bpePairCounts: type-weighted adjacent pairs, brute-forced") {
    val d = Seq(
      (1L, "aab aab ab"),   // types: aab (x2 corpus-wide), ab
      (2L, "aab bb x")).toDF("doc_id", "text") // x: length<2 excluded
    // types: aab wn=3, ab wn=1, bb wn=1
    // pairs: aab -> aa,ab; ab -> ab; bb -> bb
    // => aa=3, ab=3+1=4, bb=1
    val got = TextAnalysisOps.bpePairCounts(d, $"doc_id", $"text", topK = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "ab", 4L), (2L, "aa", 3L), (3L, "bb", 1L)))
  }

  test("bpeEncode equals the iterated min-rank-first GPT-2 encode loop") {
    // independent ground truth: learn the merges by brute-force pair
    // counting, then encode each word with the CLASSIC loop — repeat
    // "find the lowest-rank adjacent pair present, merge all its
    // occurrences left-to-right" until none applies. bpeEncode's single
    // in-rank-order replace sweep must match it exactly (the scaladoc's
    // claim that one sweep reaches the fixpoint for single-char merges).
    val d = Seq(
      (1L, "abab abab banana bandana"),
      (2L, "aaaa abba banana cab"),
      (3L, "ban cab abab aaaa")).toDF("doc_id", "text")
    def typeCounts(corpus: Seq[(Long, String)]): Map[String, Long] =
      corpus.flatMap(_._2.split(" ")).filter(_.length >= 2)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def learnMerges(words: Map[String, Long]): Seq[String] =
      words.toSeq
        .flatMap { case (w, wn) => w.sliding(2).map(_ -> wn) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy { case (p, n) => (-n, p) }
        .take(4).map(_._1)
    val words = typeCounts(d.as[(Long, String)].collect())
    val merges = learnMerges(words)
    def gpt2Encode(w: String, ms: Seq[String] = merges): Seq[String] = {
      var toks = w.map(_.toString).toVector
      var done = false
      while (!done) {
        val present = ms.zipWithIndex.filter { case (m, _) =>
          toks.sliding(2).exists(s =>
            s.length == 2 && s(0) + s(1) == m)
        }
        if (present.isEmpty) done = true
        else {
          val m = present.minBy(_._2)._1
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) + toks(i + 1) == m) {
              out += m; i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
        }
      }
      toks
    }
    val got = TextAnalysisOps.bpeEncode(d, $"doc_id", $"text",
        topK = 4, topWords = 100)
      .as[(Long, String, Long, Long, String)].collect().sortBy(_._1)
    val want = words.toSeq.sortBy { case (w, wn) => (-wn, w) }
      .map { case (w, wn) => (w, wn, gpt2Encode(w)) }
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach {
      case (((rk, w, wn, nToks, enc), (ww, wwn, toks)), i) =>
        assert(rk == i + 1 && w == ww && wn == wwn, s"row $i: $w vs $ww")
        assert(enc == toks.mkString(" "), s"'$w': got '$enc', want $toks")
        assert(nToks == toks.length)
    }
    // fixture strength: an adjacent run (where the naive replace trick
    // diverges from greedy — 'aaaa' must fold to 'aa aa', not 'aa a a')
    // and a word where one merge's consumption blocks another
    val byW = got.map(r => r._2 -> r._5).toMap
    assert(byW("aaaa") == "aa aa", byW)
    assert(byW("banana") == "ba n an a" || byW("banana") == "b an an a",
      byW) // whichever of ba/an ranks first must win the shared 'a'

    // and the corpus-level accounting over the same fixture: per-doc
    // (n_words, n_bpe_tokens) must equal the ground-truth sums, with
    // single-char words counting one token without touching the table
    val ext = d.as[(Long, String)].collect().toSeq :+ (4L, "x abab")
    val cg = TextAnalysisOps.bpeTokenCounts(
        ext.toDF("doc_id", "text"), $"doc_id", $"text", topK = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // merges re-learned over the EXTENDED corpus (the extra doc shifts
    // type counts); the 1-char type 'x' is excluded from the type table
    // and must count one token through the coalesce path
    val extMerges = learnMerges(typeCounts(ext))
    val cWant = ext.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong,
        ws.map(w => if (w.length >= 2) gpt2Encode(w, extMerges).length.toLong
                    else 1L).sum)
    }.sortBy(_._1)
    assert(cg.toSeq == cWant.toSeq,
      s"got ${cg.toSeq} want ${cWant.toSeq}")
  }

  test("bpeLearn: iterated multi-level learning equals a straight-line trainer") {
    // independent ground truth: plain-collections BPE training — each
    // round counts adjacent token pairs over the CURRENT encoding,
    // merges the top pair (count desc, then (a, b)) greedily
    // left-to-right, and repeats. The fixture is engineered so a later
    // round pairs a token an earlier round PRODUCED (the multi-level
    // step the single-level bpePairCounts table cannot express).
    def mergeGreedy(ts: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < ts.length) {
        if (i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += ts(i); i += 1 }
      }
      out.result()
    }
    def refLearn(words: Map[String, Long], rounds: Int)
        : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
      var st = words.map { case (w, n) => w -> (w.map(_.toString).toVector, n) }
      val ms = Seq.newBuilder[(String, String, Long)]
      var r = 0
      var done = false
      while (r < rounds && !done) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
        st.values.foreach { case (ts, n) =>
          ts.sliding(2).filter(_.length == 2).foreach { s =>
            pc((s(0), s(1))) = pc.getOrElse((s(0), s(1)), 0L) + n
          }
        }
        if (pc.isEmpty) done = true
        else {
          val ((a, b), n) = pc.toSeq
            .minBy { case ((pa, pb), pn) => (-pn, pa, pb) }
          ms += ((a, b, n))
          st = st.map { case (w, (ts, wn)) => w -> (mergeGreedy(ts, a, b), wn) }
        }
        r += 1
      }
      (ms.result(), st.map { case (w, (ts, _)) => w -> ts })
    }
    val d = Seq(
      (1L, "the the the then there"),
      (2L, "these those the other then"),
      (3L, "banana bandana the there an and")).toDF("doc_id", "text")
    val words = d.as[(Long, String)].collect().toSeq
      .flatMap(_._2.split(" ")).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rounds = 6
    val (wantMerges, wantEnc) = refLearn(words, rounds)
    assert(wantMerges.length == rounds)
    // the fixture must actually exercise the multi-level step: some
    // learned merge must have a side that is itself a merged token
    assert(wantMerges.exists(m => m._1.length > 1 || m._2.length > 1),
      s"fixture never paired a merged token: $wantMerges")

    val gotMerges = TextAnalysisOps.bpeLearn(d, $"doc_id", $"text", rounds)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(gotMerges.map(r => (r._2, r._3, r._5)).toSeq == wantMerges,
      s"got ${gotMerges.toSeq}\nwant $wantMerges")
    assert(gotMerges.map(r => r._4).toSeq ==
      wantMerges.map(m => m._1 + m._2))
    assert(gotMerges.map(_._1).toSeq == (1L to rounds.toLong))

    // bpeLearnEncode chain-applies the table via applyMerges; the ref
    // final state is the loop's — their equality pins the
    // chain-apply == iterate identity the oracle's e_R rides
    val gotEnc = TextAnalysisOps.bpeLearnEncode(
        d, $"doc_id", $"text", rounds, topWords = 100)
      .as[(Long, String, Long, Long, String)].collect().sortBy(_._1)
    val wantTop = words.toSeq.sortBy { case (w, wn) => (-wn, w) }
    assert(gotEnc.length == wantTop.length)
    gotEnc.zip(wantTop).foreach { case ((rk, w, wn, nToks, enc), (ww, wwn)) =>
      assert(w == ww && wn == wwn, s"rank $rk: $w/$wn vs $ww/$wwn")
      assert(enc == wantEnc(w).mkString(" "), s"'$w': got '$enc'")
      assert(nToks == wantEnc(w).length)
    }

    // corpus accounting under the learned table, with a 1-char word
    // exercising the counts-one-without-touching-the-table path; the
    // extra doc shifts type counts, so the trainer re-learns over the
    // extended corpus exactly as the operator does
    val ext = d.as[(Long, String)].collect().toSeq :+ (4L, "a the banana")
    val extWords = ext.flatMap(_._2.split(" ")).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (_, extEnc) = refLearn(extWords, rounds)
    val cg = TextAnalysisOps.bpeTokenCountsLearned(
        ext.toDF("doc_id", "text"), $"doc_id", $"text", rounds)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val cWant = ext.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong,
        ws.map(w => if (w.length >= 2) extEnc(w).length.toLong else 1L).sum)
    }.sortBy(_._1)
    assert(cg.toSeq == cWant.toSeq, s"got ${cg.toSeq}\nwant $cWant")
  }

  test("applyMerges: a multi-level table pairs merged tokens, non-overlapping") {
    // (a,a) then (aa,aa): 'aaaaa' → 'aa aa a' → 'aaaa a' — the second
    // merge consumes tokens the first produced, and the greedy pass
    // never re-merges a freshly built token as its own left side
    val d = Seq("aaaaa", "aaaa", "aaa").toDF("w")
    val got = d.select(org.apache.spark.sql.functions.array_join(
        TextAnalysisOps.applyMerges(
          org.apache.spark.sql.functions.split($"w", ""),
          Seq(("a", "a"), ("aa", "aa"))), " ").as("enc"))
      .as[String].collect().toSeq
    assert(got == Seq("aaaa a", "aaaa", "aa a"))
  }

  test("blocklistFilter: exact-token hits only, counted") {
    val d = Seq(
      (1L, "totally Fine text"),
      (2L, "contains badword twice badword yes"),
      (3L, "badwordish is NOT a hit"),   // substring must not match
      (4L, "BADWORD normalizes to a hit")).toDF("doc_id", "text")
    val got = TextAnalysisOps.blocklistFilter(d, $"doc_id", $"text",
        Seq("badword")).as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, 2L), (4L, 1L)))
  }

  test("domainStats: hosts extracted, deduped per doc, ranked") {
    val d = Seq(
      (1L, "see https://a.example.org/x and https://a.example.org/y " +
        "plus http://b.net"),          // a.example.org once per doc
      (2L, "another https://a.example.org/z reference"),
      (3L, "no urls at all")).toDF("doc_id", "text")
    val got = TextAnalysisOps.domainStats(d, $"doc_id", $"text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a.example.org", 2L), (2L, "b.net", 1L)))
  }

  test("qualitySample: kept set matches the per-doc hash threshold") {
    val d = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val kept = TextAnalysisOps.qualitySample(d, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    // brute force from the already-tested quality score
    val q = TextAnalysisOps.qualityScore(d, $"doc_id", $"text")
      .select($"doc_id", $"quality").as[(Long, Double)].collect()
    val expect = q.flatMap { case (id, quality) =>
      val pm = math.floor(quality * 1000).toLong
      val h = graft.functions.DetHash.h60Value(s"qs:$id") % 1000
      if (h < pm) Some(id -> pm) else None
    }.toMap
    assert(kept == expect)
    assert(kept.nonEmpty && kept.size < q.length,
      "threshold should keep a strict subset")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunkWindows: geometry, coverage, and short-doc edge cases") {
    val text100 = ("abcdefghij" * 10)
    val d = Seq((1L, text100), (2L, "short"), (3L, "x" * 64), (4L, "y" * 65))
      .toDF("doc_id", "text")
    val got = TextAnalysisOps.chunkWindows(d, $"doc_id", $"text",
        chunkLen = 64, overlap = 16)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // 100 chars, stride 48: windows at 1 (64 chars) and 49 (52 chars)
    assert(got(1L) == Seq(
      (1L, 0L, 1L, 64L, md5hex(text100.substring(0, 64))),
      (1L, 1L, 49L, 52L, md5hex(text100.substring(48)))))
    // shorter than the window: one whole-doc chunk
    assert(got(2L) == Seq((2L, 0L, 1L, 5L, md5hex("short"))))
    // exactly one window
    assert(got(3L).map(c => (c._2, c._3, c._4)) == Seq((0L, 1L, 64L)))
    // one char past: a second window with 17 chars (> overlap new content)
    assert(got(4L).map(c => (c._2, c._3, c._4)) ==
      Seq((0L, 1L, 64L), (1L, 49L, 17L)))
  }

  test("segmentDedup: shared 10-word blocks removed, docs reassembled") {
    val shared = (1 to 10).map(i => s"w$i").mkString(" ") // one full block
    val d = Seq(
      (1L, s"$shared alpha beta"),   // block 0 shared, block 1 = "alpha beta"
      (2L, s"$shared gamma"),        // block 0 shared, block 1 = "gamma"
      (3L, "totally original text"), // untouched
      (4L, shared))                  // nothing survives
      .toDF("doc_id", "text")
    val got = TextAnalysisOps.segmentDedup(d, $"doc_id", $"text",
        segWords = 10, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, md5hex("alpha beta")),
      (2L, 2L, 1L, md5hex("gamma")),
      (3L, 1L, 1L, md5hex("totally original text")),
      (4L, 1L, 0L, md5hex(""))))
  }

  test("spanDedup: an UNALIGNED copied region is still detected " +
      "(content-defined anchors)") {
    // 200-char random-ish region copied at offsets 0 and 37 — a fixed-
    // stride window scheme can never align these; winnowing anchors must
    val rng = new scala.util.Random(11)
    val region = (1 to 200).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val pad = (1 to 37).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val d = Seq(
      (1L, region + "zzz unrelated tail here"),
      (2L, pad + region),
      (3L, "completely different content with no repeats at all, " +
        "long enough to clear the span length threshold easily"))
      .toDF("doc_id", "text")
    val got = TextAnalysisOps.spanDedup(d, $"doc_id", $"text",
        spanLen = 60, anchorMod = 16, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty, "copied region produced no shared anchored span")
    assert(got.forall { case (_, nDocs, nOcc, firstDoc) =>
      nDocs == 2L && nOcc == 2L && firstDoc == 1L })
  }

  test("stratifiedSample: kept set matches the per-stratum hash threshold") {
    val d = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val rates = Map("en" -> 0.5, "fr" -> 1.0, "zh" -> 0.1)
    val kept = TextAnalysisOps.stratifiedSample(d, $"doc_id", $"lang",
        rates, defaultRate = 0.25)
      .as[(String, Long, Long)].collect().map(r => r._2 -> (r._1, r._3)).toMap
    val all = d.select($"doc_id", $"lang").as[(Long, String)].collect()
    val expect = all.flatMap { case (id, lang) =>
      val ppm = math.floor(rates.getOrElse(lang, 0.25) * 1000000).toLong
      val h = graft.functions.DetHash.h60Value(s"strat:$id") % 1000000
      if (h < ppm) Some(id -> (lang, ppm)) else None
    }.toMap
    assert(kept == expect)
    // fr keeps everything; zh keeps a strict minority
    val frAll = all.count(_._2 == "fr")
    assert(kept.values.count(_._1 == "fr") == frAll)
    assert(kept.values.count(_._1 == "zh") < all.count(_._2 == "zh") / 2)
  }

  test("importanceScore: target-domain docs score above the rest") {
    val d = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val imp = TextAnalysisOps.importanceScore(d, $"doc_id", $"text",
        $"lang" === "en")
      .join(d.select($"doc_id", $"lang"), "doc_id")
      .select($"lang" === "en", $"importance")
      .as[(Boolean, Long)].collect()
    val enMean = imp.filter(_._1).map(_._2.toDouble).sum / imp.count(_._1)
    val restMean = imp.filterNot(_._1).map(_._2.toDouble).sum / imp.count(!_._1)
    info(s"mean importance: en=$enMean rest=$restMean")
    // the en-trained target model must prefer en documents — the signal
    // DSIR resampling relies on
    assert(enMean > restMean,
      s"target model does not separate: en=$enMean rest=$restMean")
  }

  test("chunkWindows covers every char: stitching chunks (overlap " +
      "dropped) reproduces the document, for random lengths") {
    val rng = new scala.util.Random(23)
    val docs = (1L to 30L).map { i =>
      val len = 1 + rng.nextInt(400)
      (i, (1 to len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    }
    val d = docs.toDF("doc_id", "text")
    val chunks = TextAnalysisOps.chunkWindows(d, $"doc_id", $"text",
        chunkLen = 64, overlap = 16)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((id, text) <- docs) {
      val cs = chunks(id)
      // stitch: first chunk whole, then each successive chunk minus the
      // chars its start overlaps with what's already covered
      val stitched = cs.map { case (_, _, start, n, _) => (start, n) }
        .foldLeft(("", 0L)) { case ((acc, covered), (start, n)) =>
          val skip = (covered - (start - 1)).max(0L)
          (acc + text.substring((start - 1 + skip).toInt,
            (start - 1 + n).toInt), (start - 1 + n).max(covered))
        }._1
      assert(stitched == text, s"doc $id not covered")
      // every chunk hash is the md5 of its substring
      cs.foreach { case (_, _, start, n, h) =>
        assert(h == md5hex(text.substring((start - 1).toInt,
          (start - 1 + n).toInt)))
      }
    }
  }

  test("segmentDedup with nothing shared keeps every doc intact " +
      "(clean_hash == md5(norm))") {
    val rng = new scala.util.Random(29)
    val docs = (1L to 20L).map { i =>
      val words = (1 to 5 + rng.nextInt(40)).map(_ => s"u${i}w${rng.nextInt(1 << 20)}")
      (i, words.mkString(" "))
    }
    val got = TextAnalysisOps.segmentDedup(docs.toDF("doc_id", "text"),
        $"doc_id", $"text", segWords = 10, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    for (((id, text), (gid, nSegs, nKept, h)) <- docs.zip(got)) {
      assert(id == gid && nSegs == nKept, s"doc $id lost segments")
      assert(h == md5hex(text), s"doc $id reconstruction drifted")
    }
  }

  test("lmScore: hand-computed bigram model over a controlled split") {
    import graft.functions.DetHash
    def bucket(i: Long) = DetHash.h60Value(s"split:$i") % 100
    val pool = (1L to 60L)
    val train = pool.filter(bucket(_) < 80).take(2)
    val eval = pool.filter(bucket(_) >= 80).head
    val d = Seq(
      (train(0), "a b a b"), // bigrams: (a,b) (b,a) (a,b)
      (train(1), "a b c"),   // bigrams: (a,b) (b,c)
      (eval, "a b x"))       // bigrams: (a,b) (b,x)=unseen
      .toDF("doc_id", "text")
    // model: c2(a,b)=3 c2(b,a)=1 c2(b,c)=1; histories c1(a)=3 c1(b)=2
    // p(a,b)=1000000, p(b,a)=500000, p(b,c)=500000
    val got = TextAnalysisOps.lmScore(d, $"doc_id", $"text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(train(0)) == (3L, (1000000L + 500000L + 1000000L) / 3))
    assert(got(train(1)) == (2L, (1000000L + 500000L) / 2))
    assert(got(eval) == (2L, (1000000L + 0L) / 2))
  }

  test("temperatureMix: sqrt(nmin/n) rates, smallest stratum kept whole") {
    // strata of 4, 16, 64 docs: rates 1.0, 0.5, 0.25 exactly (powers of
    // four, so sqrt is exact and the floor boundary is not in play)
    val d = ((1L to 4L).map(i => (i, "small")) ++
      (101L to 116L).map(i => (i, "mid")) ++
      (201L to 264L).map(i => (i, "big"))).toDF("doc_id", "lang")
    val got = Pins.scoped {
      TextAnalysisOps.temperatureMix(d, $"doc_id", $"lang")
        .as[(String, Long, Long)].collect().toSeq
    }
    val ppm = got.groupBy(_._1).map { case (s, rs) => s -> rs.head._3 }
    assert(ppm == Map("small" -> 1000000L, "mid" -> 500000L,
      "big" -> 250000L), ppm)
    // the smallest stratum survives completely; every kept doc matches
    // the salted-hash threshold recomputed scala-side
    assert(got.count(_._1 == "small") == 4)
    val expect = d.as[(Long, String)].collect().filter { case (id, lang) =>
      val p = Map("small" -> 1000000L, "mid" -> 500000L, "big" -> 250000L)(lang)
      graft.functions.DetHash.h60Value(s"tmix:$id") % 1000000 < p
    }.map(_._1).toSet
    assert(got.map(_._2).toSet == expect)
  }

  test("qualityTopP keeps exactly ceil(p% of n) per stratum, best first") {
    val d = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val keepPct = 20
    val got = Pins.scoped {
      TextAnalysisOps.qualityTopP(d, $"doc_id", $"lang", $"text", keepPct)
        .as[(String, Long, Double, Long)].collect().toSeq
    }
    val scores = Pins.scoped {
      TextAnalysisOps.qualityScore(d, $"doc_id", $"text")
        .join(d.select($"doc_id", $"lang"), "doc_id")
        .select($"lang", $"doc_id", $"quality")
        .as[(String, Long, Double)].collect().toSeq
    }
    for ((lang, docs) <- scores.groupBy(_._1)) {
      val keepN = (docs.size * keepPct + 99) / 100
      val expect = docs.sortBy(r => (-r._3, r._2)).take(keepN)
        .zipWithIndex.map { case ((l, id, q), i) => (l, id, q, i + 1L) }
      val kept = got.filter(_._1 == lang).sortBy(_._4)
      assert(kept == expect, s"stratum $lang: kept ${kept.size}, " +
        s"want $keepN of ${docs.size}")
    }
  }
}
