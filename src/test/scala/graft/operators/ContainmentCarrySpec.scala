package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark

/** The `carryMax` byte bound of [[DedupOps.containmentPairs]]: docs whose
  * sampled set exceeds carryMax carry NULL through the bucket self-join
  * and their candidate pairs take the pair-level array-fetch path
  * instead. The predicate is one rule evaluated on the same sampled
  * sets either way, so the three regimes — all-carried, all-fetched,
  * mixed — must emit IDENTICAL pairs. This is what keeps carryMax a pure
  * execution-cost knob (quadratic-shuffle guard for long-document
  * corpora) with zero semantic surface, and the SQL oracle untouched. */
class ContainmentCarrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: org.apache.spark.sql.DataFrame,
                  carryMax: Int): Set[(Long, Long, Long)] =
    Pins.scoped {
      DedupOps.containmentPairs(docs, $"doc_id", $"text",
          minContainment = 0.9, maxBucket = 20, sampleMod = 8,
          carryMax = carryMax)
        .select($"doc_a", $"doc_b", $"n_common")
        .as[(Long, Long, Long)].collect().toSet
    }

  test("all-carried, all-fetched, and mixed paths emit identical pairs") {
    // corpus with containment pairs on both sides of a carryMax=24
    // sampled-size threshold: SHORT hosts (sampled set under the cap)
    // and LONG hosts (over the cap, so their pairs defer to the fetch
    // path in the mixed regime), each containing verbatim fragments
    def words(tag: String, n: Int): String =
      (0 until n).map(j => s"${tag}w$j").mkString(" ")
    val shortHosts = (0 until 6).map(i => (100L + i, words(s"s$i", 25)))
    val longHosts = (0 until 6).map(i => (200L + i, words(s"l$i", 160)))
    val frags = (0 until 6).map(i =>
      (i.toLong, words(s"s$i", 25).split(" ").take(22).mkString(" "))) ++
      (10 until 16).map(i =>
        (i.toLong, words(s"l${i - 10}", 160).split(" ")
          .take(140).mkString(" ")))
    val docs = (shortHosts ++ longHosts ++ frags).toDF("doc_id", "text")

    // sanity: the threshold really does split the corpus in the mixed
    // regime (some docs carried, some deferred)
    val sizes = Pins.scoped {
      DedupOps.shingleHashArrays(docs, $"doc_id", $"text")
        .select(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.expr("filter(hs, h -> h % 8 = 0)")))
        .as[Int].collect()
    }
    val carryMid = 40
    assert(sizes.exists(_ <= carryMid) && sizes.exists(_ > carryMid),
      s"fixture must straddle carryMax=$carryMid, sampled sizes: " +
        sizes.sorted.mkString(","))

    val allCarried = run(docs, carryMax = Int.MaxValue)
    val allFetched = run(docs, carryMax = 0)
    val mixed = run(docs, carryMax = carryMid)
    assert(allCarried.nonEmpty, "fixture produced no containment pairs")
    assert(allFetched == allCarried,
      "fetch path disagrees with carry path")
    assert(mixed == allCarried, "mixed regime disagrees with carry path")
  }
}
