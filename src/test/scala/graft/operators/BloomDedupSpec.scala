package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.TestSpark

/** Bloom-prefiltered incremental n-gram dedup: the contract is that the
  * Bloom pass is INVISIBLE in the output — no false negatives by
  * construction, false positives removed by the exact confirm — so the
  * result must equal the naive distinct-gram join at every filter size,
  * including an adversarially tiny one where almost every bit is set. */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = (1 to 40).map(i => s"tok$i")
  private val oldDocs = Seq(
    (1L, w.take(20).mkString(" ")),          // source of the copied run
    (2L, w.slice(20, 40).mkString(" ")),
    (3L, "eight short words only seven here pad end")).toDF("doc_id", "text")
  private val newDocs = Seq(
    (10L, w.slice(5, 17).mkString(" ")),     // 12-word run copied from doc 1
    (11L, "fresh material sharing absolutely nothing with the old corpus x"),
    (12L, "tiny"))                           // under n words: no grams
    .toDF("doc_id", "text")

  /** The naive form the Bloom path must reproduce exactly. */
  private def naive(n: Int): Set[(Long, Long, Long)] = {
    def grams(df: DataFrame) = df
      .select($"doc_id", split(DedupOps.normText($"text"), " ").as("ws"))
      .filter(size($"ws") >= n)
      .select($"doc_id", explode(expr(
        s"array_distinct(transform(sequence(1, size(ws) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(ws, i, $n))))")).as("g"))
    val old = grams(oldDocs).select($"g").distinct()
    grams(newDocs).join(old, "g")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
      .join(grams(newDocs).groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_grams")), "doc_id")
      .select($"doc_id", $"n_grams", $"n_shared")
      .as[(Long, Long, Long)].collect().toSet
  }

  test("matches the naive gram join (copied run found, fresh doc absent)") {
    val got = DedupOps.bloomNgramFilter(oldDocs, newDocs,
        $"doc_id", $"text", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    val want = naive(8)
    assert(got == want)
    // the planted 12-word copy shares exactly 12-8+1 = 5 distinct 8-grams
    assert(got == Set((10L, 5L, 5L)))
  }

  test("a saturated 4-bit filter (all false positives) changes nothing") {
    val got = DedupOps.bloomNgramFilter(oldDocs, newDocs,
        $"doc_id", $"text", n = 8, mBits = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive(8))
  }

  test("minShared raises the reporting floor") {
    assert(DedupOps.bloomNgramFilter(oldDocs, newDocs,
      $"doc_id", $"text", n = 8, minShared = 6).isEmpty)
  }

  test("a parquet-persisted gram index reproduces the derived run") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-gram-index").toString
    DedupOps.buildGramIndex(oldDocs, $"doc_id", $"text")
      .write.mode("overwrite").parquet(dir)
    val got = DedupOps.bloomNgramFilterWithIndex(
        spark.read.parquet(dir), newDocs, $"doc_id", $"text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive(8))
  }

  test("ngramNovelty: shared grams score down, unique docs score 1.0, " +
      "short docs excluded") {
    val shared = (1 to 9).map(i => s"s$i").mkString(" ") // 9 words: 2 grams
    val d = Seq(
      (1L, s"$shared alpha beta gamma delta"), // shares 2 of its grams
      (2L, shared),                            // ONLY the 2 shared grams
      (3L, (1 to 12).map(i => s"u$i").mkString(" ")), // all unique
      (4L, "too short"))                       // < 8 words: excluded
      .toDF("doc_id", "text")
    val got = Pins.scoped {
      DedupOps.ngramNovelty(d, $"doc_id", $"text", n = 8)
        .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    }
    // doc 1: 13 words -> 6 grams, the first 2 shared with doc 2
    assert(got == Seq(
      (1L, 6L, 4L, 4.0 / 6.0),
      (2L, 2L, 0L, 0.0),
      (3L, 5L, 5L, 1.0)), got)
  }
}
