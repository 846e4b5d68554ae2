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
}
