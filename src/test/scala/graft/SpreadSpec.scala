package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** The conditional hash-spread ([[graft.spreadByKey]]) behind every heavy
  * narrow pass: a one-file input must gain parallelism, a pre-split input
  * must NOT pay a gratuitous full-corpus exchange (the 100 TB case — the
  * input already arrives in thousands of splits). */
class SpreadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
    "(?<!Broadcast)Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("spreadByKey exchanges a narrow input and passes a wide one through") {
    val narrow = spark.range(0, 100, 1, 1).select($"id".as("doc_id"))
    val wide = spark.range(0, 100, 1, 8).select($"id".as("doc_id"))
    assert(nExchanges(spreadByKey(narrow, $"doc_id").toDF) == 1)
    // identity, not just exchange-free: the wide input is returned as-is
    assert(spreadByKey(wide, $"doc_id") eq wide)
    assert(nExchanges(wide.spreadBy($"doc_id").toDF) == 0)
    // coalesce is narrow: a coalesce(1)-stranded input is exactly the
    // one-partition case the helper exists to fix (probing its RDD
    // runs nothing), so it must be spread, not passed through
    val strangled = wide.coalesce(1)
    assert(nExchanges(spreadByKey(strangled, $"doc_id").toDF) == 1)
  }

  test("spreadByKey passes shuffled and streaming inputs through unchanged") {
    // upstream shuffle: probing .rdd would finalize the adaptive plan
    // (running the shuffle stages in a throwaway execution) — the gate
    // must return the dataset untouched instead, since a shuffle output
    // is already spread across spark.sql.shuffle.partitions
    val shuffled = spark.range(0, 100, 1, 1).select($"id".as("doc_id"))
      .groupBy($"doc_id").count()
    assert(spreadByKey(shuffled, $"doc_id") eq shuffled)
    // streaming: Dataset.rdd throws on streams — must pass through
    val stream = spark.readStream.format("rate").load()
      .select($"value".as("doc_id"))
    assert(spreadByKey(stream, $"doc_id") eq stream)
  }

  test("shingleHashArrays plan has no Exchange on a pre-split input") {
    def docs(parts: Int) = spark.range(0, 64, 1, parts)
      .select($"id".as("doc_id"),
        concat(org.apache.spark.sql.functions.lit("text of doc "),
          $"id".cast("string")).as("text"))
    val presplit = DedupOps.shingleHashArrays(docs(8), $"doc_id", $"text")
    assert(nExchanges(presplit) == 0,
      s"pre-split input must not re-exchange:\n${presplit.queryExecution.executedPlan}")
    val onefile = DedupOps.shingleHashArrays(docs(1), $"doc_id", $"text")
    assert(nExchanges(onefile) == 1,
      "one-partition input must gain hash-wide parallelism")
    // values identical either way (the spread is layout-only)
    assert(presplit.orderBy("doc_id").collect().toSeq ==
      onefile.orderBy("doc_id").collect().toSeq)
  }

  private def concat(cols: org.apache.spark.sql.Column*) =
    org.apache.spark.sql.functions.concat(cols: _*)
}
