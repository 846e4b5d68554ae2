package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reproducibility claim as an assertion: results must be
  * bit-identical under different shuffle partition counts (the scaled-
  * integer aggregation + DetHash design exists exactly so that re-runs,
  * engine moves, and cluster resizes cannot change answers). Covers one
  * query per risk family: float aggregation (ts_counter_total),
  * hash-bucketed pair generation (llm_minhash_dedup), window ranking
  * with ties (llm_tfidf), iterative centroid training + cluster-local
  * pruning (llm_semdedup), hash-permutation sharding (llm_shuffle). */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
  private val Queries = Seq("ts_counter_total", "llm_minhash_dedup",
    "llm_tfidf", "llm_semdedup", "llm_shuffle")

  test("results are identical under different shuffle partition counts") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(): Map[String, Seq[String]] = Queries.map { q =>
      val rows = SparkEntry.queries(q)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      Pins.releaseAll() // drop caches so the next run really recomputes
      q -> rows
    }.toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val a = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = runAll()
      Queries.foreach { q =>
        assert(a(q).nonEmpty, s"$q returned nothing")
        assert(a(q) == b(q), s"$q differs across partition counts")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
