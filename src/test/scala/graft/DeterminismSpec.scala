package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reproducibility claim as an assertion: EVERY batch query must be
  * bit-identical under different shuffle partition counts (the scaled-
  * integer aggregation + DetHash design exists exactly so that re-runs,
  * engine moves, and cluster resizes cannot change answers). The
  * streaming-backed query materializes its own input and is covered by
  * IngestSpec's closed-form checks instead. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
  private val Queries = SparkEntry.queries.keys.toSeq.sorted
    .filterNot(_ == "ts_stream_ingest")

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
      // some queries are legitimately empty on this fixture (planted-
      // pattern detectors like llm_boilerplate/llm_domains) — emptiness
      // is the oracle gate's business; THIS test pins stability
      assert(Queries.count(q => a(q).nonEmpty) > Queries.size / 2,
        "fixture unexpectedly empty for most queries")
      Queries.foreach { q =>
        assert(a(q) == b(q), s"$q differs across partition counts")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
