package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input robustness: every SparkEntry query must PLAN AND RUN
  * (possibly to zero rows) over a dataset of the right schema with no
  * rows — the shape of a brand-new partition, an all-filtered source, or
  * the first batch of an incremental pipeline. Catches div-by-zero,
  * first()/head on empty, and seed-selection assumptions that only a
  * 100%-full fixture hides. Streaming-backed queries (which materialize
  * their own input) are exercised by IngestSpec instead. */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val srcDir = "/root/testdata/sf0.001"

  /** One empty-parquet mirror of the sf0.001 layout, built once. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val names = new java.io.File(srcDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
    // events carries TIMESTAMP(NANOS): schema must survive the mirror,
    // so copy it with the same legacy read the queries use
    spark.conf.set(queries.Tables.NanosConf, "true")
    names.foreach { n =>
      spark.read.parquet(s"$srcDir/$n.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  private val streamingBacked = Set("ts_stream_ingest", "ts_stream_restart")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if !streamingBacked(name)) {
    test(s"$name runs on an empty corpus") {
      val n = Pins.scoped { fn(spark, emptyDir).count() }
      assert(n >= 0)
    }
  }
}
