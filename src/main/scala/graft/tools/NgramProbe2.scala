package graft.tools

import org.apache.spark.sql.SparkSession

import graft._

/** Rebuild-vs-execute split for any registry query (diagnostics): for
  * each named `SparkEntry.queries` entry, measures (a) plan-BUILD time
  * of a fresh DataFrame, (b) execute time of that freshly-built plan,
  * and (c) a re-count of a build-once DataFrame. With rebuild-stable
  * plans (deterministic observe names, DedupStats.stableName) (b) must
  * equal (c) — a gap means some plan node differs per build and the
  * pinned caches MISS on rebuild, re-materializing the pipeline.
  *
  * Run: `sbt "runMain graft.tools.NgramProbe2 llm_containment ..."`
  * (defaults to llm_ngram_jaccard). */
object NgramProbe2 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("ngramprobe2").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }

    val names = if (args.nonEmpty) args.toSeq else Seq("llm_ngram_jaccard")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"== $name")
      Pins.scoped {
        fn(spark, sf).count() // warm pins
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime(); val df = fn(spark, sf)
          val b = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime(); df.count()
          val e = (System.nanoTime() - t1) / 1e9
          println(f"  build $b%.3f s  execute $e%.3f s")
        }
        val df = fn(spark, sf); df.count()
        val t0 = System.nanoTime(); df.count()
        println(f"  build-once recount ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
