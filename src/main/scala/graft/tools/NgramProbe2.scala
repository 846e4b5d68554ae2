package graft.tools

import org.apache.spark.sql.SparkSession

import graft._
import graft.operators.DedupOps
import graft.queries.Tables

/** Rebuild-vs-execute split for llm_ngram_jaccard (diagnostics): is the
  * bench cost in the jobs or in per-build plan-time (cache lookups,
  * spreadBy's plan probe, AQE)? */
object NgramProbe2 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("ngramprobe2").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.table(spark, sf, "documents")
    docs.count()

    def q() = DedupOps.ngramJaccard(docs, $"doc_id", $"text", 0.5)
      .orderBy("doc_a", "doc_b")

    for (r <- 1 to 2) Pins.scoped {
      q().count() // warm pins
      val tb = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val df = q()
        val b = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); df.count()
        (b, (System.nanoTime() - t1) / 1e9)
      }
      tb.foreach { case (b, e) =>
        println(f"  build $b%.3f s  execute $e%.3f s")
      }
      // build-once re-count for comparison
      val df = q(); df.count()
      val t0 = System.nanoTime(); df.count()
      println(f"  build-once recount ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
