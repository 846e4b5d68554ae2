package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.operators.{DedupOps, TextAnalysisOps}
import graft.queries.Tables

/** Large-scale Spark-vs-DuckDB parity corpus + Spark-side timing
  * (diagnostics, not the bench): materializes a k× expansion of the
  * sf0.1 documents table where each replica's words are TAGGED with the
  * replica index — so every replica is a DISTINCT sub-corpus (identical
  * internal dedup structure, zero cross-replica n-gram collisions) and
  * the workload grows linearly with k, unlike raw cloning where every
  * doc becomes a true dup of its k−1 clones and the pair output is
  * quadratic by construction. Then times the two stage-floor-suspect
  * queries (llm_ngram_jaccard, llm_tfidf) QueryTimer-style against the
  * expanded corpus. The DuckDB side runs the same oracle SQL over the
  * same parquet (tools/parity_duck.py); the per-query ratios retire (or
  * confirm) the "Spark's fixed stage floor amortizes at scale"
  * explanation with a measurement.
  *
  * Usage: `runMain graft.tools.ParityProbe [k] [outDir] [query ...]`
  * (default 10, /tmp/parity, all queries). An existing `<outDir>/<k>x`
  * corpus is reused as-is — delete it to force a rebuild. */
object ParityProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val out = args.drop(1).headOption.getOrElse("/tmp/parity")
    val only = args.drop(2).toSet
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("parityprobe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"$out/${k}x"
    if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()) {
      val docs = Tables.table(spark, sf, "documents")
      val n = docs.count()
      val expanded = (0 until k).map { r =>
        docs.select(
          ($"doc_id" + lit(r * 10000000L)).as("doc_id"),
          // tag every word with the replica: distinct vocab per replica,
          // same per-replica gram/tf structure, linear total work
          array_join(transform(split($"text", " "),
            w => concat(lit(s"r$r"), w)), " ").as("text"),
          $"lang", $"source", $"n_chars")
      }.reduce(_ unionByName _)
      expanded.coalesce(8).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      println(s"[parity] wrote ${n * k} docs to $dir/documents.parquet")
    } else println(s"[parity] reusing existing corpus at $dir")

    val pdocs = spark.read.parquet(s"$dir/documents.parquet")
    pdocs.count() // warm file listing/footers

    def bench(label: String)(build: => DataFrame): Unit = {
      if (only.nonEmpty && !only(label)) return
      val best = Pins.scoped {
        val df = build
        val rows = df.count()
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); df.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[parity] $label%-20s ${t}%.3f s (rows=$rows)")
        t
      }
      val _ = best
    }

    bench("llm_ngram_jaccard") {
      DedupOps.ngramJaccard(pdocs, $"doc_id", $"text", 0.5)
        .orderBy("doc_a", "doc_b")
    }
    bench("llm_tfidf") {
      TextAnalysisOps.tfIdfTopTerms(pdocs, $"doc_id", $"text")
        .orderBy("doc_id", "rk")
    }
    bench("llm_textrank") {
      // registry parameters (PmiTopK=30, PmiMinCount=3); note the
      // replica tagging multiplies the VOCAB by k while per-replica
      // bigram structure is preserved — the right axis for textrank,
      // whose cost is vocab-bound
      TextAnalysisOps.textRank(pdocs, $"doc_id", $"text", 30, 3L)
    }
    spark.stop()
  }
}
