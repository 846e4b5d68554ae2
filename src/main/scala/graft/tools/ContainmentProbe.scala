package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft._
import graft.functions.DetHash
import graft.operators.{DedupOps, DedupStats}
import graft.queries.Tables

/** Stage-by-stage timing of the containment candidate pipeline at a
  * given SF — diagnostic for the llm_containment bench cost. */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("contprobe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      r
    }

    val docs = Tables.table(spark, sf, "documents")
    Pins.scoped {
      val base = Pins.pin(DedupOps.shingleHashArrays(docs, $"doc_id", $"text"))
      time("base (pin shingles)")(base.count())
      val samp = Pins.pin(base
        .select($"doc_id", expr("filter(hs, h -> h % 8 = 0)").as("shs"))
        .select($"doc_id", $"shs", explode($"shs").as("h31")))
      time("samp (pin 1-in-8+arr)")(samp.count())
      val counts = DedupStats.observeCapSplits(
          samp.select($"doc_id", $"h31").groupBy($"h31").count(),
          "containment", 20)
        .filter($"count" >= 2)
        .select($"h31",
          expr("CAST((count + 19) DIV 20 AS BIGINT)").as("nsub"))
      val sub = Pins.pin(samp.join(counts, "h31")
        .select($"h31",
          (DetHash.h60(concat(lit("cs:"), $"h31".cast("string"), lit(":"),
            $"doc_id".cast("string"))) % $"nsub").as("sub"),
          $"doc_id", $"shs"))
      time("sub (pin sub-buckets)")(sub.count())
      val pre = Pins.pin(sub
        .join(sub.select($"h31", $"sub",
          $"doc_id".as("doc_b"), $"shs".as("shs_b")), Seq("h31", "sub"))
        .filter($"doc_id" < $"doc_b")
        .withColumn("s_common",
          size(array_intersect($"shs", $"shs_b")).cast("long"))
        .filter(
          $"s_common" * 10 >= size($"shs").cast("long") * 7 ||
          size($"shs") <= 6 ||
          $"s_common" * 10 >= size($"shs_b").cast("long") * 7 ||
          size($"shs_b") <= 6)
        .select($"doc_id".as("doc_a"), $"doc_b")
        .distinct())
      time("pre (fused join+filter)")(pre.count())
      val ex = pre
        .join(base.select($"doc_id".as("doc_a"), $"hs".as("hs_a")), "doc_a")
        .join(base.select($"doc_id".as("doc_b"), $"hs".as("hs_b")), "doc_b")
        .select($"doc_a", $"doc_b",
          size(array_intersect($"hs_a", $"hs_b")).cast("long").as("n_common"),
          size($"hs_a").cast("long").as("sz_a"),
          size($"hs_b").cast("long").as("sz_b"))
        .select($"doc_a", $"doc_b", $"n_common",
          ($"n_common".cast("double") / $"sz_a").as("cont_a"),
          ($"n_common".cast("double") / $"sz_b").as("cont_b"))
        .filter($"cont_a" >= 0.9 || $"cont_b" >= 0.9)
      time("exact stage")(ex.count())
      time("full op re-run") {
        DedupOps.containmentPairs(docs, $"doc_id", $"text", 0.9).count()
      }
    }
    spark.stop()
  }
}
