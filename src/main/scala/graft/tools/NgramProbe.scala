package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.functions.DetHash
import graft.operators.DedupOps
import graft.queries.Tables

/** Fused end-to-end timing of llm_ngram_jaccard fix variants at a given
  * SF — each variant is a complete pipeline counted min-of-3 after one
  * warmup, Pins released per variant (QueryTimer methodology), so the
  * numbers are directly comparable to the bench entry. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("ngramprobe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.table(spark, sf, "documents")
    docs.count()

    def bench(label: String)(build: => DataFrame): Unit = {
      val best = Pins.scoped {
        val df = build
        val n = df.count() // warmup
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); df.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"  $label%-34s $t%.3f s (rows=$n)")
        t
      }
      val _ = best
    }

    // V2: carry g3 through the band join (containment-fuse shape);
    // exact jaccard inline on hit rows, distinct on scalars at the end.
    def fused(minJaccard: Double, maxBucket: Int): DataFrame = {
      val base = Pins.pin(DedupOps.gramArrays(docs, $"doc_id", $"text"))
      val buckets = base.select($"doc_id", $"g3", explode($"b5").as("bkey"))
      val counts = buckets.groupBy($"bkey").count()
        .filter($"count" >= 2)
        .select($"bkey",
          expr(s"CAST((count + ${maxBucket - 1}) DIV $maxBucket AS BIGINT)")
            .as("nsub"))
      val sub = Pins.pin(buckets.join(counts, Seq("bkey"))
        .withColumn("sub",
          DetHash.h60(concat(lit("ps:"), $"bkey".cast("string"), lit(":"),
            $"doc_id".cast("string"))) % $"nsub")
        .select($"bkey", $"sub", $"doc_id", $"g3"))
      sub.join(sub.select($"bkey", $"sub", $"doc_id".as("doc_b"),
          $"g3".as("g3_b")), Seq("bkey", "sub"))
        .filter($"doc_id" < $"doc_b")
        .select($"doc_id".as("doc_a"), $"doc_b",
          size(array_intersect($"g3", $"g3_b")).cast("long").as("n_common"),
          (size($"g3") + size($"g3_b")).as("sz_ab"))
        .select($"doc_a", $"doc_b", $"n_common",
          ($"n_common".cast("double") / ($"sz_ab" - $"n_common"))
            .as("jaccard"))
        .filter($"jaccard" >= minJaccard)
        .distinct()
    }

    // V1: keep the cappedPairs path, slim the exact stage's cache.
    def slim(minJaccard: Double, maxBucket: Int): DataFrame = {
      val base = Pins.pin(DedupOps.gramArrays(docs, $"doc_id", $"text"))
      val g3 = Pins.pin(base.select($"doc_id", $"g3".as("hs")))
      val buckets = base.select($"doc_id", explode($"b5").as("bkey"))
      val cand = DedupOps.cappedPairs(buckets, Seq("bkey"), maxBucket)
      DedupOps.trueJaccard(cand, g3).filter($"jaccard" >= minJaccard)
    }

    for (round <- 1 to 2) {
      println(s"== round $round")
      bench("V0 current ngramJaccard") {
        DedupOps.ngramJaccard(docs, $"doc_id", $"text", 0.8)
      }
      bench("V1 slim g3 pin for exact stage") { slim(0.8, 20) }
      bench("V2 fused carry-g3 band join") { fused(0.8, 20) }
    }

    // hit-row census for the fused shape (duplicate-intersect cost)
    Pins.scoped {
      val base = Pins.pin(DedupOps.gramArrays(docs, $"doc_id", $"text"))
      val buckets = base.select($"doc_id", $"g3", explode($"b5").as("bkey"))
      val counts = buckets.groupBy($"bkey").count().filter($"count" >= 2)
        .select($"bkey", expr("CAST((count + 19) DIV 20 AS BIGINT)").as("nsub"))
      val sub = Pins.pin(buckets.join(counts, Seq("bkey"))
        .withColumn("sub",
          DetHash.h60(concat(lit("ps:"), $"bkey".cast("string"), lit(":"),
            $"doc_id".cast("string"))) % $"nsub")
        .select($"bkey", $"sub", $"doc_id", $"g3"))
      val hits = sub.join(sub.select($"bkey", $"sub",
          $"doc_id".as("doc_b"), $"g3".as("g3_b")), Seq("bkey", "sub"))
        .filter($"doc_id" < $"doc_b")
      println(s"  hit rows (pre-distinct): ${hits.count()}")
      println(s"  avg |g3|: " + base.select(avg(size($"g3"))).head.getDouble(0))
      println(s"  max |g3|: " + base.select(max(size($"g3"))).head.getInt(0))
    }
    spark.stop()
  }
}
