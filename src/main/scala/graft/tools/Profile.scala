package graft.tools

import org.apache.spark.sql.SparkSession

import graft._
import graft.operators.DedupOps
import graft.queries.Tables

/** Scratch phase-timer for the heavy dedup queries (not part of the
  * library surface — bench/diagnostics only). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.table(spark, sf, "documents")
    docs.count() // warm session + file listing

    val base = time("shingleHashArrays+persist") {
      val b = DedupOps.shingleHashArrays(docs, $"doc_id", $"text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b.count(); b
    }
    val mh = time("minHashSignatures") {
      val m = DedupOps.minHashSignatures(base); m.count(); m
    }
    val bands = time("bandRows") {
      val bd = DedupOps.bandRows(mh); bd.count(); bd
    }
    val cand = time("candidatePairs") {
      val c = DedupOps.candidatePairs(bands, 20); c.count(); c
    }
    time("trueJaccard") {
      DedupOps.trueJaccard(cand, base).filter($"jaccard" >= 0.8).count()
    }
    time("whole minHashDedup fused") {
      DedupOps.minHashDedup(docs, $"doc_id", $"text", 0.8).count()
    }
    spark.stop()
  }
}
