package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft._
import graft.operators.DedupOps

/** Deep-component convergence demonstration for `dupClusters`
  * (diagnostics, not the bench): a path graph of N nodes is the
  * worst-case connected component — diameter N−1, so plain min-label
  * propagation needs N−1 shuffle rounds (a 100k-node chain would be
  * ~100k Spark stages: unrunnable). The adaptive pointer jump covers
  * 2^(r−1) hops after r rounds, so the same chain converges in
  * ~⌈log2(N)⌉+2 rounds. This probe builds the chain, runs the operator
  * under its DEFAULT maxIter (50 — which plain propagation would blow
  * through at every size probed here), asserts full convergence (all
  * labels = 0, exactly one keeper), and reports wall time.
  *
  * Run: `sbt "runMain graft.tools.ClusterDepthProbe [N ...]"`
  * (default 1000 10000 100000). */
object ClusterDepthProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1000L, 10000L, 100000L)
    val spark = SparkSession.builder().appName("clusterdepthprobe")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { n =>
      val pairs = spark.range(n - 1)
        .select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
      val t0 = System.nanoTime()
      val (rows, offMin, keepers) = Pins.scoped {
        val got = DedupOps.dupClusters(pairs)
        (got.count(),
          got.filter($"cluster_id" =!= 0L).count(),
          got.filter($"is_keeper").count())
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val ok = rows == n && offMin == 0 && keepers == 1
      println(f"[depth] n=$n%-8d diameter=${n - 1}%-8d $secs%7.2f s  " +
        f"converged=$ok (rows=$rows, off-min=$offMin, keepers=$keepers)")
      assert(ok, s"deep chain n=$n failed to converge to the component min")
    }
    spark.stop()
  }
}
