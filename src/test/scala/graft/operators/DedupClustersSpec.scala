package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark

/** Brute-force golden for the connected-components keeper assignment:
  * transitive chains collapse to one cluster under the min label even
  * when the endpoints' pairwise similarity never crossed the threshold. */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dupClusters: chains, separate components, min-label keepers") {
    // component 1: 1-5-3 chain + 3-7 (diameter 3: label 1 must hop twice)
    // component 2: 10-12
    // component 3: 20-21, 21-22, 20-22 (triangle)
    val pairs = Seq((5L, 1L), (3L, 5L), (3L, 7L), (10L, 12L),
      (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = DedupOps.dupClusters(pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val want = Seq(
      (1L, 1L, true), (3L, 1L, false), (5L, 1L, false), (7L, 1L, false),
      (10L, 10L, true), (12L, 10L, false),
      (20L, 20L, true), (21L, 20L, false), (22L, 20L, false))
    assert(got.toSeq == want)
    Pins.releaseAll()
  }

  test("dupClusters: deep path converges in O(log diameter) rounds") {
    // path 0-1-2-...-32: diameter 32. Plain min-label propagation needs
    // 32 rounds (one hop each); the interleaved pointer jump covers
    // 2^r - 1 hops after r rounds, so maxIter = 8 (6 contraction rounds
    // + 1 fixpoint-detection round + slack) only converges with the
    // jump in place — this bound is the discriminating assertion.
    val pairs = (0L until 32L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = DedupOps.dupClusters(pairs, maxIter = 8)
      .as[(Long, Long, Boolean)].collect()
    assert(got.length == 33)
    assert(got.forall(_._2 == 0L),
      "all 33 path nodes must reach the component minimum within 8 rounds")
    assert(got.count(_._3) == 1)
    Pins.releaseAll()
  }

  test("dupClusters: reliable checkpointDir path matches localCheckpoint") {
    // the cluster-production variant: per-round truncation through a
    // reliable checkpoint dir (blocks survive executor loss) must give
    // identical labels, actually write checkpoint data there, and
    // restore the context's prior checkpoint dir on exit
    val pairs = Seq((5L, 1L), (3L, 5L), (3L, 7L), (10L, 12L))
      .toDF("doc_a", "doc_b")
    val dir = java.nio.file.Files.createTempDirectory("dup_ckpt")
    val before = spark.sparkContext.getCheckpointDir
    val got = DedupOps.dupClusters(pairs, checkpointDir = Some(dir.toString))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val local = DedupOps.dupClusters(pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == local)
    import scala.jdk.CollectionConverters._
    val written = java.nio.file.Files.walk(dir).iterator().asScala
      .count(java.nio.file.Files.isRegularFile(_))
    assert(written > 0, "reliable path must write checkpoint files")
    // in-loop reaping: superseded rounds' snapshots are deleted as soon
    // as the next round materializes — only the FINAL label table's
    // rdd-* snapshot may remain, however many BSP rounds ran
    val snapshots = java.nio.file.Files.walk(dir).iterator().asScala
      .count(p => p.getFileName.toString.startsWith("rdd-"))
    assert(snapshots == 1,
      s"expected exactly the final round's checkpoint snapshot, got $snapshots")
    assert(spark.sparkContext.getCheckpointDir == before ||
      spark.sparkContext.getCheckpointDir.exists(_.contains(dir.toString)),
      "prior checkpoint dir must be restored (ours may remain only if none was set)")
    Pins.releaseAll()
  }
}
