package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark
import graft.queries.Tables

/** Approximation quality of the ANN variants against the brute-force
  * ground truth on the fixture embeddings — recall floors so a refactor
  * that silently degrades bucketing (or breaks multi-probe) fails here,
  * not in production. Deterministic inputs → deterministic recall. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"probe_id", $"vec_id").as[(Long, Long)].collect().toSet

  test("multi-probe LSH and IVF recall vs brute force") {
    val q = VectorOps.quantize(
      Tables.table(spark, sfDir, "embeddings"), $"vec_id", $"embedding")
      .cache()
    val brute = pairs(VectorOps.bruteKnn(q, q.filter($"vec_id" < 10), 5))
    val lsh = pairs(VectorOps.lshKnn(q, _ < 10, 5, planes = 4, dim = 64))
    val lsh2 = pairs(VectorOps.lshKnn(q, _ < 10, 5, planes = 4, dim = 64,
      probeRadius = 2))
    val ivf0 = pairs(VectorOps.ivfKnn(q, _ < 10, 5, nCentroids = 16, nProbe = 4))
    val ivf2 = pairs(VectorOps.ivfKnn(q, _ < 10, 5, nCentroids = 16, nProbe = 4,
      trainIters = 2))
    val ivfS = pairs(VectorOps.ivfKnn(q, _ < 10, 5, nCentroids = 16, nProbe = 4,
      trainIters = 2, trainSampleMod = 2))
    assert(brute.nonEmpty)
    val lshRecall = lsh.intersect(brute).size.toDouble / brute.size
    val lsh2Recall = lsh2.intersect(brute).size.toDouble / brute.size
    val ivf0Recall = ivf0.intersect(brute).size.toDouble / brute.size
    val ivf2Recall = ivf2.intersect(brute).size.toDouble / brute.size
    val ivfSRecall = ivfS.intersect(brute).size.toDouble / brute.size
    info(s"recall: lsh=$lshRecall lsh(r2)=$lsh2Recall " +
      s"ivf(seeds)=$ivf0Recall ivf(lloyd2)=$ivf2Recall " +
      s"ivf(sampled)=$ivfSRecall")
    // sf0.01 reference points: single-probe LSH was 0.14; radius-1
    // multi-probe 0.40; radius-2 recovers neighbours straddling two
    // hyperplanes; IVF 0.92 seeds / 0.90 after 2 Lloyd's rounds —
    // training buys balanced lists, not recall, on random
    // near-orthogonal vectors (the hard case: every centroid is roughly
    // equidistant from everything)
    assert(lshRecall >= 0.25, s"LSH recall regressed: $lshRecall")
    assert(lsh2Recall >= 0.7, s"radius-2 LSH recall regressed: $lsh2Recall")
    assert(lsh2Recall >= lshRecall, "wider probe must not lose pairs")
    assert(ivf0Recall >= 0.7, s"IVF seed recall regressed: $ivf0Recall")
    assert(ivf2Recall >= 0.7, s"IVF trained recall regressed: $ivf2Recall")
    assert(ivf2Recall >= ivf0Recall - 0.1,
      s"training should not cost recall: $ivf0Recall -> $ivf2Recall")
    // sample-trained centroids (the 100 TB shape: Lloyd's rounds on the
    // 1-in-2 hash-sample, full corpus assigned once) must not cost recall
    assert(ivfSRecall >= 0.7, s"sampled-training recall regressed: $ivfSRecall")
  }

  test("PQ/ADC recall vs brute force") {
    val q = VectorOps.quantize(
      Tables.table(spark, sfDir, "embeddings"), $"vec_id", $"embedding")
      .cache()
    val brute = pairs(VectorOps.bruteKnn(q, q.filter($"vec_id" < 10), 5))
    val pq = pairs(VectorOps.pqKnn(q, _ < 10, 5))
    val pq32 = pairs(VectorOps.pqKnn(q, _ < 10, 5, nCodes = 32))
    val pqRecall = pq.intersect(brute).size.toDouble / brute.size
    val pq32Recall = pq32.intersect(brute).size.toDouble / brute.size
    info(s"recall: pq16=$pqRecall pq32=$pq32Recall")
    // random near-orthogonal vectors are PQ's worst case (everything is
    // roughly equidistant and a seeded codebook quantizes coarsely; with
    // SEEDED codes more entries is not monotonically better — measured
    // 0.30 @16 vs 0.24 @32). Round 6 built and measured a per-subspace
    // Lloyd's-trained codebook as the would-be fix: recall@5 DROPPED to
    // 0.18-0.24 across (iters, sampleMod) sweeps, and even shortlist
    // quality under the exact re-rank fell (0.78-0.82 vs 0.84 seeded) —
    // k-means shrinks centroid norms toward the mean, flattening ADC
    // dots on exactly this isotropic data, so the trained form was NOT
    // shipped (BENCH_NOTES r6). Re-ranking, not training, is the recall
    // lever here. The floors pin the observed values so a codebook/LUT
    // regression still fails.
    assert(pqRecall >= 0.25, s"PQ recall regressed: $pqRecall")
    assert(pq32Recall >= 0.2, s"PQ-32 recall regressed: $pq32Recall")
  }

  test("corpus-wide kNN graph recall vs brute force on a probe subset") {
    val q = VectorOps.quantize(
      Tables.table(spark, sfDir, "embeddings"), $"vec_id", $"embedding")
      .cache()
    val brute = pairs(VectorOps.bruteKnn(q, q.filter($"vec_id" < 10), 5))
    val graph = Pins.scoped {
      VectorOps.knnGraph(q, 5, planes = 6, dim = 64, maxBucket = 500)
        .filter($"vec_id" < 10)
        .select($"vec_id".as("probe_id"), $"nbr_id").as[(Long, Long)]
        .collect().toSet
    }
    val recall = graph.intersect(brute).size.toDouble / brute.size
    info(s"recall: knn_graph(planes=6, r1)=$recall")
    // 64 buckets over 500 vectors, radius-1 probes: the graph sees its
    // own + 6 flipped buckets — the N-probe analogue of lshKnn's dial
    assert(recall >= 0.25, s"kNN-graph recall regressed: $recall")
    // shape: at most k neighbors per vector, ranks contiguous from 1
    val byVec = Pins.scoped {
      VectorOps.knnGraph(q, 5, planes = 6, dim = 64, maxBucket = 500)
        .select($"vec_id", $"rk").as[(Long, Long)].collect().toSeq
    }.groupBy(_._1).values
    assert(byVec.forall(rs => rs.map(_._2).sorted == (1L to rs.size)))
    assert(byVec.forall(_.size <= 5))
  }

  test("two-stage PQ (ADC shortlist + exact re-rank) recall vs brute force") {
    val q = VectorOps.quantize(
      Tables.table(spark, sfDir, "embeddings"), $"vec_id", $"embedding")
      .cache()
    val brute = pairs(VectorOps.bruteKnn(q, q.filter($"vec_id" < 10), 5))
    val rr = pairs(VectorOps.pqKnnReranked(q, _ < 10, 5, r = 50))
    val rrRecall = rr.intersect(brute).size.toDouble / brute.size
    info(s"recall: pq_rerank(r=50)=$rrRecall")
    // the exact re-rank of a top-50 ADC shortlist lifts the weak raw ADC
    // ranking (~0.3) well past the usable floor: any true neighbor that
    // lands anywhere in the shortlist is recovered exactly
    assert(rrRecall >= 0.6, s"re-ranked PQ recall regressed: $rrRecall")
    // shortlist hits are re-scored EXACTLY, so every returned pair that
    // brute force also returns must carry identical rank ordering rules;
    // and widening r can only help — r = corpus degenerates to brute
    val rrWide = pairs(VectorOps.pqKnnReranked(q, _ < 10, 5, r = 100))
    val wideRecall = rrWide.intersect(brute).size.toDouble / brute.size
    assert(wideRecall >= rrRecall - 1e-9,
      s"wider shortlist lost recall: $rrRecall -> $wideRecall")
  }
}
