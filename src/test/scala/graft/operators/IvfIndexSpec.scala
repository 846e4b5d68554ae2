package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark
import graft.queries.Tables

/** Persisted-IVF-index serving: searching against centroid + assignment
  * tables read back from parquet must equal the in-plan ivfKnn exactly
  * (same training, same probes, same ranks). */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("ivfKnnWithIndex over parquet-persisted tables == ivfKnn") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    try {
      val embs = Tables.table(spark, sfDir, "embeddings")
      def q = VectorOps.quantize(embs, $"vec_id", $"embedding")
      val direct = Pins.scoped {
        VectorOps.ivfKnn(q, _ < 10, 5, nCentroids = 16, nProbe = 4,
            trainIters = 2, trainSampleMod = 2)
          .as[(Long, Long, Double, Long)].collect().toSet
      }
      // indexing run: train + assign once, persist both tables
      Pins.scoped {
        val v = Pins.pin(q)
        val cents = VectorOps.trainCentroids(v, 16, 2, trainSampleMod = 2)
        cents.write.mode("overwrite").parquet(s"$dir/centroids")
        VectorOps.clusterAssign(v, 16, 2, trainSampleMod = 2)
          .write.mode("overwrite").parquet(s"$dir/assignments")
      }
      // serving run: no training, no corpus re-assignment
      val served = Pins.scoped {
        VectorOps.ivfKnnWithIndex(q,
            spark.read.parquet(s"$dir/centroids"),
            spark.read.parquet(s"$dir/assignments"),
            _ < 10, k = 5, nProbe = 4)
          .as[(Long, Long, Double, Long)].collect().toSet
      }
      assert(served.nonEmpty)
      assert(served == direct)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
