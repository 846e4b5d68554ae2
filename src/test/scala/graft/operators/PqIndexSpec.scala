package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark
import graft.queries.Tables

/** PQ production-serving contract (mirrors IvfIndexSpec): a codebook +
  * codes index written to parquet and read back must reproduce the
  * in-plan derived search result exactly — every LUT/rank line is shared
  * between the two paths, so divergence means the persisted schema broke. */
class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("parquet-persisted codebook + codes reproduce the derived search") {
    val q = VectorOps.quantize(
      Tables.table(spark, sfDir, "embeddings"), $"vec_id", $"embedding")
      .cache()
    val (m, nCodes, k) = (8, 16, 5)
    val derived = VectorOps.pqKnn(q, _ < 10, k, m, nCodes)
      .as[(Long, Long, Long, Int)].collect().toSet

    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val cb = VectorOps.pqCodebook(q, m, nCodes)
    cb.write.mode("overwrite").parquet(s"$dir/codebook")
    VectorOps.pqEncode(q, cb, m)
      .write.mode("overwrite").parquet(s"$dir/codes")

    val served = VectorOps.pqKnnWithIndex(q,
        spark.read.parquet(s"$dir/codebook"),
        spark.read.parquet(s"$dir/codes"), _ < 10, k, m, nCodes)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(served == derived)
    assert(derived.nonEmpty)
  }
}
