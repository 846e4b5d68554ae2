package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark
import graft.queries.Tables

/** semDedup semantics pinned against a brute-force re-derivation on the
  * fixture embeddings: the greedy keep-lowest-id rule means a vector is
  * a non-keeper iff some lower-id member of its own cluster is within
  * the cosine threshold. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("semDedup flags exactly the vectors with a close lower-id cluster-mate") {
    val q = VectorOps.quantize(
      Tables.table(spark, sfDir, "embeddings"), $"vec_id", $"embedding")
    val minCos = 0.2 // random fixture: low enough that some pairs trip
    val got = VectorOps.semDedup(q, minCos, nCentroids = 16,
        trainIters = 1, maxList = 500)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)

    // one row per corpus vector, ids intact
    val ids = q.select($"vec_id").as[Long].collect().sorted
    assert(got.map(_._1).toSeq == ids.toSeq)

    // brute-force re-derivation from the raw vectors + cluster labels
    val vecs = q.select($"vec_id", $"qv", $"nrm")
      .as[(Long, Seq[Long], Long)].collect()
      .map { case (id, qv, nrm) => id -> ((qv, nrm)) }.toMap
    def cos(a: Long, b: Long): Double = {
      val ((qa, na), (qb, nb)) = (vecs(a), vecs(b))
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
    }
    got.foreach { case (id, lst, keep) =>
      val expectDrop = got.exists { case (o, ol, _) =>
        o < id && ol == lst && cos(o, id) >= minCos
      }
      assert(keep == !expectDrop, s"vec $id in list $lst: keeper=$keep")
    }
    // the threshold actually bites on the fixture (non-vacuous test)
    assert(got.exists(!_._3), "expected at least one non-keeper")
    assert(got.exists(_._3), "expected at least one keeper")
  }

  test("oversized clusters are left intact (cap short-circuit)") {
    val q = VectorOps.quantize(
      Tables.table(spark, sfDir, "embeddings"), $"vec_id", $"embedding")
    // maxList below every cluster size → nothing is ever compared
    val got = VectorOps.semDedup(q, 0.0, nCentroids = 2,
      trainIters = 0, maxList = 1)
    assert(got.filter(!$"is_keeper").isEmpty)
  }
}
