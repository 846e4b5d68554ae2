package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft._
import graft.TestSpark

/** Cap-overflow observability: dropping an over-cap bucket is a recall
  * trade that must surface as a metric, not a silent hole (round-3
  * advice item 6). */
class DedupStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a planted mega-bucket is counted, sized, and excluded from pairs") {
    // one hot bucket of 30 members (over the cap of 10) + two small ones
    val rows = ((1 to 30).map(i => (i.toLong, "HOT")) ++
      Seq((31L, "a"), (32L, "a"), (40L, "b"), (41L, "b"), (42L, "b")))
      .toDF("doc_id", "bkey")
    DedupStats.reset()
    val pairs = Pins.scoped {
      DedupOps.cappedPairs(rows, Seq("bkey"), maxBucket = 10).collect()
    }
    DedupStats.awaitQuiesce(spark)
    assert(DedupStats.droppedBuckets.get() == 1,
      s"expected the HOT bucket reported, got ${DedupStats.droppedBuckets.get()}")
    assert(DedupStats.droppedRows.get() == 30)
    assert(DedupStats.maxDroppedBucket.get() == 30)
    // the dropped bucket contributed no candidate pairs; small ones did
    assert(pairs.length == 1 + 3) // C(2,2)=1 from "a", C(3,2)=3 from "b"
    assert(pairs.forall(r => r.getLong(0) > 30L))
  }

  test("an in-cap run reports zero drops") {
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "bkey")
    DedupStats.reset()
    Pins.scoped { DedupOps.cappedPairs(rows, Seq("bkey"), 10).collect() }
    DedupStats.awaitQuiesce(spark)
    assert(DedupStats.droppedBuckets.get() == 0)
    assert(DedupStats.droppedRows.get() == 0)
  }
}
