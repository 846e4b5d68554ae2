package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming state must survive a query RESTART from its checkpoint —
  * the fault-tolerance contract a 1000-executor deployment relies on
  * (driver loss, code redeploy, planned restart): a near-dup arriving
  * AFTER the restart must still collide with a holder registered
  * BEFORE it, because the band-cell first-holder state is restored
  * from the checkpoint, not rebuilt from the (gone) earlier batches.
  * MemoryStream is replayable within a session, so stop + re-start on
  * the same checkpoint exercises the real recovery path. */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Orig =
    "the quick brown fox jumps over the lazy dog and runs far away home"
  private val NearClone =
    "the quick brown fox jumps over the lazy cat and runs far away home"

  test("near-dup state survives stop + restart from checkpoint") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // file sink + checkpoint: the fault-tolerant pair (the memory sink
    // deliberately refuses checkpoint recovery)
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toString
    val outDir = Files.createTempDirectory("graft_restart_out").toString
    val mem = MemoryStream[(Long, Long, String)]
    val docs = mem.toDF().select($"_1".as("doc_id"),
      timestamp_seconds($"_2").as("ts"), $"_3".as("text"))
    val out = DedupOps.streamingNearDedup(docs, maxLatenessSec = 3600L)

    def start() = out.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    // epoch 1: the original registers its band cells, then the query
    // stops — a planned restart / driver loss
    val q1 = start()
    try {
      mem.addData((1L, 100L, Orig))
      q1.processAllAvailable()
    } finally q1.stop()

    // epoch 2: a NEW query on the same checkpoint; the clone arrives
    // only now. Its collision can only come from RESTORED state.
    val q2 = start()
    try {
      mem.addData((2L, 120L, NearClone))
      q2.processAllAvailable()
    } finally q2.stop()

    val landed = spark.read.parquet(outDir)
    val hits = landed.filter($"doc_id" === 2L && $"is_hit")
      .select($"holder").as[Long].collect().toSeq
    assert(hits.nonEmpty && hits.toSet == Set(1L),
      s"the post-restart clone must hit the pre-restart holder: $hits")
    // and the pre-restart epoch's own rows landed exactly once
    assert(landed.filter($"doc_id" === 1L).count() ==
      graft.functions.DetHash.NumBands.toLong)
  }

  test("fuzzy-link pair-dedup state survives stop + restart") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_fz_ckpt").toString
    val outDir = Files.createTempDirectory("graft_fz_out").toString
    val idx = graft.Pins.pin(FuzzyJoinOps.buildChunkIndex(
      Seq((100L, Orig)).toDF("id", "k"), $"id", $"k", 2))
    try {
      idx.count()
      val dirty = Orig.replace("dog", "dot") // dist 1 from the indexed key
      val mem = MemoryStream[(Long, Long, String)]
      val keys = mem.toDF().select($"_1".as("did"),
        timestamp_seconds($"_2").as("ts"), $"_3".as("dk"))
      val out = FuzzyJoinOps.streamingFuzzyLink(keys, $"did", $"ts", $"dk",
        idx, k = 2, maxLatenessSec = 3600L)
      def start() = out.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()

      // epoch 1: the pair (1, 100) emits and registers in dedup state
      val q1 = start()
      try {
        mem.addData((1L, 100L, dirty))
        q1.processAllAvailable()
      } finally q1.stop()

      // epoch 2: an at-least-once source REDELIVERS the same row; its
      // suppression can only come from state restored off the checkpoint
      val q2 = start()
      try {
        mem.addData((1L, 100L, dirty), (2L, 130L, Orig))
        q2.processAllAvailable()
      } finally q2.stop()

      val landed = spark.read.parquet(outDir)
      assert(landed.filter($"left_id" === 1L).count() == 1L,
        "redelivered pair must stay deduped across the restart")
      assert(landed.filter($"left_id" === 2L && $"right_id" === 100L &&
        $"dist" === 0L).count() == 1L)
    } finally graft.Pins.releaseAll()
  }

  test("ANN serving window opened before a restart emits after it") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // a probe lands in a window, the query restarts, and only THEN
    // does the watermark pass the window end: the emission must come
    // from checkpoint-restored window state, row-for-row the batch
    // lshKnn answer
    val dim = 4
    val emb = (0 until 8).map(i =>
      (i.toLong, (0 until dim).map(j => math.sin(1.0 + i * 0.7 + j * 1.3))))
    val q = VectorOps.quantize(
      emb.toDF("vec_id", "embedding"), $"vec_id", $"embedding")
    val idx = graft.Pins.pin(
      q.withColumn("bucket", VectorOps.lshBucket(1, dim)))
    try {
      idx.count()
      val batch = VectorOps.lshKnn(q, _ === 0L, 3, 1, dim, probeRadius = 1)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(batch.nonEmpty)
      val pv = idx.filter($"vec_id" === 0L).select($"qv").as[Seq[Long]].head()

      val ckpt = Files.createTempDirectory("graft_ann_ckpt").toString
      val outDir = Files.createTempDirectory("graft_ann_out").toString
      val mem = MemoryStream[(Long, Long, Seq[Long])]
      val stream = mem.toDF().select($"_1".as("probe_id"),
        timestamp_seconds(lit(1700000000L) + $"_2".cast("long")).as("ts"),
        $"_3".as("qv"))
      val serve = VectorOps.streamingAnnServe(stream, idx, 3, 1, dim,
        probeRadius = 1, windowSec = 3600L, latenessSec = 1L)
      def start() = serve.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()

      val q1 = start()
      try {
        mem.addData((0L, 0L, pv)) // window [0, 3600) opens, stays open
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start()
      try {
        mem.addData((-1L, 100000L, pv)) // advancer closes the window
        q2.processAllAvailable()
      } finally q2.stop()

      val got = spark.read.parquet(outDir).filter($"probe_id" >= 0)
        .select($"probe_id", $"vec_id", $"cos", $"rk")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got == batch,
        s"restored window must serve the batch answer: " +
          s"only-stream=${got -- batch}, only-batch=${batch -- got}")
    } finally graft.Pins.releaseAll()
  }
}
