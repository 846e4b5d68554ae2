package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming index-append contract for the ANN serving family:
  * ingest-side assignment/encode against FROZEN centroids/codebook must
  * equal the batch indexing run row-for-row (append == rebuild), must
  * land exactly once across a stop + restart from checkpoint (the file
  * sink's commit log), and must drop poison rows rather than crash. */
class StreamingAnnAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Dim = 8
  private def vec(seed: Long): Seq[Double] =
    (0 until Dim).map(i => math.sin(seed * 31.0 + i * 7.0) + 0.1 * i)

  private def corpus(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")
  }

  test("streaming IVF assignment equals the batch indexing run, row-for-row") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseQ = VectorOps.quantize(corpus(0L until 30L), $"vec_id", $"embedding")
    val cents = VectorOps.trainCentroids(baseQ, 4, 1)
      .select($"cent_id", $"cv", $"cn").as[(Long, Seq[Long], Long)]
      .collect().toSeq.toDF("cent_id", "cv", "cn")
    val arriving = (30L until 40L).map(i => (i, vec(i)))
    // batch rebuild side: assignVectors over the quantized new rows
    val want = VectorOps.assignVectors(
        VectorOps.quantize(corpus(arriving.map(_._1)), $"vec_id", $"embedding"),
        cents)
      .as[(Long, Long)].collect().toSet
    val mem = MemoryStream[(Long, Seq[Double])]
    val sink = "apd_spec_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = VectorOps.streamingIvfAssign(
        mem.toDF().select($"_1".as("vec_id"), $"_2".as("emb")),
        $"vec_id", $"emb", cents)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      arriving.grouped(3).foreach { chunk =>
        mem.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      val got = spark.table(sink)
        .select($"vec_id", $"list_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"stream $got\nbatch $want")
      // the emitted qv/nrm must match the batch quantize too (one
      // ingest pass feeds both serving tables)
      val gq = spark.table(sink)
        .select($"vec_id", $"qv", $"nrm").as[(Long, Seq[Long], Long)]
        .collect().toSet
      val wq = VectorOps.quantize(corpus(arriving.map(_._1)),
          $"vec_id", $"embedding")
        .select($"vec_id", $"qv", $"nrm").as[(Long, Seq[Long], Long)]
        .collect().toSet
      assert(gq == wq)
    } finally { q.stop(); spark.catalog.dropTempView(sink) }
  }

  test("streaming PQ encode equals batch pqEncode, row-for-row") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseQ = VectorOps.quantize(corpus(0L until 30L), $"vec_id", $"embedding")
    val codebook = graft.Pins.pin(VectorOps.pqCodebook(baseQ, 2, 4))
    codebook.count()
    val arriving = (30L until 40L).map(i => (i, vec(i)))
    val want = VectorOps.pqEncode(
        VectorOps.quantize(corpus(arriving.map(_._1)), $"vec_id", $"embedding"),
        codebook, 2)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toSet
    val mem = MemoryStream[(Long, Seq[Double])]
    val sink = "pqa_spec_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = VectorOps.streamingPqEncode(
        mem.toDF().select($"_1".as("vec_id"), $"_2".as("emb")),
        $"vec_id", $"emb", codebook, 2)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(arriving: _*); q.processAllAvailable()
      val got = spark.table(sink)
        .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toSet
      assert(got == want, s"stream $got\nbatch $want")
    } finally { q.stop(); spark.catalog.dropTempView(sink) }
  }

  test("index append survives stop + restart: every row lands exactly once") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseQ = VectorOps.quantize(corpus(0L until 30L), $"vec_id", $"embedding")
    val cents = VectorOps.trainCentroids(baseQ, 4, 1)
      .select($"cent_id", $"cv", $"cn").as[(Long, Seq[Long], Long)]
      .collect().toSeq.toDF("cent_id", "cv", "cn")
    val ckpt = Files.createTempDirectory("graft_apd_ckpt").toString
    val outDir = Files.createTempDirectory("graft_apd_out").toString
    val mem = MemoryStream[(Long, Seq[Double])]
    def start() = VectorOps.streamingIvfAssign(
        mem.toDF().select($"_1".as("vec_id"), $"_2".as("emb")),
        $"vec_id", $"emb", cents)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    // epoch 1: half the arriving vectors land, then a planned restart
    val q1 = start()
    try {
      mem.addData((30L until 35L).map(i => (i, vec(i))): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // epoch 2: a NEW query on the same checkpoint appends the rest
    val q2 = start()
    try {
      mem.addData((35L until 40L).map(i => (i, vec(i))): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val landed = spark.read.parquet(outDir)
      .select($"vec_id", $"list_id").as[(Long, Long)].collect().toSeq
    val want = VectorOps.assignVectors(
        VectorOps.quantize(corpus(30L until 40L), $"vec_id", $"embedding"),
        cents)
      .as[(Long, Long)].collect().toSeq
    // set equality AND count equality: a replayed batch would keep the
    // set identical while doubling rows
    assert(landed.toSet == want.toSet, s"landed $landed\nwant $want")
    assert(landed.size == want.size,
      s"rows must land exactly once: ${landed.size} vs ${want.size}")
  }

  test("poison rows (null id / null embedding) are dropped, not crashed on") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val baseQ = VectorOps.quantize(corpus(0L until 10L), $"vec_id", $"embedding")
    val cents = VectorOps.trainCentroids(baseQ, 2, 0)
      .select($"cent_id", $"cv", $"cn").as[(Long, Seq[Long], Long)]
      .collect().toSeq.toDF("cent_id", "cv", "cn")
    val mem = MemoryStream[(java.lang.Long, Seq[Double])]
    val sink = "apd_poison_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = VectorOps.streamingIvfAssign(
        mem.toDF().select($"_1".as("vec_id"), $"_2".as("emb")),
        $"vec_id", $"emb", cents)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((null.asInstanceOf[java.lang.Long], vec(50L)),
        (java.lang.Long.valueOf(51L), null), (java.lang.Long.valueOf(52L), vec(52L)))
      q.processAllAvailable()
      val got = spark.table(sink).select($"vec_id").as[Long].collect().toSeq
      assert(got == Seq(52L), s"only the clean row lands: $got")
    } finally { q.stop(); spark.catalog.dropTempView(sink) }
  }
}
