package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft._
import graft.operators.{DedupOps, TextAnalysisOps}
import graft.queries.Tables

/** Diagnostic for the streaming-contamination hang: prints the static
  * eval-index physical plan, then runs ONE small micro-batch with
  * explain enabled to see the per-batch plan the stream actually runs. */
object StreamCtProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark: SparkSession = SparkSession.builder().appName("streamctprobe")
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sparkContext.setLogLevel("WARN")

    val sp = TextAnalysisOps.withSplit(Tables.table(spark, sf, "documents"),
      $"doc_id")
    val evalIdx = Pins.pin(DedupOps.contaminationIndex(
      sp.filter($"split" === "test"), $"doc_id", $"text"))
    val t0 = System.nanoTime()
    println(f"evalIdx rows: ${evalIdx.count()} in ${(System.nanoTime()-t0)/1e9}%.1f s")

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().select($"_1".as("doc_id"),
      timestamp_seconds(lit(1700000000L) + $"_1").as("ts"), $"_2".as("text"))
    val out = DedupOps.streamingContamination(stream, evalIdx, 0.5, 7200L)
    val sink = s"ctp_${java.util.UUID.randomUUID.toString.take(8)}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      val docs = sp.filter($"split" =!= "test" && $"doc_id" <= 500L)
        .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
      docs.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
        val t1 = System.nanoTime()
        mem.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        println(f"chunk $i (${chunk.length} docs): ${(System.nanoTime()-t1)/1e9}%.1f s")
      }
      println("=== per-batch plan ===")
      println(q.explain())
    } finally q.stop()
    println(s"flagged rows: ${spark.table(sink).count()}")
    spark.stop()
  }
}
