package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft._
import graft.operators.DedupOps

/** Measures the STREAMING STATE BOUND the scaladocs claim: feed
  * [[DedupOps.streamingNearDedup]] an event-time-ordered stream whose
  * span far exceeds the lateness horizon and record the state-store
  * row count as the feed grows. The 100 TB claim is that state is
  * O(active horizon), not O(stream): doubling the feed length must NOT
  * double peak state once the span passes the horizon — rows per doc
  * stay bounded by NumBands cells, and eviction keeps only cells
  * sighted within `horizonSec` live.
  *
  * Docs are synthetic (deterministic word soup, no shared shingle
  * structure beyond chance), one doc per second of event time, fed in
  * `chunk`-doc micro-batches. Prints one line per N: peak state rows,
  * final-batch state rows, peak rows/doc-in-horizon.
  *
  * Run: `sbt "runMain graft.tools.StreamStateProbe"` (defaults
  * N=1k/4k/16k, horizon 600 s). */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().appName("streamstate")
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sparkContext.setLogLevel("ERROR")

    val horizonSec = 600L
    val ns = if (args.nonEmpty) args.map(_.toLong).toSeq
             else Seq(1000L, 4000L, 16000L)

    // deterministic word soup: ~40 words/doc from a 4k-word synthetic
    // vocabulary; docs share words (realistic shingle buckets) but no
    // planted near-dups, so state ≈ live cells, not collision artifacts
    def docText(i: Long): String =
      (0 until 40).map { w =>
        val h = (i * 40 + w) * 2654435761L % 4096
        s"w$h"
      }.mkString(" ")

    def peakState(q: StreamingQuery): (Long, Long) = {
      val rows = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal)
      (rows.maxOption.getOrElse(0L), rows.lastOption.getOrElse(0L))
    }

    println(s"[state] horizon=${horizonSec}s, 1 doc/s of event time, " +
      s"cells/doc=${graft.functions.DetHash.NumBands}")
    ns.foreach { n =>
      val mem = MemoryStream[(Long, String)]
      val stream: DataFrame = mem.toDF().select($"_1".as("doc_id"),
        timestamp_seconds(lit(1700000000L) + $"_1").as("ts"),
        $"_2".as("text"))
      val sink = s"ssp_${java.util.UUID.randomUUID.toString.take(8)}"
      val q = DedupOps.streamingNearDedup(stream, horizonSec)
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append).start()
      var peak = 0L
      try {
        (0L until n).grouped(500).foreach { chunk =>
          mem.addData(chunk.map(i => (i, docText(i))).toSeq: _*)
          q.processAllAvailable()
          peak = math.max(peak, peakState(q)._1)
        }
      } finally q.stop()
      val perDoc = peak.toDouble / math.min(n, horizonSec)
      println(f"[state] n=$n%6d span=${n}s peakStateRows=$peak%8d " +
        f"rows/doc-in-horizon=$perDoc%6.1f")
      spark.sql(s"DROP TABLE IF EXISTS $sink")
    }

    // same sweep for the frame-cell state: 6 frames/item (3 sampled
    // cells at stride 2), payloads deterministic and distinct, so
    // state ≈ live cells — the identical O(active horizon) bound
    val fb = graft.operators.MultimodalOps.FrameBytes
    println(s"[state] frame-dedup: 3 sampled cells/item, horizon=${horizonSec}s")
    ns.foreach { n =>
      val mem = MemoryStream[(Long, Array[Byte])]
      val stream: DataFrame = mem.toDF().select($"_1".as("media_id"),
        timestamp_seconds(lit(1700000000L) + $"_1").as("ts"),
        $"_2".as("payload"))
      val sink = s"ssf_${java.util.UUID.randomUUID.toString.take(8)}"
      val q = graft.operators.MultimodalOps
        .streamingFrameDedup(stream, horizonSec)
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append).start()
      var peak = 0L
      try {
        (0L until n).grouped(500).foreach { chunk =>
          mem.addData(chunk.map { i =>
            // every frame globally unique: its 8 lead bytes are the
            // little-endian global frame id (a low-byte multiply here
            // first produced payloads that repeated every 8 items —
            // peak state 8, a degenerate fixture, not a bound)
            (i, Array.tabulate(6 * fb) { j =>
              val o = j % fb
              if (o < 8) (((i * 6 + j / fb) >>> (8 * o)) & 0xFF).toByte
              else 0x55.toByte
            })
          }.toSeq: _*)
          q.processAllAvailable()
          peak = math.max(peak, peakState(q)._1)
        }
      } finally q.stop()
      val perDoc = peak.toDouble / math.min(n, horizonSec)
      println(f"[state] n=$n%6d span=${n}s peakStateRows=$peak%8d " +
        f"cells/item-in-horizon=$perDoc%6.1f")
      spark.sql(s"DROP TABLE IF EXISTS $sink")
    }
    spark.stop()
  }
}
