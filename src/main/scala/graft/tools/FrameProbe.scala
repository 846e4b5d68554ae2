package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.operators.MultimodalOps
import graft.queries.Tables

/** Stage-by-stage timing of the llm_frame_dedup pipeline at a given SF —
  * diagnostic for the bench-creep investigation, plus a declarative
  * (no typed-encoder boundary) frame-slicing variant for comparison. */
object FrameProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("frameprobe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.table(spark, sf, "documents")
    docs.count()

    def bench(label: String)(build: => DataFrame): Unit = {
      val t = Pins.scoped {
        val df = build
        val n = df.count()
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); df.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"  $label%-34s $best%.3f s (rows=$n)")
        best
      }
      val _ = t
    }

    for (round <- 1 to 2) {
      println(s"== round $round")
      bench("mediaFromDocs") {
        MultimodalOps.mediaFromDocs(docs).toDF()
      }
      bench("sampleFrames (typed flatMap)") {
        MultimodalOps.sampleFrames(MultimodalOps.mediaFromDocs(docs)).toDF()
      }
      bench("frame_h projection only") {
        MultimodalOps.sampleFrames(MultimodalOps.mediaFromDocs(docs)).toDF()
          .select($"media_id", md5(hex($"frame")).as("frame_h"))
      }
      bench("frameDedup typed-frames form") {
        MultimodalOps.frameDedup(
          MultimodalOps.sampleFrames(MultimodalOps.mediaFromDocs(docs)), 2L)
          .orderBy("frame_h")
      }
      bench("frameDedup media form (shipped)") {
        MultimodalOps.frameDedup(MultimodalOps.mediaFromDocs(docs))
          .orderBy("frame_h")
      }
      bench("declarative slicing variant") {
        val fb = MultimodalOps.FrameBytes
        val m = MultimodalOps.mediaFromDocs(docs).toDF()
        val frames = m
          .select($"media_id", $"payload",
            explode(sequence(lit(0),
              greatest(ceil(octet_length($"payload") / lit(fb.toDouble))
                .cast("int") - 1, lit(0)), lit(2))).as("f"))
          .select($"media_id",
            md5(hex(substring($"payload", $"f" * fb + 1, lit(fb)))).as("frame_h"))
        val fr = Pins.pin(frames)
        val media = fr.select($"frame_h", $"media_id").distinct()
          .groupBy($"frame_h")
          .agg(count(lit(1)).as("n_media"), min($"media_id").as("first_media"))
          .filter($"n_media" >= 2)
        fr.groupBy($"frame_h").agg(count(lit(1)).as("n_occ"))
          .join(media, "frame_h")
          .select($"frame_h", $"n_media", $"n_occ", $"first_media")
          .orderBy("frame_h")
      }
    }
    spark.stop()
  }
}
