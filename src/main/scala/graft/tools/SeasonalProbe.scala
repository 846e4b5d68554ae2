package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.operators.TimeSeriesOps

/** One-question probe (diagnostics, not the bench): is the two-scan
  * broadcast-moments shape of [[TimeSeriesOps.seasonalOutliers]] the
  * right 100 TB trade, or does a SINGLE-scan window form beat it at
  * scale? (r11 verdict: seasonal_anom is the only parity curve ending
  * near the 2× bar — 1.67× at 160×; "try the single-scan alternative,
  * keep whichever measures better, record the loser's number".)
  *
  * Contenders over the same expanded events dir:
  *  - `two-scan broadcast` (shipped): moments groupBy (120 groups,
  *    map-side partials, tiny shuffle) + broadcast join back over a
  *    second full scan. Zero data-sized shuffles; reads the source
  *    twice.
  *  - `single-scan window`: one scan, moments via unbounded-frame
  *    window over (channel, phase) — ONE data-sized shuffle and
  *    per-group buffering in WindowExec (the classic spill hazard at a
  *    hot phase), but the source is read once.
  *
  * Run: `runMain graft.tools.SeasonalProbe [expandedDir]` (default the
  * ParityProbe 160x events corpus). */
object SeasonalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/parity/160x")
    val spark = SparkSession.builder().appName("seasonalprobe")
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = graft.queries.Tables.events(spark, dir)
    events.count() // warm listings/footers

    def shipped(): DataFrame =
      TimeSeriesOps.seasonalOutliers(events, $"event_type", $"ts", $"value")

    // the single-scan contender, value-identical by construction
    def windowed(): DataFrame = {
      val dec = org.apache.spark.sql.types.DecimalType(20, 0)
      val v = events.filter($"value".isNotNull)
        .select($"event_type".as("channel"), unix_micros($"ts").as("ts_us"),
          ((unix_micros($"ts") / 1000000L % 86400L) / 3600L)
            .cast("long").as("phase"),
          round($"value" * 100).cast("long").as("vc"))
      val w = Window.partitionBy($"channel", $"phase")
      v.withColumn("s", sum($"vc".cast(dec)).over(w))
        .withColumn("sq", sum(($"vc".cast(dec) * $"vc".cast(dec))).over(w))
        .withColumn("n", count(lit(1)).over(w))
        .filter($"n" >= 12L)
        .withColumn("mu", $"s".cast("double") / $"n")
        .withColumn("vr", $"sq".cast("double") / $"n" - $"mu" * $"mu")
        .filter($"vr" > 0 &&
          ($"vc" - $"mu") * ($"vc" - $"mu") > lit(9.0) * $"vr")
        .select($"channel", $"phase", $"ts_us",
          ($"vc".cast("double") / 100.0).as("value"),
          (($"vc" - $"mu") / sqrt($"vr")).as("z"))
    }

    def time(label: String)(f: () => DataFrame): Unit = {
      val rows = f().count() // untimed warmup
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f().count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[seasonal] $label%-24s $t%.3f s (rows=$rows)")
    }
    time("two-scan broadcast")(shipped)
    time("single-scan window")(windowed)
    // sanity: same verdict set
    val a = shipped().selectExpr("channel", "phase", "ts_us")
    val b = windowed().selectExpr("channel", "phase", "ts_us")
    val d = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[seasonal] verdict-set symmetric diff: $d (must be 0)")
    spark.stop()
  }
}
