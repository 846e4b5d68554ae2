package graft.tools

import org.apache.spark.sql.SparkSession

import graft._

/** Single-query bench harness (diagnostics, not the bench): times the
  * named `SparkEntry.queries` entries exactly like `graft.Bench` — one
  * untimed warmup (plan construction + first count, reusing the
  * warmup's operator pins) then min of 3 timed iterations — so a
  * perf-tuning loop doesn't pay the full 135-query battery per probe.
  *
  * Run: `sbt "runMain graft.tools.QueryTimer llm_textrank llm_pmi"`. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().appName("querytimer")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(f"[qt] $name%-24s UNKNOWN")
        case Some(fn) =>
          val best = Pins.scoped {
            try {
              fn(spark, sfDir).count() // untimed warmup
              (1 to 3).map { _ =>
                val t0 = System.nanoTime()
                fn(spark, sfDir).count()
                (System.nanoTime() - t0) / 1e9
              }.min
            } catch { case e: Throwable =>
              println(s"[qt] $name FAILED: ${e.getMessage}"); -1.0 }
          }
          println(f"[qt] $name%-24s $best%.3f s")
      }
    }
    spark.stop()
  }
}
