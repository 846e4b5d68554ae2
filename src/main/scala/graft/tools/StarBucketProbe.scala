package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.sources.Bucketing

/** Bucketed-layout demonstration on the star-join parity corpus
  * (diagnostics, not the bench): the 160× scale-parity run shows
  * `rel_star_revenue` flat at ~2× of DuckDB on one box — the steady-
  * state cost of the lineitem⋈orders orderkey exchange against an
  * in-process hash join. The 100 TB deployment answer is not a faster
  * exchange but NO exchange: bucket both fact tables by the join key at
  * write time ([[Bucketing.writeBucketed]]) and every subsequent join
  * on that key is bucket-local. This probe writes the expanded
  * lineitem/orders as co-bucketed tables, re-times the identical
  * star-revenue aggregation through the bucketed read path, and
  * asserts the orderkey Exchange is gone from the physical plan.
  *
  * Usage: `runMain graft.tools.StarBucketProbe [k] [parityDir]
  * [buckets]` (default 40, /tmp/parity, 32) — run ParityProbe first to
  * materialize the expanded corpus. */
object StarBucketProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(40)
    val out = args.drop(1).headOption.getOrElse("/tmp/parity")
    val buckets = args.drop(2).headOption.map(_.toInt).getOrElse(32)
    val dir = s"$out/${k}x"
    val wh = s"$out/warehouse_${k}x"
    val spark = SparkSession.builder().appName("starbucketprobe")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits.localSeqToDatasetHolder

    def star(li: DataFrame, o: DataFrame, c: DataFrame,
             n: DataFrame, r: DataFrame): DataFrame =
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          sum(round($"l_extendedprice" * 100).cast("long") *
              (lit(100L) - round($"l_discount" * 100).cast("long")))
            .as("rev_u"),
          count(lit(1)).as("n_lines"))

    def timed(label: String)(df: => DataFrame): Unit = {
      val d = df
      val rows = d.count() // warmup
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); d.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      val exchanges = d.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
      println(f"[starbucket] $label%-10s ${t}%.3f s (rows=$rows, " +
        s"hash-exchanges=$exchanges)")
    }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val n = spark.read.parquet(s"$dir/nation.parquet")
    val r = spark.read.parquet(s"$dir/region.parquet")
    timed("plain")(star(li, o, c, n, r))

    // one-time write-side shuffle buys every later run a bucket-local
    // orderkey join (the nightly-fact-table deployment shape)
    val t0 = System.nanoTime()
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", buckets)
    Bucketing.writeBucketed(o, "o_b", "o_orderkey", buckets)
    println(f"[starbucket] bucketed write (one-time): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    timed("bucketed")(
      star(spark.table("li_b"), spark.table("o_b"), c, n, r))
    spark.stop()
  }
}
