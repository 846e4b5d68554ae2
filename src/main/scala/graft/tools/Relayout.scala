package graft.tools

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Multi-file input gate (diagnostics): rewrite every single-file test
  * table as an N-file parquet directory with rows round-robined across
  * files — the layout a real 100 TB table has. Running `graft.Verify`
  * against the relaid copy (oracle still on the original — same rows)
  * proves no query's result depends on single-file row order or
  * one-partition physical plans:
  *
  *   sbt "runMain graft.tools.Relayout /root/testdata/sf0.01 /tmp/sf_multi"
  *   sbt "runMain graft.Verify /tmp/sf_multi /tmp/verify_multi"
  *   python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_multi
  */
object Relayout {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Relayout <srcSfDir> <dstDir> [nFiles]")
    val (src, dst) = (args(0), args(1))
    val nFiles = args.lift(2).map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().appName("relayout").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Files.list(Paths.get(src)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    for (t <- tables) {
      val name = t.getFileName.toString
      // round-robin repartition: deliberately destroys file/row order
      spark.read.parquet(t.toString).repartition(nFiles)
        .write.mode("overwrite").parquet(s"$dst/$name")
      println(s"relaid $name -> $nFiles files")
    }
    spark.stop()
  }
}
