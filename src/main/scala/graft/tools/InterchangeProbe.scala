package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft._
import graft.sources.EtsdSource

/** Cross-implementation interchange probe (diagnostics): decode a `.tsd`
  * file written by the REFERENCE implementation (its `edd` daemon +
  * `etsdSave.c`) and print per-channel stats over the stored samples —
  * compared by hand against `etsdCmd query q=tot/min/max` output. Where
  * the two disagree, the reference's documented read-path bugs (SURVEY
  * §2.9 "known reference bugs") are the expected cause: the save path is
  * the authority both sides share. */
object InterchangeProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/refbuild/ref.tsd")
    val spark = SparkSession.builder().appName("interchange").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = EtsdSource.read(spark, path).cache()
    println("[probe] samples (deltas for counters), excluding registers:")
    df.filter(!$"is_register" && $"valid")
      .groupBy($"channel")
      .agg(count(lit(1)).as("n"), sum($"value").as("tot"),
        min($"value").as("vmin"), max($"value").as("vmax"))
      .orderBy($"channel")
      .collect().foreach(r => println(s"[probe] ${r.mkString("\t")}"))
    println("[probe] registers:")
    df.filter($"is_register").orderBy($"ts", $"channel")
      .collect().foreach(r => println(s"[probe] ${r.mkString("\t")}"))
    println("[probe] block count: " +
      EtsdSource.blockTimestamps(spark, path).count())
    spark.stop()
  }
}
