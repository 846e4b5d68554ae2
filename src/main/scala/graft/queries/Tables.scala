package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loaders. `events.parquet` carries TIMESTAMP(NANOS)
  * which Spark's parquet reader rejects; read the raw int64 nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a microsecond
  * timestamp with exact integer division — the same truncation DuckDB
  * applies when it loads the file, so both engines see identical values. */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def events(s: SparkSession, dir: String): DataFrame = {
    // nanosAsLong is also set at session build in Verify/Bench; this guard
    // only covers driver-supplied sessions and avoids re-setting otherwise.
    if (s.conf.getOption(NanosConf).forall(_ != "true")) s.conf.set(NanosConf, "true")
    // `ts DIV 1000` truncates toward zero == floor for the post-1970
    // fixture data (all nanos positive); matches DuckDB's load of the file.
    table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
}
