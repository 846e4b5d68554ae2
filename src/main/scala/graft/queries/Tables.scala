package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._

/** Testdata table loaders. `events.parquet` carries TIMESTAMP(NANOS)
  * which Spark's parquet reader rejects; read the raw int64 nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a microsecond
  * timestamp with exact integer division — the same truncation DuckDB
  * applies when it loads the file, so both engines see identical values. */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Events with the raw layout exposed: a `date=YYYY-MM-DD`-partitioned
    * copy (the 100 TB deployment shape, written by `tools.Relayout
    * --date-partition-events`) additionally carries its `date` partition
    * column here. Callers that can scope their scan go through
    * [[eventsBetween]], which turns a time range into a partition-
    * pruning predicate; everything else uses [[events]], whose schema is
    * layout-independent. */
  private def eventsRaw(s: SparkSession, dir: String): DataFrame = {
    // nanosAsLong is also set at session build in Verify/Bench; this guard
    // only covers driver-supplied sessions and avoids re-setting otherwise.
    if (s.conf.getOption(NanosConf).forall(_ != "true")) s.conf.set(NanosConf, "true")
    // `ts DIV 1000` truncates toward zero == floor for the post-1970
    // fixture data (all nanos positive); matches DuckDB's load of the file.
    table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  def events(s: SparkSession, dir: String): DataFrame =
    eventsRaw(s, dir).drop("date")

  /** Events scoped to `[fromSec, toSec)` epoch seconds: the raw `ts`
    * range predicate (parquet row-group pruning on any layout) PLUS —
    * when the table is date-partitioned — the date-range partition
    * predicate derived from the same bounds, so the scan plans only the
    * touched partitions instead of listing 100 TB of them. Catalyst
    * cannot infer `date BETWEEN …` from a `ts` range on its own (the
    * column relation is ours, not the engine's), which is why the query
    * layer states both. Output schema is layout-independent. */
  def eventsBetween(s: SparkSession, dir: String,
                    fromSec: Long, toSec: Long): DataFrame = {
    val raw = eventsRaw(s, dir)
    val scoped = raw.filter($"ts" >= timestamp_seconds(lit(fromSec)) &&
      $"ts" < timestamp_seconds(lit(toSec)))
    if (raw.columns.contains("date"))
      scoped.filter($"date" >= to_date(timestamp_seconds(lit(fromSec))) &&
          $"date" <= to_date(timestamp_seconds(lit(toSec))))
        .drop("date")
    else scoped
  }

  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
}
