package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft._
import graft.streaming.{Ingest, SrcRow}

/** The streaming ingest path inside the oracle gate (SURVEY.md §2.10):
  * a real Structured Streaming run — simulator ticks → `simTransform` →
  * stateful `counterDeltas` decode → `commitStream` to partitioned
  * parquet, fed as three micro-batches so the per-channel
  * `LastReading`/`MissedUpdate` state crosses batch boundaries
  * (etsd.c:113-121) — then per-channel totals of the INGESTED output,
  * oracle-checked against the generator's closed form recomputed
  * independently in DuckDB (generate_series + the same sawtooth odometer
  * and averaged-delta recurrence, etsdSave.c:394-402).
  *
  * The stream is self-contained (no sf tables) so the oracle is pure SQL
  * arithmetic; determinism comes from fixed t0/N/status cadence. Every
  * invocation ingests into a fresh temp dir. */
object StreamingQueries {

  private val T0 = 1700000000L
  private val N = 600L
  private val StatusEvery = 7 // every 7th tick is a checksum failure
  private val IntervalSec = 10L
  private val BlockSec = 600L // 60-interval tumbling block commit

  def streamIngestTotals(spark: SparkSession): DataFrame = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("stream_ingest")
    val out = s"$dir/out"
    val mem = MemoryStream[Long]
    val ticks = mem.toDF().select($"value".as("n"),
      timestamp_seconds(lit(T0) + $"value" * IntervalSec).as("ts"))
    val deltas = Ingest.counterDeltas(
      Ingest.simTransform(ticks, 0, Some(StatusEvery)).as[SrcRow])
    val q = Ingest.commitStream(deltas.toDF(), BlockSec, out, s"$dir/ckpt")
    try {
      Seq(1L to 200L, 201L to 400L, 401L to N).foreach { batch =>
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.read.parquet(out)
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_rows"),
        count($"delta").as("n_deltas"),
        (count(lit(1)) - count($"delta")).as("n_invalid"),
        sum($"delta").as("total"))
      .orderBy("channel")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_stream_ingest" -> ((s, _) => streamIngestTotals(s)))

  def oracles: Map[String, String] = Map(
    // the generator's closed form, recomputed from scratch: valid ticks
    // (n % StatusEvery != 0) carry the sawtooth odometer; consecutive
    // valid ticks at distance g emit the averaged delta (odo-podo)//g
    // (g-1 missed intervals -> divide by 1+missed); every invalid tick
    // and each channel's first valid tick emit a NULL-delta row
    "ts_stream_ingest" -> s"""
      WITH chans(channel, k, amp) AS (VALUES
        ${Ingest.SimChans.map { case (n, k, a) => s"('src0_$n', $k, $a)" }
          .mkString(", ")}),
      t AS (SELECT n FROM generate_series(1, $N) g(n)),
      r AS (
        SELECT channel, n,
               ((n // k) * ((k * (k-1)) // 2) +
                ((n % k) * ((n % k) + 1)) // 2) * amp AS odo
        FROM chans CROSS JOIN t WHERE n % $StatusEvery <> 0),
      d AS (
        SELECT channel, n, odo,
               lag(odo) OVER (PARTITION BY channel ORDER BY n) AS podo,
               lag(n)   OVER (PARTITION BY channel ORDER BY n) AS pn
        FROM r)
      SELECT channel,
             CAST($N AS BIGINT) AS n_rows,
             CAST(count(podo) AS BIGINT) AS n_deltas,
             CAST($N - count(podo) AS BIGINT) AS n_invalid,
             CAST(sum((odo - podo) // (n - pn)) AS BIGINT) AS total
      FROM d GROUP BY 1 ORDER BY 1""")
}
