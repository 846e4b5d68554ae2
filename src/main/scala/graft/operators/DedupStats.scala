package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft._

/** Cap-overflow observability for the capped-bucket candidate generators.
  *
  * Every dedup-family candidate generator drops buckets larger than
  * `maxBucket` (the skew guard that keeps a degenerate mega-bucket — a
  * boilerplate shingle, a constant band — from exploding one task). At
  * 100 TB that drop is a deliberate recall trade, and it must be a
  * METRIC, not a silent hole: a corpus whose hot buckets swallow 30% of
  * documents looks identical to a clean one in the output alone.
  *
  * Mechanism: the bucket-count aggregate (computed anyway for the cap)
  * carries a Spark `observe` — a native `CollectMetrics` node, zero
  * effect on results or plan shape — summing the buckets and rows over
  * the cap. A [[QueryExecutionListener]] harvests the metrics at action
  * completion into process-global counters (same pattern as
  * `TsdIndex.PlanStats`) and logs any non-zero drop to stderr with the
  * operator tag. Listener callbacks are asynchronous; [[awaitQuiesce]]
  * gives tests a deterministic read point. */
object DedupStats {
  /** Buckets dropped for exceeding their cap, cumulative per process. */
  val droppedBuckets = new AtomicLong(0)
  /** Rows (doc×bucket memberships) inside those dropped buckets — the
    * upper bound on documents a cap overflow can silently exclude. */
  val droppedRows = new AtomicLong(0)
  /** Size of the largest dropped bucket seen (skew magnitude). */
  val maxDroppedBucket = new AtomicLong(0)

  /** Buckets SPLIT (not dropped) for exceeding their cap — the
    * containment generator's bounded sub-bucket path: work stays capped
    * but candidates survive, so the trade is cost, never recall. */
  val splitBuckets = new AtomicLong(0)
  /** Rows inside those split buckets (the bounded extra join volume). */
  val splitRows = new AtomicLong(0)
  /** Size of the largest split bucket seen (skew magnitude). */
  val maxSplitBucket = new AtomicLong(0)

  def reset(): Unit = {
    droppedBuckets.set(0); droppedRows.set(0); maxDroppedBucket.set(0)
    splitBuckets.set(0); splitRows.set(0); maxSplitBucket.set(0)
  }

  private val seq = new AtomicLong(0)
  // keyed by session: a JVM can host several sessions over its life
  // (tests, restarts, concurrent apps — Pins documents the same case),
  // and a once-per-process flag would leave every later session's
  // metrics unharvested. WEAKLY keyed (synchronized WeakHashMap-backed
  // set): a strong key would pin every stopped session — and its whole
  // object graph — for the life of the JVM, the very churn scenario
  // this registry exists for. The listener itself dies with its
  // session's listener bus, so no explicit deregistration is needed.
  private val registeredSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  private val Prefix = "graft.capDrop."
  private val SplitPrefix = "graft.capSplit."

  /** Attach the overflow observation to a bucket-counts DataFrame
    * (columns: keys..., count). Returns the same rows, instrumented;
    * callers apply their own `[2, maxBucket]` filter on top. */
  def observeCapDrops(counts: DataFrame, tag: String,
                      maxBucket: Int): DataFrame = {
    ensureListener(counts.sparkSession)
    val over: Column = $"count" > maxBucket
    // unique name per call site instance: one plan may stack several
    // capped generators (funnel/pipeline) and observe names must not
    // collide within a query
    counts.observe(s"$Prefix$tag.${seq.incrementAndGet()}",
      sum(when(over, 1L).otherwise(0L)).as("dropped_buckets"),
      sum(when(over, $"count").otherwise(0L)).as("dropped_rows"),
      max(when(over, $"count").otherwise(0L)).as("max_bucket"))
  }

  /** [[observeCapDrops]]' sibling for generators that SPLIT over-cap
    * buckets into bounded sub-buckets instead of dropping them: same
    * instrumentation, separate counters, so the census distinguishes a
    * recall hole (drop) from bounded extra work (split). */
  def observeCapSplits(counts: DataFrame, tag: String,
                       maxBucket: Int): DataFrame = {
    ensureListener(counts.sparkSession)
    val over: Column = $"count" > maxBucket
    counts.observe(s"$SplitPrefix$tag.${seq.incrementAndGet()}",
      sum(when(over, 1L).otherwise(0L)).as("dropped_buckets"),
      sum(when(over, $"count").otherwise(0L)).as("dropped_rows"),
      max(when(over, $"count").otherwise(0L)).as("max_bucket"))
  }

  private def ensureListener(spark: SparkSession): Unit =
    if (registeredSessions.add(spark))
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = {
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith(Prefix)) {
              val b = Option(row.getAs[java.lang.Long]("dropped_buckets"))
                .fold(0L)(_.longValue)
              if (b > 0) {
                val r = row.getAs[Long]("dropped_rows")
                val m = row.getAs[Long]("max_bucket")
                droppedBuckets.addAndGet(b)
                droppedRows.addAndGet(r)
                maxDroppedBucket.getAndAccumulate(m, math.max)
                System.err.println(s"[capDrop] ${name.stripPrefix(Prefix)}: " +
                  s"$b buckets over cap ($r rows, largest $m) dropped — " +
                  "potential recall hole; raise maxBucket or pre-split keys")
              }
            } else if (name.startsWith(SplitPrefix)) {
              val b = Option(row.getAs[java.lang.Long]("dropped_buckets"))
                .fold(0L)(_.longValue)
              if (b > 0) {
                val r = row.getAs[Long]("dropped_rows")
                val m = row.getAs[Long]("max_bucket")
                splitBuckets.addAndGet(b)
                splitRows.addAndGet(r)
                maxSplitBucket.getAndAccumulate(m, math.max)
                System.err.println(s"[capSplit] ${name.stripPrefix(SplitPrefix)}: " +
                  s"$b buckets over cap ($r rows, largest $m) split into " +
                  "bounded sub-buckets — extra join volume, no recall loss")
              }
            }
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })

  /** Best-effort wait for the async listener bus to drain (tests). */
  def awaitQuiesce(spark: SparkSession): Unit =
    org.apache.spark.graftbridge.ListenerBridge
      .waitUntilEmpty(spark.sparkContext, 30000)
}
