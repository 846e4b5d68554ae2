package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Session-level registry of operator-pinned datasets — the explicit
  * unpersist-on-completion story for the dedup/ANN/text operators.
  *
  * Those operators persist one intermediate each (the corpus-sized
  * computation that feeds several consumers: shingle-hash arrays, LSH
  * buckets, the trigram explode). The DataFrames they return are lazy, so
  * the operator itself can never know when the caller is done; instead
  * every internal persist goes through [[pin]], and the CALLER releases
  * at its query boundary:
  *
  *   - one-shot: `Pins.scoped { op(...).collect() }`
  *   - long-lived sessions running many corpora: `Pins.releaseAll()`
  *     between runs (what `Bench`/`Verify` do per query)
  *
  * Without the release, a long-lived session accretes cache entries and
  * Spark's CacheManager logs `Asked to cache already cached data` on
  * every repeated call (identical-plan dedup keeps memory bounded for
  * same-input reruns, but distinct corpora pile up). Release is
  * fire-and-forget (`blocking=false`): freeing is async, correctness
  * unaffected.
  *
  * The registry is process-global on purpose: a query boundary is a
  * session-level event. Concurrent sessions sharing one JVM should scope
  * releases to their own quiet points. */
object Pins {
  private val live = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` and register it for the next [[releaseAll]]. */
  def pin[T](ds: Dataset[T],
             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    live.add(ds)
    ds
  }

  /** Unpersist every pinned dataset (call when the query's action is done). */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(blocking = false); d = live.poll() }
  }

  /** Run `f` (which must materialize its result) and release its pins. */
  def scoped[T](f: => T): T =
    try f finally releaseAll()
}
