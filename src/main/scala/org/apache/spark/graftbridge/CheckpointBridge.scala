package org.apache.spark.graftbridge

import org.apache.spark.SparkContext
import org.apache.spark.rdd.ReliableRDDCheckpointData

/** `ReliableRDDCheckpointData.cleanCheckpoint` is `private[spark]`; the
  * iterative operators (DedupOps.dupClusters) need it to reap a
  * superseded round's reliable-checkpoint files inside the loop — the
  * same call Spark's own ContextCleaner makes when a checkpointed RDD is
  * garbage-collected, invoked eagerly because a long BSP run must not
  * accumulate one label-table snapshot per round in the checkpoint dir.
  * Same shim pattern as [[ListenerBridge]]. */
object CheckpointBridge {
  /** Delete the reliable-checkpoint files of the RDD with `rddId`.
    * No-op if the RDD was never reliably checkpointed. */
  def cleanCheckpoint(sc: SparkContext, rddId: Int): Unit =
    ReliableRDDCheckpointData.cleanCheckpoint(sc, rddId)
}
