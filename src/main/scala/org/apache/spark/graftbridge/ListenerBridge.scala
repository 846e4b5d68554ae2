package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; tests (and the
  * DedupStats quiesce helper) need its `waitUntilEmpty` to read
  * asynchronously-delivered `QueryExecutionListener` metrics
  * deterministically. Same shim pattern as sql.graftbridge.ColumnBridge. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
