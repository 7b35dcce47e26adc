package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `SparkContext.listenerBus` (`private[spark]`): the bench
  * must quiesce the async listener bus before draining its per-stage
  * metrics, or stage records of a completed job can be attributed to the
  * next query. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
