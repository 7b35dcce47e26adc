package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `SparkContext.listenerBus` (`private[spark]`): the bench
  * must quiesce the async listener bus before draining its per-stage
  * metrics, or stage records of a completed job can be attributed to the
  * next query.
  *
  * Best-effort by design: `waitUntilEmpty` THROWS TimeoutException when
  * the bus does not drain in time, and it runs inside every timed bench
  * shot — one slow drain on a loaded box must degrade to slightly
  * misattributed stage metrics, not abort the whole bench run. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println(
          s"[bench] listener bus not drained in ${timeoutMs}ms; " +
            "stage attribution for this shot may bleed into the next")
    }
}
