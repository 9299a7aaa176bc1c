package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** The listener bus drains asynchronously, but Bench snapshots
  * per-query task-metric deltas (shuffle bytes, spill, peak memory)
  * around each timed repetition — without a flush the delta could
  * miss task-end events still in flight. `SparkContext.listenerBus`
  * is `private[spark]`; this object lives under `org.apache.spark`
  * solely to expose the drain to [[graft.Bench]]. */
object ListenerFlush {
  def apply(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(30000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
