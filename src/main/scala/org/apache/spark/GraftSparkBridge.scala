package org.apache.spark

/** Minimal bridge into `private[spark]` core surface (the GraftSqlBridge
  * pattern): the benchmark's inter-entry settle needs to know the async
  * listener queues are drained before timing the next entry — a heavy
  * entry can leave thousands of queued events whose processing steals
  * cycles from the next measurement (VERDICT r9 #2's residual bench
  * inflation). Nothing else in the repo reaches into core internals.
  */
object GraftSparkBridge {

  /** Block (bounded) until every queued listener event is processed. */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
