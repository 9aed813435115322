package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-infrastructure accessor: `LiveListenerBus.waitUntilEmpty` is
  * `private[spark]`, but per-query attribution snapshots (graft.Bench)
  * must not read the shuffle counters while a finished query's task-end
  * events are still queued on the bus thread — that misattributes the
  * tail of query N's shuffle volume to query N+1. Not used by any
  * library code path. */
object BusDrain {
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: Throwable => () } // best effort: attribution only
}
