package org.apache.spark.graft

/** Test-only accessor for the private[spark] listener bus drain — the only
  * way to read listener-counted totals deterministically (listener events
  * are delivered asynchronously; without the drain a job-count assertion
  * races the bus).
  */
object ListenerDrain {
  def drain(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
