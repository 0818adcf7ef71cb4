package org.apache.spark.graftest

import org.apache.spark.SparkContext

/** Test-only shim: deterministic listener-event drain for job-count
  * receipts (listenerBus is private[spark]). */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
