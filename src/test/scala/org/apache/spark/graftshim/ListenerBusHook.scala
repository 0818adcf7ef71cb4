package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Test-only accessor for the private[spark] listener bus: specs that
  * count Spark jobs via a SparkListener need a deterministic flush
  * (event delivery is async) before reading their counters. */
object ListenerBusHook {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
