package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-scope bridge into `private[spark]`: block until every queued
  * listener event has been delivered, so stage-metrics assertions don't
  * race the async listener bus. */
object ListenerBusBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
