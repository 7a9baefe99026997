package org.apache.spark.graftx

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for metric snapshots.
  *
  * Spark delivers `SparkListener` events asynchronously; reading a
  * listener-accumulated metric right after an action can miss the last
  * stages' events and misattribute their bytes to the next measurement.
  * `LiveListenerBus.waitUntilEmpty()` is exactly the primitive a meter
  * needs before snapshotting, but it is `private[spark]` — hence this
  * one-line bridge in the `org.apache.spark` namespace (same device as
  * the `sql.graftx` extension package; public Spark API everywhere else).
  */
object ListenerBusDrain {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
