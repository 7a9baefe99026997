package org.apache.spark.sql.graftx

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Deterministic state-store eviction for benchmark hygiene.
  *
  * A terminated streaming query does NOT release its executor-side state
  * store providers; they stay registered (HDFS-backed: heap maps of the
  * last versions; RocksDB: native memtables/block cache OUTSIDE the Java
  * heap) until the maintenance thread lazily notices the query is gone.
  * In a one-JVM bench that runs ~25 drains back-to-back this makes each
  * drain's memory pressure — and therefore its GC/allocation timing — a
  * function of WHICH drains ran before it (the r5 `q_stream_interp`
  * +12% drift appeared exactly when two RocksDB twins joined the
  * section). `StateStore.unloadAll()` is the primitive that makes
  * timings order-independent, but it lives in `execution.streaming.state`
  * — hence this bridge in the `sql.graftx` extension package (same device
  * as [[org.apache.spark.graftx.ListenerBusDrain]]; public Spark API
  * everywhere else). Cost model note: drains are cold-start by
  * construction (fresh checkpoint dirs), so eviction never removes state
  * a later measurement would have reused.
  */
object StateStoreHygiene {
  /** Close and deregister every loaded state store provider on this JVM
    * (local-mode executors share it), releasing RocksDB native memory
    * immediately instead of at the next maintenance tick.
    */
  def unloadAll(): Unit = StateStore.unloadAll()
}
