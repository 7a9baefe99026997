package graft.similarity

import scala.collection.concurrent.TrieMap

/** Driver-side cache for fitted ANN models (k-means centroids, PQ
  * codebooks). An ANN index is a build-once artifact: in production the
  * quantizer is fit when the index is built and every query reuses it.
  * The declared-query harness re-enters `fit` once per query, which would
  * re-run Lloyd's each time — this cache restores the build-once shape.
  *
  * Values are tiny (k×dim doubles — a 16×64 coarse quantizer is 8 KiB), and
  * fits are deterministic (hash-sampled working set, lowest-id init, exact
  * fixed-point sums), so a cached model is bit-identical to a refit one;
  * correctness results cannot depend on cache hits.
  */
private[graft] object ModelCache {
  private val cache = TrieMap.empty[String, AnyRef]
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-key locked like [[graft.Fixtures.getOrBuild]] (r11: Verify's query
    * pool can race two queries onto one model key; the atomic TrieMap would
    * fit twice — deterministic, merely wasted minutes on the big fits).
    */
  def getOrFit[T <: AnyRef](key: String)(fit: => T): T =
    cache.get(key) match {
      case Some(m) => m.asInstanceOf[T]
      case None =>
        val lock = locks.computeIfAbsent(key, _ => new Object)
        lock.synchronized {
          cache.getOrElseUpdate(key, fit).asInstanceOf[T]
        }
    }

  /** Test hook. */
  def clear(): Unit = cache.clear()
}
