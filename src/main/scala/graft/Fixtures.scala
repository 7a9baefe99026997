package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.concurrent.TrieMap

/** JVM-local cache for deterministic on-disk query fixtures (input tables,
  * persisted indexes) — the [[graft.similarity.ModelCache]] discipline
  * applied to build-once artifacts. In production these are built when data
  * lands (a bucketed layout, an IVF store, a band index) and every query
  * reuses them; only the declared-query harness would rebuild them per run.
  * Builds are deterministic, so a cached fixture is byte-equivalent to a
  * rebuilt one and correctness cannot depend on cache hits. What stays
  * timed in Bench is the OPERATOR over the fixture (the purge rewrite, the
  * compaction, the streaming drain, the probe) — not the test-input
  * generation.
  *
  * Queries that MUTATE their fixture take a [[mutableCopy]] per run; the
  * pristine build is what is cached.
  */
private[graft] object Fixtures {
  private val cache = TrieMap.empty[String, String]
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Build-once directory fixture: `build` populates a fresh temp dir the
    * first time `key` is seen in this JVM; later calls return the same dir.
    * Per-key locked (r11: Verify runs queries through a thread pool):
    * TrieMap's atomic getOrElseUpdate already returns one consistent
    * winner, but it evaluates `build` in BOTH racers — wasted work for the
    * heavy fixtures, and a loud collision for the few builds with external
    * side effects (catalog table names). Distinct keys build concurrently;
    * a nested build of a DIFFERENT fixture takes a different monitor, so
    * the only deadlock shape is a cyclic fixture dependency, which would
    * already be an infinite recursion single-threaded.
    */
  def getOrBuild(key: String)(build: String => Unit): String =
    cache.get(key) match {
      case Some(dir) => dir
      case None =>
        val lock = locks.computeIfAbsent(key, _ => new Object)
        lock.synchronized {
          cache.get(key) match {
            case Some(dir) => dir
            case None =>
              val dir = Files.createTempDirectory("graft-fx").toString
              build(dir)
              cache.put(key, dir)
              dir
          }
        }
    }

  /** Fresh mutable copy of a fixture tree (for operators that rewrite or
    * swap files in place). Local file copy — no Spark job.
    */
  def mutableCopy(src: String): String = {
    val dstRoot = Files.createTempDirectory("graft-fxcopy")
    copyTree(src, dstRoot.toString)
    dstRoot.toString
  }

  /** Recursive copy of `src`'s contents into existing-or-created `dst`. */
  def copyTree(src: String, dst: String): Unit = {
    val s = Paths.get(src)
    val d = Paths.get(dst)
    Files.createDirectories(d)
    val walk = Files.walk(s)
    try walk.forEach { p =>
      val t = d.resolve(s.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }

  /** Test hook. */
  def clear(): Unit = cache.clear()
}
