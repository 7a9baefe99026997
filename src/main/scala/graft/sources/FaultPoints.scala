package graft.sources

/** Test-only fault injection for crash-consistency fuzzing (r9 verdict
  * task 6): stores and drains call [[hit]] at named protocol boundaries
  * (delta staged, delta published, watermark advanced, copy written but
  * not marked, …); production leaves the handler a no-op, while
  * `CrashConsistencySpec` installs a handler that throws at a seeded
  * random occurrence and then asserts the re-run converges to the
  * never-crashed result.
  *
  * A thrown handler aborts the operation mid-protocol but DOES unwind
  * `finally` blocks (locks release), so this fuzzes the "process aborted"
  * family; the hard kill windows (no unwinding at all) remain covered by
  * the hand-enumerated filesystem-state tests in the same spec.
  */
private[graft] object FaultPoints {
  @volatile private var handler: String => Unit = null

  private[graft] def install(h: String => Unit): Unit = handler = h
  private[graft] def clear(): Unit = handler = null

  private[graft] def hit(name: String): Unit = {
    val h = handler
    if (h != null) h(name)
  }
}
