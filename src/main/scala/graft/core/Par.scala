package graft.core

/** Concurrent driver actions (guide §2.6 "overlap independent jobs"):
  * Spark's scheduler happily runs several jobs at once inside one
  * application — actions are sequential only because driver code calls
  * them sequentially. The PQ/IVF artifact-lifecycle queries are ladders
  * of SMALL sequential jobs (train collects, artifact writes, read-backs)
  * whose wall clock is per-job latency, not compute; running the
  * independent rungs concurrently back-fills the idle cores and also
  * overlaps the driver-side Catalyst analysis each action pays.
  *
  * Correctness posture: callers pass thunks with NO data dependency on
  * each other (enforced by review, not the type system); each thunk's
  * own result is unchanged by concurrency, so query outputs are
  * byte-identical to the sequential form. Concurrent first-use of a
  * shared persisted frame is safe — the BlockManager's per-block locks
  * make one thread compute a partition while the other waits.
  */
object Par {

  /** Evaluate two independent thunks concurrently; rethrows the first
    * failure after both settle (a still-running sibling must not be
    * abandoned mid-write).
    */
  def par2[A, B](a: => A, b: => B): (A, B) = {
    @volatile var rb: Either[Throwable, B] = null
    val t = new Thread(() => {
      rb = try Right(b) catch { case e: Throwable => Left(e) }
    }, "graft-par2")
    t.setDaemon(true)
    t.start()
    val ra =
      try Right(a) catch { case e: Throwable => Left(e) }
    t.join()
    (ra, rb) match {
      case (Right(x), Right(y)) => (x, y)
      case (Left(e), _) => throw e
      case (_, Left(e)) => throw e
    }
  }
}
