package graft.ops

/** §2.6 driver-side overlap of INDEPENDENT Spark actions.
  *
  * The r15 GateProfile of the store gates showed the driver single-
  * threaded between jobs (w_retention_cascade: 55 jobs, 6.4 s of job
  * wall, 7.9 s of inter-job gap — planning, codegen source generation,
  * commit protocol), while 32 cores sat idle. Spark's scheduler happily
  * runs jobs concurrently; actions are only sequential because the
  * caller's code calls them sequentially. Submitting independent writes
  * from a small pool overlaps one job's driver-side latency with
  * another's execution — and since planning/codegen happen on the
  * SUBMITTING thread, it parallelizes the driver work itself, not just
  * the cluster time.
  *
  * Only for actions with no ordering contract between them (writes to
  * DIFFERENT tables, independent compactions). Anything whose crash-
  * window ordering is load-bearing (the BM25 negation's tag protocol,
  * clearCascade's payload-before-state) stays sequential at the caller.
  */
object Overlap {

  /** Run the thunks concurrently on a bounded fresh pool; wait for ALL
    * to settle, then rethrow the first failure (so a spec's simulated
    * crash inside one thunk still aborts the caller exactly once).
    * Sequential fast path for 0/1 thunks. Threads are created at submit
    * time, so Spark's inheritable thread-locals (job description/group)
    * carry over from the caller. */
  def par(thunks: Seq[() => Unit]): Unit = {
    if (thunks.size <= 1) { thunks.foreach(t => t()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(thunks.size, 4))
    try {
      val fs = thunks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = t()
        }))
      var first: Throwable = null
      fs.foreach { f =>
        try { f.get(); () }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (first == null) first = e.getCause
        }
      }
      if (first != null) throw first
    } finally { pool.shutdown(); () }
  }
}
