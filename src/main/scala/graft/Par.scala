package graft

/** Overlap INDEPENDENT Spark actions from a small driver-side thread pool
  * (optimization guide §2.6): Spark's scheduler runs several jobs at once
  * inside one application, and actions are only sequential because driver
  * code calls them sequentially — an index build whose components form
  * independent chains (e.g. the PQ, IVF, SQ8 and k-means chains of
  * [[pipeline.VectorIndex.rebuild]]) wastes most of `local[32]` running
  * each small job back-to-back. Jobs from later chains back-fill the
  * executor slots earlier chains' stage tails leave idle; FIFO scheduling
  * gives exactly that behaviour.
  *
  * Each task runs with the caller's [[Ckpt.off]] value (a plain
  * ThreadLocal, NOT inherited by pool threads), so `PlanSpec`'s
  * lineage-preserving sweep behaves identically through a parallel build.
  * Determinism: tasks must be independent (no shared mutable state, writes
  * to disjoint paths); each task's own Spark lineage is unchanged, so
  * results are byte-identical to the sequential spelling.
  */
private[graft] object Par {
  def run(tasks: (() => Unit)*): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_ ()); return }
    val off = Ckpt.off.get
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = { Ckpt.off.set(off); t() }
        })
      }
      // surface the FIRST failure with its original type (builds raise
      // loudly; an ExecutionException wrapper would obscure asserts)
      futs.foreach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause }
      }
    } finally { pool.shutdownNow(); () }
  }
}
