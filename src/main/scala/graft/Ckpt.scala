package graft

import org.apache.spark.sql.DataFrame

/** Eager `localCheckpoint` with a per-thread off switch.
  *
  * The iterative operators (connected components, PageRank) checkpoint
  * between rounds so round N doesn't replay rounds 1..N-1 — but a
  * checkpoint truncates the logical plan to a `LogicalRDD` scan, hiding
  * everything upstream from plan ASSERTIONS. `PlanSpec`'s guardrail sweep
  * flips [[off]] for its thread so the swept plans retain full lineage
  * (the LSH pair pipeline inside the clustering queries stays visible to
  * the cartesian/nested-loop scan). The production path never touches the
  * switch: checkpointing is always on.
  */
private[graft] object Ckpt {
  val off: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  def apply(df: DataFrame): DataFrame =
    if (off.get) df else df.localCheckpoint(true)
}
