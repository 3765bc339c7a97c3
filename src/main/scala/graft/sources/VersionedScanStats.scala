package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** Real statistics for CATALOG-table reads (E188).
  *
  * Spark plans a [[GraftTable]] SELECT through `V2ScanRelationPushDown`,
  * which wraps the [[GraftV1Scan]] in its `V1ScanWrapper` — and the
  * wrapper does not forward `SupportsReportStatistics`, so every catalog
  * read reports `defaultSizeInBytes` (effectively infinite) and a small
  * versioned dimension joined through the catalog can NEVER
  * auto-broadcast: at 100 TB every star join over a catalog dim
  * sort-merges, the single biggest join-cost miss the surface had (the
  * v1 source and DDL views already report real sizes via
  * `VersionedRelation.sizeInBytes`).
  *
  * This rule routes plain catalog reads onto exactly that v1 relation:
  * after the early-pushdown batch produced the wrapped scan, the
  * `DataSourceV2ScanRelation` leaf is rewritten to a [[LogicalRelation]]
  * over a [[VersionedRelation]] pinned at the SAME snapshot version
  * (`versionAsOf` = the scan's tip). The relation leaf gets FRESH
  * attributes derived from the relation's OWN schema (the
  * `LogicalRelation.output mirrors relation.schema` contract Catalyst
  * assumes — grafting the v2 scan's pruned/renullified attribute set
  * onto the leaf worked but leaned on undocumented tolerance), and a
  * `Project` of aliases carrying the ORIGINAL exprIds re-binds every
  * reference above the leaf. `PhysicalOperation` collapses the alias
  * projection into the scan at planning, so the physical plan is
  * unchanged. One read path for all three SQL surfaces — and
  * `computeStats` now serves the chain's real summed file lengths (a
  * driver-side listing), which is what lets Catalyst pick a broadcast
  * hash join for a small dim.
  *
  * Scope guards (each a correctness seam, not a heuristic):
  *  - only `V1ScanWrapper`-wrapped [[GraftV1Scan]]s — row-level
  *    operation scans (MERGE/UPDATE/DELETE rewrites) are planned by
  *    `GroupBasedRowLevelOperationScanPlanning`, which never applies the
  *    wrapper, and their group-scan semantics must not change;
  *  - only plain snapshot reads ([[GraftV1Scan.isPlainRead]]) — belt
  *    and braces with the above;
  *  - never when `_version` (the metadata column) is in the output: the
  *    v1 relation does not serve it.
  *
  * Hidden-partitioned bases (E193) are served too: the v1 relation's
  * `buildScan` runs the SAME driver-side partition pruning the v2 path
  * ran ([[HiddenPrune]]), so a hidden-partitioned table keeps its pruned
  * reads AND gains real statistics — a small hidden-partitioned dim both
  * prunes and broadcasts (the round-13 composition gap, closed).
  *
  * Filter/column pushdown is preserved: the residual `Filter` node Spark
  * kept above the scan re-pushes through `DataSourceStrategy` into
  * [[VersionedRelation.buildScan]], which bakes translatable predicates
  * and the pruned column set into the delegate plan — the same inner
  * parquet `PushedFilters`/`ReadSchema` the v2 spelling produced.
  *
  * Registered via [[VersionedScanStats.register]] on
  * `experimental.extraOptimizations` by [[GraftCatalog.initialize]] and
  * re-asserted per scan by [[GraftTable.newScanBuilder]] (so the rule is
  * present on the session that actually PLANS the query, not just the
  * one that happened to be active when the catalog initialized) — the
  * "User Provided Optimizers" batch, which runs AFTER the early-pushdown
  * batch and BEFORE join selection reads statistics. Deliberately NOT
  * injected through `SparkSessionExtensions.injectOptimizerRule`: those
  * rules join the operator-optimization batch, which precedes early
  * pushdown — the pattern this rule matches would not exist yet (a
  * silent no-op).
  */
object VersionedScanStats extends Rule[LogicalPlan] {

  /** Idempotent, synchronized registration on `s`'s experimental rules.
    * The read-modify-write on `extraOptimizations` is not atomic, so two
    * concurrent catalog initializations could double-register (harmless
    * but wasteful) or — worse — interleave and DROP a registration;
    * serializing on this rule object closes both.
    */
  def register(s: SparkSession): Unit = synchronized {
    val em = s.experimental
    if (!em.extraOptimizations.exists(_ eq VersionedScanStats))
      em.extraOptimizations = em.extraOptimizations :+ VersionedScanStats
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case DataSourceV2ScanRelation(_, w: V1ScanWrapper, output, _, _)
        if w.v1Scan.isInstanceOf[GraftV1Scan] &&
          w.v1Scan.asInstanceOf[GraftV1Scan].isPlainRead &&
          !output.exists(_.name == "_version") =>
      val g = w.v1Scan.asInstanceOf[GraftV1Scan]
      val lr = LogicalRelation(
        new VersionedRelation(SparkSession.active.sqlContext, g.dir,
          Map("path" -> g.dir, "versionAsOf" -> g.tip.toString)))
      val byName = lr.output.map(a => a.name -> a).toMap
      Project(output.map(o =>
        Alias(byName(o.name), o.name)(exprId = o.exprId)), lr)
  }
}
