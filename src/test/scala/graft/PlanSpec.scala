package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the "would this survive 100×" checks
  * (SURVEY.md §4.1): projection/filter pushdown into the parquet scan,
  * broadcast joins for dims, TakeOrderedAndProject for global top-k, and
  * partial (map-side) aggregation.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("scan+project: column pruning reaches the parquet reader") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double>"),
      s"expected 3-column ReadSchema:\n$p")
  }

  test("filter: predicates are pushed to the parquet scan") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters: [") && p.contains("l_quantity"),
      s"expected pushed filters on l_quantity:\n$p")
  }

  test("star join: dims broadcast — fact table never shuffles for the join") {
    val p = plan("q_join_star")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("global top-k plans as TakeOrderedAndProject (no global sort)") {
    val li = Tables.orders(spark, sf)
    val p = li.orderBy(org.apache.spark.sql.functions.col("o_totalprice").desc)
      .limit(10).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("grouped agg: partial aggregation before the shuffle (map-side combine)") {
    val p = plan("q_agg_group")
    assert(p.contains("partial_"), s"expected partial aggregation:\n$p")
  }

  test("bench harness: the determinism sort is eliminated under count()") {
    val df = SparkEntry.queries("q_agg_group")(spark, sf)
    val countPlan = df.groupBy().count().queryExecution.executedPlan.toString
    assert(!countPlan.contains("Sort "), s"sort should be optimized away:\n$countPlan")
  }

  test("native as-of join: AsOfJoinExec merge plan, one shuffle per input") {
    val df = SparkEntry.queries("q_join_asof_native")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), s"expected the custom operator:\n$p")
    // co-partitioned merge: exactly one hash exchange per input feeds it
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"expected <= 3 hash exchanges (2 inputs + agg):\n$p")
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    // WSCG spans only appear in AQE's final plan — execute first.
    val df = SparkEntry.queries("q_filter_pred")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // WSCG stages print as "*(n)" prefixes in the compact plan form.
    assert(p.contains("*(1)"), s"expected WSCG stage markers:\n$p")
  }
}
