package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Subquery surface (Hive 2.1 executes these over reference xml tables;
  * Spark SQL subsumes them): scalar subqueries, correlated scalar subqueries
  * (Catalyst decorrelates into joins — SURVEY.md §4.1 "subquery
  * decorrelation" row), and a typed Dataset aggregation showing the
  * encoder-based API (with its documented tradeoff: mapGroups is opaque to
  * Catalyst, so no partial aggregation — use untyped agg in hot paths).
  *
  * Thresholds compare against EXACT integer-cents averages so both engines
  * compute bit-identical cutoffs (no boundary-row drift).
  */
object Subqueries {

  /** Typed row for the Dataset-API query. */
  case class LineSlim(l_returnflag: String, qty_c: Long)

  val queries: Map[String, Q] = Map(
    // Uncorrelated scalar subquery: orders pricier than 1.5× the exact
    // global mean price.
    "q_subquery_scalar" -> ((s, dir) => {
      T.orders(s, dir).createOrReplaceTempView("sq_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey FROM sq_orders
          |WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) * (SELECT count(*) FROM sq_orders)
          |      > (SELECT SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) FROM sq_orders) * 3 DIV 2
          |""".stripMargin)
    }),

    // Correlated scalar subquery: lineitems above their own order's exact
    // average quantity (decorrelated by Catalyst into an aggregate + join).
    "q_subquery_correlated" -> ((s, dir) => {
      T.lineitem(s, dir).createOrReplaceTempView("sq_lineitem")
      s.sql(
        """SELECT l_orderkey, l_linenumber, CAST(FLOOR(l_quantity * 100) AS BIGINT) AS qty_c
          |FROM sq_lineitem a
          |WHERE CAST(FLOOR(l_quantity * 100) AS BIGINT) *
          |      (SELECT count(*) FROM sq_lineitem b WHERE b.l_orderkey = a.l_orderkey)
          |      > (SELECT SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT))
          |         FROM sq_lineitem b WHERE b.l_orderkey = a.l_orderkey)
          |""".stripMargin)
    }),

    // Recursive CTE (Spark 4 / SPARK-24497; UNION ALL recursion — Spark
    // rejects UNION-distinct recursion, so this stays acyclic): walk the
    // halving-ancestor chain of every customer key (a derived binary-tree
    // hierarchy) and report each node's depth. DuckDB runs the same
    // recursion (its integer division is `//` where Spark's is `DIV`).
    "q_sql_recursive" -> ((s, dir) => {
      // Total recursion output is rows × depth, and depth is provably
      // ≤ 64 (each level halves a 64-bit key), so the real bound is the
      // level limit, not the row count. Spark's default rowLimit (1e6)
      // tripped at the sf1 scaling probe (150k customers × ~31 levels);
      // raise it — the levelLimit (default 100) still guards divergence.
      s.conf.set("spark.sql.cteRecursionRowLimit", "2000000000")
      T.customer(s, dir).createOrReplaceTempView("rec_customer")
      s.sql(
        """WITH RECURSIVE chain(id, anc, depth) AS (
          |  SELECT c_custkey, c_custkey DIV 2, 1 FROM rec_customer
          |  WHERE c_custkey > 0
          |  UNION ALL
          |  SELECT id, anc DIV 2, depth + 1 FROM chain WHERE anc > 0)
          |SELECT id, max(depth) AS depth FROM chain GROUP BY id
          |""".stripMargin)
    }),

    // Typed Dataset path: encoders + groupByKey/mapGroups (exact cents).
    "q_typed_groups" -> ((s, dir) => {
      import s.implicits._
      val ds = T.lineitem(s, dir)
        .select(col("l_returnflag"),
          floor(col("l_quantity") * 100).cast("long").as("qty_c"))
        .as[LineSlim]
      ds.groupByKey(_.l_returnflag)
        .mapGroups { (flag, rows) =>
          var n = 0L; var sum = 0L
          rows.foreach { r => n += 1; sum += r.qty_c }
          (flag, n, sum)
        }
        .toDF("l_returnflag", "n", "sum_qty_c")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_sql_recursive" ->
      """WITH RECURSIVE chain(id, anc, depth) AS (
        |  SELECT c_custkey, c_custkey // 2, 1 FROM customer
        |  WHERE c_custkey > 0
        |  UNION ALL
        |  SELECT id, anc // 2, depth + 1 FROM chain WHERE anc > 0)
        |SELECT id, max(depth) AS depth FROM chain GROUP BY id
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) * (SELECT count(*) FROM orders)
        |      > (SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) FROM orders) * 3 // 2
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_subquery_correlated" ->
      """SELECT l_orderkey, l_linenumber, CAST(FLOOR(l_quantity * 100) AS BIGINT) AS qty_c
        |FROM lineitem a
        |WHERE CAST(FLOOR(l_quantity * 100) AS BIGINT) *
        |      (SELECT count(*) FROM lineitem b WHERE b.l_orderkey = a.l_orderkey)
        |      > (SELECT CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |         FROM lineitem b WHERE b.l_orderkey = a.l_orderkey)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_typed_groups" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
        |FROM lineitem GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
