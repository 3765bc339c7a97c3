package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 O1–O3 + §2.7 U1–U4: sort/limit/top-k and set operations.
  *
  * O2's global top-k compiles to `TakeOrderedAndProject` — each partition
  * keeps k rows, the driver merges k·p rows; no global sort even at 100 TB.
  * Set ops are native Spark `union/intersect/except` (distinct variants
  * shuffle once on the full row as key).
  */
object SortSetOps {

  val queries: Map[String, Q] = Map(
    // O1: multi-key ORDER BY with mixed directions and null placement. The
    // interesting part at scale is the range-partitioned global Sort node;
    // the harness wrapper re-sorts all-asc for the hash compare.
    "q_sort_multi" -> ((s, dir) => {
      T.orders(s, dir)
        .orderBy(col("o_orderstatus").desc_nulls_last,
          col("o_totalprice").asc, col("o_orderkey").asc)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    }),

    // O2: global top-k → TakeOrderedAndProject.
    "q_topk" -> ((s, dir) => {
      T.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    }),

    // O3: LIMIT/OFFSET over a unique total order.
    "q_limit_offset" -> ((s, dir) => {
      T.orders(s, dir)
        .orderBy(col("o_orderkey"))
        .offset(100).limit(50)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    }),

    // U1: UNION ALL (bag semantics).
    "q_union_all" -> ((s, dir) => {
      val c = T.customer(s, dir).select(col("c_name").as("name"),
        lit("customer").as("kind"))
      val su = T.supplier(s, dir).select(col("s_name").as("name"),
        lit("supplier").as("kind"))
      c.unionAll(su)
    }),

    // U2: UNION DISTINCT.
    "q_union_distinct" -> ((s, dir) => {
      val c = T.customer(s, dir).select(col("c_nationkey").as("nk"))
      val su = T.supplier(s, dir).select(col("s_nationkey").as("nk"))
      c.union(su).distinct()
    }),

    // U3: INTERSECT (distinct).
    "q_intersect" -> ((s, dir) => {
      val c = T.customer(s, dir).select(col("c_nationkey").as("nk"))
      val su = T.supplier(s, dir).select(col("s_nationkey").as("nk"))
      c.intersect(su)
    }),

    // U4: EXCEPT (distinct).
    "q_except" -> ((s, dir) => {
      val c = T.customer(s, dir).select(col("c_nationkey").as("nk"))
      val su = T.supplier(s, dir).select(col("s_nationkey").as("nk"))
      c.except(su)
    }),

    // U3b/U4b: bag-semantics variants (multiplicities preserved).
    "q_intersect_all" -> ((s, dir) => {
      val a = T.lineitem(s, dir).select(col("l_suppkey").as("k"))
      val b = T.orders(s, dir).select((col("o_custkey") % 10).as("k"))
      a.intersectAll(b)
    }),
    "q_except_all" -> ((s, dir) => {
      val a = T.orders(s, dir).select((col("o_custkey") % 10).as("k"))
      val b = T.supplier(s, dir).select(col("s_suppkey").as("k"))
      a.exceptAll(b)
    }),

    // Spark relational pivot (oracle = conditional aggregation).
    "q_pivot" -> ((s, dir) => {
      T.lineitem(s, dir)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(floor(col("l_quantity") * 100).cast("long")))
    }),

    // Unpivot via the stack generator — wide measures to (metric, value)
    // rows, the inverse of pivot (oracle = UNION ALL; values in exact cents).
    "q_unpivot" -> ((s, dir) => {
      T.lineitem(s, dir).selectExpr("l_orderkey", "l_linenumber",
        """stack(3,
          |  'qty',   CAST(FLOOR(l_quantity * 100) AS BIGINT),
          |  'price', CAST(FLOOR(l_extendedprice * 100) AS BIGINT),
          |  'disc',  CAST(FLOOR(l_discount * 100) AS BIGINT)
          |) AS (metric, value_c)""".stripMargin)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM (
        |  SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM (
        |  SELECT * FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_union_all" ->
      """SELECT c_name AS name, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS name, 'supplier' AS kind FROM supplier
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_intersect_all" ->
      """SELECT l_suppkey AS k FROM lineitem
        |INTERSECT ALL
        |SELECT o_custkey % 10 AS k FROM orders
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_except_all" ->
      """SELECT o_custkey % 10 AS k FROM orders
        |EXCEPT ALL
        |SELECT s_suppkey AS k FROM supplier
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(FLOOR(l_quantity * 100) AS BIGINT) END) AS BIGINT) AS A,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(FLOOR(l_quantity * 100) AS BIGINT) END) AS BIGINT) AS N,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(FLOOR(l_quantity * 100) AS BIGINT) END) AS BIGINT) AS R
        |FROM lineitem GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'qty' AS metric,
        |  CAST(FLOOR(l_quantity * 100) AS BIGINT) AS value_c FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'price',
        |  CAST(FLOOR(l_extendedprice * 100) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'disc',
        |  CAST(FLOOR(l_discount * 100) AS BIGINT) FROM lineitem
        |ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
