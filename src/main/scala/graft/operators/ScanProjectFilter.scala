package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 S6 + §2.2 P1–P6: parquet scan, projection, expression
  * projection, predicates, casts, CASE, null handling.
  *
  * In the reference these are Hive-delegated operators
  * (`/root/reference/src/main/scala/com/github/xmlavrobridge/AvroFromXmlSerde.scala:13`
  * extends AvroSerDe; Hive executes SELECT/WHERE over xml tables). Here they
  * are declarative DataFrame plans, so Catalyst pushes filters and projections
  * into the parquet scan (verified via .explain: PushedFilters/ReadSchema) —
  * at 100 TB the scan reads only the referenced columns/row-groups.
  */
object ScanProjectFilter {

  val queries: Map[String, Q] = Map(
    // S6/P1: pure scan + column projection (column pruning reaches parquet).
    "q_scan_project" -> ((s, dir) => {
      T.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    }),

    // P2: arithmetic expression projection; op sequence mirrored in oracle so
    // IEEE-754 results are bit-identical (no rounding needed row-wise).
    "q_project_expr" -> ((s, dir) => {
      val li = T.lineitem(s, dir)
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        ((col("l_extendedprice") * (lit(1.0) - col("l_discount"))) *
          (lit(1.0) + col("l_tax"))).as("charge"),
        (col("l_quantity") + lit(5.0)).as("qty_adj"))
    }),

    // P3: AND/OR/NOT + BETWEEN predicates (all pushable to the scan).
    "q_filter_pred" -> ((s, dir) => {
      val li = T.lineitem(s, dir)
      li.filter(
        (col("l_quantity").between(10, 30) &&
          col("l_discount") >= 0.02 && !(col("l_returnflag") === "N")) ||
          col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    }),

    // P3b: IN / LIKE / string predicates.
    "q_filter_in_like" -> ((s, dir) => {
      val o = T.orders(s, dir)
      o.filter(
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_orderstatus").like("F%"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    }),

    // P4: cast semantics (double→int truncates toward zero in Spark; the
    // oracle spells TRUNC explicitly since DuckDB CAST rounds).
    "q_cast_coercion" -> ((s, dir) => {
      val li = T.lineitem(s, dir)
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_orderkey").cast("string").as("ok_str"),
        col("l_shipdate").cast("date").as("ship_date"),
        (col("l_discount") > 0.05).as("hi_disc"),
        col("l_linenumber").cast("double").as("ln_d"))
    }),

    // P5: CASE WHEN bucketing + grouped counts.
    "q_case_expr" -> ((s, dir) => {
      val li = T.lineitem(s, dir)
      li.select(
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
    }),

    // P6: COALESCE / NULLIF / IS DISTINCT FROM.
    "q_null_handling" -> ((s, dir) => {
      val o = T.orders(s, dir)
      o.select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING"))
          .as("status_or_pending"),
        expr("o_orderstatus IS DISTINCT FROM 'F'").as("not_f"),
        nullif(col("o_orderpriority"), lit("5-LOW")).as("prio_or_null"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue,
        |  (l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge,
        |  l_quantity + 5.0 AS qty_adj
        |FROM lineitem
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE (l_quantity BETWEEN 10 AND 30 AND l_discount >= 0.02
        |       AND NOT (l_returnflag = 'N')) OR l_quantity > 45
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_filter_in_like" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |  AND o_orderstatus LIKE 'F%'
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_cast_coercion" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(TRUNC(l_quantity) AS INTEGER) AS qty_int,
        |  CAST(l_orderkey AS VARCHAR) AS ok_str,
        |  CAST(l_shipdate AS DATE) AS ship_date,
        |  l_discount > 0.05 AS hi_disc,
        |  CAST(l_linenumber AS DOUBLE) AS ln_d
        |FROM lineitem
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_case_expr" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 30 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_null_handling" ->
      """SELECT o_orderkey,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_pending,
        |  o_orderstatus IS DISTINCT FROM 'F' AS not_f,
        |  NULLIF(o_orderpriority, '5-LOW') AS prio_or_null
        |FROM orders
        |ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
