package graft.operators

import graft.{Det, Q, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 W1–W7: Hive-2.1 windowing surface (delegation cite
  * `AvroFromXmlSerde.scala:13`) as Spark window functions.
  *
  * Scale note: each window is partitioned by a real key (customer / user /
  * segment), so the plan is one hash-shuffle on the partition key + in-
  * partition sort — no global sort, no single-reducer bottleneck at 100 TB.
  * Rank/dense_rank windows order by coarse keys (real ties, deterministic
  * results); row_number windows always carry a unique tiebreak column.
  */
object Windows {
  import Det.cents

  val queries: Map[String, Q] = Map(
    // W1: row_number (unique order) + rank/dense_rank (coarse order, ties).
    "q_win_rank" -> ((s, dir) => {
      val wUnique = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wCoarse = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderpriority"))
      T.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        row_number().over(wUnique).as("rn"),
        rank().over(wCoarse).as("rk"),
        dense_rank().over(wCoarse).as("drk"))
    }),

    // W1b: rank-distribution functions over a UNIQUE ordering (ties broken
    // by o_orderkey) — (rank-1)/(n-1) is a single IEEE division, so the raw
    // doubles are bit-identical across engines, no rounding needed.
    "q_win_dist" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(w).as("prk"),
        cume_dist().over(w).as("cd"))
    }),

    // W2: running sum over a rows frame (exact: integer cents).
    "q_win_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        sum(cents(col("o_totalprice"))).over(w).as("running_c"))
    }),

    // W3: RANGE frame — sliding 1-hour sum per user keyed on epoch seconds.
    "q_win_range_frame" -> ((s, dir) => {
      val e = T.events(s, dir)
        .withColumn("tsec", expr("unix_micros(ts) div 1000000"))
      val w = Window.partitionBy("user_id").orderBy(col("tsec"))
        .rangeBetween(-3600L, 0L)
      e.select(col("event_id"), col("user_id"), col("tsec"),
        sum(cents(col("value"))).over(w).as("hour_sum_c"))
    }),

    // W4: lead/lag with explicit defaults.
    "q_win_lead_lag" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      T.events(s, dir).select(
        col("event_id"), col("user_id"),
        lag(cents(col("value")), 1, -1L).over(w).as("prev_c"),
        lead(cents(col("value")), 1, -1L).over(w).as("next_c"))
    }),

    // W5: ntile / percent_rank / cume_dist over a unique total order.
    "q_win_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      T.customer(s, dir).select(
        col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),

    // W6: top-k per group (rank ≤ 3 filter pattern).
    "q_win_topk_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    }),

    // W7b: nth_value over the full-partition frame.
    "q_win_nth" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
    }),

    // W7: first_value / last_value over the full-partition frame.
    "q_win_first_last" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INTEGER) AS rk,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INTEGER) AS drk
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_win_dist" ->
      """SELECT o_orderkey, o_orderpriority,
        |  percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS prk,
        |  cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS cd
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_win_running" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_win_range_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) // 1000000 AS tsec,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
        |          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS hour_sum_c
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_win_lead_lag" ->
      """SELECT event_id, user_id,
        |  lag(CAST(FLOOR(value * 100) AS BIGINT), 1, -1)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_c,
        |  lead(CAST(FLOOR(value * 100) AS BIGINT), 1, -1)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_c
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_win_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_win_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_win_nth" ->
      """SELECT o_orderkey, o_custkey,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_win_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
