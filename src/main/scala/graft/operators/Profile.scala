package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE TABLE` / data-quality-report surface
  * (per-column null counts, cardinalities, extrema) that every ingest
  * pipeline runs before trusting a new drop, expressed in exactly two
  * scans regardless of how many columns are profiled:
  *
  *  - pass A: ONE wide aggregation computes every column's non-null count
  *    and min/max in a single partially-aggregated scan (no shuffle beyond
  *    the 1-row final combine, no Expand — the multi-distinct trap
  *    `q_approx_distinct` documents is deliberately avoided);
  *  - pass B: exact distinct counts for ALL columns in one job — the
  *    columns unpivot into (col_name, value-as-string) pairs (a codegen'd
  *    `stack`, not a per-column loop), dedupe map-side into one shuffle,
  *    and count per column.
  *
  * The 1-row pass-A result unpivots into per-column rows and broadcast-
  * joins pass B's counts — nothing driver-side, output = one row per
  * profiled column. Extrema are computed on the ORIGINAL type (so numeric
  * columns order numerically, not lexically) and cast to string only for
  * the uniform report schema.
  *
  * [[profileApprox]] is the single-scan variant for interactive 100 TB
  * profiling: distinct counts come from per-column HLL sketches
  * (`approx_count_distinct`) inside pass A, dropping pass B entirely —
  * same report schema, rsd-bounded cardinalities.
  */
object Profile {

  /** Exact profile of `cols`: one row per column with the table's row
    * count, the column's null count, exact distinct (non-null) count, and
    * stringified min/max. Two scans total (see object doc).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val aggs = count(lit(1)).as("_n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"_nn_$c"),
      min(col(c)).cast("string").as(s"_min_$c"),
      max(col(c)).cast("string").as(s"_max_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row wide frame: stack(n, 'c', nn_c, min_c, max_c, ...)
    val stackArgs = cols.flatMap(c => Seq(s"'$c'", s"`_nn_$c`",
      s"`_min_$c`", s"`_max_$c`")).mkString(", ")
    val perCol = wide.selectExpr("_n_rows",
      s"stack(${cols.size}, $stackArgs) as (col_name, n_nonnull, min_s, max_s)")
    // pass B: every column's exact distinct count in ONE dedupe shuffle
    val valueStack = cols.map(c => s"'$c', cast(`$c` as string)")
      .mkString(", ")
    val distincts = df
      .selectExpr(s"stack(${cols.size}, $valueStack) as (col_name, val)")
      .filter($"val".isNotNull)
      .distinct()
      .groupBy("col_name").agg(count(lit(1)).as("n_distinct"))
    perCol.join(broadcast(distincts), Seq("col_name"), "left")
      .select($"col_name", $"_n_rows".as("n_rows"),
        ($"_n_rows" - $"n_nonnull").as("n_null"),
        coalesce($"n_distinct", lit(0L)).as("n_distinct"),
        $"min_s", $"max_s")
  }

  /** Single-scan approximate profile: exact row/null counts and extrema,
    * HLL distinct counts at `rsd`. The interactive shape — one pass, no
    * shuffle beyond the 1-row combine.
    */
  def profileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val aggs = count(lit(1)).as("_n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"_nn_$c"),
      approx_count_distinct(col(c), rsd).as(s"_nd_$c"),
      min(col(c)).cast("string").as(s"_min_$c"),
      max(col(c)).cast("string").as(s"_max_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.flatMap(c => Seq(s"'$c'", s"`_nn_$c`", s"`_nd_$c`",
      s"`_min_$c`", s"`_max_$c`")).mkString(", ")
    wide.selectExpr("_n_rows",
      s"stack(${cols.size}, $stackArgs) as " +
        "(col_name, n_nonnull, n_distinct, min_s, max_s)")
      .select($"col_name", $"_n_rows".as("n_rows"),
        ($"_n_rows" - $"n_nonnull").as("n_null"),
        $"n_distinct", $"min_s", $"max_s")
  }

  val queries: Map[String, Q] = Map(
    // PR1: exact four-column profile of lineitem — a bigint key, exact
    // cents, a low-cardinality flag, and a date-as-string column; counts,
    // cardinalities, and extrema all hash-checked.
    "q_table_profile" -> ((s, dir) => {
      val li = T.lineitem(s, dir).select(
        col("l_orderkey"),
        floor(col("l_extendedprice") * 100).cast("long").as("price_c"),
        col("l_returnflag"),
        col("l_shipdate").cast("string").as("shipdate_s"))
      profile(li, Seq("l_orderkey", "price_c", "l_returnflag", "shipdate_s"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_table_profile" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    l_returnflag,
        |    CAST(l_shipdate AS VARCHAR) AS shipdate_s
        |  FROM lineitem)
        |SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT(l_orderkey) AS n_null,
        |  COUNT(DISTINCT l_orderkey) AS n_distinct,
        |  CAST(MIN(l_orderkey) AS VARCHAR) AS min_s,
        |  CAST(MAX(l_orderkey) AS VARCHAR) AS max_s
        |FROM li
        |UNION ALL
        |SELECT 'price_c', COUNT(*), COUNT(*) - COUNT(price_c),
        |  COUNT(DISTINCT price_c),
        |  CAST(MIN(price_c) AS VARCHAR), CAST(MAX(price_c) AS VARCHAR)
        |FROM li
        |UNION ALL
        |SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
        |  COUNT(DISTINCT l_returnflag),
        |  MIN(l_returnflag), MAX(l_returnflag)
        |FROM li
        |UNION ALL
        |SELECT 'shipdate_s', COUNT(*), COUNT(*) - COUNT(shipdate_s),
        |  COUNT(DISTINCT shipdate_s),
        |  MIN(shipdate_s), MAX(shipdate_s)
        |FROM li
        |ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
