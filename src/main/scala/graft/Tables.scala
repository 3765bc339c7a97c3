package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so the same
  * plan runs on sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, on a
  * real cluster, on a 100 TB lake: all access goes through `spark.read.parquet`
  * so partition pruning / predicate pushdown / column pruning apply unchanged.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame   = t(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = t(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = t(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = t(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  /** events.parquet has stored `ts` as TIMESTAMP(NANOS) (readable only via
    * `spark.sql.legacy.parquet.nanosAsLong`, as a nanos-since-epoch long) and,
    * since the round-8 regeneration, as TIMESTAMP(MICROS, isAdjustedToUTC =
    * false) (read as TIMESTAMP_NTZ). Normalize BOTH to a µs TimestampType
    * here: `div 1000` truncates ns exactly like DuckDB's ns→µs read, and the
    * NTZ cast binds the wall-clock in the session timezone (UTC everywhere in
    * this project) — the same instants either way, so oracle comparisons line
    * up and downstream `unix_micros`/window functions type-check.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}

/** Determinism helpers for the DuckDB hash-match oracle.
  *
  * Floating-point SUM/AVG are order-dependent; Spark's partial aggregation
  * order differs run-to-run and engine-to-engine. We therefore aggregate
  * doubles as exact integer "cents": `floor(x * 100)` is a deterministic
  * IEEE-754 op sequence, identical in Spark and DuckDB on the same parquet
  * doubles, and integer sums are order-independent. Averages are expressed as
  * `cast(sum_cents as double) / count` — a single exact division.
  *
  * This is a test-determinism device only; production aggregations on a
  * cluster would use plain `sum`/`avg` (same plan shape, same shuffle).
  */
object Det {
  /** Total order over every output column (asc, nulls first — Spark's ASC
    * default). The oracle mirrors with `ORDER BY ALL NULLS FIRST` (DuckDB).
    * Needed because the synthetic data has duplicate "natural keys" (e.g.
    * 1161 duplicate (l_orderkey, l_linenumber) pairs at sf0.001), so any
    * partial ordering leaves the hash compare nondeterministic.
    */
  def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.toIndexedSeq.map(c => col(c).asc_nulls_first): _*)

  /** Exact integer cents of a double column (deterministic across engines). */
  def cents(c: Column): Column = floor(c * lit(100)).cast("long")

  /** cents sum / 100 as double — exact, order-independent "dollar" sum. */
  def sumDollars(c: Column): Column =
    (sum(cents(c)).cast("double") / lit(100.0))

  /** Exact average of a double column via integer cents. */
  def avgDollars(c: Column): Column =
    (sum(cents(c)).cast("double") / (count(c) * lit(100)).cast("double"))

  /** DuckDB SQL fragments mirroring the above (kept adjacent for review). */
  def sqlCents(e: String): String = s"CAST(FLOOR(($e) * 100) AS BIGINT)"
  def sqlSumDollars(e: String): String =
    s"CAST(SUM(${sqlCents(e)}) AS DOUBLE) / 100.0"
  def sqlAvgDollars(e: String): String =
    s"CAST(SUM(${sqlCents(e)}) AS DOUBLE) / CAST(COUNT($e) * 100 AS DOUBLE)"
}
