package graft.pipeline

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Production pipelines sample by HASHING a stable key, not by `rand()`:
  * the sample is then reproducible across reruns, engines, repartitioning,
  * and speculative retries, membership is decidable per row with no state,
  * and up/down-sampling a stratum later keeps prior members (hash buckets
  * nest). `df.stat.sampleBy` (kept here as the API-parity demo) offers none
  * of those at 100 TB.
  */
object Sampling {

  /** Stable [0, 100) bucket of a key: first 8 hex chars of md5 as an int.
    * md5 rather than xxhash64 so any engine (and the DuckDB oracle) can
    * reproduce membership.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep `pct`% of rows, decided by key hash — reproducible sampling. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) < pct)

  /** Per-stratum rates: keep `rates(stratum)`% (default `otherPct`%). */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Int], otherPct: Int): DataFrame = {
    val rate = rates.foldLeft(lit(otherPct)) { case (acc, (value, pct)) =>
      when(stratum === value, pct).otherwise(acc)
    }
    df.filter(hashBucket(key) < rate)
  }

  val queries: Map[String, Q] = Map(
    // Stratified reproducible sample: English kept at 80%, the rest at 20%
    // — the rebalancing step of corpus curation, exactly reproducible in any
    // engine (oracle-checked).
    "q_sample_stratified" -> ((s, dir) => {
      stratifiedHashSample(T.documents(s, dir), col("doc_id"), col("lang"),
        Map("en" -> 80), otherPct = 20)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_sample_stratified" ->
      """SELECT lang, count(*) AS n_kept FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |      < (CASE WHEN lang = 'en' THEN 80 ELSE 20 END)
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
