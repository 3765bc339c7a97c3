package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the shapes that decide whether a join is
  * feasible at 100 TB (SURVEY.md §4.1 "shuffle/partitioning" row; the
  * builder-prompt scale contract).
  */
object Layout {

  /** Write both sides bucketed+sorted on the join key so subsequent joins
    * are shuffle-free (co-located sort-merge): classic Hive/Spark bucketing.
    * Reads back via the table names.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Salted equi-join for skewed keys: the skewed (big) side gets a random
    * salt in [0, salts); the small side is replicated `salts` times with an
    * exploded salt column, so one hot key spreads over `salts` reducers.
    * Deterministic result set (the salt never leaves the join).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Range-partition + sort within partitions by `cols` — the write-side
    * layout that makes downstream range scans partition-prunable.
    */
  def clusterBy(df: DataFrame, partitions: Int, cols: Column*): DataFrame =
    df.repartitionByRange(partitions, cols: _*)
      .sortWithinPartitions(cols: _*)
}
