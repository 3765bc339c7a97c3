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

  /** Bloom-pruned semi-join for long keys — the explicit form of a runtime
    * filter: build a Bloom filter over the small side's keys, broadcast it,
    * and drop non-matching big-side rows BEFORE the shuffle; the exact
    * left-semi join afterwards removes the false positives, so the result
    * is identical to a plain semi-join while the shuffle carries ~fpp of
    * the non-matching rows instead of all of them. (The membership test is
    * a UDF by necessity: Spark's `might_contain` expression is
    * optimizer-internal, not registered for users.)
    */
  def bloomPrunedSemiJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain =
      udf((k: java.lang.Long) => k != null && bc.value.mightContain(k.longValue()))
    big.filter(mightContain(col(key)))
      .join(small.select(key).distinct(), Seq(key), "left_semi")
  }

  /** Small-file compaction — THE routine lake-maintenance op: rewrite a
    * directory of fragmented parquet into files of ~`targetFileMB`, sized
    * from the optimizer's own byte statistics (so the caller doesn't guess a
    * partition count). Returns the partition count used.
    */
  def compact(df: DataFrame, outPath: String, targetFileMB: Int = 128): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1,
      (bytes / (targetFileMB.toLong * 1024 * 1024)).toInt +
        (if (bytes % (targetFileMB.toLong * 1024 * 1024) > 0) 1 else 0))
    df.repartition(parts).write.mode("overwrite").parquet(outPath)
    parts
  }

  /** Z-order clustering value for two non-negative int columns: interleaves
    * the low 31 bits of each (a in even positions, b in odd), so sorting by
    * the result keeps rows close in BOTH dimensions — parquet row-group
    * min/max stats then prune 2-D range predicates, which a lexicographic
    * sort only achieves for the leading column. Pure bit arithmetic on
    * columns — codegen'd, no UDF.
    */
  // the morton-spread shift-or-mask stages, shared by the Column and the
  // driver-side scalar forms so the two can never drift (a drift would
  // break zorderLayout's zMax bucket bound; ZorderScalarSpec pins them
  // value-equal over the edge domain)
  private val spreadMasks = Array(
    16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  def zValue(a: Column, b: Column): Column = {
    // spread the low 31 bits of x to even bit positions (classic morton
    // spreading, done with shift-or-mask stages as column expressions)
    def spread(x: Column): Column =
      spreadMasks.foldLeft(x.cast("long")) { case (v, (sh, m)) =>
        v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(m))
      }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** [[zValue]] evaluated driver-side on one (a, b) pair — built from the
    * SAME mask stages, so it is value-equal by construction. Monotone in
    * each argument over non-negative 31-bit inputs, and the two bit
    * planes are disjoint, so `zValueScalar(maxA, maxB)` bounds every
    * row's z (the zorderLayout bucket-shift derivation).
    */
  def zValueScalar(a: Long, b: Long): Long = {
    def spread(x: Long): Long =
      spreadMasks.foldLeft(x) { case (v, (sh, m)) => (v | (v << sh)) & m }
    spread(a) | (spread(b) << 1)
  }

  /** Repartition+sort by the Z-order value of (a, b) — the write-side layout
    * for 2-D data skipping.
    */
  def zorderBy(df: DataFrame, partitions: Int, a: Column, b: Column): DataFrame = {
    val z = zValue(a, b)
    df.repartitionByRange(partitions, z).sortWithinPartitions(z)
  }
}
