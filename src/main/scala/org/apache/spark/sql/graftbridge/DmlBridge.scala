package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `private[sql]` pieces the DSv2 catalog surface needs (same namespace
  * escape hatch as [[ColumnBridge]]):
  *
  *  - the built-in v2 PARQUET writer, so the graft catalog's staged
  *    writes reuse Spark's executor-side file writing (task commit
  *    protocol, speculative-attempt handling, per-task parquet encoding)
  *    verbatim instead of re-implementing a distributed writer;
  *  - the v2-Predicate → v1-Filter translation, so `DELETE WHERE`
  *    predicates reuse the same Filter→Column path the read side uses.
  */
object DmlBridge {

  /** A BatchWrite that lands `info.schema`-shaped rows as parquet files
    * in `path`, driven by Spark's own v2 parquet write (file commit
    * protocol included — after `commit()` the directory holds the final
    * files).
    */
  def parquetBatchWrite(spark: SparkSession, path: String,
      info: LogicalWriteInfo): BatchWrite =
    ParquetTable("graft-staging", spark, CaseInsensitiveStringMap.empty(),
      Seq(path), Some(info.schema), classOf[ParquetFileFormat])
      .newWriteBuilder(info).build().toBatch

  def predicateToV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)

  /** Scala-space value of a v2 Literal (whose `value()` is the
    * CATALYST-internal form — UTF8String for strings, etc.).
    */
  def literalToScala(
      l: org.apache.spark.sql.connector.expressions.Literal[_]): Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToScala(l.value, l.dataType)

  /** A v2 `Batch` over parquet files whose schema IS `schema` (the
    * caller guarantees the files were written with exactly that layout),
    * delegating to Spark's v2 parquet scan — real distributed
    * InputPartitions, vectorized readers, the works.
    */
  def parquetBatch(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.connector.read.Batch = {
    val table = ParquetTable("graft-rowlevel-scan", spark,
      CaseInsensitiveStringMap.empty(), Seq(path), Some(schema),
      classOf[ParquetFileFormat])
    val builder = table.newScanBuilder(CaseInsensitiveStringMap.empty())
    builder.pruneColumns(schema)
    builder.build().toBatch
  }
}
