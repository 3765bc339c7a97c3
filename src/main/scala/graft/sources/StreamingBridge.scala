package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** The one internal seam the v1 streaming `Source` contract forces on an
  * external source: `MicroBatchExecution` asserts every `getBatch` result
  * has `isStreaming = true`, but the only way to tag a DataFrame that way
  * — `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * is `private[sql]`. Spark's own v1 sources (FileStreamSource,
  * MemoryStream) call it from inside the package; external v1 sources
  * have always used exactly this sub-package bridge (the Apache Bahir
  * streaming connectors' pattern, e.g. its MQTT source). Confined to this
  * one object so the seam is auditable: everything else in the graft
  * source tree is public Spark API.
  *
  * The returned frame is a `LogicalRDD` over the batch plan's
  * `InternalRow`s — the batch is bounded (one version range of a
  * versioned table), so losing the declarative plan costs nothing: the
  * delegate plan it wraps already did its pruning/pushdown.
  */
object StreamingBridge {
  def asStreaming(df: DataFrame): DataFrame = {
    val s = df.sparkSession.asInstanceOf[classic.SparkSession]
    s.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
