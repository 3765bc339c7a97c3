package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 removed the public `new Column(expr)` constructor; the supported
  * conversion lives in `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is `private[sql]` — so this one-file shim sits inside the `sql` package
  * namespace (the customary escape hatch for Spark extension libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (classic.Dataset.ofRows is
    * private[sql]); needed to hand custom logical operators to the planner.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-bind a streaming micro-batch DataFrame (the frame a v1 `Sink`'s
    * `addBatch` receives, wired to the in-flight IncrementalExecution) to
    * a standalone NON-streaming plan over the same internal rows — the
    * exact rebinding Spark's own ForeachBatchSink performs before handing
    * the batch to user code. Without it, re-executing the frame (e.g. a
    * parquet write) would re-plan against streaming sources and fail.
    */
  def stableBatch(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val classic =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ofRows(df.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        classic.queryExecution.toRdd, classic, isStreaming = false))
  }
}
