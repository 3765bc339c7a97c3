package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native as-of join (SURVEY.md §2.3 J10 as the full custom-operator ladder:
  * LogicalPlan + SparkStrategy + SparkPlan, rung (c) of the builder-prompt
  * preference order — the compositional rungs (a)/(b) live in
  * `operators.Joins.asofJoin`).
  *
  * Semantics: for each left row, attach the LATEST right row of the same key
  * with `rightTime <= leftTime` (nulls when none) — left-outer, exactly the
  * `LEFT JOIN + row_number DESC = 1` SQL the oracle runs.
  *
  * Scale shape: `requiredChildDistribution` co-partitions both inputs on the
  * key and `requiredChildOrdering` sorts each partition by (key, time), so
  * execution is ONE forward merge pass per partition — no candidate-pair
  * blowup (theta-join + argmax is O(matches) rows) and no union-window
  * global state (the compositional form carries last_value state through a
  * window). Each input shuffles exactly once; memory is O(1 row) per stream.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoin = copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution:
      Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(leftKeys) ::
      org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      val outProj = UnsafeProjection.create(output, leftOut ++ rightOut)

      new Iterator[InternalRow] {
        // current right-side cursor (copies: projections reuse buffers)
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rT: InternalRow = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val row = rIter.next()
            rRow = row.copy()
            rKey = rKeyProj(rRow).copy()
            rT = rTimeProj(rRow).copy()
          } else { rRow = null; rKey = null; rT = null }
        advanceRight()

        // latest matching right row for the current left key
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lT = lTimeProj(lRow)
          if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
            lastMatch = null; lastMatchKey = null
          }
          // consume right rows with key < lKey (drop) or key == lKey and
          // time <= lT (record as latest match)
          var advancing = true
          while (advancing && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && timeOrd.compare(rT, lT) <= 0) {
              lastMatch = rRow; lastMatchKey = rKey
              advanceRight()
            } else advancing = false
          }
          val r = if (lastMatch != null) lastMatch else nullRight
          outProj(joined(lRow, r))
        }
      }
    }
  }
}

/** DataFrame-facing API + lazy strategy injection (works on a stock session:
  * `spark.experimental.extraStrategies` is public, no withExtensions needed).
  */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame, leftKey: Column,
      rightKey: Column, leftTime: Column, rightTime: Column): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val plan = AsOfJoin(
      leftDf.queryExecution.analyzed, rightDf.queryExecution.analyzed,
      Seq(ColumnBridge.expression(leftKey)), Seq(ColumnBridge.expression(rightKey)),
      ColumnBridge.expression(leftTime), ColumnBridge.expression(rightTime))
    ColumnBridge.ofRows(spark, plan)
  }
}
