package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Theta-sketch aggregate (SURVEY.md §2 E171): folds a group's long keys
  * into ONE serialized compact theta sketch — the DataSketches KMV
  * ("k minimum values") distinct-count sketch whose SET ALGEBRA is closed:
  * unlike HLL, theta sketches support intersection and difference with
  * error bounds, so |A∩B| / |A∪B| / |A∖B| are answerable without ever
  * joining A and B.
  *
  * The Catalyst extension-point choice (SURVEY §4.2 ladder): an
  * `Aggregator` buffer must be Encoder-serializable per ROW-group
  * assignment, but a theta `Union` is an off-heap-backed object with no
  * Java serialization — `TypedImperativeAggregate` is the interface built
  * for exactly this (an opaque mutable buffer, serialized only at shuffle
  * boundaries via `serialize`/`deserialize`). Same pattern as Spark's own
  * HLL++ and percentile aggregates.
  *
  * Determinism: a theta sketch's retained set is the k smallest values of
  * a seed-fixed hash — a pure function of the input key MULTISET, so
  * merge order (partial aggregation, shuffle arrival order, AQE re-plans)
  * cannot change the result; `getResult` emits the ORDERED compact form,
  * so the bytes are canonical too. The shuffle carries one ≤(8·2^lgK)-byte
  * partial sketch per (task, group), never the keys.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch needs a LONG key column, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Driver-side set algebra over [[ThetaSketchAgg]] outputs — the
  * metadata-scale step (a handful of compact sketches, KBs each; the
  * Versioned-manifest posture): the distributed pass builds one sketch
  * per group, the driver combines them.
  */
object ThetaSketch {
  def wrap(bytes: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  def union(a: Array[Byte], b: Array[Byte], lgK: Int = 12): Array[Byte] = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.toByteArray
  }

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.toByteArray
  }

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val op = SetOperation.builder().buildANotB()
    op.setA(wrap(a)); op.notB(wrap(b))
    op.getResult(true).toByteArray
  }

  /** (estimate, lower, upper) at `numStdDev` standard deviations. */
  def bounds(bytes: Array[Byte], numStdDev: Int): (Double, Double, Double) = {
    val s = wrap(bytes)
    (s.getEstimate, s.getLowerBound(numStdDev), s.getUpperBound(numStdDev))
  }
}
