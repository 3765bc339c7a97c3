package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom UDAF (SURVEY.md §2.11 X2): geometric mean via the log-sum identity
  * exp(Σ ln x / n). Maps Hive's UDAF extension point onto Spark's typed
  * `Aggregator` (stable public API, codegen-compatible via `udaf(...)`).
  * The (Double, Long) buffer merges associatively, so partial aggregation
  * works map-side — the shuffle carries one 16-byte buffer per group.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
