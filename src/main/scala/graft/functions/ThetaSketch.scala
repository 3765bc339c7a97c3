package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Sketch, Sketches}

/** Error-bound probe for Spark's NATIVE theta sketch functions
  * (SURVEY.md §2 E171).
  *
  * Spark 4.1 ships the whole theta family built in —
  * `theta_sketch_agg`, `theta_union`, `theta_intersection`,
  * `theta_difference`, `theta_sketch_estimate` — as native
  * `TypedImperativeAggregate`s / expressions over DataSketches compact
  * bytes, so the engine USES them (the functions-not-UDFs rule applies
  * to ourselves too: never re-implement a built-in). The one thing the
  * built-in surface does not expose is the sketch's ERROR BOUNDS, which
  * the certification row `q_theta_sets` needs to hash-prove the
  * estimate-vs-exact contract every round. Spark's sketch bytes are
  * standard DataSketches compact sketches, so this helper wraps them
  * with the same library Spark embeds and reads the bounds off —
  * a metadata-scale probe over per-group sketch rows (the
  * q_heavy_hitters CMS-probe seam), never over data.
  */
object ThetaSketch {
  def wrap(bytes: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = wrap(bytes).getEstimate

  /** (estimate, lower, upper) at `numStdDev` standard deviations.
    * Deterministic: bounds are pure functions of the retained hash set
    * and theta, both order-insensitive functions of the input multiset.
    */
  def bounds(bytes: Array[Byte], numStdDev: Int): (Double, Double, Double) = {
    val s = wrap(bytes)
    (s.getEstimate, s.getLowerBound(numStdDev), s.getUpperBound(numStdDev))
  }
}
