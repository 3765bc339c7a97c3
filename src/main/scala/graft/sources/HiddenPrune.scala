package graft.sources

import graft.operators.Versioned
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._

/** Driver-side hidden-partition pruning from pushed v1 filters (E193),
  * shared by BOTH physical read paths of a catalog table — the v2
  * [[GraftV1Scan]] and the v1 [[VersionedRelation]] the statistics
  * reroute ([[VersionedScanStats]]) substitutes for it — so pruning and
  * real join statistics compose on one read instead of excluding each
  * other (the round-13 tradeoff, removed).
  *
  * When the chain's BASE version is hidden-partitioned and the pushed
  * filters bound the RAW source column, the base scan is replaced by a
  * driver-side partition-pruned read — point/IN predicates admit exactly
  * the probed keys' partitions (any transform), ranges admit
  * `[transform(lo), transform(hi)]` (monotone transforms only). The
  * pruned base is row-identical to (full base ∘ predicate) and Spark
  * re-applies every filter above the scan, so pruning is an
  * optimization, never a correctness dependency — anything unparseable
  * falls back to the full read (`Try`), and a rename anywhere above the
  * base disables pruning (the sidecar records the pre-rename column
  * name).
  */
private[sources] object HiddenPrune {

  /** The chain-resolved read of `dir` at `tip` with a partition-pruned
    * base, or None when pruning cannot engage (not hidden-partitioned, a
    * rename above the base, no usable predicate, or a type combination
    * outside the proven classes below). Sets [[GraftScanPruneProbe]] on
    * engage; the CALLER records `"full"` when falling back (so the probe
    * always reflects the scan that actually ran).
    */
  def pruned(s: SparkSession, dir: String, tip: Int, full: StructType,
      pushed: Seq[Filter],
      keepAdd: Int => Boolean = _ => true): Option[DataFrame] =
    for {
      b <- Versioned.materializedBaseAt(dir, tip)
      if ((b + 1) to tip).forall(w => !Versioned.isMetaVersion(dir, w))
      spec <- Versioned.hiddenSpecAt(dir, b)
      prunedDf <- scala.util.Try(
        prunedBase(s, b, dir, spec._1, spec._2, full, pushed)).toOption.flatten
    } yield Versioned.readAtDvBase(s, dir, tip, _ => prunedDf, keepAdd)

  /** Pruning engages only where the pruned read's semantics PROVABLY
    * equal (full read ∘ predicate) for the column/literal types in
    * play — the review-pinned divergence classes:
    *
    *  - point/IN: the residual compares `cast(col AS STRING)` against
    *    the literal's `toString`, so both renderings must be canonical —
    *    strings, integral numbers, and dates qualify; TIMESTAMP literals
    *    render with a 'T'/'.0' the cast never produces (a silent
    *    zero-match), floats/decimals have unstable renderings → skip;
    *  - month/day/year ranges: temporal column types only — on a STRING
    *    column the pushed predicate compares lexicographically while the
    *    residual casts to DATE, and a malformed value (NULL partition)
    *    satisfies one but not the other;
    *  - trunc ranges: integral column types only — lexicographic string
    *    order ('9' > '10') diverges from the numeric window;
    *  - identity ranges: DATE or integral column types — a DATE's
    *    canonical rendering is fixed-width (lexicographic = chronologic)
    *    and integrals compare numerically; TIMESTAMP renderings diverge
    *    from literal spellings (the point/IN seam), strings have no
    *    residual-safe cast → skip.
    */
  private def prunedBase(s: SparkSession, b: Int, dir: String, t: String,
      srcCol: String, full: StructType,
      pushed: Seq[Filter]): Option[DataFrame] = {
    def isCol(a: String) = a.equalsIgnoreCase(srcCol)
    val srcType = full.fields
      .find(f => f.name.equalsIgnoreCase(srcCol)).map(_.dataType)
    def isTemporal = srcType.exists(d =>
      d == DateType || d == TimestampType || d == TimestampNTZType)
    def isIntegral = srcType.exists(d => d == ByteType || d == ShortType ||
      d == IntegerType || d == LongType)
    def canonical(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
          _: java.lang.Long => Some(v.toString)
      case d: java.sql.Date => Some(d.toString)
      case d: java.time.LocalDate => Some(d.toString)
      case _ => None
    }
    val pointVals = pushed.flatMap {
      case org.apache.spark.sql.sources.EqualTo(a, v)
          if isCol(a) && v != null => Seq(canonical(v))
      case org.apache.spark.sql.sources.In(a, vs)
          if isCol(a) && vs.nonEmpty && vs.forall(_ != null) =>
        vs.toSeq.map(canonical)
      case _ => Nil
    }
    val points = pointVals.flatten
    val rangeable = ((t == "month" || t == "day" || t == "year") &&
      isTemporal) || (t.startsWith("trunc:") && isIntegral) ||
      (t == "identity" && (srcType.contains(DateType) || isIntegral))
    if (points.nonEmpty && points.length == pointVals.length) {
      GraftScanPruneProbe.last.set(s"in:${points.size}")
      Some(Versioned.readPartitionedHiddenIn(s, dir, b, points))
    } else if (rangeable) {
      val los = pushed.collect {
        case org.apache.spark.sql.sources.GreaterThan(a, v)
            if isCol(a) && v != null => v.toString
        case org.apache.spark.sql.sources.GreaterThanOrEqual(a, v)
            if isCol(a) && v != null => v.toString
      }
      val his = pushed.collect {
        case org.apache.spark.sql.sources.LessThan(a, v)
            if isCol(a) && v != null => v.toString
        case org.apache.spark.sql.sources.LessThanOrEqual(a, v)
            if isCol(a) && v != null => v.toString
      }
      if (los.isEmpty || his.isEmpty) None
      else {
        // tightest admitted window; inclusive bounds are a superset of
        // any strict spelling (the re-applied filter keeps edges exact)
        val numeric = t.startsWith("trunc:") ||
          (t == "identity" && isIntegral)
        val (lo, hi) =
          if (numeric) (los.maxBy(_.toLong), his.minBy(_.toLong))
          else (los.max, his.min)
        GraftScanPruneProbe.last.set(s"range:$lo..$hi")
        Some(Versioned.readPartitionedHiddenRange(s, dir, b, lo, hi))
      }
    } else None
  }
}
