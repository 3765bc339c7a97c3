package graft.sources

import graft.operators.Versioned
import graft.operators.Versioned.AddColStats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources._

/** Driver-side APPEND-LINK skipping from pushed v1 filters (E198) — the
  * Delta/Iceberg file-skipping posture applied to the versioned store's
  * append chain. Every delta commit carries a `_addstats` sidecar of
  * footer-harvested per-column (rows, nulls, min, max); a read whose
  * pushed predicate provably excludes every row of a link skips that
  * link's scan entirely. The 100 TB shape this buys: a `ts > now - 1h`
  * query over a month of streaming ingest between compactions plans a
  * few-version scan instead of a 2000-version union.
  *
  * Soundness: a link is skipped only when, for SOME pushed conjunct,
  * no row of the link can satisfy it (stats are exact for the integer
  * domains the sidecar records, and every comparison predicate is
  * null-rejecting, so "outside [min, max]" plus "all-null" both imply
  * the re-applied residual filter would drop every row). Both v1 read
  * paths re-apply all pushed filters above the scan, so skipping is an
  * optimization, never a correctness dependency. Engagement guards:
  *
  *  - no rename/drop version in the chain — a retired column's stats
  *    must never answer for a later same-name column (`IS NULL` would
  *    mis-skip);
  *  - every link's recorded layout equals the base's (the stable-schema
  *    ingest chain) — skipping a link can then never narrow the folded
  *    schema out from under the plan's required columns;
  *  - stats domain tag must match the literal's domain ('i' integral,
  *    'd' date-days, 't' UTC-timestamp-micros) — a mismatch keeps the
  *    link.
  */
private[sources] object AddSkip {

  /** The chain read with hidden-base pruning AND append-link skipping
    * composed — the ONE composition both v1 read paths
    * ([[GraftV1Scan]] and [[VersionedRelation]]) share, so pruned
    * catalog reads and stats-rerouted reads can never diverge. Falls
    * back to `plain` (recording the base probe as "full") when the
    * hidden prune doesn't engage; link skipping applies either way.
    */
  def composedRead(s: SparkSession, dir: String, tip: Int,
      full: org.apache.spark.sql.types.StructType, pushed: Seq[Filter])(
      plain: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val keep = skippable(s, dir, tip, pushed)
    HiddenPrune.pruned(s, dir, tip, full, pushed,
        keep.getOrElse((_: Int) => true))
      .getOrElse {
        // the base-prune probe reflects the BASE scan that ran (full);
        // link skipping reports through GraftAddSkipProbe
        GraftScanPruneProbe.last.set("full")
        keep match {
          case Some(k) => Versioned.readAtDvBase(s, dir, tip,
            b => Versioned.readPartitionedOrFlatAt(s, dir, b), k)
          case None => plain
        }
      }
  }

  /** The keep-predicate over append versions of `dir`'s chain at `tip`,
    * or None when skipping cannot engage (no appends, missing sidecars,
    * layout drift, a meta version in the chain, or nothing excluded).
    * Sets [[GraftAddSkipProbe]] on engagement.
    */
  def skippable(s: SparkSession, dir: String, tip: Int,
      pushed: Seq[Filter]): Option[Int => Boolean] =
    if (pushed.isEmpty) None
    else scala.util.Try(decide(s, dir, tip, pushed)).toOption.flatten

  // version dirs are immutable once committed, so a base's column layout
  // never changes — cached per (dir, base) to keep the stable-schema
  // guard off the per-query planning path (the first filtered scan pays
  // one driver-side schema read, every later one a map hit)
  private val baseLayoutCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Seq[String]]()

  private def baseLayout(s: SparkSession, dir: String,
      base: Int): Seq[String] =
    baseLayoutCache.computeIfAbsent((dir, base), _ =>
      Versioned.readPartitionedOrFlatAt(s, dir, base)
        .schema.fieldNames.toSeq.filterNot(_ == "gpart"))

  // sidecars are sealed with their version and never change; PRESENT
  // sidecars cache forever, absent ones stay uncached (re-checked — a
  // cheap existence probe, and the conservative direction)
  private val statsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), (Seq[String], Map[String, AddColStats])]()

  private def cachedStats(dir: String,
      w: Int): Option[(Seq[String], Map[String, AddColStats])] =
    Option(statsCache.get((dir, w))).orElse {
      val r = Versioned.addStats(dir, w)
      r.foreach(statsCache.put((dir, w), _))
      r
    }

  private def decide(s: SparkSession, dir: String, tip: Int,
      pushed: Seq[Filter]): Option[Int => Boolean] = {
    val base = Versioned.materializedBaseAt(dir, tip).getOrElse(return None)
    val chain = ((base + 1) to tip).filter(Versioned.isCommitted(dir, _))
    if (chain.exists(Versioned.isMetaVersion(dir, _))) return None
    val adds = chain.filter(Versioned.isAddVersion(dir, _))
    if (adds.isEmpty) return None
    val stats = adds.map(w => w -> cachedStats(dir, w)).toMap
    if (stats.values.exists(_.isEmpty)) return None
    val layouts = stats.values.map(_.get._1).toSet
    if (layouts.size != 1) return None
    // the stable-schema guard: links must carry exactly the base's
    // columns (minus the hidden tier's derived key, which the read
    // drops) so a skip can never narrow the folded schema
    if (layouts.head != baseLayout(s, dir, base)) return None
    val skipped = adds.filter { w =>
      val byCol = stats(w).get._2
      pushed.exists(f => excludes(byCol, f))
    }
    if (skipped.isEmpty) None
    else {
      GraftAddSkipProbe.last.set(s"skip:${skipped.size}/${adds.size}")
      val dead = skipped.toSet
      Some(w => !dead.contains(w))
    }
  }

  /** Does `f` provably exclude EVERY row of a link with stats `byCol`?
    * Only the conjunct shapes below decide; anything else keeps the
    * link. Comparisons are evaluated in the sidecar's integer domain
    * after a tag-checked literal conversion.
    */
  private def excludes(byCol: Map[String, AddColStats], f: Filter): Boolean = {
    def statsOf(a: String): Option[AddColStats] =
      byCol.collectFirst { case (c, st) if c.equalsIgnoreCase(a) => st }
    def litOf(st: AddColStats, v: Any): Option[Long] = (st.tag, v) match {
      case ('i', n: java.lang.Number) if n.isInstanceOf[java.lang.Byte] ||
          n.isInstanceOf[java.lang.Short] || n.isInstanceOf[Integer] ||
          n.isInstanceOf[java.lang.Long] => Some(n.longValue)
      case ('d', d: java.sql.Date) => Some(d.toLocalDate.toEpochDay)
      case ('d', d: java.time.LocalDate) => Some(d.toEpochDay)
      case ('t', t: java.sql.Timestamp) =>
        // getTime's millis already include the integral-millis part of
        // getNanos — rebuild micros from (whole seconds, full nanos)
        Some(Math.floorDiv(t.getTime, 1000L) * 1000000L +
          t.getNanos / 1000L)
      case ('t', i: java.time.Instant) =>
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case _ => None
    }
    f match {
      case EqualTo(a, v) => statsOf(a).exists { st =>
        st.mm match {
          case None => true // all null: equality never matches
          case Some((mn, mx)) =>
            litOf(st, v).exists(l => l < mn || l > mx)
        }
      }
      case In(a, vs) => statsOf(a).exists { st =>
        st.mm match {
          case None => vs.nonEmpty
          case Some((mn, mx)) =>
            vs.nonEmpty && vs.forall(v =>
              litOf(st, v).exists(l => l < mn || l > mx))
        }
      }
      case GreaterThan(a, v) => statsOf(a).exists(st =>
        st.mm.forall { case (_, mx) => litOf(st, v).exists(mx <= _) })
      case GreaterThanOrEqual(a, v) => statsOf(a).exists(st =>
        st.mm.forall { case (_, mx) => litOf(st, v).exists(mx < _) })
      case LessThan(a, v) => statsOf(a).exists(st =>
        st.mm.forall { case (mn, _) => litOf(st, v).exists(mn >= _) })
      case LessThanOrEqual(a, v) => statsOf(a).exists(st =>
        st.mm.forall { case (mn, _) => litOf(st, v).exists(mn > _) })
      case IsNull(a) => statsOf(a).exists(_.nulls == 0L)
      case IsNotNull(a) => statsOf(a).exists(st =>
        st.rows > 0L && st.nulls == st.rows)
      case And(l, r) => excludes(byCol, l) || excludes(byCol, r)
      case _ => false
    }
  }
}

/** Test/oracle probe: the last scan's append-skip decision
  * ("skip:<skipped>/<links>" on engagement; callers reset it).
  */
private[graft] object GraftAddSkipProbe {
  val last = new java.util.concurrent.atomic.AtomicReference[String]("")
}
