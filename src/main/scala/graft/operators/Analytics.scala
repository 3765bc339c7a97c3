package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 extension rows E167–E170: decision-support analytics the
  * reference reaches only through its Hive delegation
  * (`AvroFromXmlSerde.scala:13`) — skyline (multi-criteria dominance),
  * association rules (market-basket co-occurrence), exponentially weighted
  * moving averages, and equi-depth histograms. Each is spelled as
  * DataFrame algebra whose physical plan survives a 100× scale-up: no
  * cartesian pairings, no single-task windows, no driver loops over data
  * (the only collects are metadata-scale: bucket boundary keys and
  * per-bucket maxima, one row per bucket — the `runningSumRanged`
  * posture).
  */
object Analytics {

  /** Exact interpolated quantiles of a LONG column, distributed.
    *
    * `percentile()`'s single-reducer merge buffers a (value → count) map
    * of every distinct value — 2.1 s of one-task work for the 581 k
    * distinct cents of sf0.1 lineitem, and unbounded single-task state at
    * 100 TB. This is the classic distributed exact-quantile rewrite:
    *
    *  1. one narrow agg gives (n, min, max); the ranks to look up are
    *     floor/ceil of each position f·(n−1) — ≤ 2·|fracs| of them;
    *  2. recursive range binning finds each rank's VALUE: B-way split of
    *     the value range, per-bin counts (one parallel job per level,
    *     ≤ B rows collected — metadata-scale), recurse into any needed
    *     bin still holding > 2^16 rows, else collect that bin's (value,
    *     count) pairs and resolve the rank exactly. Depth ≤ log_B(span):
    *     ≤ 2 levels for integer cents. All integer arithmetic — no
    *     float seam can reorder values;
    *  3. the interpolation between the two rank values is delegated to
    *     Spark's OWN `percentile` over a two-row frame at percentage
    *     g = p − floor(p): its position is g·(2−1) = g, and both
    *     (p − floor(p)) and (ceil(p) − p) are EXACT doubles (Sterbenz —
    *     the neighbours are within a factor of two), so the result is
    *     bit-identical to the single-reducer spelling, with none of its
    *     memory shape.
    *
    * Driver traffic is bounded by B + 2^16 rows per level — rank
    * METADATA, never the data (the zone-map-collect contract).
    */
  private[graft] def exactQuantilesLong(df: DataFrame, c: String,
      fracs: Seq[Double]): Seq[Double] = {
    val s = df.sparkSession
    import s.implicits._
    val head = df.agg(count(col(c)).as("n"), min(col(c)).as("mn"),
      max(col(c)).as("mx")).collect()(0)
    val n = head.getLong(0)
    require(n > 0, "exactQuantilesLong: empty input")
    val (mn, mx) = (head.getLong(1), head.getLong(2))
    val positions = fracs.map(f => f * (n - 1))
    val neededRanks = positions
      .flatMap(p => Seq(math.floor(p).toLong, math.ceil(p).toLong))
      .distinct.sorted
    val B = 1024L
    val Direct = 1L << 16
    val resolved = scala.collection.mutable.Map.empty[Long, Long]
    // work items: value range [lo, hi] → (globalRank, rankWithinRange)
    var work: List[((Long, Long), Seq[(Long, Long)])] =
      if (mn == mx || BigInt(mx) - BigInt(mn) >= BigInt(Long.MaxValue) / 2)
        Nil // degenerate / span overflow: both handled below
      else List((mn, mx) -> neededRanks.map(r => r -> r))
    if (mn == mx) return fracs.map(_ => mn.toDouble)
    if (work.isEmpty) {
      // span too wide for long bin arithmetic (never the cents shape):
      // correct single-reducer fallback
      val qs = df.agg(expr(
        s"percentile($c, array(${fracs.mkString(", ")}))")).collect()(0)
        .getSeq[Double](0)
      return qs
    }
    val vcol = col(c).as("__v")
    while (work.nonEmpty) {
      val ((lo, hi), ranks) = work.head
      work = work.tail
      if (lo == hi) ranks.foreach { case (g, _) => resolved(g) = lo }
      else {
        val width = math.max(1L, (hi - lo) / B + 1L)
        // integer `div` (never `/`: double division would misplace values
        // near bin edges for longs beyond 2^53)
        val counts = df.select(vcol).filter(col("__v").between(lo, hi))
          .groupBy(expr(s"(__v - ${lo}L) div ${width}L").as("__b"))
          .agg(count(lit(1)).as("__n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .sortBy(_._1)
        val cumBefore = counts.scanLeft(0L)(_ + _._2).init
        val byBin = ranks.groupBy { case (_, lr) =>
          // the bin holding local rank lr: last bin whose cumBefore ≤ lr
          var i = counts.length - 1
          while (i > 0 && cumBefore(i) > lr) i -= 1
          i
        }
        val (direct, recurse) = byBin.partition { case (i, _) =>
          counts(i)._2 <= Direct
        }
        if (direct.nonEmpty) {
          val bins = direct.keys.map(i => counts(i)._1).toSeq
          val vals = df.select(vcol).filter(col("__v").between(lo, hi))
            .withColumn("__b", expr(s"(__v - ${lo}L) div ${width}L"))
            .filter(col("__b").isin(bins: _*))
            .groupBy("__b", "__v").agg(count(lit(1)).as("__n"))
            .collect()
            .groupBy(_.getLong(0))
            .map { case (b, rows) =>
              b -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
            }
          direct.foreach { case (i, rs) =>
            val vc = vals(counts(i)._1)
            val cums = vc.scanLeft(0L)(_ + _._2).init
            rs.foreach { case (g, lr) =>
              val local = lr - cumBefore(i)
              var j = vc.length - 1
              while (j > 0 && cums(j) > local) j -= 1
              resolved(g) = vc(j)._1
            }
          }
        }
        recurse.foreach { case (i, rs) =>
          val b = counts(i)._1
          val nlo = lo + b * width
          val nhi = math.min(hi, nlo + width - 1)
          work = ((nlo, nhi) ->
            rs.map { case (g, lr) => (g, lr - cumBefore(i)) }) :: work
        }
      }
    }
    positions.map { p =>
      val (rl, rh) = (math.floor(p).toLong, math.ceil(p).toLong)
      if (rl == rh) resolved(rl).toDouble
      else {
        val g = p - math.floor(p)
        Seq(resolved(rl), resolved(rh)).toDF("__v")
          .agg(expr(s"percentile(__v, $g)")).collect()(0).getDouble(0)
      }
    }
  }

  /** 2-d skyline (dominance frontier): rows minimizing `minCol` while
    * maximizing `maxCol` — a row survives iff no other row is ≤ on
    * `minCol` AND ≥ on `maxCol` with at least one strict. The naive
    * spelling is an n² NOT-EXISTS self-join; this is the distributed
    * sweep-line rewrite:
    *
    *  1. collapse to one row per distinct `minCol` key holding the
    *     group's max `maxCol` (same-key rows below the group max are
    *     dominated within their group);
    *  2. a survivor is a group whose max strictly exceeds EVERY max at a
    *     strictly smaller key — a strict prefix-max over the key order,
    *     computed with the [[Aggregations.runningSumRanged]] machinery:
    *     explicit bucket boundaries from a deterministic hash-sample
    *     (pure row function — identical across jobs/retries), bucket id
    *     as a codegen'd comparison chain, per-bucket maxima collected
    *     (one row per bucket), exclusive prefix-max broadcast back, and
    *     a bucket-LOCAL `max().over()` window for the intra-bucket
    *     prefix — no "No Partition Defined" window anywhere;
    *  3. join the surviving (key, max) pairs back to the input.
    *
    * All comparisons, no arithmetic — `minCol` is compared on its raw
    * type; `maxCol` is compared as DOUBLE (exact for fractional values
    * and for integers up to 2^53 — beyond that, widen before calling;
    * a truncating integer cast would silently keep dominated rows whose
    * fractional maxima collide). Null keys/values are excluded
    * (dominance is undefined on null). `-Infinity` is the prefix-max
    * identity.
    *
    * The bucket-sweep scaffolding here intentionally mirrors
    * [[Aggregations.runningSumRanged]] with a different monoid (max, not
    * sum) and a 1-column order key — a change to either's boundary
    * sampling or prefix-broadcast logic should be cross-checked against
    * the other (not factored together: q_pareto's plan is hash-pinned).
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val s = df.sparkSession
    // capped at 256 buckets for the same reason as runningSumRanged: the
    // pidExpr comparison chain grows with n, and shuffle.partitions=2000
    // would push the codegen'd expression past JVM method limits
    val n = math.min(
      s.conf.get("spark.sql.shuffle.partitions", "32").toInt, 256)
    val pts = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    val g = pts.groupBy(col(minCol).as("__k"))
      .agg(max(col(maxCol).cast("double")).as("__gmax"))
    // driver phase: boundary cuts + per-bucket maxima. The grouped frame
    // is persisted across its three eager consumers (count, cut sample,
    // bucket maxima) so the upstream scan runs once; bucket membership is
    // a pure expression over the cuts, so the final (recomputing) plan
    // cannot disagree with what the collects saw.
    val cached = g.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cuts, offs) =
      try {
        val cnt = cached.count()
        val p = math.max(1L, cnt / math.max(1L, 128L * n))
        val sample = cached
          .filter(pmod(xxhash64(col("__k")), lit(p)) === 0)
          .select("__k").collect().map(_.get(0))
        val ord: Ordering[Any] = new Ordering[Any] {
          def compare(a: Any, b: Any): Int = (a, b) match {
            case (x: java.lang.Long, y: java.lang.Long) =>
              java.lang.Long.compare(x, y)
            case (x: Number, y: Number) =>
              java.lang.Double.compare(x.doubleValue(), y.doubleValue())
            case (x: Comparable[_], y) =>
              x.asInstanceOf[Comparable[Any]].compareTo(y)
            case _ => 0
          }
        }
        val sorted = sample.sorted(ord)
        val cutKeys: Seq[Any] =
          if (sorted.isEmpty) Seq.empty
          else (1 until n).map(i => sorted((i * sorted.length) / n))
            .distinct.sorted(ord).toSeq
        val pid = pidExpr(col("__k"), cutKeys)
        val bmax = cached.groupBy(pid.as("__pid"))
          .agg(max(col("__gmax")).as("__bm"))
          .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
        // exclusive prefix max per present bucket (identity for the first)
        var acc = Double.NegativeInfinity
        val offRows = bmax.map { case (b, m) =>
          val o = acc; acc = math.max(acc, m); (b, o)
        }
        (cutKeys, offRows.toIndexedSeq)
      } finally { cached.unpersist(false); () }
    val offDf = s.createDataFrame(offs).toDF("__pid", "__pmax")
    val w = Window.partitionBy("__pid").orderBy(col("__k").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val surv = g.withColumn("__pid", pidExpr(col("__k"), cuts))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("__prev",
        greatest(coalesce(max(col("__gmax")).over(w),
          lit(Double.NegativeInfinity)), col("__pmax")))
      .filter(col("__gmax") > col("__prev"))
      .select(col("__k"), col("__gmax"))
    pts.join(surv,
      pts(minCol) === surv("__k") &&
        pts(maxCol).cast("double") === surv("__gmax"))
      .drop("__k", "__gmax")
  }

  /** Bucket id = number of ascending cut keys strictly below the key — a
    * pure, codegen'd comparison chain (no execution-time sampling). */
  private def pidExpr(key: Column, cuts: Seq[Any]): Column =
    cuts.map(c => when(key > lit(c), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))

  /** Derived-constant join key for 1-row stats attaches: always 0, but
    * NON-foldable (it reads a column), so Catalyst keeps the equi-join
    * and plans a broadcast HASH join — a plain `lit` key constant-folds
    * away and the attach degrades to a BroadcastNestedLoopJoin. Same
    * semantics and cost as a cross join of a 1-row frame; this spelling
    * keeps the PlanSpec nested-loop whitelist closed. */
  private[graft] def key0(c: Column): Column =
    pmod(xxhash64(c), lit(1)).cast("int")

  val queries: Map[String, Q] = Map(
    // E167: skyline over part — cheapest-yet-largest frontier
    // (minimize p_retailprice, maximize p_size). Oracle is the n²
    // NOT EXISTS spelling; this plan is the linear sweep.
    "q_skyline" -> ((s, dir) => {
      skyline2d(T.part(s, dir), "p_retailprice", "p_size")
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    }),

    // E168: association rules over order baskets (market-basket
    // analysis, Agrawal-Srikant). Items = brands per order; the
    // apriori property prunes infrequent items BEFORE any pairing
    // (broadcast semi-join), so per-basket pair fan-out is bounded by
    // the frequent-basket size squared, never |items|². Pairs below
    // mean support are dropped by integer cross-multiplication
    // (SF-relative, exact at any scale). Confidence and lift are each
    // ONE double division/multiplication chain over exact long counts —
    // deterministic, engine-identical.
    "q_assoc_rules" -> ((s, dir) => {
      // the basket-item table feeds FIVE consumers (totals, item counts,
      // both pairing sides, the semi-join) — checkpoint it once so the
      // scan+join+distinct runs once, not five times (the iterative-
      // operator Ckpt posture; a production pipeline would persist this
      // table between the stages)
      val items = graft.Ckpt(T.lineitem(s, dir)
        .join(broadcast(T.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
        .distinct())
      val tot = items.agg(countDistinct(col("basket")).as("n_baskets"))
        .withColumn("__k0", key0(col("n_baskets")))
      // items is distinct per (basket, item): count(*) = basket support
      val itemCnt = items.groupBy("item").agg(count(lit(1)).as("n_item"))
      val freq = itemCnt.withColumn("__k0", key0(col("n_item")))
        .join(broadcast(tot), Seq("__k0"))
        .filter(col("n_item") * 200 >= col("n_baskets")) // >= 0.5% support
        .select("item", "n_item")
      val pruned = items.join(broadcast(freq.select("item")), Seq("item"),
        "left_semi")
      val a = pruned.select(col("basket"), col("item").as("item_a"))
      val b = pruned.select(col("basket"), col("item").as("item_b"))
      // NOT checkpointed: the two consumers' pairing subtrees are
      // identical, so exchange reuse already executes the join once —
      // an explicit checkpoint measured SLOWER (2.3 → 2.7 s)
      val pairs = a.join(b, Seq("basket"))
        .filter(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      val ps = pairs.agg(sum(col("n_ab")).as("s_ab"),
        count(lit(1)).as("n_pairs")).withColumn("__k0", key0(col("s_ab")))
      pairs.withColumn("__k0", key0(col("n_ab")))
        .join(broadcast(ps), Seq("__k0"))
        .filter(col("n_ab") * col("n_pairs") >= col("s_ab")) // above-mean
        .join(freq.select(col("item").as("item_a"), col("n_item").as("n_a")),
          Seq("item_a"))
        .join(freq.select(col("item").as("item_b"), col("n_item").as("n_b")),
          Seq("item_b"))
        .join(broadcast(tot), Seq("__k0"))
        .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
          col("n_b"),
          (col("n_ab").cast("double") / col("n_a").cast("double"))
            .as("conf_ab"),
          (col("n_ab").cast("double") / col("n_b").cast("double"))
            .as("conf_ba"),
          ((col("n_ab").cast("double") * col("n_baskets").cast("double")) /
            (col("n_a").cast("double") * col("n_b").cast("double")))
            .as("lift"))
    }),

    // E169: per-key EWMA over the event stream — weights (1/2)^j over the
    // last W=16 observations, normalized over however many exist. The
    // whole computation is EXACT integer arithmetic until one final
    // double division: numerator Σ centsⱼ·2^(15−j) (a lag chain — every
    // term a shifted long), denominator (2^16 − 2^(15−m))·100 where m+1
    // is the available-history length; both fit comfortably in a long,
    // so the quotient is bit-identical in Spark and DuckDB regardless of
    // evaluation order. Windows partition by user — parallel across
    // keys, never a single-task sort.
    "q_ts_ewma" -> ((s, dir) => {
      val W = 16
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val ev = T.events(s, dir).select(col("user_id"), col("event_id"),
        col("ts"), col("value"),
        floor(col("value") * 100).cast("long").as("__c"))
      val num = (0 until W).map(j =>
          coalesce(lag(col("__c"), j).over(w), lit(0L)) *
            lit(1L << (W - 1 - j)))
        .reduce(_ + _)
      ev.withColumn("__num", num)
        .withColumn("__m",
          least(row_number().over(w) - lit(1), lit(W - 1)))
        .withColumn("__den",
          (lit(1L << W) - expr(s"shiftleft(1L, ${W - 1} - __m)")) * lit(100L))
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("ts_us"), col("value"),
          (col("__num").cast("double") / col("__den").cast("double"))
            .as("ewma"))
    }),

    // E171: theta-sketch distinct-count SET ALGEBRA — the sketch-family
    // member HLL cannot be (theta sketches close under intersect /
    // difference): |A∩B|, |A∪B|, |A∖B| over the per-flag partkey sets
    // WITHOUT joining the sets. Spark 4.1 ships the theta family
    // NATIVELY (`theta_sketch_agg` + `theta_intersection`/`theta_union`/
    // `theta_difference` — TypedImperativeAggregates whose shuffle
    // carries KB partial sketches, never keys), so this row USES the
    // built-ins: one narrow conditional aggregation builds all three
    // per-flag sketches in a single pass, and the set algebra is
    // column-wise expressions over the 1-row sketch frame. Certification:
    // the exact counts are re-derived in one narrow agg and `theta_ok`
    // asserts every estimate's 3-σ bounds contain exact — bounds read
    // off the (standard DataSketches) sketch bytes by a probe udf over
    // the 5 op rows only (the q_heavy_hitters CMS-probe seam; the
    // built-in surface exposes estimates but not bounds). The
    // q_approx_distinct pattern: the error contract is hash-proved
    // every round. Deterministic: retained sets are the k smallest
    // seed-fixed hashes — pure functions of the key multiset.
    "q_theta_sets" -> ((s, dir) => {
      import graft.functions.ThetaSketch
      val li = T.lineitem(s, dir)
        .select(col("l_returnflag").as("f"), col("l_partkey").as("k"))
      val sk = li.agg(
        expr("theta_sketch_agg(CASE WHEN f = 'A' THEN k END)").as("ska"),
        expr("theta_sketch_agg(CASE WHEN f = 'N' THEN k END)").as("skn"),
        expr("theta_sketch_agg(CASE WHEN f = 'R' THEN k END)").as("skr"))
      val ops = sk.select(expr(
        "stack(5, " +
          "'A&N',   theta_intersection(ska, skn), " +
          "'A&R',   theta_intersection(ska, skr), " +
          "'N&R',   theta_intersection(skn, skr), " +
          "'A|N|R', theta_union(theta_union(ska, skn), skr), " +
          "'A-N',   theta_difference(ska, skn)) as (op, sk)"))
      // null-guarded: theta_sketch_agg over an all-NULL group yields a
      // NULL sketch (a dataset missing a whole flag) — emit null bounds
      // instead of NPE-ing the row
      val boundsOf = udf((b: Array[Byte]) =>
        if (b == null) null
        else { val (_, lb, ub) = ThetaSketch.bounds(b, 3); Array(lb, ub) })
      val estDf = ops.select(col("op"), boundsOf(col("sk")).as("b"))
        .select(col("op"), element_at(col("b"), 1).as("lb"),
          element_at(col("b"), 2).as("ub"))
      val flagBit = (name: String) =>
        max(when(col("f") === name, 1).otherwise(0)).as(name.toLowerCase)
      val g = li.distinct().groupBy("k")
        .agg(flagBit("A"), flagBit("N"), flagBit("R"))
      val both = (x: String, y: String) =>
        sum(when(col(x) === 1 && col(y) === 1, 1L).otherwise(0L))
      val exact = g.agg(
        both("a", "n").as("i_an"), both("a", "r").as("i_ar"),
        both("n", "r").as("i_nr"), count(lit(1)).as("u_anr"),
        sum(when(col("a") === 1 && col("n") === 0, 1L).otherwise(0L))
          .as("d_an"))
      val ex = exact.select(expr(
        "stack(5, 'A&N', i_an, 'A&R', i_ar, 'N&R', i_nr, " +
          "'A|N|R', u_anr, 'A-N', d_an) as (op, n_exact)"))
      ex.join(broadcast(estDf), Seq("op"))
        .select(col("op"), col("n_exact"),
          (col("lb") <= col("n_exact").cast("double") &&
            col("n_exact").cast("double") <= col("ub")).as("theta_ok"))
    }),

    // E175: per-key least-squares trend — the regr_slope/regr_intercept
    // surface spelled ORACLE-EXACT: x = the per-key observation index
    // (rank in (ts, event_id) order), y = integer cents, and the normal
    // equations stay in EXACT integer arithmetic: per-row sums (Σx, Σy,
    // Σxy, Σx²) in longs (safe to per-key n·x·y < 9e18), then every
    // CROSS product — slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept =
    // (Σy·den − num·Σx)/(n·den) — in DECIMAL(38,0)/HUGEINT (the E140
    // widening: the intercept numerator grows like n⁵·y, past a long at
    // n ≈ 2000 already), until ONE double division each — the zero-
    // float-seam recipe, engine-identical where the built-in regr_*
    // aggregates sum doubles in partition order. The built-ins are
    // unit-pinned to agree within 1e-9 (they run at 100 TB; this row is
    // their standing certification). One shuffle per key for the window
    // rank, one narrow agg.
    "q_trend_bykey" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      T.events(s, dir)
        .select(col("user_id"),
          (row_number().over(w) - lit(1)).cast("long").as("__x"),
          floor(col("value") * 100).cast("long").as("__y"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
          sum(col("__y")).as("__sy"),
          sum(col("__x") * col("__y")).as("__sxy"),
          sum(col("__x") * col("__x")).as("__sxx"))
        .filter(col("n") >= 2)
        .select((Seq("n", "__sx", "__sy", "__sxy", "__sxx")
          .map(c => col(c).cast("decimal(20,0)").as(c)) :+ col("user_id")): _*)
        .withColumn("__num",
          col("n") * col("__sxy") - col("__sx") * col("__sy"))
        .withColumn("__den",
          col("n") * col("__sxx") - col("__sx") * col("__sx"))
        .select(col("user_id"), col("n").cast("long").as("n"),
          (col("__num").cast("double") / col("__den").cast("double"))
            .as("slope_c"),
          ((col("__sy") * col("__den") - col("__num") * col("__sx"))
            .cast("double") /
            (col("n") * col("__den")).cast("double")).as("intercept_c"))
    }),

    // E176: time-weighted average (TWAP) — the financial/observability
    // aggregation where plain AVG over-weights dense bursts: each
    // observation weighs its HOLDING time (seconds until the key's next
    // observation; the last observation has no successor and zero
    // weight). Exact integers end-to-end: Δt in whole seconds (truncating
    // µs div — identical in both engines), products cents·Δt and both
    // sums in longs, ONE double division at the end. Per-key lead window
    // + one narrow agg; keys with one observation (no held interval)
    // drop, matching the SQL NULLIF guard.
    "q_ts_twap" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("__us").asc, col("event_id").asc)
      T.events(s, dir)
        .select(col("user_id"), expr("unix_micros(ts)").as("__us"),
          col("event_id"), floor(col("value") * 100).cast("long").as("__c"))
        .withColumn("__next", lead(col("__us"), 1).over(w))
        .withColumn("__dt", expr("(__next - __us) div 1000000"))
        .filter(col("__dt").isNotNull)
        .groupBy("user_id")
        .agg(sum(col("__c") * col("__dt")).as("__num"),
          sum(col("__dt")).as("__den"), count(lit(1)).as("n_held"))
        .filter(col("__den") > 0)
        .select(col("user_id"), col("n_held"),
          (col("__num").cast("double") / col("__den").cast("double"))
            .as("twap_c"))
    }),

    // E178: per-key rolling median — the robust moving-statistic twin of
    // E169's EWMA (medians shrug off the spikes an exponential average
    // chases): exact `percentile` over a BOUNDED 16-row window frame per
    // key. Frame-bounded exact percentile is scale-safe where the global
    // exact percentile is not (state = 16 longs per frame, any key
    // history length); rounding to 4 matches the A12 cross-engine
    // interpolation contract.
    "q_ts_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("__us").asc, col("event_id").asc)
        .rowsBetween(-15, 0)
      T.events(s, dir)
        .select(col("user_id"), expr("unix_micros(ts)").as("__us"),
          col("event_id"), floor(col("value") * 100).cast("long").as("__c"))
        .withColumn("roll_med_c",
          round(expr("percentile(__c, 0.5)").over(w), 4))
        .select(col("user_id"), col("event_id"), col("__us").as("ts_us"),
          col("roll_med_c"))
    }),

    // E179: first-order Markov transition matrix over event streams —
    // the session-flow / user-journey surface: per-key consecutive
    // event-type pairs (one lead window), counted and normalized into
    // transition probabilities by ONE double division over exact long
    // counts. Output is |event_type|² rows at most — metadata-scale
    // whatever the corpus; the row totals attach by a broadcast hash
    // join on the source state.
    "q_markov_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val trans = T.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("src"))
        .withColumn("dst", lead(col("src"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("n_sd"))
      val totals = trans.groupBy("src").agg(sum(col("n_sd")).as("n_s"))
      trans.join(broadcast(totals), Seq("src"))
        .select(col("src"), col("dst"), col("n_sd"), col("n_s"),
          (col("n_sd").cast("double") / col("n_s").cast("double")).as("p"))
    }),

    // E170: equi-depth histogram — bucket edges are the exact
    // k-quantiles, computed DISTRIBUTED by [[exactQuantilesLong]] (rank
    // lookup via recursive range binning; the old single-aggregate
    // `percentile` buffered all 581 k distinct cents in one reducer —
    // 2.1 s of single-task work at sf0.1 and unbounded state at 100 TB),
    // then inlined as literals into a codegen'd comparison chain over
    // the bucketing scan. Bit-identical edges (the final interpolation
    // runs Spark's own percentile over the two rank values); integer
    // cents vs interpolated edges: a cross-engine ulp on a fractional
    // edge cannot flip an integer comparison. `q_agg_percentile_approx`
    // remains the sketch twin for single-pass interactive use.
    "q_hist_equidepth" -> ((s, dir) => {
      val k = 8
      // the edge ranking and the bucketing scan share one checkpointed
      // narrow projection of the cents column
      val li = graft.Ckpt(T.lineitem(s, dir)
        .select(floor(col("l_extendedprice") * 100).cast("long").as("__c")))
      val fracs = (1 until k).map(i => i.toDouble / k)
      val qs = exactQuantilesLong(li, "__c", fracs)
      val bucket = (1 until k).map(i =>
          when(col("__c") > qs(i - 1), 1).otherwise(0))
        .reduce(_ + _) + lit(1)
      li.select(bucket.as("bucket"), col("__c"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min(col("__c")).as("min_c"),
          max(col("__c")).as("max_c"))
    })
  )

  private val ewmaOracle: String = {
    val W = 16
    val terms = (0 until W).map(j =>
      s"COALESCE(LAG(c, $j) OVER w, 0) * ${1L << (W - 1 - j)}")
      .mkString(" + ")
    s"""WITH e AS (SELECT user_id, event_id, ts, value,
       |  CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events),
       |t AS (SELECT user_id, event_id, ts, value,
       |  $terms AS num,
       |  LEAST(ROW_NUMBER() OVER w - 1, ${W - 1}) AS m
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
       |  CAST(num AS DOUBLE) /
       |    CAST((${1L << W} - (1 << (${W - 1} - m))) * 100 AS DOUBLE) AS ewma
       |FROM t ORDER BY ALL NULLS FIRST""".stripMargin
  }

  private val histOracle: String = {
    val k = 8
    val fracs = (1 until k).map(i => i.toDouble / k).mkString(", ")
    val chain = (1 until k).map(i =>
      s"(CASE WHEN c > qs[$i] THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH li AS (SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c
       |  FROM lineitem),
       |e AS (SELECT quantile_cont(c, [$fracs]) AS qs FROM li)
       |SELECT 1 + $chain AS bucket,
       |  count(*) AS n, min(c) AS min_c, max(c) AS max_c
       |FROM li CROSS JOIN e GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_skyline" ->
      """SELECT p_partkey, p_name, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT count(DISTINCT basket) AS n_baskets FROM items),
        |ic AS (SELECT item, count(*) AS n_item FROM items GROUP BY 1),
        |freq AS (SELECT item, n_item FROM ic CROSS JOIN tot
        |         WHERE n_item * 200 >= n_baskets),
        |pruned AS (SELECT i.basket, i.item FROM items i
        |           JOIN freq f ON i.item = f.item),
        |pairs AS (SELECT a.item AS item_a, b.item AS item_b,
        |    count(*) AS n_ab
        |  FROM pruned a JOIN pruned b
        |    ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2),
        |ps AS (SELECT sum(n_ab) AS s_ab, count(*) AS n_pairs FROM pairs)
        |SELECT item_a, item_b, n_ab, fa.n_item AS n_a, fb.n_item AS n_b,
        |  CAST(n_ab AS DOUBLE) / CAST(fa.n_item AS DOUBLE) AS conf_ab,
        |  CAST(n_ab AS DOUBLE) / CAST(fb.n_item AS DOUBLE) AS conf_ba,
        |  (CAST(n_ab AS DOUBLE) * CAST(t.n_baskets AS DOUBLE)) /
        |    (CAST(fa.n_item AS DOUBLE) * CAST(fb.n_item AS DOUBLE)) AS lift
        |FROM pairs
        |CROSS JOIN ps CROSS JOIN tot t
        |JOIN freq fa ON pairs.item_a = fa.item
        |JOIN freq fb ON pairs.item_b = fb.item
        |WHERE n_ab * n_pairs >= s_ab
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_ts_ewma" -> ewmaOracle,
    "q_hist_equidepth" -> histOracle,
    "q_ts_rolling_median" ->
      """WITH pts AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |  CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events)
        |SELECT user_id, event_id, ts_us,
        |  round(quantile_cont(c, 0.5) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN 15 PRECEDING AND CURRENT ROW), 4) AS roll_med_c
        |FROM pts ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_markov_transitions" ->
      """WITH t AS (SELECT event_type AS src,
        |  LEAD(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS dst
        |  FROM events),
        |c AS (SELECT src, dst, count(*) AS n_sd FROM t
        |  WHERE dst IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT src, CAST(sum(n_sd) AS BIGINT) AS n_s FROM c GROUP BY 1)
        |SELECT c.src, c.dst, c.n_sd, s.n_s,
        |  CAST(c.n_sd AS DOUBLE) / CAST(s.n_s AS DOUBLE) AS p
        |FROM c JOIN s ON c.src = s.src
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_trend_bykey" ->
      """WITH pts AS (SELECT user_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) - 1 AS BIGINT) AS x,
        |  CAST(FLOOR(value * 100) AS BIGINT) AS y FROM events),
        |s AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
        |  CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |  CAST(sum(x * y) AS HUGEINT) AS sxy,
        |  CAST(sum(x * x) AS HUGEINT) AS sxx
        |  FROM pts GROUP BY 1 HAVING count(*) >= 2),
        |d AS (SELECT user_id, n,
        |  n * sxy - sx * sy AS num, n * sxx - sx * sx AS den, sy, sx
        |  FROM s)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope_c,
        |  CAST(sy * den - num * sx AS DOUBLE) /
        |    CAST(n * den AS DOUBLE) AS intercept_c
        |FROM d ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_ts_twap" ->
      """WITH pts AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |  CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events),
        |held AS (SELECT user_id, c,
        |  (LEAD(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |    - us) // 1000000 AS dt
        |  FROM pts),
        |agg AS (SELECT user_id,
        |  CAST(sum(c * dt) AS BIGINT) AS num,
        |  CAST(sum(dt) AS BIGINT) AS den,
        |  CAST(count(*) AS BIGINT) AS n_held
        |  FROM held WHERE dt IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_held,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS twap_c
        |FROM agg WHERE den > 0 ORDER BY ALL NULLS FIRST""".stripMargin,
    // exact set-algebra counts re-derived; TRUE asserts every theta
    // estimate's 3-σ bounds contain exact (the q_approx_distinct pattern)
    "q_theta_sets" ->
      """WITH p AS (SELECT DISTINCT l_returnflag AS f, l_partkey AS k
        |  FROM lineitem),
        |g AS (SELECT k,
        |  max(CASE WHEN f = 'A' THEN 1 ELSE 0 END) AS a,
        |  max(CASE WHEN f = 'N' THEN 1 ELSE 0 END) AS n,
        |  max(CASE WHEN f = 'R' THEN 1 ELSE 0 END) AS r
        |  FROM p GROUP BY 1)
        |SELECT 'A&N' AS op, CAST(sum(CASE WHEN a = 1 AND n = 1 THEN 1
        |  ELSE 0 END) AS BIGINT) AS n_exact, TRUE AS theta_ok FROM g
        |UNION ALL SELECT 'A&R', CAST(sum(CASE WHEN a = 1 AND r = 1 THEN 1
        |  ELSE 0 END) AS BIGINT), TRUE FROM g
        |UNION ALL SELECT 'N&R', CAST(sum(CASE WHEN n = 1 AND r = 1 THEN 1
        |  ELSE 0 END) AS BIGINT), TRUE FROM g
        |UNION ALL SELECT 'A|N|R', count(*), TRUE FROM g
        |UNION ALL SELECT 'A-N', CAST(sum(CASE WHEN a = 1 AND n = 0 THEN 1
        |  ELSE 0 END) AS BIGINT), TRUE FROM g
        |ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
