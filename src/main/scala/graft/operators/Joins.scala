package graft.operators

import graft.{Det, Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 J1–J11: the join surface Hive 2.1 provides over reference
  * xml tables (delegation at `AvroFromXmlSerde.scala:13`, dep `build.sbt:19`),
  * re-expressed as declarative DataFrame joins.
  *
  * Physical strategy is left to Catalyst (broadcast-hash for the small dims
  * under autoBroadcastJoinThreshold, sort-merge for fact⋈fact); J8 pins an
  * explicit `broadcast()` hint — at 100 TB every dim⋈fact join here
  * broadcasts the dim, so the fact table never shuffles for the join.
  */
object Joins {

  /** A fresh per-invocation scratch dir for planted-layout demos (the
    * `Versioned.tableDir` pattern — the query carries its own build cost).
    */
  private def scratchDir(sfDir: String, tag: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir#$tag".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val d = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft-joins", h)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      f.delete(); ()
    }
    rm(d); d.mkdirs()
    d.getAbsolutePath
  }

  /** Scalable as-of join (J10): for each left row, the latest right row with
    * `right.time <= left.time` on the same key.
    *
    * Implemented union-style: tag both inputs, union on a common schema, and
    * run one `last_value(ignoreNulls)` window ordered by (time, side) per
    * key. This shuffles each input ONCE on the key — no m×n candidate-pair
    * blowup like the naive theta-join + argmax plan, so it survives 100 TB
    * (same partitioning strategy as sort-merge as-of joins in kdb/Flink).
    * Right rows sort before left rows at equal timestamps, giving `<=`
    * semantics.
    *
    * `toleranceDays` (pandas `merge_asof(tolerance=...)` semantics): when
    * set, a match older than the bound yields null payload instead. Only the
    * LATEST candidate can ever be within tolerance, so masking after the
    * carry is equivalent to restricting candidates — the plan shape is
    * unchanged (still one shuffle per input).
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      payload: Seq[String], toleranceDays: Option[Int] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_asof_key", col(leftKey)).withColumn("_asof_t", col(leftTime))
      .withColumn("_asof_side", lit(1))
      .select(Seq(col("_asof_key"), col("_asof_t"), col("_asof_side"),
          lit(null).cast("timestamp").as("_asof_mt")) ++
        leftCols.map(col) ++ payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("_asof_key", col(rightKey)).withColumn("_asof_t", col(rightTime))
      .withColumn("_asof_side", lit(0))
      .select(Seq(col("_asof_key"), col("_asof_t"), col("_asof_side"),
          col(rightTime).cast("timestamp").as("_asof_mt")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy("_asof_key")
      .orderBy(col("_asof_t"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r).select(
      (leftCols.map(col) :+ col("_asof_side")) ++
        (payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
          last(col("_asof_mt"), ignoreNulls = true).over(w).as("_asof_mt")): _*)
    val matched = carried.filter(col("_asof_side") === 1).drop("_asof_side")
    toleranceDays match {
      case None => matched.drop("_asof_mt")
      case Some(tol) => matched.select(
        leftCols.map(col) ++ payload.map(c =>
          when(datediff(col(leftTime), col("_asof_mt")) <= tol, col(c))
            .otherwise(lit(null)).as(c)): _*)
    }
  }

  /** Binned range join: point-in-interval without an equi key — the case
    * Spark plans as BroadcastNestedLoopJoin (O(|P|·|I|) compares, and a
    * broadcast of a side that may not fit). Standard bin trick instead:
    * points land in bin floor(pt/w); each interval explodes to every bin it
    * overlaps; equi-join on bin, then the exact containment filter. A
    * matching pair meets EXACTLY once (the point has one bin; the interval
    * emits that bin once) so no dedup step is needed. Cost: interval rows ×
    * (len/w + 1) replication vs a hash join instead of a nested loop — pick
    * `binWidth` near the typical interval length. Hot bins (skewed point
    * density) are AQE-skew-join territory, same as any hash join.
    */
  def rangeJoinBinned(points: DataFrame, pt: String, intervals: DataFrame,
      startCol: String, endCol: String, binWidth: Long): DataFrame = {
    val p = points.withColumn("_bin",
      floor(col(pt).cast("double") / binWidth).cast("long"))
    val iv = intervals.withColumn("_bin", explode(sequence(
      floor(col(startCol).cast("double") / binWidth).cast("long"),
      floor(col(endCol).cast("double") / binWidth).cast("long"))))
    p.join(iv, Seq("_bin"))
      .filter(col(pt) >= col(startCol) && col(pt) <= col(endCol))
      .drop("_bin")
  }

  /** SymSpell-style fuzzy self-join over a string vocabulary: the scale
    * answer for edit-distance matching, where the naive spelling is an
    * O(n²) nested-loop `levenshtein(a, b) <= 1` theta join. Each distinct
    * string emits its 1-deletion neighborhood (the string itself + every
    * single-character deletion); two strings within edit distance 1 are
    * GUARANTEED to share a variant (substitution: delete the differing
    * position from both; insert/delete: the shorter string IS a variant of
    * the longer), so an equi-join on the variant key finds every candidate
    * and the exact levenshtein refine only pays for candidates. Cost:
    * (len+1) replication per distinct string + one hash join — the
    * dictionary side of spell correction at any scale. Dedupe to the
    * vocabulary FIRST (as here): identical strings are exact-dedup's job
    * (L1), and skipping them kills the quadratic duplicate-pair blowup.
    */
  def fuzzyPairsDeletes(names: DataFrame, nameCol: String): DataFrame = {
    val name = col(nameCol)
    val variants = names.select(name.as("name"))
      .withColumn("variant", explode(array_distinct(concat(
        array(col("name")),
        transform(sequence(lit(1), length(col("name"))),
          i => concat(col("name").substr(lit(1), i - 1),
            col("name").substr(i + 1, length(col("name")) - i)))))))
    variants.select(col("name").as("a"), col("variant"))
      .join(variants.select(col("name").as("b"), col("variant")), Seq("variant"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      // compute the O(len²) distance once, filter on the materialized column
      .withColumn("d", levenshtein(col("a"), col("b")))
      .filter(col("d") <= 1)
  }

  /** [[fuzzyPairsDeletes]] extended to edit distance ≤ 2: the delete-2
    * neighborhood. SymSpell's intersection property generalizes — if
    * levenshtein(a, b) ≤ d then the d-deletion neighborhoods of a and b
    * intersect (each edit is covered by deleting the touched position from
    * one or both sides) — so the equi-join on ≤2-delete variants finds
    * EVERY candidate and the exact levenshtein refine keeps d ≤ 2 only.
    * Cost: ~1 + L + L(L-1)/2 variants per distinct string (L = length) —
    * quadratic in the STRING length, never in the corpus; one hash join.
    * Two strings sharing a ≤2-delete variant differ in length by ≤ 2, but
    * the explicit length-difference prune is kept cheap and BEFORE the
    * O(L²) levenshtein so the refine pays only for plausible pairs.
    */
  def fuzzyPairsDeletes2(names: DataFrame, nameCol: String): DataFrame = {
    // {s} ∪ single-deletions of s; empty strings map to {""} (Spark's
    // sequence(1, 0) would count DOWN — DuckDB's generate_series returns
    // empty — so the guard also keeps the oracle arithmetic aligned)
    def dels(c: Column): Column = when(length(c) >= 1,
      array_distinct(concat(
        array(c),
        transform(sequence(lit(1), length(c)),
          i => concat(c.substr(lit(1), i - 1),
            c.substr(i + 1, length(c) - i))))))
      .otherwise(array(c))
    val variants = names.select(col(nameCol).as("name"))
      .withColumn("variant", explode(
        array_distinct(flatten(transform(dels(col("name")), v => dels(v))))))
    variants.select(col("name").as("a"), col("variant"))
      .join(variants.select(col("name").as("b"), col("variant")), Seq("variant"))
      .filter(col("a") < col("b"))
      .filter(abs(length(col("a")) - length(col("b"))) <= 2)
      .select("a", "b").distinct()
      .withColumn("d", levenshtein(col("a"), col("b")))
      .filter(col("d") <= 2)
  }

  val queries: Map[String, Q] = Map(
    // J1: inner equi-join fact⋈dim.
    "q_join_inner_equi" -> ((s, dir) => {
      val o = T.orders(s, dir); val c = T.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), c("c_custkey"), col("c_name"),
          col("c_mktsegment"), col("o_totalprice"))
    }),

    // J2: left outer (customers without orders keep null order columns).
    "q_join_left" -> ((s, dir) => {
      val o = T.orders(s, dir); val c = T.customer(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"))
    }),

    // J3: right outer — same content as J2, spelled from the fact side.
    "q_join_right" -> ((s, dir) => {
      val o = T.orders(s, dir); val c = T.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"))
    }),

    // J4: full outer on nationkey (unmatched rows on both sides survive).
    "q_join_full" -> ((s, dir) => {
      val c = T.customer(s, dir); val su = T.supplier(s, dir)
      c.join(su, c("c_nationkey") === su("s_nationkey"), "full")
        .select(col("c_custkey"), col("c_nationkey"), col("s_suppkey"),
          col("s_nationkey"))
    }),

    // J5: left semi — EXISTS(order > 100k).
    "q_join_semi" -> ((s, dir) => {
      val o = T.orders(s, dir); val c = T.customer(s, dir)
      c.join(o.filter(col("o_totalprice") > 100000.0),
        c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    }),

    // J6: left anti — NOT EXISTS.
    "q_join_anti" -> ((s, dir) => {
      val o = T.orders(s, dir); val c = T.customer(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // J7: cross join (tiny dims only — a deliberate BNLJ).
    "q_join_cross" -> ((s, dir) => {
      T.region(s, dir).crossJoin(T.nation(s, dir))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
    }),

    // J8: explicit broadcast hint (map-side join; same rows as J1 modulo
    // projection). At scale this is the default shape for dim joins.
    "q_join_broadcast" -> ((s, dir) => {
      val o = T.orders(s, dir); val c = T.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(o("o_orderkey"), col("c_name"), col("o_orderstatus"))
    }),

    // J9: non-equi theta join — nation pairs within a region.
    "q_join_theta_range" -> ((s, dir) => {
      val n1 = T.nation(s, dir).select(col("n_nationkey").as("a_key"),
        col("n_name").as("a_name"), col("n_regionkey").as("a_region"))
      val n2 = T.nation(s, dir).select(col("n_nationkey").as("b_key"),
        col("n_name").as("b_name"), col("n_regionkey").as("b_region"))
      n1.join(n2, col("a_region") === col("b_region") &&
          col("a_key") < col("b_key"))
        .select("a_region", "a_key", "a_name", "b_key", "b_name")
    }),

    // J9b: keyless point-in-interval join via binning — "all events during
    // each incident window" — planned as TWO hash joins (bin explode +
    // equi-join) where the naive spelling is a nested-loop join.
    "q_join_range" -> ((s, dir) => {
      val ev = T.events(s, dir)
        .select(col("event_id"), expr("unix_micros(ts) DIV 1000000").as("sec"))
      val windows = ev.filter(col("event_id") < 50)
        .select(col("event_id").as("wid"), col("sec").as("w_start"),
          (col("sec") + 21600L).as("w_end"))
      rangeJoinBinned(ev, "sec", windows, "w_start", "w_end", 3600L)
        .groupBy("wid").agg(count(lit(1)).as("n_events"))
    }),

    // J10: as-of join — latest order at-or-before each event, per user.
    "q_join_asof" -> ((s, dir) => {
      val e = T.events(s, dir).select("event_id", "user_id", "ts")
      val o = T.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate"),
          col("o_orderkey"))
        // dedup to the max orderkey per (cust, date) so the carried payload
        // is unique at equal timestamps (deterministic tiebreak).
        .groupBy("o_custkey", "o_orderdate")
        .agg(max("o_orderkey").as("o_orderkey"))
      asofJoin(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
    }),

    // J10c: as-of join with a 30-day staleness tolerance (pandas
    // merge_asof(tolerance=...) semantics) — matches older than the bound
    // yield null payload; same one-shuffle-per-input plan.
    "q_join_asof_tol" -> ((s, dir) => {
      val e = T.events(s, dir).select("event_id", "user_id", "ts")
      val o = T.orders(s, dir)
        .groupBy("o_custkey", "o_orderdate")
        .agg(max("o_orderkey").as("o_orderkey"))
      asofJoin(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey"), toleranceDays = Some(30))
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
    }),

    // J10b: the same as-of join through the native custom operator
    // (graft.plans.AsOfJoinExec — LogicalPlan + Strategy + merge-pass
    // SparkPlan); same oracle as J10. Right side is pre-deduped to a unique
    // (key, time) row so the at-tie pick is deterministic.
    "q_join_asof_native" -> ((s, dir) => {
      val e = T.events(s, dir).select("event_id", "user_id", "ts")
      val o = T.orders(s, dir)
        .groupBy("o_custkey", "o_orderdate")
        .agg(max("o_orderkey").as("o_orderkey"))
      graft.plans.AsOf.join(e, o, e("user_id"), o("o_custkey"),
          e("ts"), o("o_orderdate"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"))
    }),

    // J11: multi-way star join (flagship shape; Catalyst reorders + AQE).
    "q_join_star" -> ((s, dir) => starJoin(s, dir)),

    // J12: skew-safe SALTED fact⋈fact equi-join — the 100 TB answer to a
    // hot orderkey. The probe side takes a deterministic salt in [0, S)
    // from its own row identity; the build side replicates ×S; the join
    // key becomes (orderkey, salt), so one hot key's rows spread over S
    // tasks instead of one straggler. Each lineitem row still matches
    // exactly the one replica carrying its salt → result set identical to
    // the unsalted join, which is therefore the oracle. shuffle_hash hint
    // pins the shuffled shape (a broadcast would hide the salted exchange
    // this query exists to demonstrate; at real scale neither side fits).
    "q_join_salted" -> ((s, dir) => saltedStarJoin(s, dir)),

    // J12: SymSpell deletion-neighborhood fuzzy join over the part-name
    // vocabulary — every (a, b) pair within edit distance 1 via one hash
    // join on deletion variants (oracle re-derives variants, candidates,
    // and every levenshtein).
    "q_join_fuzzy" -> ((s, dir) =>
      fuzzyPairsDeletes(T.part(s, dir).select("p_name").distinct(), "p_name")),

    // J12b: the d ≤ 2 neighborhood — same SymSpell construction, two
    // deletion levels (oracle re-derives both variant levels, candidates,
    // and every levenshtein; completeness vs the naive n² is additionally
    // unit-asserted in CoverageSpec).
    "q_join_fuzzy2" -> ((s, dir) =>
      fuzzyPairsDeletes2(T.part(s, dir).select("p_name").distinct(), "p_name")),

    // J14: DYNAMIC PARTITION PRUNING — the implicit runtime-filter twin of
    // J13's explicit Bloom: the fact is laid out hive-partitioned by ship
    // month (the 100 TB date-partitioned-fact posture; the write is the
    // planted layout, the q_lake_skipping pattern), the dim side is a
    // filtered 3-month key set, and Catalyst injects a dynamicpruning
    // subquery into the fact scan's PartitionFilters — only the 3 matching
    // month dirs are ever read, with NO explicit filter on the fact in the
    // query text. PlanSpec pins the dynamicpruning expression + the reused
    // broadcast; the oracle (plain join semantics) proves pruning lost
    // nothing.
    "q_join_dpp" -> ((s, dir) => {
      val d = scratchDir(dir, "dpp")
      T.lineitem(s, dir)
        .withColumn("l_ym", date_format(col("l_shipdate"), "yyyy-MM"))
        // pinned count: a bare repartition(col) AQE-coalesces this small
        // 83-dir plant to one task that opens every parquet writer
        // sequentially (see Versioned.clusterForWrite)
        .repartition(s.sessionState.conf.numShufflePartitions, col("l_ym"))
        .write.partitionBy("l_ym").mode("overwrite").parquet(d)
      val fact = s.read.parquet(d)
      val dim = T.orders(s, dir)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("l_ym"))
        .filter(col("l_ym").between("1995-01", "1995-03")).distinct()
      fact.join(dim, Seq("l_ym"))
        .groupBy(col("l_ym"))
        .agg(count(lit(1)).as("n_items"),
          sum(Det.cents(col("l_extendedprice"))).as("sum_price_c"))
    }),

    // J13: Bloom-pruned semi-join — the explicit runtime-filter shape
    // (Layout.bloomPrunedSemiJoin): big side pre-filtered by a broadcast
    // Bloom filter BEFORE the shuffle, exact semi-join after. The refine
    // makes the result identical to a plain semi-join, so the oracle is
    // simply that semi-join — hash equality proves the pruning lost
    // nothing.
    "q_join_bloom" -> ((s, dir) => {
      val sel = T.customer(s, dir).filter(col("c_custkey") % 97 === 0)
        .select("c_custkey")
      Layout.bloomPrunedSemiJoin(
        T.orders(s, dir).withColumn("c_custkey", col("o_custkey")),
        sel, "c_custkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    })
  )

  private val JoinSalts = 8

  private[graft] def saltedStarJoin(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val li = T.lineitem(s, dir).withColumn("_salt",
      pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
        lit(JoinSalts.toLong)).cast("int"))
    val o = T.orders(s, dir).withColumn("_salt",
      explode(sequence(lit(0), lit(JoinSalts - 1))))
    li.hint("shuffle_hash")
      .join(o, li("l_orderkey") === o("o_orderkey") && li("_salt") === o("_salt"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(Det.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_c"), count(lit(1)).as("n_items"))
  }

  private[graft] def starJoin(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val li = T.lineitem(s, dir); val o = T.orders(s, dir)
    val c = T.customer(s, dir); val n = T.nation(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(Det.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_c"), count(lit(1)).as("n_items"))
  }

  val oracles: Map[String, String] = Map(
    "q_join_inner_equi" ->
      """SELECT o_orderkey, c_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT c_custkey, c_nationkey, s_suppkey, s_nationkey
        |FROM customer FULL OUTER JOIN supplier ON c_nationkey = s_nationkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_broadcast" ->
      """SELECT o_orderkey, c_name, o_orderstatus
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_theta_range" ->
      """SELECT n1.n_regionkey AS a_region, n1.n_nationkey AS a_key,
        |  n1.n_name AS a_name, n2.n_nationkey AS b_key, n2.n_name AS b_name
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_range" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) // 1000000 AS sec FROM events),
        |w AS (
        |  SELECT event_id AS wid, sec AS w_start, sec + 21600 AS w_end
        |  FROM ev WHERE event_id < 50)
        |SELECT wid, count(*) AS n_events
        |FROM w JOIN ev ON ev.sec >= w.w_start AND ev.sec <= w.w_end
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_bloom" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey AND c_custkey % 97 = 0)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_fuzzy" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part),
        |v AS (
        |  SELECT name, unnest(list_distinct(list_append(
        |    list_transform(generate_series(1, strlen(name)),
        |      i -> substr(name, 1, i - 1) || substr(name, i + 1, strlen(name) - i)),
        |    name))) AS variant
        |  FROM n),
        |p AS (
        |  SELECT DISTINCT a.name AS a, b.name AS b
        |  FROM v a JOIN v b ON a.variant = b.variant AND a.name < b.name)
        |SELECT a, b, CAST(levenshtein(a, b) AS INTEGER) AS d
        |FROM p WHERE levenshtein(a, b) <= 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_fuzzy2" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part),
        |v1 AS (
        |  SELECT name, unnest(list_distinct(list_append(
        |    list_transform(generate_series(1, strlen(name)),
        |      i -> substr(name, 1, i - 1) || substr(name, i + 1, strlen(name) - i)),
        |    name))) AS v
        |  FROM n),
        |v2 AS (
        |  SELECT DISTINCT name, variant FROM (
        |    SELECT name, unnest(list_distinct(list_append(
        |      list_transform(generate_series(1, strlen(v)),
        |        i -> substr(v, 1, i - 1) || substr(v, i + 1, strlen(v) - i)),
        |      v))) AS variant
        |    FROM v1)),
        |p AS (
        |  SELECT DISTINCT a.name AS a, b.name AS b
        |  FROM v2 a JOIN v2 b ON a.variant = b.variant AND a.name < b.name
        |  WHERE abs(strlen(a.name) - strlen(b.name)) <= 2)
        |SELECT a, b, CAST(levenshtein(a, b) AS INTEGER) AS d
        |FROM p WHERE levenshtein(a, b) <= 2
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_asof_native" ->
      """SELECT event_id, user_id, o_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_asof" ->
      """SELECT event_id, user_id, o_orderkey FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_asof_tol" ->
      """SELECT event_id, user_id,
        |  CASE WHEN datediff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE)) <= 30
        |       THEN o_orderkey END AS o_orderkey
        |FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_salted" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(FLOOR((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    // plain join semantics over the unpartitioned tables — hash equality
    // proves the runtime partition pruning lost nothing
    "q_join_dpp" ->
      """WITH dim AS (
        |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS l_ym
        |  FROM orders
        |  WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-03')
        |SELECT l.l_ym, count(*) AS n_items,
        |  CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_c
        |FROM (SELECT strftime(l_shipdate, '%Y-%m') AS l_ym, l_extendedprice
        |      FROM lineitem) l
        |  JOIN dim ON l.l_ym = dim.l_ym
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_join_star" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CAST(FLOOR((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(*) AS n_items
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
