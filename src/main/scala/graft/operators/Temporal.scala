package graft.operators

import graft.{Det, Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 T1–T3: event-time windowing, declared as batch queries
  * (batch/streaming share these exact plans in Structured Streaming — see
  * graft.streaming for the readStream/watermark variants of the same ops).
  *
  * Tumbling windows are a single hash aggregation on (window, key) — fully
  * parallel at 100 TB. Session windows (gaps-and-islands) need one shuffle on
  * user_id + an in-partition sort; state never exceeds one user's events.
  */
object Temporal {
  import Det.cents

  /** Linear gap interpolation over a dense `step`-second resample grid of
    * (`tsecCol`: epoch seconds, `valCol`: non-negative double): observed
    * buckets carry their exact mean in micro-units (cents·10000 div n);
    * empty buckets take the straight line between the nearest observed
    * means on either side; leading/trailing gaps stay null ('edge'). All
    * integer arithmetic, non-negative numerators — so truncating and
    * flooring division agree and the result hash-matches cross-engine.
    *
    * Scale shape: one bucket aggregation over the events (the only
    * event-sized pass), then window scans over the GRID — metadata-scale,
    * one row per bucket (a year of 15-min buckets is 35k rows), so the
    * unpartitioned sort is bounded by calendar span, not data. A per-key
    * variant partitions the same windows by key.
    */
  def interpolateResample(e: DataFrame, tsecCol: String, valCol: String,
      step: Long = 900): DataFrame = {
    val bounds = e.agg(
      (expr(s"min($tsecCol) div $step") * step).as("lo"),
      max(col(tsecCol)).as("hi"))
    val grid = bounds
      .select(explode(sequence(col("lo"), col("hi"), lit(step))).as("gsec"))
    val agg = e.groupBy((expr(s"$tsecCol div $step") * lit(step)).as("gsec"))
      .agg(count(lit(1)).as("n"), sum(cents(col(valCol))).as("v_c"))
    val w = Window.orderBy("gsec")
    val wp = w.rowsBetween(Long.MinValue, 0)
    val wn = w.rowsBetween(0, Long.MaxValue)
    grid.join(agg, Seq("gsec"), "left")
      .withColumn("mean_u", expr("v_c * 10000 div n"))
      .withColumn("pu", last(col("mean_u"), ignoreNulls = true).over(wp))
      .withColumn("pg", last(when(col("mean_u").isNotNull, col("gsec")),
        ignoreNulls = true).over(wp))
      .withColumn("nu", first(col("mean_u"), ignoreNulls = true).over(wn))
      .withColumn("ng", first(when(col("mean_u").isNotNull, col("gsec")),
        ignoreNulls = true).over(wn))
      .select(col("gsec"), coalesce(col("n"), lit(0L)).as("n"),
        when(col("mean_u").isNotNull, lit("obs"))
          .when(col("pu").isNotNull && col("nu").isNotNull, lit("interp"))
          .otherwise(lit("edge")).as("kind"),
        when(col("mean_u").isNotNull, col("mean_u"))
          .when(col("pu").isNotNull && col("nu").isNotNull,
            expr("(pu * (ng - gsec) + nu * (gsec - pg)) div (ng - pg)"))
          .as("v_u"))
  }

  /** Per-key [[interpolateResample]]: each key gets its own grid (spanning
    * ITS min..max bucket) and its own anchor scan — the windows partition
    * by key, so there is no global sort anywhere and the whole operator
    * distributes by key exactly like any keyed aggregation. The grid is
    * still metadata-scale per key.
    */
  def interpolateResampleByKey(e: DataFrame, keyCol: String, tsecCol: String,
      valCol: String, step: Long = 900): DataFrame = {
    val bounds = e.groupBy(col(keyCol)).agg(
      (expr(s"min($tsecCol) div $step") * step).as("lo"),
      max(col(tsecCol)).as("hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("lo"), col("hi"), lit(step))).as("gsec"))
    val agg = e.groupBy(col(keyCol),
        (expr(s"$tsecCol div $step") * lit(step)).as("gsec"))
      .agg(count(lit(1)).as("n"), sum(cents(col(valCol))).as("v_c"))
    val w = Window.partitionBy(keyCol).orderBy("gsec")
    val wp = w.rowsBetween(Long.MinValue, 0)
    val wn = w.rowsBetween(0, Long.MaxValue)
    grid.join(agg, Seq(keyCol, "gsec"), "left")
      .withColumn("mean_u", expr("v_c * 10000 div n"))
      .withColumn("pu", last(col("mean_u"), ignoreNulls = true).over(wp))
      .withColumn("pg", last(when(col("mean_u").isNotNull, col("gsec")),
        ignoreNulls = true).over(wp))
      .withColumn("nu", first(col("mean_u"), ignoreNulls = true).over(wn))
      .withColumn("ng", first(when(col("mean_u").isNotNull, col("gsec")),
        ignoreNulls = true).over(wn))
      .select(col(keyCol), col("gsec"), coalesce(col("n"), lit(0L)).as("n"),
        when(col("mean_u").isNotNull, lit("obs"))
          .when(col("pu").isNotNull && col("nu").isNotNull, lit("interp"))
          .otherwise(lit("edge")).as("kind"),
        when(col("mean_u").isNotNull, col("mean_u"))
          .when(col("pu").isNotNull && col("nu").isNotNull,
            expr("(pu * (ng - gsec) + nu * (gsec - pg)) div (ng - pg)"))
          .as("v_u"))
  }

  /** Cohort retention matrix — the product-analytics classic: users are
    * cohorted by their FIRST active bucket (epoch time div `bucketSec`,
    * integer end to end so engines agree without date-type seams) and
    * every (cohort, bucket-offset) cell counts the cohort's users active
    * that far in, plus an exact basis-point retention rate
    * (10000·n_active div n_cohort).
    *
    * Scale shape: one user-bucket distinct (events collapse to
    * user-activity days first — the matrix never touches raw event rows
    * twice), one per-user min for the cohort label, a user-keyed join of
    * metadata-scale frames, two narrow aggs, and a broadcast of the
    * per-cohort sizes. Nothing pairwise, nothing driver-side.
    */
  def cohortRetention(events: DataFrame, bucketSec: Long = 86400L): DataFrame = {
    val ev = events.select(col("user_id"),
      expr(s"unix_micros(ts) div ${bucketSec * 1000000L}L").as("b"))
      .distinct()
    val first = ev.groupBy("user_id").agg(min("b").as("cohort_b"))
    val sizes = first.groupBy("cohort_b").agg(count(lit(1)).as("n_cohort"))
    ev.join(first, "user_id")
      .groupBy(col("cohort_b"), (col("b") - col("cohort_b")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .join(broadcast(sizes), "cohort_b")
      .select(col("cohort_b"), col("day_offset"), col("n_active"),
        col("n_cohort"),
        expr("(10000 * n_active) div n_cohort").as("retained_bp"))
  }

  /** Per-key 3σ outlier detection with NO float seam: the classic
    * anomaly gate (|v − μ| > 3σ) decided entirely in integer arithmetic.
    * With per-key n, S = Σc, Q = Σc² over exact cents, the test
    * (c − S/n)² > 9·(nQ − S²)/n² cross-multiplies to
    * (n·c − S)² > 9·(n·Q − S²) — both sides exact integers, computed in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so the squares can't
    * overflow 64 bits at scale. One narrow per-key aggregation broadcast
    * back over the rows; engines agree bit-for-bit because no division
    * or square root ever happens.
    */
  def sigmaOutliers(e: DataFrame, keyCol: String, centsCol: Column,
      sigmas: Int = 3): DataFrame = {
    val rows = e.withColumn("__c", centsCol)
    // Σc² accumulates in DECIMAL(38,0) from the first multiply: at 1e9
    // rows of 1e5-cent values the long spelling would sit within 10× of
    // Int64 overflow — the 128-bit sum never does
    val st = rows.groupBy(keyCol).agg(count(lit(1)).as("n"),
      sum("__c").as("sv"),
      sum(expr("CAST(__c AS DECIMAL(38,0)) * CAST(__c AS DECIMAL(38,0))"))
        .as("q"))
    rows.join(broadcast(st), Seq(keyCol))
      .filter(expr(
        s"""(CAST(n AS DECIMAL(38,0)) * CAST(__c AS DECIMAL(38,0))
           |   - CAST(sv AS DECIMAL(38,0))) *
           |(CAST(n AS DECIMAL(38,0)) * CAST(__c AS DECIMAL(38,0))
           |   - CAST(sv AS DECIMAL(38,0)))
           | > CAST(${sigmas * sigmas} AS DECIMAL(38,0)) *
           |   (CAST(n AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))
           |    - CAST(sv AS DECIMAL(38,0)) * CAST(sv AS DECIMAL(38,0)))"""
          .stripMargin))
  }

  val queries: Map[String, Q] = Map(
    // T10: per-event-type 3σ outliers over exact value cents — the flagged
    // row set hash-checked with zero float operations on either engine.
    "q_ts_outliers" -> ((s, dir) =>
      sigmaOutliers(T.events(s, dir), "event_type",
        floor(col("value") * 100).cast("long"), 3)
        .select(col("event_id"), col("event_type"), col("__c").as("value_c"))),

    // T9: daily cohort retention over the events table — every cell of
    // the (first-active-day × day-offset) matrix hash-checked, including
    // the integer basis-point rates.
    "q_cohort_retention" -> ((s, dir) =>
      cohortRetention(T.events(s, dir))),

    // T1: tumbling 1-hour window aggregate (≡ streaming groupBy(window(...))).
    "q_stream_tumbling" -> ((s, dir) => {
      T.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_c"))
        // window start as epoch seconds: Spark parquet timestamps are
        // UTC-adjusted (tz-aware on re-read) while DuckDB's are naive — long
        // epochs compare exactly.
        .select(expr("unix_micros(w.start) div 1000000").as("wstart_s"),
          col("event_type"), col("n"), col("sum_c"))
    }),

    // T2: 1-hour window sliding every 15 minutes. Oracle-checked: every
    // event lands in EXACTLY size/slide = 4 windows with starts
    // 900·⌊ts/900⌋ − 900i, i ∈ [0, 4) (epoch-aligned, same as Spark's
    // default startTime), so the explode is enumerable in plain SQL.
    "q_stream_sliding" -> ((s, dir) => {
      T.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(expr("unix_micros(w.start) div 1000000").as("wstart_s"), col("n"))
    }),

    // T3: session windows via gaps-and-islands (5-minute gap): a session
    // starts when the gap to the previous event of the same user > 300 s.
    "q_stream_session" -> ((s, dir) => {
      val e = T.events(s, dir)
        .withColumn("tsec", expr("unix_micros(ts) div 1000000"))
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("tsec"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("new_sess",
          when(col("tsec") - lag(col("tsec"), 1).over(byUser) > 300, 1)
            .otherwise(0))
        .withColumn("sess", sum(col("new_sess")).over(cum))
        .groupBy("user_id", "sess")
        .agg(min(col("tsec")).as("sess_start"), max(col("tsec")).as("sess_end"),
          count(lit(1)).as("n_events"))
    }),

    // T6: resample with gap fill — a dense 15-minute grid from min to max
    // event time, left-joined against the bucket aggregate so EMPTY buckets
    // appear with n=0 (tumbling windows only emit non-empty buckets; every
    // monitoring/feature pipeline needs the gaps). The grid explodes from a
    // one-row bounds aggregate — tiny even over years — and the gap-fill
    // join shuffles on the bucket key only.
    "q_stream_resample" -> ((s, dir) => {
      val e = T.events(s, dir)
        .withColumn("tsec", expr("unix_micros(ts) div 1000000"))
      val bounds = e.agg(
        (expr("min(tsec) div 900") * 900).as("lo"), max(col("tsec")).as("hi"))
      val grid = bounds
        .select(explode(sequence(col("lo"), col("hi"), lit(900L))).as("gsec"))
      val agg = e.groupBy((expr("tsec div 900") * lit(900L)).as("gsec"))
        .agg(count(lit(1)).as("n"))
      grid.join(agg, Seq("gsec"), "left")
        .select(col("gsec"), coalesce(col("n"), lit(0L)).as("n"))
    }),

    // T8: linear gap interpolation over the resampled grid — the feature-
    // engineering sibling of T6's zero-fill (see [[interpolateResample]]
    // for the exact-integer arithmetic and the grid-scale window shape).
    // ~65% of the sf0.001 grid is empty, so the interp path dominates the
    // oracle's hash.
    "q_ts_interpolate" -> ((s, dir) =>
      interpolateResample(
        T.events(s, dir)
          .withColumn("tsec", expr("unix_micros(ts) div 1000000")),
        "tsec", "value")),

    // T8b: the distributed spelling — one independent grid + anchor scan
    // per event_type, windows partitioned by the key (no global sort
    // anywhere). Sparser per-key series ⇒ more 'interp'/'edge' rows, so
    // the oracle exercises longer gaps than T8.
    "q_ts_interpolate_bykey" -> ((s, dir) =>
      interpolateResampleByKey(
        T.events(s, dir)
          .withColumn("tsec", expr("unix_micros(ts) div 1000000")),
        "event_type", "tsec", "value")),

    // T7: time-bounded funnel / ordered-sequence match (MATCH_RECOGNIZE-
    // lite, anchored at the first signup): per user, the furthest stage of
    // signup → click → purchase reached where each next step lands STRICTLY
    // after the previous one and within 1 day of it. One shuffle on
    // user_id, then a single-pass walk over the time-sorted event list with
    // one (stage, last_ts) pair of state — greedy earliest matching, which
    // for the ANCHORED chain provably equals the oracle's conditional-min
    // CTE chain (min click in (u1, u1+W], min purchase in (u2, u2+W]).
    // Per-user event lists ride one collect_list — the sessionization
    // memory contract (one user's events per task), never a global
    // materialization.
    "q_funnel" -> ((s, dir) => {
      val W = 86400000000L // 1 day in µs
      val seqCol = array_sort(collect_list(struct(
        expr("unix_micros(ts)").as("us"), col("event_type").as("et"))))
      val step = (acc: org.apache.spark.sql.Column,
          x: org.apache.spark.sql.Column) => {
        val inWindow = x.getField("us") > acc.getField("lastus") &&
          x.getField("us") <= acc.getField("lastus") + W
        when(acc.getField("st") === 0 && x.getField("et") === "signup",
          struct(lit(1).as("st"), x.getField("us").as("lastus")))
        .when(acc.getField("st") === 1 && x.getField("et") === "click" &&
            inWindow,
          struct(lit(2).as("st"), x.getField("us").as("lastus")))
        .when(acc.getField("st") === 2 && x.getField("et") === "purchase" &&
            inWindow,
          struct(lit(3).as("st"), x.getField("us").as("lastus")))
        .otherwise(acc)
      }
      T.events(s, dir)
        .groupBy("user_id")
        .agg(aggregate(seqCol,
          struct(lit(0).as("st"), lit(-1L).as("lastus")), step)
          .getField("st").as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("users"))
    }),

    // T3b: the native session_window operator, oracle-checked at µs
    // precision against a gaps-and-islands rewrite (a session's window is
    // [start, last+gap), so an event exactly AT prev+gap starts a NEW
    // session — the oracle's new-session test is `>= gap`, unlike
    // q_stream_session's whole-second `> gap` convention). Start emitted
    // as epoch µs (raw timestamps don't hash-compare across engines).
    "q_stream_session_native" -> ((s, dir) => {
      T.events(s, dir)
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), expr("unix_micros(w.start)").as("wstart_us"),
          col("n_events"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_ts_outliers" ->
      """WITH c AS (
        |  SELECT event_id, event_type,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(value_c) AS BIGINT) AS sv,
        |    SUM(CAST(value_c AS HUGEINT) * value_c) AS q
        |  FROM c GROUP BY 1)
        |SELECT c.event_id, c.event_type, c.value_c
        |FROM c JOIN st USING (event_type)
        |WHERE (CAST(n AS HUGEINT) * value_c - sv) *
        |      (CAST(n AS HUGEINT) * value_c - sv)
        |      > 9 * (CAST(n AS HUGEINT) * q - CAST(sv AS HUGEINT) * sv)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_cohort_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS b FROM events),
        |f AS (SELECT user_id, min(b) AS cohort_b FROM ev GROUP BY 1),
        |sz AS (SELECT cohort_b, CAST(count(*) AS BIGINT) AS n_cohort FROM f GROUP BY 1),
        |r AS (
        |  SELECT f.cohort_b, e.b - f.cohort_b AS day_offset,
        |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |  FROM ev e JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT r.cohort_b, r.day_offset, r.n_active, sz.n_cohort,
        |  CAST((10000 * r.n_active) // sz.n_cohort AS BIGINT) AS retained_bp
        |FROM r JOIN sz USING (cohort_b)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Funnel as the conditional-min chain: u1 = first signup, u2 = first
    // click in (u1, u1 + 1 day], u3 = first purchase in (u2, u2 + 1 day] —
    // the same anchored-greedy definition the Spark side's sorted walk
    // computes, so they agree by construction.
    "q_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, min(epoch_us(ts)) AS u1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS u2 FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.u1
        |    AND epoch_us(e.ts) <= t1.u1 + 86400000000 GROUP BY 1),
        |t3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS u3 FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.u2
        |    AND epoch_us(e.ts) <= t2.u2 + 86400000000 GROUP BY 1),
        |st AS (
        |  SELECT u.user_id,
        |    CASE WHEN t3.user_id IS NOT NULL THEN 3
        |         WHEN t2.user_id IS NOT NULL THEN 2
        |         WHEN t1.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  LEFT JOIN t1 ON u.user_id = t1.user_id
        |  LEFT JOIN t2 ON u.user_id = t2.user_id
        |  LEFT JOIN t3 ON u.user_id = t3.user_id)
        |SELECT stage, count(*) AS users FROM st GROUP BY 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_stream_sliding" ->
      """SELECT wstart_s, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT 900 * ((epoch_us(ts) // 1000000) // 900) - 900 * g.i AS wstart_s
        |  FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g)
        |GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_stream_session_native" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |flagged AS (
        |  SELECT user_id, tus,
        |    CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus)
        |      >= 300000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |sess AS (
        |  SELECT user_id, tus,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, min(tus) AS wstart_us, CAST(count(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id, sid ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_stream_resample" ->
      """WITH b AS (
        |  SELECT epoch_us(min(ts)) // 1000000 AS lo,
        |         epoch_us(max(ts)) // 1000000 AS hi
        |  FROM events),
        |grid AS (
        |  SELECT unnest(generate_series(
        |    (SELECT lo FROM b) // 900 * 900, (SELECT hi FROM b), 900)) AS gsec),
        |agg AS (
        |  SELECT epoch_us(ts) // 1000000 // 900 * 900 AS gsec, count(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT g.gsec, coalesce(a.n, CAST(0 AS BIGINT)) AS n
        |FROM grid g LEFT JOIN agg a USING (gsec)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_ts_interpolate" ->
      """WITH b AS (
        |  SELECT epoch_us(min(ts)) // 1000000 AS lo,
        |         epoch_us(max(ts)) // 1000000 AS hi
        |  FROM events),
        |grid AS (
        |  SELECT unnest(generate_series(
        |    (SELECT lo FROM b) // 900 * 900, (SELECT hi FROM b), 900)) AS gsec),
        |agg AS (
        |  SELECT epoch_us(ts) // 1000000 // 900 * 900 AS gsec,
        |    count(*) AS n,
        |    SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS v_c
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT g.gsec, coalesce(a.n, CAST(0 AS BIGINT)) AS n,
        |    a.v_c * 10000 // a.n AS mean_u
        |  FROM grid g LEFT JOIN agg a USING (gsec)),
        |anch AS (
        |  SELECT gsec, n, mean_u,
        |    last_value(mean_u IGNORE NULLS) OVER (ORDER BY gsec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pu,
        |    last_value(CASE WHEN mean_u IS NOT NULL THEN gsec END IGNORE NULLS)
        |      OVER (ORDER BY gsec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pg,
        |    first_value(mean_u IGNORE NULLS) OVER (ORDER BY gsec
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nu,
        |    first_value(CASE WHEN mean_u IS NOT NULL THEN gsec END IGNORE NULLS)
        |      OVER (ORDER BY gsec
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ng
        |  FROM g)
        |SELECT gsec, n,
        |  CASE WHEN mean_u IS NOT NULL THEN 'obs'
        |       WHEN pu IS NOT NULL AND nu IS NOT NULL THEN 'interp'
        |       ELSE 'edge' END AS kind,
        |  CAST(CASE WHEN mean_u IS NOT NULL THEN mean_u
        |       WHEN pu IS NOT NULL AND nu IS NOT NULL
        |         THEN (pu * (ng - gsec) + nu * (gsec - pg)) // (ng - pg)
        |  END AS BIGINT) AS v_u
        |FROM anch ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_ts_interpolate_bykey" ->
      """WITH b AS (
        |  SELECT event_type,
        |    epoch_us(min(ts)) // 1000000 // 900 * 900 AS lo,
        |    epoch_us(max(ts)) // 1000000 AS hi
        |  FROM events GROUP BY 1),
        |grid AS (
        |  SELECT event_type, unnest(generate_series(lo, hi, 900)) AS gsec
        |  FROM b),
        |agg AS (
        |  SELECT event_type, epoch_us(ts) // 1000000 // 900 * 900 AS gsec,
        |    count(*) AS n,
        |    SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS v_c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT g.event_type, g.gsec, coalesce(a.n, CAST(0 AS BIGINT)) AS n,
        |    a.v_c * 10000 // a.n AS mean_u
        |  FROM grid g LEFT JOIN agg a USING (event_type, gsec)),
        |anch AS (
        |  SELECT event_type, gsec, n, mean_u,
        |    last_value(mean_u IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY gsec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pu,
        |    last_value(CASE WHEN mean_u IS NOT NULL THEN gsec END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY gsec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pg,
        |    first_value(mean_u IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY gsec
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nu,
        |    first_value(CASE WHEN mean_u IS NOT NULL THEN gsec END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY gsec
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ng
        |  FROM g)
        |SELECT event_type, gsec, n,
        |  CASE WHEN mean_u IS NOT NULL THEN 'obs'
        |       WHEN pu IS NOT NULL AND nu IS NOT NULL THEN 'interp'
        |       ELSE 'edge' END AS kind,
        |  CAST(CASE WHEN mean_u IS NOT NULL THEN mean_u
        |       WHEN pu IS NOT NULL AND nu IS NOT NULL
        |         THEN (pu * (ng - gsec) + nu * (gsec - pg)) // (ng - pg)
        |  END AS BIGINT) AS v_u
        |FROM anch ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_stream_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS wstart_s,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
        |FROM events GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin,
    "q_stream_session" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS tsec FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, tsec,
        |    CASE WHEN tsec - lag(tsec) OVER (PARTITION BY user_id
        |      ORDER BY tsec, event_id) > 300 THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |sess AS (
        |  SELECT user_id, tsec,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsec, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess
        |  FROM flagged)
        |SELECT user_id, sess, min(tsec) AS sess_start, max(tsec) AS sess_end,
        |  count(*) AS n_events
        |FROM sess GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin
  )
}
