package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Units for the decision-support analytics rows (SURVEY.md §2 E167–E170):
  * skyline vs the n² dominance reference under FORCED multi-bucket prefix
  * sweeps, EWMA vs a sequential fold, equi-depth mass bounds, and
  * association-rule identities on a planted basket corpus.
  */
class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("skyline2d equals the quadratic dominance reference (forced buckets, ties)") {
    import spark.implicits._
    // deterministic pseudo-random points with planted duplicate keys and
    // duplicate (key, value) pairs — ties must ALL survive (no strict
    // dominator) and within-key smaller values must all drop. 4000 keys
    // across 4 shuffle partitions forces many cut keys, so the prefix-max
    // genuinely crosses bucket boundaries.
    val pts = (1 to 4000).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      (i.toLong, (h % 997L).toDouble / 10.0, (h / 997L % 500L).toInt)
    }
    val df = pts.toDF("id", "price", "size")
    val got = operators.Analytics.skyline2d(df, "price", "size")
      .select("id").as[Long].collect().toSet
    val brute = pts.filter { case (_, p, sz) =>
      !pts.exists { case (_, p2, sz2) =>
        p2 <= p && sz2 >= sz && (p2 < p || sz2 > sz)
      }
    }.map(_._1).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("skyline2d: fractional max values are compared exactly (no integer truncation)") {
    import spark.implicits._
    // same price, sizes 5.9 vs 5.2: a long-truncating compare would keep
    // both (5 == 5); the dominated 5.2 row must drop
    val df = Seq((1L, 1.0, 5.9), (2L, 1.0, 5.2), (3L, 0.5, 5.2))
      .toDF("id", "price", "size")
    val got = operators.Analytics.skyline2d(df, "price", "size")
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 3L)) // (1.0, 5.9) and (0.5, 5.2) survive
  }

  test("skyline2d: a second evaluation of the same frame is identical (pure bucket exprs)") {
    val df = Tables.part(spark, "/root/testdata/sf0.001")
    val sky = operators.Analytics.skyline2d(df, "p_retailprice", "p_size")
    val a = sky.collect().map(_.toString).sorted.toSeq
    val b = sky.collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("EWMA matches the sequential exponential fold") {
    // one user, values 1..40: reference fold over the last-16 window with
    // normalized (1/2)^j weights, computed in plain Scala.
    val rows = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") === 0)
      .orderBy("ts", "event_id")
      .select("value").collect().map(_.getDouble(0)).toSeq
    val got = operators.Analytics.queries("q_ts_ewma")(spark,
        "/root/testdata/sf0.001")
      .filter(col("user_id") === 0)
      .orderBy("ts_us", "event_id")
      .select("ewma").collect().map(_.getDouble(0)).toSeq
    val W = 16
    val ref = rows.indices.map { i =>
      val hist = (0 until math.min(i + 1, W)).map { j =>
        math.floor(rows(i - j) * 100).toLong * (1L << (W - 1 - j))
      }.sum
      val m = math.min(i, W - 1)
      hist.toDouble / (((1L << W) - (1L << (W - 1 - m))) * 100L).toDouble
    }
    assert(got.size === ref.size)
    got.zip(ref).foreach { case (g, r) => assert(g === r) }
  }

  test("equi-depth histogram: 8 buckets, each within ±15% of N/8, covering N") {
    val r = operators.Analytics.queries("q_hist_equidepth")(spark,
        "/root/testdata/sf0.001")
      .orderBy("bucket").collect()
    assert(r.length === 8)
    val n = r.map(_.getLong(1)).sum
    val target = n / 8.0
    r.foreach { row =>
      assert(math.abs(row.getLong(1) - target) <= target * 0.15,
        s"bucket ${row.getInt(0)} holds ${row.getLong(1)} of $n")
    }
    // buckets tile the value range in order
    val sorted = r.sortBy(_.getInt(0))
    sorted.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0).getLong(3) <= w(1).getLong(2))
    }
  }

  test("association rules: planted perfect implication scores conf=1, lift=N/n_b") {
    import spark.implicits._
    // 100 baskets: x in the 50 even baskets, y in the 25 multiples of 4 —
    // every y basket has x, so conf(y => x) = 1 and
    // lift = n_xy·N / (n_x·n_y) = 25·100 / (50·25) = 2 (y predicts x at
    // twice the base rate). w fills odd baskets so pairing has noise.
    val rows = (1 to 100).flatMap { b =>
      (if (b % 2 == 0) Seq((b.toLong, "x")) else Seq((b.toLong, "w"))) ++
        (if (b % 4 == 0) Seq((b.toLong, "y")) else Nil)
    }
    val items = rows.toDF("basket", "item")
    val tot = items.agg(countDistinct(col("basket")).as("n_baskets"))
      .withColumn("__one", lit(1))
    val itemCnt = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val a = items.select(col("basket"), col("item").as("item_a"))
    val b = items.select(col("basket"), col("item").as("item_b"))
    val pairs = a.join(b, Seq("basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .join(itemCnt.select(col("item").as("item_a"),
        col("n_item").as("n_a")), Seq("item_a"))
      .join(itemCnt.select(col("item").as("item_b"),
        col("n_item").as("n_b")), Seq("item_b"))
      .withColumn("__one", lit(1)).join(broadcast(tot), Seq("__one"))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_ba"),
        ((col("n_ab").cast("double") * col("n_baskets").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
      .collect()
    val xy = pairs.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(xy.getLong(2) === 25L)       // y baskets all contain x
    assert(xy.getDouble(3) === 1.0)     // conf(y => x) = 1
    assert(xy.getDouble(4) === 2.0)     // lift = 25·100 / (50·25)
  }

  test("theta sketch (native fns): exact-mode set algebra; merge order never changes results") {
    import spark.implicits._
    import functions.ThetaSketch
    def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(expr("theta_sketch_agg(k)").as("sk"))
        .collect()(0).getAs[Array[Byte]](0)
    val a = (1L to 1000L).toDF("k")
    val b = (501L to 1500L).toDF("k")
    val r = a.agg(expr("theta_sketch_agg(k)").as("ska"))
      .crossJoin(b.agg(expr("theta_sketch_agg(k)").as("skb")))
      .select(
        expr("theta_sketch_estimate(theta_intersection(ska, skb))"),
        expr("theta_sketch_estimate(theta_union(ska, skb))"),
        expr("theta_sketch_estimate(theta_difference(ska, skb))"))
      .collect().head
    // < 2^lgK nominal entries -> exact mode: estimates are exact counts
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((500L, 1500L, 500L)))
    // merge-order insensitivity: 8-partition partials of a duplicated
    // multiset give the same retained set -> same estimate and bounds
    val ska = sketchOf(a)
    val ska8 = sketchOf(a.union(a).repartition(8))
    assert(ThetaSketch.bounds(ska, 3) === ThetaSketch.bounds(ska8, 3))
  }

  test("theta sketch (native fns): estimation mode bounds contain exact (certified)") {
    import spark.implicits._
    import functions.ThetaSketch
    val n = 50000L
    val sk = (1L to n).toDF("k").repartition(8)
      .agg(expr("theta_sketch_agg(k, 9)").as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val (est, lb, ub) = ThetaSketch.bounds(sk, 3)
    assert(est !== n.toDouble)          // genuinely estimating, not exact
    assert(lb <= n && n <= ub, s"bounds [$lb, $ub] miss exact $n")
    assert(math.abs(est - n) / n < 0.2) // lgK=9 keeps 512 entries: ~4.4% rse
  }

  test("trend: planted perfect line recovers slope/intercept exactly; built-in regr_* agrees") {
    import spark.implicits._
    // y = 3x + 7 over two keys with different lengths — integer normal
    // equations must recover the line EXACTLY (num/den divide evenly)
    val pts = (0L until 40L).map(x => (1L, x, 3 * x + 7)) ++
      (0L until 25L).map(x => (2L, x, 3 * x + 7))
    val df = pts.toDF("user_id", "__x", "__y")
    val got = df.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"), sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("user_id"),
        (col("num").cast("double") / col("den").cast("double")).as("slope"),
        ((col("sy") * col("den") - col("num") * col("sx")).cast("double") /
          (col("n") * col("den")).cast("double")).as("icept"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) === 3.0); assert(r.getDouble(2) === 7.0)
    }
    // the built-in (double-summing) regr aggregates agree within 1e-9 —
    // they run at 100 TB; the integer spelling is their certification
    val builtin = df.groupBy("user_id")
      .agg(expr("regr_slope(__y, __x)").as("s"),
        expr("regr_intercept(__y, __x)").as("i")).collect()
    builtin.foreach { r =>
      assert(math.abs(r.getDouble(1) - 3.0) < 1e-9)
      assert(math.abs(r.getDouble(2) - 7.0) < 1e-9)
    }
  }

  test("TWAP: holding-time weights, last observation weightless") {
    import spark.implicits._
    // v=100 held 30 s, v=900 held 10 s, final v=555 held 0 s (dropped):
    // twap = (100·30 + 900·10) / 40 = 300
    val df = Seq((5L, 0L, 1L, 100L), (5L, 30000000L, 2L, 900L),
      (5L, 40000000L, 3L, 555L)).toDF("user_id", "__us", "event_id", "__c")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("__us").asc, col("event_id").asc)
    val got = df.withColumn("__next", lead(col("__us"), 1).over(w))
      .withColumn("__dt", expr("(__next - __us) div 1000000"))
      .filter(col("__dt").isNotNull)
      .groupBy("user_id")
      .agg(sum(col("__c") * col("__dt")).as("num"), sum(col("__dt")).as("den"))
      .select(col("num").cast("double") / col("den").cast("double"))
      .collect().head.getDouble(0)
    assert(got === 300.0)
  }

  test("rolling median: 16-row frame tracks the window, shrugging off a spike") {
    import spark.implicits._
    // constant 500-cent series with one 99999 spike: the rolling median
    // stays 500 everywhere (robustness the EWMA lacks), while the frame
    // is warm; early partial frames interpolate over what exists
    val df = (0L until 40L).map(i =>
      (9L, i * 1000000L, i, if (i == 20) 99999L else 500L))
      .toDF("user_id", "__us", "event_id", "__c")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("__us").asc, col("event_id").asc).rowsBetween(-15, 0)
    val med = df.withColumn("m", expr("percentile(__c, 0.5)").over(w))
      .orderBy("event_id").select("m").collect().map(_.getDouble(0))
    assert(med.forall(_ === 500.0))
  }

  test("Markov transitions: planted deterministic chain gives exact probabilities") {
    import spark.implicits._
    // user 1 walks A,B,A,B,A (A->B x2, B->A x2); user 2 walks A,C
    // (A->C x1): P(A->B)=2/3, P(A->C)=1/3, P(B->A)=1
    val rows = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (1L, 4L, "B"), (1L, 5L, "A"), (2L, 1L, "A"), (2L, 2L, "C"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("seq").asc)
    val trans = rows.toDF("user_id", "seq", "src")
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n_sd"))
    val totals = trans.groupBy("src").agg(sum(col("n_sd")).as("n_s"))
    val p = trans.join(totals, Seq("src"))
      .select(col("src"), col("dst"),
        (col("n_sd").cast("double") / col("n_s").cast("double")).as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(p(("A", "B")) === 2.0 / 3.0)
    assert(p(("A", "C")) === 1.0 / 3.0)
    assert(p(("B", "A")) === 1.0)
  }

  test("q_assoc_rules keeps only above-mean-support pairs and is non-empty") {
    val r = operators.Analytics.queries("q_assoc_rules")(spark,
      "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty)
    // every surviving pair individually clears the mean of the full pair
    // distribution — re-derive the mean bound from the row's own counts:
    // conf/lift are ratios of the emitted exact counts
    r.foreach { row =>
      val nAb = row.getLong(2); val nA = row.getLong(3); val nB = row.getLong(4)
      assert(row.getDouble(5) === nAb.toDouble / nA.toDouble)
      assert(row.getDouble(6) === nAb.toDouble / nB.toDouble)
      assert(nAb <= math.min(nA, nB))
    }
  }
}
