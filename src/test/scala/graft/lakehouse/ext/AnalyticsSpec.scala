package graft.lakehouse.ext

import java.sql.Timestamp
import graft.lakehouse.{Bucketing, Joins, SparkSuite}
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("sessionize: gap starts a new session, ids break ts ties, rows kept") {
    val ev = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(5)),   // session 1
      (1L, 12L, ts(40)),                     // 35 min gap -> session 2
      (2L, 20L, ts(0)), (2L, 21L, ts(0)))    // same ts: one session, id order
      .toDF("user_id", "event_id", "ts")
    val out = Analytics.sessionize(ev, "user_id", "ts", "event_id",
        gapSeconds = 1800L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[Long]("session_seq")).toMap
    assert(out == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 20L -> 1L, 21L -> 1L))
  }

  test("cubeAgg: all four grouping sets of two dims, gid disambiguates") {
    val df = Seq(("a", "x", 10.0), ("a", "y", 20.0), ("b", "x", 5.0))
      .toDF("d1", "d2", "v")
    val out = Analytics.cubeAgg(df, Seq("d1", "d2"), "v")
      .collect().map(r => (r.getAs[String]("d1"), r.getAs[String]("d2"),
        r.getAs[Long]("cnt"), r.getAs[Double]("sum_val"), r.getAs[Int]("gid")))
      .toSet
    assert(out == Set(
      ("a", "x", 1L, 10.0, 0), ("a", "y", 1L, 20.0, 0), ("b", "x", 1L, 5.0, 0),
      ("a", null, 2L, 30.0, 1), ("b", null, 1L, 5.0, 1),
      // the dims-suffix sets ROLLUP lacks: per-d2 subtotals
      (null, "x", 2L, 15.0, 2), (null, "y", 1L, 20.0, 2),
      (null, null, 3L, 35.0, 3)))
  }

  test("rollupAgg: leaf rows + subtotals + grand total, gid disambiguates") {
    val df = Seq(("a", "x", 10.0), ("a", "y", 20.0), ("b", "x", 5.0))
      .toDF("d1", "d2", "v")
    val out = Analytics.rollupAgg(df, Seq("d1", "d2"), "v")
      .collect().map(r => (r.getAs[String]("d1"), r.getAs[String]("d2"),
        r.getAs[Long]("cnt"), r.getAs[Double]("sum_val"), r.getAs[Int]("gid")))
      .toSet
    assert(out == Set(
      ("a", "x", 1L, 10.0, 0), ("a", "y", 1L, 20.0, 0), ("b", "x", 1L, 5.0, 0),
      ("a", null, 2L, 30.0, 1), ("b", null, 1L, 5.0, 1),
      (null, null, 3L, 35.0, 3)), out.toString)
  }

  test("pivotCounts: explicit values, absent combos fill 0") {
    val df = Seq((1L, "click"), (1L, "click"), (2L, "view")).toDF("u", "t")
    val out = Analytics.pivotCounts(df, "u", "t", Seq("click", "view", "error"))
      .collect().map(r => r.getAs[Long]("u") ->
        (r.getAs[Long]("click"), r.getAs[Long]("view"), r.getAs[Long]("error")))
      .toMap
    assert(out == Map(1L -> ((2L, 0L, 0L)), 2L -> ((0L, 1L, 0L))), out.toString)
  }

  test("cohortRetention: users counted in their first-event week's cohort " +
      "at each week offset") {
    def w(d: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-$d%02d 03:$m%02d:00")
    // u1 first event week of Jan 1, active weeks 0 and 2; u2 week of Jan 8
    val ev = Seq((1L, w(2)), (1L, w(16)), (2L, w(9)), (2L, w(10)))
      .toDF("user_id", "ts")
    val out = Analytics.cohortRetention(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getAs[Timestamp]("cohort_week").toString.take(10),
        r.getAs[Int]("week_offset"), r.getAs[Long]("n_users"))).toSet
    assert(out == Set(("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L)), out.toString)
  }

  test("movingAverage: RANGE frame includes exactly the trailing window, " +
      "ties are peers") {
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(30), 3.0), (1L, ts(59), 5.0),
      // 61min after the first event: frame drops the 1.0
      (2L, ts(0), 10.0), (2L, ts(0), 20.0) // tie: both frames see both rows
    ).toDF("user_id", "ts", "value")
    val got = Analytics.movingAverage(ev, "user_id", "ts", "value",
        windowMicros = 3600000000L)
      .select("user_id", "ts", "avg_val")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .toSet
    assert(got.contains((1L, ts(59), 3.0)), got.toString) // (1+3+5)/3
    assert(got.contains((2L, ts(0), 15.0)), got.toString) // tie peers
  }

  test("movingAverage: null measurements don't deflate the mean") {
    val ev = Seq((1L, ts(0), Some(10.0)), (1L, ts(30), None))
      .toDF("user_id", "ts", "value")
    val got = Analytics.movingAverage(ev, "user_id", "ts", "value",
        windowMicros = 3600000000L)
      .filter($"ts" === ts(30)).select("avg_val").as[Double].head()
    assert(got == 10.0, s"null row counted into the mean: $got")
  }

  test("topNPerGroup: n per group, desc order, tie goes to smaller tieCol") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 9.0), ("g", 3L, 9.0), ("g", 4L, 1.0))
      .toDF("grp", "id", "v")
    val got = Analytics.topNPerGroup(df, Seq("grp"), "v", "id", 2)
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((2L, 1), (3L, 2)), got.toString) // 9.0 tie: id 2 wins
  }

  test("histogram: floor-division bins, nulls dropped, bin_lo exact") {
    val df = Seq(Some(0.0), Some(24999.99), Some(25000.0), Some(99.0), None)
      .toDF("v")
    val got = Analytics.histogram(df, "v", 25000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((0L, 3L, 0.0), (1L, 1L, 25000.0)), got.toString)
  }

  test("resampleFFill: hourly grid per key, latest value at-or-before " +
      "each grid point, null before first observation") {
    def h(hh: Int, mm: Int = 0) = Timestamp.valueOf(f"2024-01-01 $hh%02d:$mm%02d:00")
    val ev = Seq((1L, h(10, 30), 5.0), (1L, h(12, 0), 7.0)).toDF("user_id", "ts", "value")
    val got = Analytics.resampleFFill(ev, "user_id", "ts", "value", "1 HOUR")
      .collect().map(r => (r.getTimestamp(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // grid from trunc(10:30)=10:00 to 12:00
    assert(got == Map(h(10) -> None, h(11) -> Some(5.0), h(12) -> Some(7.0)),
      got.toString)
  }

  test("resampleFFill: a day step with matching originTrunc aligns the " +
      "grid to midnight and reaches the last day") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:30:00"), 5.0),
      (1L, Timestamp.valueOf("2024-01-03 05:00:00"), 7.0))
      .toDF("user_id", "ts", "value")
    val got = Analytics.resampleFFill(ev, "user_id", "ts", "value",
        "1 DAY", originTrunc = "day")
      .collect().map(r => (r.getTimestamp(1).toString.take(10),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(got == Map("2024-01-01" -> None, "2024-01-02" -> Some(5.0),
      "2024-01-03" -> Some(5.0)), got.toString)
  }

  test("periodOverPeriod: zero previous total yields NULL pct_change, " +
      "not Infinity") {
    val base = Seq(
      (Timestamp.valueOf("2024-01-01 01:00:00"), 5.0),
      (Timestamp.valueOf("2024-01-01 02:00:00"), -5.0),
      (Timestamp.valueOf("2024-01-02 09:00:00"), 20.0)).toDF("t", "v")
    val got = Analytics.periodOverPeriod(base, "t", "v", "day")
      .orderBy("period").collect()
    assert(got(0).getAs[Double]("total") == 0.0)
    assert(got(1).isNullAt(got(1).fieldIndex("pct_change")), got.mkString(","))
  }

  test("periodOverPeriod: exact per-period totals, change vs previous, " +
      "first period null") {
    val base = Seq(
      (Timestamp.valueOf("2024-01-01 01:00:00"), 10.0),
      (Timestamp.valueOf("2024-01-01 02:00:00"), 30.0),
      (Timestamp.valueOf("2024-01-02 09:00:00"), 20.0)).toDF("t", "v")
    val got = Analytics.periodOverPeriod(base, "t", "v", "day")
      .orderBy("period").collect()
      .map(r => (r.getAs[Double]("total"), Option(r.getAs[Any]("prev_total")),
        Option(r.getAs[Any]("pct_change"))))
    assert(got(0) == ((40.0, None, None)), got.mkString(","))
    assert(got(1)._1 == 20.0 && got(1)._2 == Some(40.0), got.mkString(","))
    assert(got(1)._3 == Some(-0.5), got.mkString(","))
  }

  test("runningDistinct: cumulative count equals count of users first " +
      "seen at or before each period") {
    def d(dd: Int) = Timestamp.valueOf(f"2024-01-$dd%02d 12:00:00")
    val ev = Seq((1L, d(1)), (2L, d(1)), (1L, d(2)), (3L, d(3)), (1L, d(3)))
      .toDF("user_id", "ts")
    val got = Analytics.runningDistinct(ev, "user_id", "ts", "day")
      .orderBy("period").collect()
      .map(r => (r.getTimestamp(0).toString.take(10),
        r.getAs[Long]("new_users"), r.getAs[Long]("cum_users")))
    // day 2 has events but no NEW users -> not an output row
    assert(got.toSeq == Seq(("2024-01-01", 2L, 2L), ("2024-01-03", 1L, 3L)),
      got.mkString(","))
  }

  test("anomalyZScore: z matches a hand-computed frame; null under minN " +
      "or zero variance") {
    val ev = Seq(
      (1L, ts(0), 1.0), (1L, ts(1), 1.0), (1L, ts(2), 1.0),
      (1L, ts(3), 1.0), (1L, ts(4), 6.0),
      (2L, ts(0), 2.0), (2L, ts(1), 2.0), (2L, ts(2), 2.0),
      (2L, ts(3), 2.0), (2L, ts(4), 2.0) // zero variance
    ).toDF("user_id", "ts", "value")
    val got = Analytics.anomalyZScore(ev, "user_id", "ts", "value",
        windowMicros = 3600000000L, minN = 5)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) ->
        (if (r.isNullAt(r.fieldIndex("z"))) None else Some(r.getAs[Double]("z"))))
      .toMap
    // user 1 at ts(4): frame [1,1,1,1,6]; mu=2, varPop=(40-100/5)/5=4, sd=2
    assert(got((1L, ts(4))) == Some(2.0), got.toString)
    assert(got((1L, ts(3))) == None) // minN=5 not reached (4 rows)
    assert(got((2L, ts(4))) == None) // zero variance
  }

  test("markovTransitions: deterministic lead under ties, row-conditional " +
      "probabilities sum to 1 per from state") {
    val ev = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"), (1L, ts(1), 3L, "a"),
      (2L, ts(0), 4L, "a"), (2L, ts(1), 5L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.markovTransitions(ev, "user_id", "ts", "event_id",
        "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // u1: a->b (tie at ts(1) broken by event_id: b before a), b->a
    // u2: a->b. So a->b:2 (p=1.0), b->a:1 (p=1.0)
    assert(got == Set(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)), got.toString)
  }

  test("welchTTest: hand-computed two-arm t; null when an arm is thin") {
    val df = Seq(
      ("m", 0, 1.0), ("m", 0, 2.0), ("m", 0, 3.0),
      ("m", 1, 5.0), ("m", 1, 7.0),
      ("x", 0, 1.0), ("x", 1, 9.0)) // 1 row per arm -> null t
      .toDF("g", "arm", "value")
    val rows = Analytics.welchTTest(df, Seq("g"), "arm", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    val m = rows("m")
    assert(m.getAs[Long]("n_a") == 3L && m.getAs[Long]("n_b") == 2L)
    assert(m.getAs[Double]("mean_a") == 2.0 && m.getAs[Double]("mean_b") == 6.0)
    // varA = 1, varB = 2; t = (2-6)/sqrt(1/3 + 2/2) = -4/sqrt(4/3)
    val expected = -4.0 / math.sqrt(1.0 / 3.0 + 1.0)
    assert(math.abs(m.getAs[Double]("t_stat") - expected) < 1e-12, m.toString)
    assert(rows("x").isNullAt(rows("x").fieldIndex("t_stat")))
  }

  test("corrRegression: hand-computed r/slope/intercept; null-pair rows " +
      "excluded; zero-variance group null") {
    val df = Seq(
      ("g", Some(1.0), Some(2.0)), ("g", Some(2.0), Some(4.0)),
      ("g", Some(3.0), Some(6.0)), ("g", None, Some(9.9)), // excluded pair
      ("z", Some(1.0), Some(5.0)), ("z", Some(1.0), Some(7.0))) // varX=0
      .toDF("grp", "x", "y")
    val rows = Analytics.corrRegression(df, Seq("grp"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = rows("g")
    assert(g.getAs[Long]("n") == 3L)
    assert(math.abs(g.getAs[Double]("r") - 1.0) < 1e-12) // y = 2x exactly
    assert(math.abs(g.getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(g.getAs[Double]("intercept")) < 1e-12)
    assert(rows("z").isNullAt(rows("z").fieldIndex("r")))
    assert(rows("z").isNullAt(rows("z").fieldIndex("slope")))
  }

  test("ntileStats: equal-count buckets with remainder to earlier buckets") {
    val df = (1L to 11L).map(i => (i, i.toDouble)).toDF("id", "v")
    val got = Analytics.ntileStats(df, "v", "id", 3)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1, 4L, 1.0, 4.0), (2, 4L, 5.0, 8.0),
      (3, 3L, 9.0, 11.0)), got.mkString(","))
  }

  test("heavyHittersMG equals exact heavyHitters when capacity exceeds " +
      "the distinct-key count") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val exact = Analytics.heavyHitters(li, "l_partkey", 20).collect().toSeq
    val mg = Analytics.heavyHittersMG(li, "l_partkey", 20, capacity = 256)
      .collect().toSeq
    assert(mg == exact)
  }

  test("heavyHittersMG: skewed keys above the N/capacity threshold are " +
      "exactly recovered with a small capacity") {
    val rows = Seq.fill(1000)("hot") ++ Seq.fill(500)("warm") ++
      Seq.fill(250)("mild") ++ (1 to 2000).map(i => s"u$i")
    val df = rows.toDF("k").repartition(8)
    val got = Analytics.heavyHittersMG(df, "k", 3, capacity = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("hot", 1000L), ("warm", 500L), ("mild", 250L)), got.toString)
  }

  test("bloomSemiJoin equals the plain inner join (false positives removed, " +
      "null keys dropped like any inner join)") {
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
      .union(Seq((Option.empty[Long], "n")).toDF("k", "v"))
    val build = Seq((1L, 10.0), (3L, 30.0)).toDF("k", "w")
    val got = Joins.bloomSemiJoin(fact, build, "k", expectedKeys = 10)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val plain = fact.join(build, Seq("k"), "inner")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.sameElements(plain), got.mkString(","))
    intercept[IllegalArgumentException] {
      Joins.bloomSemiJoin(fact, build, "k", 10, joinType = "left_outer")
    }
  }

  test("bucketed join + keyed aggregation plans with zero hash exchange " +
      "(broadcast disabled)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val db = graft.QFixtures.bucketedDb(spark, sf0001)
      val joined = Bucketing.table(spark, db, "orders_b")
        .join(Bucketing.table(spark, db, "customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      val finalP = { val c = p.indexOf("== Initial Plan =="); if (c >= 0) p.take(c) else p }
      assert(!finalP.contains("Exchange hashpartitioning"), finalP)
      assert(finalP.contains("SortMergeJoin"), finalP)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("madOutliers: robust to the outliers it hunts — the masked " +
      "z-score case still flags; clean data flags nothing") {
    import spark.implicits._
    // 20 values at 100 plus two huge ones: median/MAD ignore the
    // contamination the mean/stddev would absorb
    val df = ((1L to 10L).map(i => (i, 99L)) ++
      (11L to 20L).map(i => (i, 101L)) ++
      Seq((21L, 10000L), (22L, 20000L))).toDF("id", "v")
    val out = Analytics.madOutliers(df, "id", "v", 3000L)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(21L, 22L))
    val clean = (1L to 20L).map(i => (i, 100L + i % 3)).toDF("id", "v")
    assert(Analytics.madOutliers(clean, "id", "v", 3000L).count() == 0)
    intercept[IllegalArgumentException] {
      Analytics.madOutliers(clean, "id", "v", 0L)
    }
  }

  test("shareDrift: shares are per-side permille, one-sided keys " +
      "surface with zero counts, deltas signed") {
    import spark.implicits._
    val a = (Seq.fill(8)("x") ++ Seq.fill(2)("y")).toDF("k")    // 800/200
    val b = (Seq.fill(5)("x") ++ Seq.fill(4)("y") ++ Seq("z")).toDF("k")
    val out = Analytics.shareDrift(a, b, "k").orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("x", 8L, 5L, 800L, 500L, -300L),
      ("y", 2L, 4L, 200L, 400L, 200L),
      ("z", 0L, 1L, 0L, 100L, 100L)))
  }
  test("nextEventExamples: order-k contexts need a full history; counts " +
    "aggregate across users") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, t(1), 1L, "a"), (1L, t(2), 2L, "b"), (1L, t(3), 3L, "c"),
      (1L, t(4), 4L, "d"),
      (2L, t(1), 5L, "a"), (2L, t(2), 6L, "b"), (2L, t(3), 7L, "c"),
      (3L, t(1), 8L, "a"), (3L, t(2), 9L, "b")) // too short for k=2
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.nextEventExamples(ev, "user_id", "ts", "event_id",
        "event_type", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(("a>b", "c", 2L), ("b>c", "d", 1L)))
  }
  test("frequentItemPairs: in-row pair census matches the hand count; " +
    "hub cap and minSupport filter") {
    val rows = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 20L), // dup item collapses
      (4L, 99L)) // singleton basket contributes nothing
      .toDF("basket", "item")
    val got = Analytics.frequentItemPairs(rows, "basket", "item", 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == Set((10L, 20L, 3L)))
    // maxBasket below basket 1's size drops its pairs
    val capped = Analytics.frequentItemPairs(rows, "basket", "item", 1L,
      maxBasket = 2)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet == Set((10L, 20L)))
  }

  test("cusumChangepoint: the peak deviation lands on the shift day") {
    import java.sql.Timestamp
    // 4 days at 10/day then 4 days at 30/day: |S| peaks at day 4
    val ev = (1 to 4).flatMap(d => Seq.fill(10)(d)) ++
      (5 to 8).flatMap(d => Seq.fill(30)(d))
    val df = ev.zipWithIndex.map { case (d, i) =>
      (Timestamp.valueOf(f"2024-02-0$d%d 10:00:00"), i.toLong)
    }.toDF("ts", "id")
    val r = Analytics.cusumChangepoint(df, "ts").head()
    assert(r.getAs[java.sql.Date]("change_day").toString == "2024-02-04")
    // S_4 = sum over first 4 days of (10*8 - 160) = 4 * -80 = -320
    assert(r.getAs[Long]("cusum_scaled") == -320L)
    assert(r.getAs[Long]("n_events") == 160L && r.getAs[Long]("n_days") == 8L)
  }
  test("kaplanMeier: hand-computed risk table and log-survival") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 09:00:00")
    // obs end = day 11. A 1->11 censored(dur 10); B,C 1->3 churn(dur 2);
    // D 1->6 churn(dur 5); E 3->11 censored(dur 8).
    val ev = Seq(
      (1L, t(1)), (1L, t(11)),
      (2L, t(1)), (2L, t(3)),
      (3L, t(1)), (3L, t(3)),
      (4L, t(1)), (4L, t(6)),
      (5L, t(3)), (5L, t(11)))
      .toDF("user_id", "ts")
    val got = Analytics.kaplanMeier(ev, "user_id", "ts", churnGapDays = 3)
      .orderBy("duration").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Double]("ln_surv")))
    assert(got.map(x => (x._1, x._2, x._3, x._4)).toSeq ==
      Seq((2, 5L, 2L, 0L), (5, 3L, 1L, 0L), (8, 2L, 0L, 1L),
        (10, 1L, 0L, 1L)))
    assert(math.abs(got(0)._5 - math.log(3.0 / 5.0)) < 1e-12)
    assert(math.abs(got(1)._5 - math.log(0.4)) < 1e-12)
    assert(got(3)._5 == got(2)._5, "censoring-only durations keep S flat")
  }

  test("nelsonAalen: hand-computed cumulative hazard on the KM fixture") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val ev = Seq(
      (1L, t(1)), (1L, t(11)),
      (2L, t(1)), (2L, t(3)),
      (3L, t(1)), (3L, t(3)),
      (4L, t(1)), (4L, t(6)),
      (5L, t(3)), (5L, t(11)))
      .toDF("user_id", "ts")
    val got = Analytics.nelsonAalen(ev, "user_id", "ts", churnGapDays = 3)
      .orderBy("duration").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("cum_hazard"), r.getAs[Double]("cum_hazard_var")))
    // risk table (from the KM spec): dur 2: d=2 n=5; dur 5: d=1 n=3;
    // dur 8: d=0 n=2; dur 10: d=0 n=1
    assert(got.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq((2, 5L, 2L), (5, 3L, 1L), (8, 2L, 0L), (10, 1L, 0L)))
    assert(math.abs(got(0)._4 - 0.4) < 1e-12)
    assert(math.abs(got(1)._4 - (0.4 + 1.0 / 3.0)) < 1e-12)
    assert(got(3)._4 == got(1)._4, "no-event durations keep H flat")
    assert(math.abs(got(0)._5 - 2.0 / 25.0) < 1e-12)
    assert(math.abs(got(1)._5 - (2.0 / 25.0 + 1.0 / 9.0)) < 1e-12)
  }

  test("theilSenSlope: exact line -> its slope, outlier shrugged off, " +
    "even count averages the two middles, oversize group refused") {
    import spark.implicits._
    // y = 2x + 1 with one wild outlier at x=5: median slope stays 2
    val pts = Seq(("a", 1, 3), ("a", 2, 5), ("a", 3, 7), ("a", 4, 9),
      ("a", 5, 1000)).toDF("g", "x", "y")
    val r = Analytics.theilSenSlope(pts, "g", "x", "y").head()
    assert(r.getAs[Long]("n_points") == 5L &&
      r.getAs[Long]("n_slopes") == 10L &&
      math.abs(r.getAs[Double]("slope") - 2.0) < 1e-12)
    // two points -> one slope; three collinear-x points with even slope
    // count: slopes {1, 2, 3} from (0,0),(1,1),(2,3)? -> pairs
    // (0,1):1, (0,2):1.5, (1,2):2 -> odd count 3, median 1.5
    val tri = Seq(("b", 0, 0), ("b", 1, 1), ("b", 2, 3)).toDF("g", "x", "y")
    val m = Analytics.theilSenSlope(tri, "g", "x", "y").head()
    assert(m.getAs[Long]("n_slopes") == 3L &&
      math.abs(m.getAs[Double]("slope") - 1.5) < 1e-12)
    // even count: 4 slopes, the two middles average exactly
    // pts (0,0),(1,1),(2,2),(3,100): slopes 1,1,1, 33.xx, 49.5, 97
    // sorted: 1,1,1,33.33,49.5,97 (6 slopes) -> middles 1 and 33.33
    val ev4 = Seq(("c", 0, 0), ("c", 1, 1), ("c", 2, 2), ("c", 3, 100))
      .toDF("g", "x", "y")
    val e = Analytics.theilSenSlope(ev4, "g", "x", "y").head()
    assert(e.getAs[Long]("n_slopes") == 6L)
    // middles: rank3 = 1 (num/den reduced variants), rank4 = 100-2=98/1?
    // slopes: (0,1)=1,(0,2)=1,(0,3)=100/3,(1,2)=1,(1,3)=99/2,(2,3)=98
    // sorted: 1,1,1,100/3,99/2,98 -> middles 1 and 100/3
    assert(math.abs(e.getAs[Double]("slope") - (1.0 + 100.0 / 3.0) / 2.0)
      < 1e-12)
    intercept[Exception] {
      Analytics.theilSenSlope(pts, "g", "x", "y", maxPoints = 3).collect()
    }
  }

  test("lagAutocorrelation: constant series -> zero variance (null acf); " +
    "alternating series -> acf(1) < 0 < acf(2); missing days fill as 0") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // alternating 2,1,2,1,... over 8 days
    val alt = (1 to 8).flatMap(d =>
      Seq.fill(if (d % 2 == 1) 2 else 1)(("a", t(d))))
    // constant 1/day over 4 days
    val const = (1 to 4).map(d => ("c", t(d)))
    val ev = (alt ++ const).toDF("event_type", "ts")
    val got = Analytics.lagAutocorrelation(ev, "event_type", "ts",
      maxLag = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got(("a", 1L))._1 == 8L)
    assert(got(("a", 1L))._2.get < 0 && got(("a", 2L))._2.get > 0)
    assert(got(("c", 1L))._2.isEmpty, "zero variance -> null acf")
    // a gap: days 1 and 3 only, one event each -> dense day 2 fills 0
    val gap = Seq(("g", t(1)), ("g", t(3))).toDF("event_type", "ts")
    val g = Analytics.lagAutocorrelation(gap, "event_type", "ts",
      maxLag = 1).collect()
    assert(g.head.getLong(2) == 3L, "dense grid spans the gap")
  }

  test("ewmaAnomalyScore: steady series scores ~1000, spike scores " +
    "high, day one has no history") {
    import spark.implicits._
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // 25 days of 4 events/day, then a 40-event spike on day 26
    val ev = ((1 to 25).flatMap(d => Seq.fill(4)(("a", t(d)))) ++
      Seq.fill(40)(("a", t(26)))).toDF("event_type", "ts")
    val got = Analytics.ewmaAnomalyScore(ev, "event_type", "ts",
      window = 20).orderBy("day").collect()
    assert(got.head.isNullAt(4), "first day has no history")
    val steady = got(24) // day 25: full window of constant 4s
    // full-history mass: score = y*(2^20-1)*1000 div (y*(2^20-1)) = 1000
    assert(steady.getAs[Long]("score_permille") == 1000L)
    val spike = got(25)
    assert(spike.getAs[Long]("y") == 40L &&
      spike.getAs[Long]("score_permille") == 10000L,
      s"spike must score 10x steady, got ${spike}")
  }

  test("ohlcBars: deterministic open/close under same-timestamp ties, " +
    "exact decimal volume") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 09:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 17:00:00")
    val ev = Seq(
      ("a", ts0, 1L, 10.5), ("a", ts0, 2L, 11.0),  // tie: open = id 1
      ("a", ts1, 3L, 9.25), ("a", ts1, 4L, 12.0)   // tie: close = id 4
    ).toDF("event_type", "ts", "event_id", "value")
    val r = Analytics.ohlcBars(ev, "event_type", "ts", "event_id",
      "value").head()
    assert(r.getAs[Double]("open") == 10.5 &&
      r.getAs[Double]("close") == 12.0 &&
      r.getAs[Double]("high") == 12.0 &&
      r.getAs[Double]("low") == 9.25 &&
      r.getAs[Long]("n_events") == 4L &&
      r.getAs[Double]("volume") == 42.75)
  }

  test("eventTrigrams: per-user sequences only, deterministic tie order") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, t(1), 1L, "a"), (1L, t(2), 2L, "b"), (1L, t(3), 3L, "c"),
      (1L, t(4), 4L, "d"),
      (2L, t(1), 5L, "a"), (2L, t(2), 6L, "b"), (2L, t(3), 7L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.eventTrigrams(ev, "user_id", "ts", "event_type",
      "event_id", topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // user1: abc, bcd; user2: abc -> abc x2, bcd x1; no cross-user grams
    assert(got.toSeq == Seq(("a", "b", "c", 2L), ("b", "c", "d", 1L)))
  }

  test("histogram2d: fixed-grid cells, out-of-range clamps to edges, " +
    "total preserved") {
    import spark.implicits._
    val df = Seq((0, 0), (4, 9), (5, 10), (99, -5)).toDF("x", "y")
    val got = Analytics.histogram2d(df, "x", "y", xLo = 0L, xHi = 10L,
      xBins = 2, yLo = 0L, yHi = 20L, yBins = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // (0,0)->cell(0,0); (4,9)->(0,0); (5,10)->(1,1); (99,-5) clamps
    // to x=9,y=0 -> (1,0)
    assert(got == Map((0, 0) -> 2L, (1, 1) -> 1L, (1, 0) -> 1L))
    assert(got.values.sum == 4L)
  }

  test("interArrivalPercentiles: hand-checked gaps per group, ranks " +
    "select exact order statistics") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // group a events at minutes 0,1,3,7 -> gaps {60,120,240}
    val ev = Seq(("a", t(0), 1L), ("a", t(1), 2L), ("a", t(3), 3L),
      ("a", t(7), 4L), ("b", t(0), 5L)).toDF("event_type", "ts", "event_id")
    val got = Analytics.interArrivalPercentiles(ev, "event_type", "ts",
      "event_id", permilles = Seq(500, 1000)).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // p500 -> rank ceil(3*0.5)=2 -> 120; p1000 -> rank 3 -> 240
    assert(got(("a", 500)) == (120L, 3L))
    assert(got(("a", 1000)) == (240L, 3L))
    // single-event group has no gaps: absent
    assert(!got.keySet.exists(_._1 == "b"))
  }

  private def onDay(i: Int, n: Int, grp: String = "x")
      : Seq[(String, java.sql.Timestamp)] = {
    val day = java.time.LocalDate.of(1970, 1, 5).plusDays(i.toLong)
    (1 to n).map(_ => (grp,
      java.sql.Timestamp.valueOf(day.atTime(12, 0))))
  }

  test("brownDoubleSmoothing: constant series -> level=c trend=0; " +
    "linear series -> exact level and constant trend") {
    import spark.implicits._
    // constant y=3 for 40 days (>= 2 warm-up windows)
    val const = (0 until 40).flatMap(i => onDay(i, 3))
      .toDF("event_type", "ts")
    val c = Analytics.brownDoubleSmoothing(const, "event_type", "ts",
      window = 10, horizon = 7).head()
    assert(c.getAs[Double]("level") == 3.0, c.toString)
    assert(c.getAs[Double]("trend") == 0.0)
    assert(c.getAs[Double]("forecast_7d") == 3.0)
    // linear y(i) = i+1: level lands exactly on the last value,
    // trend_scaled = (2^11 - 12)·1023 (truncated-window Brown identity)
    val lin = (0 until 40).flatMap(i => onDay(i, i + 1))
      .toDF("event_type", "ts")
    val l = Analytics.brownDoubleSmoothing(lin, "event_type", "ts",
      window = 10, horizon = 7).head()
    assert(l.getAs[Long]("level_scaled") == 40L * 1023 * 1023,
      l.toString)
    assert(l.getAs[Long]("trend_scaled") == 2036L * 1023)
  }

  test("seasonalDowIndices: Mondays at 2x over a two-week grid") {
    import spark.implicits._
    // 1970-01-05 is a Monday; 14 days, y=2 on the 2 Mondays else y=1
    val ev = (0 until 14).flatMap(i =>
      onDay(i, if (i % 7 == 0) 2 else 1)).toDF("event_type", "ts")
    val got = Analytics.seasonalDowIndices(ev, "event_type", "ts")
      .orderBy("dow").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // total=16 over 14 days; Monday: 4/2 days -> (4·14·1000)/(2·16)=1750
    assert(got.head == (1, 2L, 4L, 1750L), got.mkString(","))
    assert(got.tail.forall(t => t._4 == 875L), got.mkString(","))
  }

  test("activityHeatmap: cells land on the right (dow, hour), shares " +
    "are per-group permille") {
    import spark.implicits._
    // 1970-01-05 = Monday; 3 events Mon 10h + 1 event Tue 03h
    def at(i: Int, h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1970, 1, 5).plusDays(i.toLong).atTime(h, 0))
    val ev = (Seq.fill(3)(("x", at(0, 10))) :+ (("x", at(1, 3))))
      .toDF("event_type", "ts")
    val got = Analytics.activityHeatmap(ev, "event_type", "ts")
      .orderBy("dow", "hour").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq((1, 10, 3L, 750L), (2, 3, 1L, 250L)),
      got.mkString(","))
  }

  test("diffInDiff: dense panel hand case — treated doubles post, " +
    "control flat -> did = +2") {
    import spark.implicits._
    // span days 0..10 -> mid 5; u1 (treat): pre 2 / post 4;
    // u2 (control): pre 3 / post 3
    val ev = (Seq(1, 2).map(d => (1L, onDay(d, 1).head._2)) ++
      Seq(6, 7, 8, 9).map(d => (1L, onDay(d, 1).head._2)) ++
      Seq(0, 3, 5).map(d => (2L, onDay(d, 1).head._2)) ++
      Seq(6, 7, 10).map(d => (2L, onDay(d, 1).head._2)))
      .toDF("user_id", "ts")
    val r = Analytics.diffInDiff(ev, "user_id", "ts",
      col("u") % 2 === 1).head()
    assert(r.getAs[Long]("s_treat_pre") == 2L &&
      r.getAs[Long]("s_treat_post") == 4L &&
      r.getAs[Long]("s_control_pre") == 3L &&
      r.getAs[Long]("s_control_post") == 3L, r.toString)
    assert(r.getAs[Double]("did") == 2.0)
  }

  test("mdePowerCheck: hand MDE at pooled rate 0.2 and binding arm 50") {
    import spark.implicits._
    val units = (Seq.tabulate(100)(i => (1, i < 20)) ++
      Seq.tabulate(50)(i => (0, i < 10))).toDF("arm", "conv")
    val r = Analytics.mdePowerCheck(units, "arm", col("conv")).head()
    assert(r.getAs[Long]("pooled_rate_permille") == 200L)
    assert(math.abs(r.getAs[Double]("mde") -
      2.8 * math.sqrt(2.0 * 0.2 * 0.8 / 50)) < 1e-12, r.toString)
  }

  test("obfSequentialMonitor: boundary shrinks to 1.96 at the final " +
    "look; the hand z crosses only there") {
    import spark.implicits._
    // two weeks; each week: treated 4 events 2 conv, control 4 and 0
    // (absolute epoch days — onDay's base is 1970-01-05, epoch day 4)
    def wk(w: Int, uid: Long, et: String, n: Int) =
      (1 to n).map(i => (uid, java.sql.Timestamp.valueOf(
        java.time.LocalDate.ofEpochDay(w * 7L + 1 + i % 5)
          .atTime(12, 0)), et))
    val ev = (wk(0, 1L, "purchase", 2) ++ wk(0, 1L, "view", 2) ++
      wk(0, 2L, "view", 4) ++
      wk(1, 1L, "purchase", 2) ++ wk(1, 1L, "view", 2) ++
      wk(1, 2L, "view", 4)).toDF("user_id", "ts", "event_type")
    val got = Analytics.obfSequentialMonitor(ev, "user_id", "ts",
      col("event_type") === "purchase").orderBy("look").collect()
    assert(got.length == 2)
    assert(math.abs(got(1).getAs[Double]("obf_boundary") - 1.96) < 1e-12)
    assert(got(0).getAs[Double]("obf_boundary") >
      got(1).getAs[Double]("obf_boundary"))
    assert(!got(0).getAs[Boolean]("crossed"), got(0).toString)
    assert(got(1).getAs[Boolean]("crossed"), got(1).toString)
    // hand z at the final look: p1=.5, p0=0, pooled .25 over 8+8
    assert(math.abs(got(1).getAs[Double]("z") -
      0.5 / math.sqrt(0.25 * 0.75 * (1.0 / 8 + 1.0 / 8))) < 1e-12)
  }

  test("quantileTreatmentEffect: exact per-arm rank quantiles and " +
    "integer differences") {
    import spark.implicits._
    val units = (Seq(10L, 20L, 30L, 40L).map((1, _)) ++
      Seq(5L, 15L, 25L, 35L).map((0, _))).toDF("arm", "v")
    val got = Analytics.quantileTreatmentEffect(units, "arm", "v",
      permilles = Seq(500, 900)).orderBy("p").collect()
      .map(r => (r.getInt(0), r.getAs[Long]("q_treat"),
        r.getAs[Long]("q_control"), r.getAs[Long]("qte"))).toSeq
    assert(got == Seq((500, 20L, 15L, 5L), (900, 40L, 35L, 5L)),
      got.mkString(","))
  }

  test("upliftByBin: per-bin treated/control rates and their exact " +
    "permille difference; single-arm bins drop") {
    import spark.implicits._
    val units = Seq(
      (100L, 1, 1), (150L, 1, 0), (120L, 0, 0), (180L, 0, 0), // bin 0
      (900L, 1, 0), (950L, 0, 1), // bin 4
      (500L, 1, 1)) // bin 2: treated only -> dropped
      .toDF("score", "arm", "conv")
    val got = Analytics.upliftByBin(units, "score", "arm",
      col("conv") === 1, bins = 5).orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq
    assert(got == Seq((0, 500L, 0L, 500L), (4, 0L, 1000L, -1000L)),
      got.mkString(","))
  }

  test("covariateBalance: hand SMD, identical covariate reads 0, " +
    "zero-variance covariate guarded null") {
    import spark.implicits._
    // arm1 x=[10,14] (mean 12, s2 8); arm0 x=[8,12] (mean 10, s2 8)
    val units = Seq(
      (1, 10L, 3L, 5L), (1, 14L, 4L, 5L),
      (0, 8L, 3L, 5L), (0, 12L, 4L, 5L))
      .toDF("arm", "x", "same_dist", "const")
    val got = Analytics.covariateBalance(units, "arm",
      Seq("x", "same_dist", "const")).collect()
      .map(r => r.getString(0) -> Option(r.get(5))
        .map(_.asInstanceOf[Double])).toMap
    assert(math.abs(got("x").get - 2.0 / math.sqrt(8.0)) < 1e-12,
      got.toString)
    assert(got("same_dist").get == 0.0)
    assert(got("const").isEmpty, "zero variance both arms -> null SMD")
  }

  test("ipsPolicyValue: matched rewards reweight by N/n_a exactly") {
    import spark.implicits._
    val logs = Seq(
      ("a", "a", 10L), ("a", "b", 20L), ("b", "b", 5L))
      .toDF("action", "target", "r")
    val got = Analytics.ipsPolicyValue(logs, "action", "target", "r")
      .orderBy("action").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("a", 2L, 1L, 10L, 15L), // 10·3 div 2
      ("b", 1L, 1L, 5L, 15L)), got.mkString(","))
  }

  test("rfmSegments: three users land in the hand-derived quintile " +
    "cells under the ceil(cum*5/n) rule") {
    import spark.implicits._
    val ev = (
      // a: last day 10, 3 events, value 3x3.0 -> m=9000
      (1 to 3).map(i => ("a", onDay(7 + i, 1).head._2, 3.0)) ++
      // b: last day 8, 2 events, value 2x0.25 -> m=500
      (1 to 2).map(i => ("b", onDay(6 + i, 1).head._2, 0.25)) ++
      // c: last day 5, 1 event, value 0.1 -> m=100
      Seq(("c", onDay(5, 1).head._2, 0.1)))
      .toDF("user_id", "ts", "value")
    val got = Analytics.rfmSegments(ev, "user_id", "ts", "value")
      .orderBy("r_q", "f_q", "m_q").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSeq
    // r: a=0,b=2,c=5 -> q 2/4/5; f: c=1,b=2,a=3 -> q 2/4/5; m likewise
    assert(got == Seq((2, 5, 5, 1L), (4, 4, 4, 1L), (5, 2, 2, 1L)),
      got.mkString(","))
  }

  test("cupedAdjustment: a perfectly-correlated covariate removes all " +
    "variance (theta exact, reduction 1000 permille)") {
    import spark.implicits._
    val units = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val r = Analytics.cupedAdjustment(units, "x", "y").head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("theta") == 2.0, r.toString)
    assert(math.abs(r.getAs[Double]("var_y") - 24.0 / 9) < 1e-12)
    assert(r.getAs[Double]("var_adjusted") == 0.0)
    assert(r.getAs[Long]("reduction_permille") == 1000L)
    // zero-variance covariate: theta guarded null
    val flat = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    assert(Analytics.cupedAdjustment(flat, "x", "y").head()
      .isNullAt(1))
  }

  test("activityCells runs UNCHANGED as a streaming aggregation: " +
    "complete-mode cells over a MemoryStream equal the batch heatmap's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(i: Int, h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1970, 1, 5).plusDays(i.toLong).atTime(h, 0))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp)]
    val agg = Analytics.activityCells(
      mem.toDF().toDF("event_type", "ts"), "event_type", "ts")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("heatmap_stream_test").start()
    try {
      mem.addData(("x", at(0, 10)), ("x", at(0, 10)))
      q.processAllAvailable()
      mem.addData(("x", at(0, 10)), ("x", at(1, 3)), ("y", at(2, 7)))
      q.processAllAvailable()
      val got = spark.table("heatmap_stream_test").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
          r.getLong(3)).toMap
      val all = Seq(("x", at(0, 10)), ("x", at(0, 10)), ("x", at(0, 10)),
        ("x", at(1, 3)), ("y", at(2, 7))).toDF("event_type", "ts")
      val batch = Analytics.activityHeatmap(all, "event_type", "ts")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
          r.getLong(3)).toMap
      assert(got == batch, s"stream=$got batch=$batch")
    } finally q.stop()
  }

  test("naiveForecastEval: linear series -> persistence err 1/day, " +
    "weekly err 7/day, ratio 7000 permille") {
    import spark.implicits._
    val ev = (0 until 14).flatMap(i => onDay(i, i + 1))
      .toDF("event_type", "ts")
    val r = Analytics.naiveForecastEval(ev, "event_type", "ts").head()
    assert(r.getAs[Long]("n_days") == 7L, r.toString)
    assert(r.getAs[Long]("abs_err_naive1") == 7L)
    assert(r.getAs[Long]("abs_err_naive7") == 49L)
    assert(r.getAs[Long]("seasonal_vs_persistence_permille") == 7000L)
  }

  test("logRankTest: hand-computed O1/E1/V on a 4-user fixture") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 09:00:00")
    // obs end = day 21. u1 (g1) 1->11: gap 10 > 7 -> churn, duration 10.
    // u2 (g0) 1->17: gap 4 -> censored, duration 16. u3 (g1), u4 (g0)
    // 1->21: censored, duration 20. Only duration 10 carries an event:
    // n=4, n1=2, d=1, d1=1 -> E1 = 1*2/4 = 0.5,
    // V = 1*(2/4)*(1-2/4)*((4-1)/(4-1)) = 0.25, chi2 = 0.25/0.25 = 1.
    val ev = Seq(
      (1L, t(1)), (1L, t(11)),
      (2L, t(1)), (2L, t(17)),
      (3L, t(1)), (3L, t(21)),
      (4L, t(1)), (4L, t(21)))
      .toDF("user_id", "ts")
    val r = Analytics.logRankTest(ev, "user_id", "ts", churnGapDays = 7,
      groupCol = col("user_id") % 2).head()
    assert(r.getAs[Long]("o1") == 1L, r.toString)
    assert(math.abs(r.getAs[Double]("e1") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("v") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("chi2") - 1.0) < 1e-12)
  }

  test("logRankTest: identical group curves give chi2 = 0") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 09:00:00")
    // u1 (g1) and u2 (g0) both churn at duration 10; u3/u4 censored.
    val ev = Seq(
      (1L, t(1)), (1L, t(11)),
      (2L, t(1)), (2L, t(11)),
      (3L, t(1)), (3L, t(21)),
      (4L, t(1)), (4L, t(21)))
      .toDF("user_id", "ts")
    val r = Analytics.logRankTest(ev, "user_id", "ts", churnGapDays = 7,
      groupCol = col("user_id") % 2).head()
    assert(r.getAs[Long]("o1") == 1L)
    assert(math.abs(r.getAs[Double]("e1") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-12)
  }

  test("ljungBox: hand-computed Q on a 4-day alternating series") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // daily counts [1,2,1,2]: n=4, S=6, n*y-S = [-2,2,-2,2], den=16;
    // lag nums: -12, 8, -4 -> r = [-.75, .5, -.25];
    // Q = 4*6*(0.5625/3 + 0.25/2 + 0.0625/1) = 24*0.375 = 9.
    val ev = Seq(
      ("x", t(1)),
      ("x", t(2)), ("x", t(2)),
      ("x", t(3)),
      ("x", t(4)), ("x", t(4)))
      .toDF("event_type", "ts")
    val r = Analytics.ljungBox(ev, "event_type", "ts", maxLag = 3).head()
    assert(r.getAs[Long]("n_days") == 4L, r.toString)
    assert(r.getAs[Long]("h") == 3L)
    assert(math.abs(r.getAs[Double]("q_lb") - 9.0) < 1e-12)
  }

  test("ljungBox: constant series reports NULL Q, not a fabricated 0") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val ev = Seq(("x", t(1)), ("x", t(2)), ("x", t(3)), ("x", t(4)))
      .toDF("event_type", "ts")
    val r = Analytics.ljungBox(ev, "event_type", "ts", maxLag = 2).head()
    assert(r.isNullAt(r.fieldIndex("q_lb")))
  }
}
