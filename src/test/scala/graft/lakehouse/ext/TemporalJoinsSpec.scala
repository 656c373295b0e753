package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import java.sql.Timestamp

class TemporalJoinsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right row at or before each left timestamp, per key") {
    val quotes = Seq( // (sym, ts, price)
      ("A", ts("2024-01-01 09:00:00"), 10.0),
      ("A", ts("2024-01-01 09:05:00"), 11.0),
      ("A", ts("2024-01-01 09:10:00"), 12.0),
      ("B", ts("2024-01-01 09:02:00"), 100.0)
    ).toDF("sym", "t", "price")
    val trades = Seq( // (sym, ts, qty)
      ("A", ts("2024-01-01 09:04:00"), 5L),  // -> 10.0
      ("A", ts("2024-01-01 09:05:00"), 6L),  // ties match (<=) -> 11.0
      ("A", ts("2024-01-01 09:30:00"), 7L),  // -> 12.0
      ("B", ts("2024-01-01 09:00:00"), 8L),  // before any quote -> null
      ("C", ts("2024-01-01 09:00:00"), 9L)   // key with no quotes -> null
    ).toDF("sym", "t", "qty")

    val out = TemporalJoins.asofJoin(trades, quotes, Seq("sym"), "t",
      Seq("price")).orderBy("sym", "t").collect()
    assert(out.length == 5) // left join: every trade survives
    val got = out.map(r => (r.getAs[String]("sym"), r.getAs[Long]("qty"),
      Option(r.getAs[java.lang.Double]("price_asof")).map(_.toDouble)))
    assert(got.toSeq == Seq(
      ("A", 5L, Some(10.0)), ("A", 6L, Some(11.0)), ("A", 7L, Some(12.0)),
      ("B", 8L, None), ("C", 9L, None)))
  }

  test("rangeJoin: inclusive bounds, overlapping intervals, bin edges") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 25.0), (4L, 99.0))
      .toDF("pid", "v")
    val ranges = Seq((10L, 0.0, 10.0), (20L, 10.0, 30.0), (30L, 50.0, 60.0))
      .toDF("rid", "lo", "hi")
    // binWidth deliberately misaligned with the interval ends
    val out = TemporalJoins.rangeJoin(points, "v", ranges, "lo", "hi", 7.0)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(
      (1L, 10L),            // 5 in [0,10]
      (2L, 10L), (2L, 20L), // 10 on both inclusive boundaries
      (3L, 20L)             // 25 in [10,30]; 99 matches nothing
    ), out.toString)
  }

  test("rangeJoin matches a brute-force BETWEEN join on fixture data") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
    val bands = spark.range(0, 13).select($"id".as("band_id"),
      ($"id" * 40000.0).as("lo"), ($"id" * 40000.0 + 60000.0).as("hi"))
    val fast = TemporalJoins.rangeJoin(orders, "o_totalprice", bands,
      "lo", "hi", 20000.0).select("o_orderkey", "band_id")
    val brute = orders.join(bands,
      $"o_totalprice" >= $"lo" && $"o_totalprice" <= $"hi")
      .select("o_orderkey", "band_id")
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }

  test("asofJoin carries all value columns from the same right row") {
    val right = Seq(
      ("k", ts("2024-01-01 00:00:00"), null.asInstanceOf[java.lang.Double], "first"),
      ("k", ts("2024-01-01 01:00:00"), java.lang.Double.valueOf(2.0), null.asInstanceOf[String])
    ).toDF("k", "t", "v1", "v2")
    val left = Seq(("k", ts("2024-01-01 02:00:00"), 1L)).toDF("k", "t", "id")
    val r = TemporalJoins.asofJoin(left, right, Seq("k"), "t",
      Seq("v1", "v2")).collect().head
    // latest right row is (2.0, null): v2 must be null, NOT "first"
    assert(r.getAs[java.lang.Double]("v1_asof") == 2.0)
    assert(r.getAs[String]("v2_asof") == null)
  }

  test("intervalOverlapJoin: overlap pairs exactly once even when a pair " +
      "shares several bins; non-overlaps and key mismatches excluded") {
    import spark.implicits._
    def t(d: String) = java.sql.Timestamp.valueOf(d)
    val left = Seq(
      ("k1", 1L, t("2024-01-01 00:00:00"), t("2024-01-10 00:00:00")),
      ("k1", 2L, t("2024-02-01 00:00:00"), t("2024-02-02 00:00:00")),
      ("k2", 3L, t("2024-01-01 00:00:00"), t("2024-01-10 00:00:00")))
      .toDF("k", "id", "s", "e")
    val right = Seq(
      // overlaps id=1 and shares many 1-day bins with it
      ("k1", 10L, t("2024-01-05 00:00:00"), t("2024-01-20 00:00:00")),
      // touches id=1 exactly at its end instant (inclusive bounds)
      ("k1", 11L, t("2024-01-10 00:00:00"), t("2024-01-12 00:00:00")),
      // no overlap with anything on k1
      ("k1", 12L, t("2024-03-01 00:00:00"), t("2024-03-02 00:00:00")),
      // would overlap id=1 but key differs
      ("k3", 13L, t("2024-01-02 00:00:00"), t("2024-01-03 00:00:00")))
      .toDF("k", "id", "s", "e")
    val got = TemporalJoins.intervalOverlapJoin(left, right, Seq("k"),
        "s", "e", binMicros = 24L * 3600 * 1000000)
      .select("id", "id_r")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == Seq((1L, 10L), (1L, 11L)), got.mkString(","))
  }

  test("intervalCoverage: overlap collapses, touching merges, gaps " +
      "split islands, inverted/null intervals drop") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val iv = Seq(
      (1L, t(0), t(10)),
      (1L, t(5), t(12)),   // overlaps -> same island
      (1L, t(12), t(15)),  // touches  -> same island (end-exclusive)
      (1L, t(30), t(35)),  // gap      -> second island
      (2L, t(0), t(1)),
      (2L, t(5), t(4)),    // inverted -> dropped
      (2L, null.asInstanceOf[Timestamp], t(9))  // null -> dropped
    ).toDF("k", "s", "e")
    val out = TemporalJoins.intervalCoverage(iv, "k", "s", "e")
      .orderBy("k").collect()
    assert(out(0).getAs[Long]("n_intervals") == 4L)
    assert(out(0).getAs[Long]("n_islands") == 2L)
    // island 1 covers 0..15 = 15 min, island 2 covers 5 min
    assert(out(0).getAs[Long]("covered_us") == 20L * 60 * 1000000)
    assert(out(0).getAs[Long]("span_us") == 35L * 60 * 1000000)
    assert(out(1).getAs[Long]("n_intervals") == 1L &&
      out(1).getAs[Long]("covered_us") == 60L * 1000000)
  }
  test("asofJoinNearest: closest reading either direction wins inside " +
    "the tolerance, ties to the earlier right row, no-match stays null") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, t("2024-01-01 12:00:00")), // nearest is AFTER (12:00:30)
      (2L, 10L, t("2024-01-01 13:00:00")), // equidistant -> earlier right
      (3L, 10L, t("2024-01-01 18:00:00")), // nothing within tolerance
      (4L, 20L, t("2024-01-01 12:00:00"))) // other key: its own stream
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("2024-01-01 11:58:00"), 1.0),
      (10L, t("2024-01-01 12:00:30"), 2.0),
      (10L, t("2024-01-01 12:59:00"), 3.0),
      (10L, t("2024-01-01 13:01:00"), 4.0),
      (20L, t("2024-01-01 12:00:10"), 9.0))
      .toDF("user_id", "ts", "value")
    val got = TemporalJoins.asofJoinNearest(left, right, Seq("user_id"),
        "event_id", "ts", Seq("value"), toleranceMicros = 600000000L)
      .orderBy("event_id").collect()
    assert(got(0).getAs[Double]("value_near") == 2.0)
    assert(got(0).getAs[Long]("delta_micros") == 30000000L)
    assert(got(1).getAs[Double]("value_near") == 3.0,
      "60s before vs 60s after must tie-break to the earlier right row")
    assert(got(2).isNullAt(got(2).fieldIndex("value_near")))
    assert(got(3).getAs[Double]("value_near") == 9.0)
  }
}
