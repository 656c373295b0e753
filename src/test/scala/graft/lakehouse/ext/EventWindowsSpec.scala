package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventWindowsSpec extends SparkSuite {
  import spark.implicits._

  lazy val events = graft.lakehouse.TableIO.readParquetNanoTs(
    spark, s"$sf0001/events.parquet")

  test("eventTimeAudit: late arrivals counted per key, worst regression " +
      "in exact micros, ordered logs report zero") {
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      (1L, 1L, t(10)),
      (1L, 2L, t(20)),
      (1L, 3L, t(5)),    // late by 15 s vs max(10, 20)
      (2L, 4L, t(1)),
      (2L, 5L, t(2)),    // in order
      (3L, 6L, t(30)),
      (3L, 7L, t(29))    // late by 1 s
    ).toDF("k", "seq", "ts")
    val r = EventWindows.eventTimeAudit(ev, "k", "seq", "ts").head()
    assert(r.getAs[Long]("n_events") == 7L)
    assert(r.getAs[Long]("n_late") == 2L)
    assert(r.getAs[Long]("n_keys_affected") == 2L)
    assert(r.getAs[Long]("max_regression_us") == 15000000L)
    assert(r.getAs[Long]("late_permille") == 285L)
    val ordered = EventWindows.eventTimeAudit(
      ev.filter(col("k") === 2L), "k", "seq", "ts").head()
    assert(ordered.getAs[Long]("n_late") == 0L &&
      ordered.getAs[Long]("max_regression_us") == 0L)
  }

  test("streamEventTimeAudit: incremental per-key state over a stream " +
      "folds to the SAME one-row audit as the batch replay") {
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // same log as the batch test, split mid-key across micro-batches so
    // state must carry the per-key max BETWEEN batches: key 1's late
    // event and key 3's whole history arrive in batch 2
    val batch1 = Seq((1L, 1L, t(10)), (1L, 2L, t(20)), (2L, 4L, t(1)))
    val batch2 = Seq((1L, 3L, t(5)), (2L, 5L, t(2)),
      (3L, 6L, t(30)), (3L, 7L, t(29)))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val out = EventWindows.streamEventTimeAudit(
      mem.toDF().toDF("k", "seq", "ts"), "k", "seq", "ts")
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("stream_eta_test").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      // the latest update per key carries its full running totals; the
      // global audit is the bounded fold over those |keys| rows
      val latest = spark.table("stream_eta_test")
        .groupBy("k").agg(
          max("n_events").as("n_events"), max("n_late").as("n_late"),
          max("max_regression_us").as("max_regression_us"))
      val got = latest.agg(
          sum("n_events").as("n_events"), sum("n_late").as("n_late"),
          sum(when(col("n_late") > 0, 1L).otherwise(0L))
            .as("n_keys_affected"),
          max("max_regression_us").as("max_regression_us"))
        .withColumn("late_permille", expr("(n_late * 1000) div n_events"))
        .head()
      val batch = EventWindows.eventTimeAudit(
        (batch1 ++ batch2).toDF("k", "seq", "ts"), "k", "seq", "ts").head()
      Seq("n_events", "n_late", "n_keys_affected", "max_regression_us",
        "late_permille").foreach { f =>
        assert(got.getAs[Long](f) == batch.getAs[Long](f),
          s"$f: stream ${got.getAs[Long](f)} != batch ${batch.getAs[Long](f)}")
      }
      assert(got.getAs[Long]("n_late") == 2L &&
        got.getAs[Long]("max_regression_us") == 15000000L)
    } finally q.stop()
  }

  test("tumbling: windows align to the hour grid, counts add up") {
    val out = EventWindows.tumbling(events, "ts", "1 hour")
    assert(out.agg(sum("n_events")).head().getLong(0) == events.count())
    val starts = out.select(minute(col("window_start")), second(col("window_start")))
      .distinct().collect()
    assert(starts.forall(r => r.getInt(0) == 0 && r.getInt(1) == 0))
  }

  test("lastTouchAttribution: conversions credit the nearest prior touch, " +
      "ties broken by id; first conversions attribute to null") {
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      (1L, 10L, t(1), "view", 0.0),
      (1L, 11L, t(2), "click", 0.0),
      (1L, 12L, t(3), "purchase", 9.99),   // -> click 11
      (1L, 13L, t(4), "purchase", 1.00),   // -> still click 11 (12 is a conversion)
      (2L, 20L, t(5), "purchase", 5.00),   // -> null (no prior touch)
      (2L, 21L, t(5), "view", 0.0),        // same ts as 20, larger id: after
      (2L, 22L, t(6), "purchase", 2.00))   // -> view 21
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = EventWindows.lastTouchAttribution(
        ev, "user_id", "ts", "event_id", "event_type", "purchase")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("touch_id")).map(_.toLong),
          r.getAs[String]("touch_type"))).toMap
    assert(out == Map(
      12L -> (Some(11L), "click"),
      13L -> (Some(11L), "click"),
      20L -> (None, null),
      22L -> (Some(21L), "view")))
  }

  test("sliding: each event lands in width/slide windows") {
    val out = EventWindows.sliding(events, "ts", "1 hour", "30 minutes")
    assert(out.agg(sum("n_events")).head().getLong(0) == 2 * events.count())
  }

  test("sessionizeBatch: known tiny timeline") {
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "c", 1.0, ""),
      (2L, Timestamp.valueOf("2024-01-01 00:10:00"), 7L, "c", 2.0, ""),
      (3L, Timestamp.valueOf("2024-01-01 02:00:00"), 7L, "c", 3.0, ""),
      (4L, Timestamp.valueOf("2024-01-01 00:05:00"), 8L, "c", 4.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventWindows.sessionizeBatch(rows, "user_id", "ts", gapSeconds = 1800)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    val u7s1 = out(0)
    assert(u7s1.getAs[Long]("n_events") == 2 && u7s1.getAs[Double]("total_value") == 3.0)
    val u7s2 = out(1)
    assert(u7s2.getAs[Long]("n_events") == 1 && u7s2.getAs[Double]("total_value") == 3.0)
    assert(out(2).getAs[Long]("user_id") == 8L)
  }

  test("funnel: strict in-order matching — re-orderings and missing " +
      "steps cap the furthest step; users without step 1 are excluded") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)), // full
      (2L, "click", t(1)), (2L, "view", t(2)),                // click first
      (3L, "view", t(1)), (3L, "purchase", t(2)),             // skipped click
      (4L, "click", t(1)), (4L, "purchase", t(2)),            // no view at all
      (5L, "view", t(1)), (5L, "purchase", t(2)), (5L, "click", t(3)) // p<c
    ).toDF("user_id", "event_type", "ts")
      .select($"user_id", $"ts", $"event_type")
    val got = EventWindows.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 5L -> 2), got.toString)
  }

  test("streamingFunnel matches batch funnel across out-of-order " +
      "micro-batches (earlier step-1 event arrives after a step-2 event)") {
    implicit val sqlCtx = spark.sqlContext
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val batch1 = Seq(
      (1L, t(5), "click"), (1L, t(6), "purchase"), // out of order: view later
      (2L, t(1), "view"), (2L, t(2), "click"))
    val batch2 = Seq(
      (1L, t(1), "view"), // arrives late: unlocks click@5 then purchase@6
      (2L, t(3), "purchase"),
      (3L, t(1), "click")) // never does step 1 -> no output
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = EventWindows.streamingFunnel(
      mem.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("stream_funnel_test").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      // furthest_step is monotone per user -> max-merge the update stream
      val got = spark.table("stream_funnel_test")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("furthest_step").as("f"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = EventWindows.funnel(
        (batch1 ++ batch2).toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(batch == Map(1L -> 3, 2L -> 3), batch.toString)
      assert(got == batch, s"stream=$got batch=$batch")
    } finally q.stop()
  }

  test("streaming tumbling over MemoryStream matches batch on same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventWindows.streamingTumbling(streamDf, "ts", "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_tumbling_test").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:10:00"), "a", 1.5),
        (Timestamp.valueOf("2024-01-01 00:20:00"), "a", 2.5),
        (Timestamp.valueOf("2024-01-01 01:10:00"), "b", 3.0))
      q.processAllAvailable()
      val got = spark.table("stream_tumbling_test")
        .orderBy("window_start", "event_type").collect()
      assert(got.length == 2)
      assert(got(0).getAs[Long]("n_events") == 2)
      assert(got(0).getAs[Double]("total_value") == 4.0)
      assert(got(1).getAs[String]("event_type") == "b")
    } finally q.stop()
  }

  test("streamIngest publishes each micro-batch as an atomic table version") {
    implicit val sqlCtx = spark.sqlContext
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    val dir = java.nio.file.Files.createTempDirectory("ingest_test").toString
    val lh = Catalog.registerLocalWorkspace(dir, "ws_ing", "lh_ing").lakehouses.head
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventWindows.streamIngest(
      mem.toDF().toDF("ts", "event_type", "value"), spark, lh, "bronze",
      accumulate = true)
    try {
      mem.addData((Timestamp.valueOf("2024-01-01 00:00:00"), "a", 1.0))
      q.processAllAvailable()
      assert(TableIO.selectTable(spark, lh, "bronze").count() == 1)
      val v1 = Versioned.latestVersion(Catalog.tablePath(lh, "bronze"))
      mem.addData((Timestamp.valueOf("2024-01-01 00:01:00"), "b", 2.0))
      q.processAllAvailable()
      // accumulated snapshot, advanced version
      assert(TableIO.selectTable(spark, lh, "bronze").count() == 2)
      assert(Versioned.latestVersion(Catalog.tablePath(lh, "bronze"))
        .exists(v => v1.exists(_ < v)))
    } finally q.stop()
  }

  test("streamIngest(accumulate) restart keeps previously accumulated rows") {
    implicit val sqlCtx = spark.sqlContext
    import graft.lakehouse.{Catalog, TableIO}
    val dir = java.nio.file.Files.createTempDirectory("ingest_acc_restart").toString
    val lh = Catalog.registerLocalWorkspace(dir, "ws_iar", "lh_iar").lakehouses.head
    val mem1 = MemoryStream[(Timestamp, String, Double)]
    val q1 = EventWindows.streamIngest(
      mem1.toDF().toDF("ts", "event_type", "value"), spark, lh, "bronze_r",
      accumulate = true)
    try {
      mem1.addData((Timestamp.valueOf("2024-01-01 00:00:00"), "a", 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // "restart": a brand-new query with no in-memory state — the published
    // table IS the accumulator, so batch 1's row must survive
    val mem2 = MemoryStream[(Timestamp, String, Double)]
    val q2 = EventWindows.streamIngest(
      mem2.toDF().toDF("ts", "event_type", "value"), spark, lh, "bronze_r",
      accumulate = true)
    try {
      mem2.addData((Timestamp.valueOf("2024-01-01 00:05:00"), "b", 2.0))
      q2.processAllAvailable()
      val types = TableIO.selectTable(spark, lh, "bronze_r")
        .select("event_type").collect().map(_.getString(0)).toSet
      assert(types == Set("a", "b"), types.toString)
    } finally q2.stop()
  }

  test("streamUpsert: per-batch MERGE with an atomic txn watermark — " +
      "updates converge, restart resumes, replayed batches skip") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    val wdir = java.nio.file.Files.createTempDirectory("su_test").toString
    val lh = Catalog.registerLocalWorkspace(wdir, "ws_su", "lh_su")
      .lakehouses.head
    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("su_ckpt").toString
    def rows(): Map[Long, String] =
      TableIO.selectTable(spark, lh, "su1").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val q = EventWindows.streamUpsert(mem.toDF().toDF("k", "v"), spark, lh,
      "su1", Seq("k"), checkpoint = Some(ckpt))
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(rows() == Map(1L -> "a", 2L -> "b"))
      mem.addData((2L, "B2"), (3L, "c")) // update + insert
      q.processAllAvailable()
      assert(rows() == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
    } finally q.stop()
    // the batch watermark committed atomically with the merge
    val dir = Catalog.tablePath(lh, "su1")
    val meta = Versioned.latestVersion(dir)
      .flatMap(Versioned.readManifest(dir, _)).get.meta
    assert(meta.get(s"txn:$ckpt").contains("1"), meta)
    // restart from the same checkpoint: new batches apply, version count
    // shows no replay of batches 0-1
    val vBefore = Versioned.committedVersions(dir).size
    val q2 = EventWindows.streamUpsert(mem.toDF().toDF("k", "v"), spark, lh,
      "su1", Seq("k"), checkpoint = Some(ckpt))
    try {
      mem.addData((1L, "A3"))
      q2.processAllAvailable()
      assert(rows() == Map(1L -> "A3", 2L -> "B2", 3L -> "c"))
    } finally q2.stop()
    assert(Versioned.committedVersions(dir).size == vBefore + 1)
    TableIO.dropTable(spark, lh, "su1")
  }

  test("streamIngestDeduped drops near-dups across and within batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.lakehouse.{Catalog, TableIO}
    val dir = java.nio.file.Files.createTempDirectory("ingest_dedup").toString
    val lh = Catalog.registerLocalWorkspace(dir, "ws_idd", "lh_idd").lakehouses.head
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the wide open field until sunset arrives quietly"
    val other = "completely different prose describing shuffle exchanges " +
      "and broadcast joins inside a distributed query engine at scale"
    val mem = MemoryStream[(Long, String)]
    val q = EventWindows.streamIngestDeduped(
      mem.toDF().toDF("doc_id", "text"), spark, lh, "silver",
      "doc_id", "text")
    try {
      // batch 1: two distinct docs + an in-batch near-dup of the first
      mem.addData((1L, base), (2L, other), (3L, base + " tail"))
      q.processAllAvailable()
      assert(TableIO.selectTable(spark, lh, "silver").count() == 2)
      // batch 2: a near-dup of doc 1 (drop) + one genuinely new doc (keep)
      mem.addData((4L, base + " edited"), (5L, "novel walrus migration notes " +
        "covering arctic routes and seasonal haul-out site selection"))
      q.processAllAvailable()
      val ids = TableIO.selectTable(spark, lh, "silver")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 5L), ids.toString)
    } finally q.stop()
  }

  test("streamIngestDeduped restart keeps history and still dedups against it") {
    implicit val sqlCtx = spark.sqlContext
    import graft.lakehouse.{Catalog, TableIO}
    val dir = java.nio.file.Files.createTempDirectory("ingest_restart").toString
    val lh = Catalog.registerLocalWorkspace(dir, "ws_irr", "lh_irr").lakehouses.head
    val base = "a long stable reference document about columnar storage " +
      "formats and predicate pushdown behavior in modern query engines"
    val mem1 = MemoryStream[(Long, String)]
    val q1 = EventWindows.streamIngestDeduped(
      mem1.toDF().toDF("doc_id", "text"), spark, lh, "silver_r", "doc_id", "text")
    try {
      mem1.addData((1L, base))
      q1.processAllAvailable()
    } finally q1.stop()
    // "restart": a brand-new query with fresh in-memory state
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventWindows.streamIngestDeduped(
      mem2.toDF().toDF("doc_id", "text"), spark, lh, "silver_r", "doc_id", "text")
    try {
      mem2.addData((2L, base + " tiny edit"), // near-dup of published doc 1
        (3L, "genuinely novel notes about watermark state eviction timing"))
      q2.processAllAvailable()
      val ids = TableIO.selectTable(spark, lh, "silver_r")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // history retained, near-dup of history dropped, new doc admitted
      assert(ids == Set(1L, 3L), ids.toString)
    } finally q2.stop()
  }

  test("streaming dedup drops re-delivered keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_id", "value")
    val deduped = EventWindows.streamingDedup(streamDf, Seq("event_id"),
      "ts", watermark = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup_test").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), "e1", 1.0),
        (Timestamp.valueOf("2024-01-01 00:05:00"), "e1", 1.0), // re-delivery
        (Timestamp.valueOf("2024-01-01 00:10:00"), "e2", 2.0))
      q.processAllAvailable()
      mem.addData( // next micro-batch re-delivers e1 again, adds e3
        (Timestamp.valueOf("2024-01-01 00:20:00"), "e1", 1.0),
        (Timestamp.valueOf("2024-01-01 00:30:00"), "e3", 3.0))
      q.processAllAvailable()
      val got = spark.table("stream_dedup_test").orderBy("ts").collect()
      assert(got.map(_.getAs[String]("event_id")).toSeq == Seq("e1", "e2", "e3"),
        got.mkString(","))
    } finally q.stop()
  }

  test("stream-stream interval join: purchases pick up clicks in the " +
      "lookback window across micro-batches, and match batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val cdf = clicks.toDF().toDF("user_id", "cts", "page")
    val pdf = purchases.toDF().toDF("user_id", "pts", "value")
    val joined = EventWindows.streamIntervalJoin(
      pdf, cdf, "user_id", "pts", "cts",
      lookback = "10 minutes", watermark = "1 hour")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_test").start()
    try {
      // click arrives FIRST micro-batch, matching purchase in the SECOND:
      // the join state must carry it across batches
      clicks.addData((1L, t("2024-01-01 00:00:00"), "home"),
        (1L, t("2024-01-01 00:20:00"), "pricing"),
        (2L, t("2024-01-01 00:00:00"), "other"))
      q.processAllAvailable()
      purchases.addData((1L, t("2024-01-01 00:25:00"), 9.99))
      q.processAllAvailable()
      val got = spark.table("ssj_test")
        .select("user_id", "page", "value").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      // only user 1's click within [00:15, 00:25] joins; 00:00 is outside
      // the lookback and user 2 never purchases
      assert(got == Set((1L, "pricing", 9.99)), got.mkString(","))
      // batch twin over the same rows agrees
      import spark.implicits._
      val bc = Seq((1L, t("2024-01-01 00:00:00"), "home"),
        (1L, t("2024-01-01 00:20:00"), "pricing"),
        (2L, t("2024-01-01 00:00:00"), "other")).toDF("user_id", "cts", "page")
      val bp = Seq((1L, t("2024-01-01 00:25:00"), 9.99))
        .toDF("user_id", "pts", "value")
      val batch = EventWindows.streamIntervalJoin(bp, bc, "user_id",
        "pts", "cts", lookback = "10 minutes", watermark = "1 hour")
        .select("user_id", "page", "value").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming session_window groups by gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "value")
    val agg = EventWindows.streamingSessions(streamDf, "user_id", "ts",
      gap = "30 minutes", watermark = "2 hours")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_session_test").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), 7L, 1.0),
        (Timestamp.valueOf("2024-01-01 00:10:00"), 7L, 2.0),
        (Timestamp.valueOf("2024-01-01 03:00:00"), 7L, 5.0))
      q.processAllAvailable()
      val got = spark.table("stream_session_test").orderBy("session_start").collect()
      assert(got.length == 2)
      assert(got(0).getAs[Long]("n_events") == 2)
      assert(got(1).getAs[Double]("total_value") == 5.0)
    } finally q.stop()
  }

  test("streamIngestGated routes each micro-batch's rows to gold or " +
      "quarantine with reasons, as versioned commits") {
    implicit val sqlCtx = spark.sqlContext
    import graft.lakehouse.{Catalog, TableIO}
    val dir = java.nio.file.Files.createTempDirectory("gate_stream").toString
    val lh = Catalog.registerLocalWorkspace(dir, "ws_gs", "lh_gs").lakehouses.head
    val mem = MemoryStream[(Long, Double)]
    val q = EventWindows.streamIngestGated(
      mem.toDF().toDF("k", "v"), spark, lh, "gold_s", "quar_s",
      Seq(Quality.InRange("v", 0.0, 10.0)))
    try {
      mem.addData((1L, 5.0), (2L, -1.0))
      q.processAllAvailable()
      mem.addData((3L, 99.0), (4L, 7.0))
      q.processAllAvailable()
      val gold = TableIO.selectTable(spark, lh, "gold_s").collect()
        .map(_.getLong(0)).toSet
      assert(gold == Set(1L, 4L), gold)
      val quar = TableIO.selectTable(spark, lh, "quar_s").collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(quar == Map(2L -> "in_range:v", 3L -> "in_range:v"), quar)
    } finally q.stop()
  }

  test("streamIngestGated: a replayed batch is skipped per destination — " +
      "exactly-once through crash/restart, half-landed batches self-heal") {
    implicit val sqlCtx = spark.sqlContext
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    import java.nio.file.Files
    val dir = Files.createTempDirectory("gate_replay").toString
    val lh = Catalog.registerLocalWorkspace(dir, "ws_gr", "lh_gr").lakehouses.head
    val checks = Seq(Quality.InRange("v", 0.0, 10.0))
    def version(name: String) =
      Versioned.latestVersion(Catalog.tablePath(lh, name))
    // batch 0 lands normally under an explicit appId
    val mem1 = MemoryStream[(Long, Double)]
    val q1 = EventWindows.streamIngestGated(
      mem1.toDF().toDF("k", "v"), spark, lh, "g_r", "q_r", checks,
      checkpoint = Some(Files.createTempDirectory("gr_c1").toString),
      appId = Some("gapp"))
    try {
      mem1.addData((1L, 5.0), (2L, -1.0)); q1.processAllAvailable()
    } finally q1.stop()
    assert(TableIO.selectTable(spark, lh, "g_r").count() == 1)
    assert(TableIO.selectTable(spark, lh, "q_r").count() == 1)
    val (gv, qv) = (version("g_r"), version("q_r"))
    // a FRESH checkpoint under the SAME appId replays batch 0 — both
    // watermarks cover it, so NOTHING lands (no rows, no versions)
    val mem2 = MemoryStream[(Long, Double)]
    val q2 = EventWindows.streamIngestGated(
      mem2.toDF().toDF("k", "v"), spark, lh, "g_r", "q_r", checks,
      checkpoint = Some(Files.createTempDirectory("gr_c2").toString),
      appId = Some("gapp"))
    try {
      mem2.addData((1L, 5.0), (2L, -1.0)); q2.processAllAvailable()
    } finally q2.stop()
    assert(TableIO.selectTable(spark, lh, "g_r").count() == 1,
      "replayed batch double-appended gold")
    assert(TableIO.selectTable(spark, lh, "q_r").count() == 1,
      "replayed batch double-appended quarantine")
    assert(version("g_r") == gv && version("q_r") == qv)
    // half-landed crash: gold committed batch 0, quarantine did not
    // (simulated by pre-writing gold with the txn marker) — the replay
    // lands ONLY the quarantine half
    TableIO.writeTable(spark, lh, "g_h",
      Seq((1L, 5.0)).toDF("k", "v"), extraMeta = Map("txn:happ" -> "0"))
    val mem3 = MemoryStream[(Long, Double)]
    val q3 = EventWindows.streamIngestGated(
      mem3.toDF().toDF("k", "v"), spark, lh, "g_h", "q_h", checks,
      checkpoint = Some(Files.createTempDirectory("gr_c3").toString),
      appId = Some("happ"))
    try {
      mem3.addData((1L, 5.0), (2L, -1.0)); q3.processAllAvailable()
    } finally q3.stop()
    assert(TableIO.selectTable(spark, lh, "g_h").count() == 1,
      "already-landed gold half re-landed")
    assert(TableIO.selectTable(spark, lh, "q_h").collect()
      .map(_.getLong(0)).toSeq == Seq(2L), "missing quarantine half lost")
  }

  test("conversionLatency: first-from to first-subsequent-to, exact " +
    "percentile ranks, non-converters counted in n_started only") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, t(0), "view"), (1L, t(1), "purchase"),   // 60 s
      (2L, t(0), "view"), (2L, t(5), "purchase"),   // 300 s
      (3L, t(2), "purchase"), (3L, t(4), "view"),   // purchase BEFORE view
      (4L, t(0), "view"))                           // never converts
      .toDF("user_id", "ts", "event_type")
    val got = EventWindows.conversionLatency(ev, "user_id", "ts",
      "event_type", "view", "purchase", permilles = Seq(500, 1000))
      .orderBy("p").collect()
    assert(got.forall(_.getAs[Long]("n_started") == 4L))
    assert(got.forall(_.getAs[Long]("n_converted") == 2L))
    // latencies {60, 300}: p500 -> rank 1 -> 60; p1000 -> rank 2 -> 300
    assert(got(0).getAs[Long]("latency_s") == 60L)
    assert(got(1).getAs[Long]("latency_s") == 300L)
  }
}
