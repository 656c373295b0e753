package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

/** Portable HLL: integer-exact registers, accurate estimates, null
  * hygiene. Cross-engine register equality is the q192 oracle's job. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private def estimateOf(df: org.apache.spark.sql.DataFrame,
      valueCol: String, m: Int): Double = {
    val regs = Sketches.portableHllRegisters(df, valueCol, m)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    Sketches.hllEstimate(regs, m)
  }

  test("estimate lands within 15% of a 5000-distinct truth (m=64)") {
    val df = spark.range(20000).select((col("id") % 5000).as("v"))
    val est = estimateOf(df, "v", 64)
    assert(math.abs(est - 5000) / 5000.0 < 0.15, s"estimate $est")
  }

  test("small-range linear counting: 10 distinct estimates ~10") {
    val df = spark.range(100).select((col("id") % 10).as("v"))
    val est = estimateOf(df, "v", 64)
    assert(est > 8 && est < 12, s"estimate $est")
  }

  test("registers ignore nulls and duplicates cannot move them") {
    val base = Seq[java.lang.Long](1L, 2L, 3L, null).toDF("v")
    val dup = Seq[java.lang.Long](1L, 1L, 2L, 2L, 3L, null, null).toDF("v")
    val r1 = Sketches.portableHllRegisters(base, "v", 64)
      .orderBy("bucket").collect().toSeq
    val r2 = Sketches.portableHllRegisters(dup, "v", 64)
      .orderBy("bucket").collect().toSeq
    assert(r1 == r2, "registers are a set property, not a multiset one")
    assert(r1.nonEmpty && r1.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 64
      && r.getInt(1) >= 1 && r.getInt(1) <= 55))
  }

  test("grouped registers: per-group sketches are independent") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("g", "v")
    val regs = Sketches.portableHllRegisters(df, "v", 64, Seq("g"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val aRegs = regs.filter(_._1 == "a").map(t => (t._2, t._3)).toSet
    val bRegs = regs.filter(_._1 == "b").map(t => (t._2, t._3)).toSet
    assert(bRegs.subsetOf(aRegs), "b saw a subset of a's values")
    assert(aRegs.size == 2 && bRegs.size == 1)
  }

  // ---- Count-Min sketch ----------------------------------------------------

  test("CMS estimates never undercount and stay within the εN bound") {
    // zipfy-ish stream: value v appears ~20000/v times
    val df = spark.range(20000).select((lit(20000) / (col("id") + 1))
      .cast("long").as("v"))
    val truth = df.groupBy("v").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counters = Sketches.portableCmsCounters(df, "v",
      depth = 4, width = 256)
    val est = Sketches.cmsPointEstimates(counters, df.select("v"), "v",
      depth = 4, width = 256).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == truth.keySet)
    val n = 20000.0
    est.foreach { case (v, e) =>
      assert(e >= truth(v), s"CMS undercounted $v: $e < ${truth(v)}")
      // ε = e/width per row; min over 4 rows makes exceeding 4εN
      // astronomically unlikely — a loose deterministic-enough bound
      assert(e - truth(v) <= 4 * math.E / 256 * n,
        s"CMS overcount for $v out of bound: $e vs ${truth(v)}")
    }
  }

  test("rollingHllRegisters: a window's registers equal the one-shot " +
      "sketch of its days' union; window=1 equals daily") {
    import java.sql.Timestamp
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // users per day: d1 {1,2}, d2 {2,3}, d4 {9}; no events on d3
    val ev = Seq((1L, t(1)), (2L, t(1)), (2L, t(2)), (3L, t(2)),
      (9L, t(4))).toDF("user_id", "ts")
    val rolled = Sketches.rollingHllRegisters(ev, "user_id", "ts",
      windowDays = 3, m = 16).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Int]("bucket"),
        r.getAs[Int]("r"))).toSet
    def oneShot(userDays: Seq[(Long, Int)]) = Sketches
      .portableHllRegisters(
        userDays.map { case (u, d) => (u, t(d)) }.toDF("user_id", "ts"),
        "user_id", m = 16)
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Int]("r"))).toSet
    val day2 = java.time.LocalDate.parse("2024-01-02").toEpochDay
    // window ending day2 spans d1+d2: union {1,2,3}
    assert(rolled.filter(_._1 == day2).map(x => (x._2, x._3)) ==
      oneShot(Seq((1L, 1), (2L, 1), (3L, 2))))
    // window ending day4 spans d2..d4: union {2,3,9}
    assert(rolled.filter(_._1 == day2 + 2).map(x => (x._2, x._3)) ==
      oneShot(Seq((2L, 2), (3L, 2), (9L, 4))))
    // no phantom windows beyond the last data day
    assert(rolled.map(_._1).max == day2 + 2)
    // windowDays=1 degenerates to the per-day registers
    val w1 = Sketches.rollingHllRegisters(ev, "user_id", "ts",
      windowDays = 1, m = 16).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Int]("bucket"),
        r.getAs[Int]("r"))).toSet
    assert(w1.filter(_._1 == day2).map(x => (x._2, x._3)) ==
      oneShot(Seq((2L, 2), (3L, 2))))
  }

  test("CMS counters stream: complete-mode cells over a MemoryStream " +
      "equal the batch counters on the same data") {
    // The counter agg is sum-per-(row,slot) cell, so Structured
    // Streaming keeps depth*width longs of state and every micro-batch
    // folds incrementally — the q192 "the agg IS the incremental
    // operator" shape for frequencies.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val agg = Sketches.portableCmsCounters(mem.toDF().toDF("v"), "v",
      depth = 4, width = 64)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream_test").start()
    try {
      mem.addData(1L to 300L: _*); q.processAllAvailable()
      mem.addData((1L to 900L).map(_ % 50): _*); q.processAllAvailable()
      val streamed = spark.table("cms_stream_test").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val batchDf = (1L to 300L).toDF("v")
        .union((1L to 900L).map(_ % 50).toDF("v"))
      val batch = Sketches.portableCmsCounters(batchDf, "v",
          depth = 4, width = 64).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        "streamed CMS state diverged from the batch counters")
    } finally q.stop()
  }

  test("CMS is linear: counters of a union = cell-wise sum of the parts") {
    val a = spark.range(0, 5000).select((col("id") % 97).as("v"))
    val b = spark.range(5000, 12000).select((col("id") % 131).as("v"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.portableCmsCounters(df, "v", depth = 4, width = 64)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = cells(a.unionByName(b))
    val parts = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(whole == parts, "CMS linearity broken")
  }

  test("CMS ignores nulls; probes not in the stream can read 0") {
    import spark.implicits._
    val df = Seq[java.lang.Long](1L, 1L, 2L, null).toDF("v")
    val counters = Sketches.portableCmsCounters(df, "v",
      depth = 4, width = 256)
    assert(counters.agg(sum("cnt")).head().getLong(0) == 12L,
      "3 non-null values x 4 rows")
    val probes = Seq[java.lang.Long](1L, 999999L, null).toDF("v")
    val est = Sketches.cmsPointEstimates(counters, probes, "v",
      depth = 4, width = 256).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(1L) == 2L && est.size == 2, "null probe dropped")
    assert(est(999999L) <= 2L, "unseen probe reads at most a collision")
  }

  test("CMS guards: non-power-of-two width and oversized width refused") {
    val df = spark.range(4).select(col("id").as("v"))
    intercept[IllegalArgumentException] {
      Sketches.portableCmsCounters(df, "v", depth = 4, width = 100)
    }
    intercept[IllegalArgumentException] {
      Sketches.portableCmsCounters(df, "v", depth = 6, width = 2048)
    }
  }

  // ---- KMV ----------------------------------------------------------------

  private def kmvOf(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
    Sketches.kmvSketch(df, "v", k).collect()
      .head.getSeq[Long](0)

  test("KMV: unsaturated sketch is the exact distinct hash set; estimate " +
      "equals the exact count") {
    val df = Seq[java.lang.Long](1L, 2L, 2L, 3L, null).toDF("v")
    val sk = kmvOf(df, 64)
    assert(sk.length == 3 && sk == sk.sorted, sk)
    val est = Sketches.kmvSketch(df, "v", 64)
      .select(Sketches.kmvEstimateCol(col("kmv"), 64)).head().getLong(0)
    assert(est == 3L, s"unsaturated estimate must be exact, got $est")
  }

  test("KMV: saturated estimate lands within 25% of a 5000-distinct " +
      "truth (k=64) and duplicates/partitioning cannot move the sketch") {
    val df = spark.range(20000).select((col("id") % 5000).as("v"))
    val sk = kmvOf(df, 64)
    assert(sk.length == 64 && sk == sk.sorted)
    assert(kmvOf(df.repartition(13), 64) == sk,
      "sketch is a pure set property — partitioning must not matter")
    val est = Sketches.kmvSketch(df, "v", 64)
      .select(Sketches.kmvEstimateCol(col("kmv"), 64)).head().getLong(0)
    assert(math.abs(est - 5000L) / 5000.0 < 0.25, s"estimate $est")
  }

  test("KMV: merging two sketches equals sketching the unioned stream") {
    val a = spark.range(0, 3000).select(col("id").as("v"))
    val b = spark.range(2000, 5000).select(col("id").as("v"))
    val k = 64
    val skA = kmvOf(a, k)
    val skB = kmvOf(b, k)
    val direct = kmvOf(a.union(b), k)
    val merged = (skA ++ skB).distinct.sorted.take(k)
    assert(merged == direct,
      "bottom-k(A ∪ B) must equal bottom-k(bottom-k(A) ∪ bottom-k(B))")
  }

  test("KMV set algebra: disjoint intersection reads ~0, identical " +
      "intersection reads ~union, union estimate tracks truth") {
    val k = 64
    val two = Sketches.kmvSketch(
      spark.range(12000).select(
        when(col("id") < 6000, "a").otherwise("b").as("g"),
        (col("id") % 6000 + when(col("id") < 6000, 0).otherwise(100000))
          .as("v")),
      "v", k, groupCols = Seq("g"))
    val Seq(skA, skB) = two.orderBy("g").collect()
      .map(_.getSeq[Long](1)).toSeq
    val pair = Seq((skA, skB)).toDF("a", "b")
    val row = pair.select(
      Sketches.kmvEstimateCol(
        Sketches.kmvMergedCol(col("a"), col("b"), k), k).as("u"),
      Sketches.kmvIntersectionCol(col("a"), col("b"), k).as("i")).head()
    val (u, i) = (row.getLong(0), row.getLong(1))
    assert(math.abs(u - 12000L) / 12000.0 < 0.3, s"union estimate $u")
    assert(i < 12000L / 10, s"disjoint intersection estimate $i")
    val selfRow = pair.select(
      Sketches.kmvIntersectionCol(col("a"), col("a"), k).as("i"),
      Sketches.kmvEstimateCol(col("a"), k).as("e")).head()
    assert(selfRow.getLong(0) == selfRow.getLong(1),
      "A ∩ A must estimate exactly |A| (ρ = k)")
  }

  test("KMV guard: k < 2 refused") {
    val df = spark.range(4).select(col("id").as("v"))
    intercept[IllegalArgumentException] {
      Sketches.kmvSketch(df, "v", 1)
    }
  }

  // ---- fixed-grid rank sketch ------------------------------------------

  private def qsk(df: org.apache.spark.sql.DataFrame) =
    Sketches.quantileSketch(df, "v", lo = 0L, hi = 1000000L, buckets = 16,
      scale = 1000L)

  test("quantile sketch merges by addition: sketch(A) + sketch(B) == " +
      "sketch(A union B), cell for cell") {
    import spark.implicits._
    val a = (0 until 400).map(i => (i * 997 % 900).toDouble).toDF("v")
    val b = (0 until 300).map(i => (i * 131 % 1100 - 50).toDouble).toDF("v")
    def cells(df: org.apache.spark.sql.DataFrame) =
      qsk(df).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (ca, cb) = (cells(a), cells(b))
    val merged = (ca.keySet ++ cb.keySet).map(k =>
      k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
    assert(cells(a.union(b)) == merged)
  }

  test("quantile answers are the grid floor of the exact quantile — " +
      "within one cell width, never above") {
    import spark.implicits._
    val vals = (1 to 1000).map(_.toDouble)
    val df = vals.toDF("v")
    val got = Sketches.quantilesFromSketch(qsk(df), Seq(500, 900, 990),
        lo = 0L, hi = 1000000L, buckets = 16)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // cell width = 1e6/16 = 62500 scaled units = 62.5 value units
    Seq(500 -> 500.0, 900 -> 900.0, 990 -> 990.0).foreach { case (p, exact) =>
      val v = got(p) / 1000.0
      assert(v <= exact && v > exact - 62.5 - 1e-9, s"p=$p got $v exact $exact")
    }
  }

  test("quantile sketch guards: inverted domain and overflow refused") {
    import spark.implicits._
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Sketches.quantileSketch(df, "v", lo = 10L, hi = 10L, buckets = 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.quantileSketch(df, "v", lo = 0L, hi = Long.MaxValue,
        buckets = 1024)
    }
  }

  test("portableHllRegisters runs UNCHANGED as a streaming aggregation: " +
      "complete-mode registers over a MemoryStream equal the batch " +
      "registers on the same data") {
    // The sketch agg is max-per-bucket, so Structured Streaming keeps
    // exactly m integers of state per group and every micro-batch merges
    // incrementally — no operator changes, no foreachBatch plumbing.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val agg = Sketches.portableHllRegisters(mem.toDF().toDF("v"), "v", m = 32)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream_test").start()
    try {
      mem.addData(1L to 500L: _*); q.processAllAvailable()
      mem.addData(300L to 800L: _*); q.processAllAvailable() // overlap re-observed
      val got = spark.table("hll_stream_test").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toMap
      val batch = Sketches.portableHllRegisters(
        (1L to 800L).toDF("v"), "v", m = 32).collect()
        .map(r => (r.getInt(0), r.getInt(1))).toMap
      assert(got == batch, s"stream=$got batch=$batch")
      val est = Sketches.hllEstimate(got.toSeq, 32)
      assert(est > 800 * 0.7 && est < 800 * 1.3, s"estimate $est")
    } finally q.stop()
  }

  test("persisted KMV sketch table: batch folds equal the one-shot " +
      "sketch in any fold order; new groups join the state") {
    import graft.lakehouse.{Catalog, TableIO}
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("kmv_state_test").toString,
      "ws_kmv", "lh_kmv").lakehouses.head
    val all = spark.range(3000)
      .select((col("id") % 3).cast("string").as("g"), (col("id") % 700).as("v"))
    def stateOf(name: String): Map[String, Seq[Long]] =
      TableIO.selectTable(spark, lh, name).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    // fold even-then-odd ids into one state, odd-then-even into another
    val b1 = all.filter(col("v") % 2 === 0)
    val b2 = all.filter(col("v") % 2 =!= 0)
    Sketches.kmvSketchTableUpdate(spark, lh, "st_a", b1, "v", 64, Seq("g"))
    Sketches.kmvSketchTableUpdate(spark, lh, "st_a", b2, "v", 64, Seq("g"))
    Sketches.kmvSketchTableUpdate(spark, lh, "st_b", b2, "v", 64, Seq("g"))
    Sketches.kmvSketchTableUpdate(spark, lh, "st_b", b1, "v", 64, Seq("g"))
    Sketches.kmvSketchTableUpdate(spark, lh, "st_c", all, "v", 64, Seq("g"))
    val (a, b, c) = (stateOf("st_a"), stateOf("st_b"), stateOf("st_c"))
    assert(a == c, "fold(evens)+fold(odds) != one-shot sketch")
    assert(b == c, "fold order changed the state")
    // a batch introducing a brand-new group extends the state
    Sketches.kmvSketchTableUpdate(spark, lh, "st_a",
      Seq(("zz", 1L)).toDF("g", "v"), "v", 64, Seq("g"))
    val a2 = stateOf("st_a")
    assert(a2.keySet == c.keySet + "zz" && a2("zz").size == 1)
    assert(a2.filterKeys(_ != "zz").toMap == c.toMap)
    Seq("st_a", "st_b", "st_c").foreach(TableIO.dropTable(spark, lh, _))
  }

  test("streamKmvSketch: micro-batches fold exactly once (txn marker " +
      "skips replays) and the state equals the one-shot sketch") {
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    implicit val sqlCtx = spark.sqlContext
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("kmv_stream_test").toString,
      "ws_kmvs", "lh_kmvs").lakehouses.head
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = Sketches.streamKmvSketch(mem.toDF().toDF("g", "v"), spark, lh,
      "kmv_stream", "v", k = 64, groupCols = Seq("g"),
      appId = Some("kmvs_test"))
    try {
      val b1 = Seq(("a", 1L), ("a", 2L), ("b", 10L))
      val b2 = Seq(("a", 2L), ("b", 11L), ("c", 5L))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      def stateOf = TableIO.selectTable(spark, lh, "kmv_stream").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      import spark.implicits._
      val oneShot = Sketches.kmvSketch(
          (b1 ++ b2).toDF("g", "v"), "v", 64, Seq("g"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList)
        .toMap
      assert(stateOf == oneShot, s"stream=$stateOf oneShot=$oneShot")
      // replayed batch id: the watermark skips it, no new state version
      val dir = Catalog.tablePath(lh, "kmv_stream")
      val vBefore = Versioned.latestVersion(dir).get
      val replayed = Sketches.foldKmvBatchExactlyOnce(spark, lh,
        "kmv_stream", Seq(("zz", 1L)).toDF("g", "v"), "v", 64, Seq("g"),
        Some("txn:kmvs_test"), batchId = 1L)
      assert(!replayed && Versioned.latestVersion(dir).get == vBefore,
        "replayed batch must not fold or version the state forward")
      // a genuinely new batch id folds
      assert(Sketches.foldKmvBatchExactlyOnce(spark, lh, "kmv_stream",
        Seq(("zz", 1L)).toDF("g", "v"), "v", 64, Seq("g"),
        Some("txn:kmvs_test"), batchId = 2L))
      assert(stateOf.contains("zz"))
    } finally q.stop()
  }

  test("sketchQuantileError: error bounded by one grid cell; exact " +
    "median of 1..100 recovered on the integer grid") {
    import spark.implicits._
    val df = (1 to 100).map(_.toLong).toDF("v")
    val got = Sketches.sketchQuantileError(df, "v", lo = 0L, hi = 128L,
      buckets = 128, scale = 1L, permilles = Seq(500, 900))
      .orderBy("p").collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Long]("abs_err_scaled") <=
        r.getAs[Long]("cell_bound_scaled"))
    }
    // one value per unit cell: the sketch answer IS the exact rank stat
    assert(got.forall(r =>
      r.getAs[Long]("sketch_scaled") == r.getAs[Long]("exact_scaled")))
    assert(got.head.getAs[Long]("exact_scaled") == 50L)
  }

  test("cmsAccuracyReport: estimates never undercount and are exact " +
    "when the sketch is wide enough") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i % 10).toLong).toDF("k")
    val probes = Seq(0L, 3L, 7L).toDF("k")
    val got = Sketches.cmsAccuracyReport(df, "k", depth = 4,
      width = 256, probes = probes).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L, "CMS is one-sided")
      assert(r.getAs[Long]("exact_count") == 30L)
    }
    // 10 distinct keys in 256 buckets x 4 rows: no collisions expected
    assert(got.forall(_.getAs[Long]("overcount") == 0L))
  }

  test("hllEstimatePortable: ~exact via linear counting at small " +
    "cardinality, within 20% at 5k distinct, empty input -> 0-ish") {
    import spark.implicits._
    val small = (1 to 40).map(_.toLong).toDF("v")
    val s = Sketches.hllEstimatePortable(small, "v").head()
    // linear-counting regime: 64*ln(64/zeros) is within a few % at n=40
    assert(math.abs(s.getAs[Double]("estimate") - 40.0) < 8.0, s.toString)
    assert(s.getAs[Long]("n_buckets_used") +
      s.getAs[Long]("n_zero_buckets") == 64L)
    val big = (1 to 5000).map(_.toLong).toDF("v")
    val b = Sketches.hllEstimatePortable(big, "v").head()
    val est = b.getAs[Double]("estimate")
    assert(est > 4000 && est < 6000, s"estimate $est off at 5k")
    // the scaled harmonic denominator is exact and deterministic
    val b2 = Sketches.hllEstimatePortable(big, "v").head()
    assert(b.getAs[Long]("s_scaled") == b2.getAs[Long]("s_scaled"))
  }

  test("amsF2Sketch: exact F2, internally-consistent rel-err, " +
      "partition-order independent, m guarded") {
    import spark.implicits._
    // counts: a=3, b=2, c=1 -> F2 = 9 + 4 + 1 = 14
    val rows = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    def run(parts: Int) = Sketches.amsF2Sketch(
      rows.repartition(parts), "k", m = 16).head()
    val r = run(1)
    assert(r.getAs[Long]("exact_f2") == 14L, r.toString)
    assert(r.getAs[Int]("m") == 16)
    val med2 = r.getAs[Long]("med2_estimate")
    assert(med2 >= 0L, "squares can't go negative")
    assert(r.getAs[Long]("rel_err_permille") ==
      math.abs(med2 - 28L) * 1000L / 28L)
    assert(run(5).getAs[Long]("med2_estimate") == med2,
      "sha-derived signs must be partition-order independent")
    intercept[IllegalArgumentException] {
      Sketches.amsF2Sketch(rows, "k", m = 15)
    }
  }

  test("kmvANotBCol: disjoint unsaturated sets difference exactly, " +
    "identical sets difference to zero") {
    import spark.implicits._
    val k = 64
    val a = Sketches.kmvSketch((1L to 40L).toDF("v"), "v", k)
      .select(col("kmv").as("ka"))
    val b = Sketches.kmvSketch((41L to 80L).toDF("v"), "v", k)
      .select(col("kmv").as("kb"))
    val d = a.crossJoin(b).select(
      Sketches.kmvANotBCol(col("ka"), col("kb"), k).as("ab"),
      Sketches.kmvANotBCol(col("ka"), col("ka"), k).as("aa")).head()
    assert(d.getAs[Long]("ab") == 40L, d.toString)
    assert(d.getAs[Long]("aa") == 0L)
  }

  test("bloomFprAudit: member probes always hit (no false negatives), " +
      "disjoint probes stay near the theory rate, guards fire") {
    import spark.implicits._
    val members = (1L to 200L).toDF("key")
    // probing with the members themselves: every position is set
    val self = Sketches.bloomFprAudit(members, "key",
      members.withColumnRenamed("key", "p"), "p",
      mBits = 4096, k = 3).head()
    assert(self.getAs[Long]("n_false_positives") == 200L,
      "a member must always pass its own filter")
    assert(self.getAs[Long]("n_members") == 200L)
    assert(self.getAs[Long]("n_bits_set") <= 600L)
    // disjoint probes: sparse filter (600/4096 bits) -> low measured FPR
    val disjoint = Sketches.bloomFprAudit(members, "key",
      (10001L to 11000L).toDF("p"), "p", mBits = 4096, k = 3).head()
    assert(disjoint.getAs[Long]("n_probes") == 1000L)
    assert(disjoint.getAs[Long]("fpr_permille") < 50L,
      s"expected sparse-filter FPR well under 5%: $disjoint")
    val theory = disjoint.getAs[Double]("fpr_theory")
    assert(theory > 0.0 && theory < 0.01, s"theory $theory")
    intercept[IllegalArgumentException] {
      Sketches.bloomFprAudit(members, "key", members, "key",
        mBits = 100, k = 3)
    }
  }
}
