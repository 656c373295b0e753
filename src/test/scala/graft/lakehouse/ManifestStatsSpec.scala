package graft.lakehouse

import java.nio.file.Files

/** Metadata-only column stats: answers must equal a real scan whenever
  * the operator agrees to answer, and every situation where the manifest
  * can no longer give an exact answer must refuse LOUDLY — a silently
  * stale min/max would be worse than a scan. */
class ManifestStatsSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("mstats_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_ms", "lh_ms").lakehouses.head
  }

  test("profile equals a real scan across multiple appends, with nulls " +
      "and an all-null column") {
    val a = Seq((1L, Some(10), None: Option[Long]),
      (2L, Some(3), None), (3L, None, None))
      .toDF("k", "v", "z")
    val b = Seq((4L, Some(-7), None: Option[Long]), (5L, None, None))
      .toDF("k", "v", "z")
    TableIO.dropTable(spark, lh, "ms1")
    TableIO.writeTable(spark, lh, "ms1", a)
    TableIO.appendTable(spark, lh, "ms1", b)
    val out = TableIO.manifestColumnStats(spark, lh, "ms1",
      Seq("k", "v", "z")).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSeq
    assert(out == Seq(
      ("k", 5L, 0L, "1", "5"),
      ("v", 5L, 2L, "-7", "10"),
      ("z", 5L, 5L, null, null)), out.toString)
  }

  test("empty staged files carry explicit zero-row stats: stats-only " +
      "consumers keep answering (the sf0.1 bench regression shape)") {
    // stage one real and one EMPTY parquet file — whether the writer
    // emits empty part files is path-dependent (the sf0.1 bench did),
    // so the fixture plants one explicitly
    val staging = Files.createTempDirectory("cfs_empty").toString
    Seq((1L, 5), (2L, 9)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(staging)
    Seq.empty[(Long, Int)].toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(staging)
    val stats = TableIO.collectFileStats(spark)(staging)
    val parquet = new java.io.File(staging).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    assert(parquet.length == 2)
    assert(stats.keySet == parquet.toSet,
      s"every staged file needs stats: ${stats.keySet} vs ${parquet.toSet}")
    val rowCounts = parquet.map(p =>
      TableIO.entryRows(Versioned.FileEntry(p, Some(stats(p)))).get).sorted
    assert(rowCounts.toSeq == Seq(0L, 2L), rowCounts.mkString(","))
    // the zero-row entry's column stats: all-null bounds, zero nulls —
    // maximally prunable, never "unknown"
    val empty = parquet.find(p => stats(p).contains("\"__rows\":\"0\"")).get
    assert(stats(empty).contains("\"k\":[null,null,\"0\"]"), stats(empty))
  }

  test("min/max folds in the TYPED domain, not string order") {
    // string-order min of {9, 10} is "10"; numeric min is 9 — the fold
    // must parse the stat strings into the column's domain
    TableIO.dropTable(spark, lh, "ms2")
    TableIO.writeTable(spark, lh, "ms2", Seq((1L, 9)).toDF("k", "v"))
    TableIO.appendTable(spark, lh, "ms2", Seq((2L, 10)).toDF("k", "v"))
    val r = TableIO.manifestColumnStats(spark, lh, "ms2", Seq("v"))
      .collect().head
    assert((r.getString(3), r.getString(4)) == ("9", "10"))
  }

  test("deletion vectors refuse: physical stats no longer describe " +
      "logical rows") {
    TableIO.dropTable(spark, lh, "ms3")
    TableIO.writeTable(spark, lh, "ms3",
      (1 to 100).map(i => (i.toLong, i)).toDF("k", "v"))
    TableIO.deleteFromTable(spark, lh, "ms3", "v <= 10",
      deletionVectors = true)
    val e = intercept[IllegalStateException] {
      TableIO.manifestColumnStats(spark, lh, "ms3", Seq("v"))
    }
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
  }

  test("string columns refuse (truncated bounds are not values); " +
      "unknown columns refuse") {
    TableIO.dropTable(spark, lh, "ms4")
    TableIO.writeTable(spark, lh, "ms4",
      Seq((1L, "abc")).toDF("k", "s"))
    val e1 = intercept[IllegalArgumentException] {
      TableIO.manifestColumnStats(spark, lh, "ms4", Seq("s"))
    }
    assert(e1.getMessage.contains("string column"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TableIO.manifestColumnStats(spark, lh, "ms4", Seq("nope"))
    }
    assert(e2.getMessage.contains("no column"), e2.getMessage)
  }

  test("manifestPartitionCounts: exact under deletion vectors, NULL " +
      "partition bucket reported, non-partition columns refuse") {
    val df = (1 to 200).map { i =>
      (i.toLong, if (i % 10 == 0) null else s"p${i % 3}", i)
    }.toDF("k", "part", "v")
    TableIO.dropTable(spark, lh, "mp1")
    TableIO.writeTable(spark, lh, "mp1", df, partitionBy = Seq("part"))
    TableIO.deleteFromTable(spark, lh, "mp1", "v <= 40",
      deletionVectors = true)
    val out = TableIO.manifestPartitionCounts(spark, lh, "mp1", "part")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val expect = TableIO.selectTable(spark, lh, "mp1")
      .groupBy("part").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(out == expect, s"metadata=$out scan=$expect")
    assert(out.contains(None), "null partition bucket must be reported")
    val e = intercept[IllegalStateException] {
      TableIO.manifestPartitionCounts(spark, lh, "mp1", "v")
    }
    assert(e.getMessage.contains("not single-valued"), e.getMessage)
  }

  test("zero Spark jobs: the profile is answered from the manifest alone") {
    TableIO.dropTable(spark, lh, "ms5")
    TableIO.writeTable(spark, lh, "ms5",
      (1 to 1000).map(i => (i.toLong, i % 13)).toDF("k", "v"))
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = TableIO.manifestColumnStats(spark, lh, "ms5", Seq("k", "v"))
      Thread.sleep(200) // let any (unexpected) job-start events land
      val before = counter.get()
      // building the frame must not have scanned anything; collecting the
      // 2-row local result may cost at most one trivial local job
      assert(before == 0,
        s"manifestColumnStats ran $before Spark job(s) while building")
      val rows = df.collect()
      assert(rows.map(_.getLong(1)).toSeq == Seq(1000L, 1000L))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("manifestSums: exact across appends with nulls and negatives, " +
      "all-null columns surface NULL, float columns refuse, DV refuses") {
    val a = Seq((1L, Some(-7), None: Option[Long]),
      (2L, Some(1000000000), None), (3L, None, None))
      .toDF("k", "v", "z")
    val b = Seq((4L, Some(42), None: Option[Long])).toDF("k", "v", "z")
    TableIO.dropTable(spark, lh, "msum1")
    TableIO.writeTable(spark, lh, "msum1", a)
    TableIO.appendTable(spark, lh, "msum1", b)
    val out = TableIO.manifestSums(spark, lh, "msum1", Seq("k", "v", "z"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(("k", 4L, "10"), ("v", 3L, "1000000035"),
      ("z", 0L, null)), out.toString)
    TableIO.dropTable(spark, lh, "msum2")
    TableIO.writeTable(spark, lh, "msum2",
      Seq((1L, 0.5)).toDF("k", "d"))
    val e2 = intercept[IllegalArgumentException] {
      TableIO.manifestSums(spark, lh, "msum2", Seq("d"))
    }
    assert(e2.getMessage.contains("integral"), e2.getMessage)
    TableIO.dropTable(spark, lh, "msum3")
    TableIO.writeTable(spark, lh, "msum3",
      (1 to 50).map(i => (i.toLong, i)).toDF("k", "v"))
    TableIO.deleteFromTable(spark, lh, "msum3", "v <= 10",
      deletionVectors = true)
    val e3 = intercept[IllegalStateException] {
      TableIO.manifestSums(spark, lh, "msum3", Seq("v"))
    }
    assert(e3.getMessage.contains("deletion vectors"), e3.getMessage)
  }


  test("manifestColumnStats asOfVersion: the profile time-travels by " +
      "reading the older manifest, no scan either way") {
    TableIO.dropTable(spark, lh, "mtt")
    TableIO.writeTable(spark, lh, "mtt", Seq((1L, 5), (2L, 9))
      .toDF("k", "v"))
    TableIO.appendTable(spark, lh, "mtt", Seq((3L, -4)).toDF("k", "v"))
    val v1 = TableIO.manifestColumnStats(spark, lh, "mtt", Seq("v"),
      asOfVersion = Some(1L)).collect().head
    val v2 = TableIO.manifestColumnStats(spark, lh, "mtt", Seq("v"))
      .collect().head
    assert((v1.getLong(1), v1.getString(3), v1.getString(4)) ==
      ((2L, "5", "9")))
    assert((v2.getLong(1), v2.getString(3), v2.getString(4)) ==
      ((3L, "-4", "9")))
    intercept[IllegalStateException] {
      TableIO.manifestColumnStats(spark, lh, "mtt", Seq("v"),
        asOfVersion = Some(99L))
    }
  }


  test("schemaTimeline: creation, widening, rename and drop surface; " +
      "schema-neutral commits contribute nothing") {
    TableIO.dropTable(spark, lh, "stl")
    TableIO.writeTable(spark, lh, "stl",
      Seq((1, 1.5f)).toDF("k", "v")) // v1: int, float
    TableIO.widenColumnType(spark, lh, "stl", "k",
      org.apache.spark.sql.types.LongType) // v2
    TableIO.appendTable(spark, lh, "stl",
      Seq((2L, 2.5f)).toDF("k", "v")) // v3: no schema change
    TableIO.writeTable(spark, lh, "stl",
      Seq((3L, "z")).toDF("k", "s")) // v4: drop v, add s
    val out = TableIO.schemaTimeline(spark, lh, "stl")
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 2, "k#v", "", ""),
      (2L, 2, "", "", "k:int->bigint"),
      (4L, 2, "s", "v", "")), out.mkString(","))
  }

}
