package graft.lakehouse

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance contracts: a refresh folds
  * the change feed into the snapshot and lands exactly where a full
  * recompute would; groups reaching zero rows vanish; new groups appear;
  * an up-to-date view refreshes as a no-op; unaffected view files are
  * inherited byte-identical (the O(changes) cost model). */
class MatViewSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("mv_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_mv", "lh_mv").lakehouses.head
  }

  private def fullRecompute(name: String): Set[(String, Long, Long)] =
    TableIO.selectTable(spark, lh, name)
      .groupBy("g").agg(count(lit(1)).as("mv_count"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def viewRows(view: String): Set[(String, Long, Long)] =
    TableIO.selectTable(spark, lh, view)
      .select("g", "mv_count", "sum_v") // partitioned reads reorder columns
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("refresh after merge+delete matches a full recompute, including " +
      "updated, inserted, and fully-deleted groups") {
    val base = (1 to 100).map(i =>
      (i.toLong, if (i <= 90) s"g${i % 9}" else "doomed", i.toLong))
      .toDF("k", "g", "v")
    TableIO.writeTable(spark, lh, "mv_src", base)
    TableIO.enableChangeFeed(spark, lh, "mv_src")
    MatView.createAggView(spark, lh, "mv_agg", "mv_src", Seq("g"), Seq("v"))
    assert(viewRows("mv_agg") == fullRecompute("mv_src"))

    // update some rows (doubles their v), insert a brand-new group, and
    // wipe out the 'doomed' group entirely
    TableIO.mergeTable(spark, lh, "mv_src",
      ((1 to 20).map(i => (i.toLong, s"g${i % 9}", 2L * i)) :+
        (200L, "brandnew", 7L)).toDF("k", "g", "v"), Seq("k"))
    TableIO.deleteFromTable(spark, lh, "mv_src", "g = 'doomed'")

    MatView.refreshAggView(spark, lh, "mv_agg")
    val got = viewRows("mv_agg")
    assert(got == fullRecompute("mv_src"))
    assert(got.exists(_._1 == "brandnew"), "new group must appear")
    assert(!got.exists(_._1 == "doomed"), "zero-count group must vanish")
    TableIO.dropTable(spark, lh, "mv_src")
    TableIO.dropTable(spark, lh, "mv_agg")
  }

  test("no-op refresh (source unchanged) commits nothing; a second " +
      "refresh after changes is idempotent") {
    val base = (1 to 50).map(i => (i.toLong, s"g${i % 5}", i.toLong))
      .toDF("k", "g", "v")
    TableIO.writeTable(spark, lh, "mv_src2", base)
    TableIO.enableChangeFeed(spark, lh, "mv_src2")
    MatView.createAggView(spark, lh, "mv_agg2", "mv_src2", Seq("g"), Seq("v"))
    val dir = Catalog.tablePath(lh, "mv_agg2")
    val vBefore = Versioned.latestVersion(dir).get
    MatView.refreshAggView(spark, lh, "mv_agg2") // nothing to fold
    assert(Versioned.latestVersion(dir).get == vBefore,
      "an up-to-date view must not commit a new version")

    TableIO.mergeTable(spark, lh, "mv_src2",
      Seq((1L, "g1", 100L)).toDF("k", "g", "v"), Seq("k"))
    MatView.refreshAggView(spark, lh, "mv_agg2")
    val after1 = viewRows("mv_agg2")
    MatView.refreshAggView(spark, lh, "mv_agg2") // nothing new to fold
    assert(viewRows("mv_agg2") == after1, "refresh must be idempotent")
    assert(after1 == fullRecompute("mv_src2"))
    TableIO.dropTable(spark, lh, "mv_src2")
    TableIO.dropTable(spark, lh, "mv_agg2")
  }

  test("refresh rewrites only view files containing changed groups; the " +
      "rest are inherited byte-identical") {
    // partition the VIEW by group so group→file mapping is deterministic
    val base = (1 to 100).map(i => (i.toLong, s"g${i % 4}", i.toLong))
      .toDF("k", "g", "v")
    TableIO.writeTable(spark, lh, "mv_src3", base)
    TableIO.enableChangeFeed(spark, lh, "mv_src3")
    MatView.createAggView(spark, lh, "mv_agg3", "mv_src3", Seq("g"), Seq("v"))
    // re-write the view partitioned by g, preserving the mv metadata
    val mvDir = Catalog.tablePath(lh, "mv_agg3")
    val meta = Versioned.readManifest(mvDir,
      Versioned.latestVersion(mvDir).get).get.meta
    TableIO.writeTable(spark, lh, "mv_agg3",
      TableIO.selectTable(spark, lh, "mv_agg3"), partitionBy = Seq("g"),
      extraMeta = meta)
    val before = TableIO.currentFiles(lh, "mv_agg3").map { p =>
      p.toString -> (Files.size(p), Files.getLastModifiedTime(p).toMillis)
    }.toMap
    assert(before.keys.exists(_.contains("/g=g3/")))

    // change only group g1
    TableIO.mergeTable(spark, lh, "mv_src3",
      Seq((1L, "g1", 999L)).toDF("k", "g", "v"), Seq("k"))
    MatView.refreshAggView(spark, lh, "mv_agg3")
    val after = TableIO.currentFiles(lh, "mv_agg3").map { p =>
      p.toString -> (Files.size(p), Files.getLastModifiedTime(p).toMillis)
    }.toMap
    assert(after.filter(_._1.contains("/g=g3/")) ==
      before.filter(_._1.contains("/g=g3/")),
      "untouched group's file was rewritten by the refresh")
    assert(viewRows("mv_agg3") == fullRecompute("mv_src3"))
    TableIO.dropTable(spark, lh, "mv_src3")
    TableIO.dropTable(spark, lh, "mv_agg3")
  }

  test("NULL group keys refresh correctly (null-safe matching): no " +
      "stranded stale row, no duplicate") {
    val base = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, null, 10L), (2L, null, 20L), (3L, "g1", 5L), (4L, "g1", 6L))
      .toDF("k", "g", "v")
    TableIO.writeTable(spark, lh, "mv_srcn", base)
    TableIO.enableChangeFeed(spark, lh, "mv_srcn")
    MatView.createAggView(spark, lh, "mv_aggn", "mv_srcn", Seq("g"), Seq("v"))
    // change the NULL group from both sides: add a row, delete a row
    TableIO.appendTable(spark, lh, "mv_srcn",
      Seq[(java.lang.Long, String, java.lang.Long)]((5L, null, 30L))
        .toDF("k", "g", "v"))
    TableIO.deleteFromTable(spark, lh, "mv_srcn", "k = 1")
    MatView.refreshAggView(spark, lh, "mv_aggn")
    val rows = TableIO.selectTable(spark, lh, "mv_aggn")
      .select("g", "mv_count", "sum_v").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    val nullRows = rows.filter(_._1.isEmpty)
    assert(nullRows.length == 1,
      s"expected exactly ONE null-group view row, got ${nullRows.toSeq}")
    assert(nullRows.head == ((None, 2L, 50L)), // rows k=2 (20) + k=5 (30)
      s"null group must fold deltas into the old row, got ${nullRows.head}")
    assert(rows.filter(_._1.contains("g1")).head == ((Some("g1"), 2L, 11L)))
    TableIO.dropTable(spark, lh, "mv_srcn")
    TableIO.dropTable(spark, lh, "mv_aggn")
  }

  test("all-null measure group: sum goes back to NULL (not 0) when the " +
      "last non-null value is deleted") {
    val base = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, "g", 10L), (2L, "g", null), (3L, "h", 7L))
      .toDF("k", "g", "v")
    TableIO.writeTable(spark, lh, "mv_srca", base)
    TableIO.enableChangeFeed(spark, lh, "mv_srca")
    MatView.createAggView(spark, lh, "mv_agga", "mv_srca", Seq("g"), Seq("v"))
    TableIO.deleteFromTable(spark, lh, "mv_srca", "k = 1")
    MatView.refreshAggView(spark, lh, "mv_agga")
    val rows = TableIO.selectTable(spark, lh, "mv_agga")
      .select("g", "mv_count", "sum_v")
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(rows("g") == (1L, None),
      s"all-null group must sum to NULL, got ${rows("g")}")
    assert(rows("h") == (1L, Some(7L)))
    TableIO.dropTable(spark, lh, "mv_srca")
    TableIO.dropTable(spark, lh, "mv_agga")
  }

  test("min/max views: inserts fold in; deleting a stored extremum " +
      "triggers the group rescan and lands on the full recompute") {
    val base = Seq(
      (1L, "a", 10L), (2L, "a", 50L), (3L, "a", 90L),
      (4L, "b", 5L), (5L, "b", 7L)).toDF("k", "g", "v")
    TableIO.writeTable(spark, lh, "mv_srcm", base)
    TableIO.enableChangeFeed(spark, lh, "mv_srcm")
    MatView.createAggView(spark, lh, "mv_aggm", "mv_srcm", Seq("g"),
      Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
    def minmax(): Map[String, (Long, Long)] =
      TableIO.selectTable(spark, lh, "mv_aggm")
        .select("g", "min_v", "max_v").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(minmax() == Map("a" -> ((10L, 90L)), "b" -> ((5L, 7L))))

    // insert-only change: no rescan needed, extrema fold via least/greatest
    TableIO.appendTable(spark, lh, "mv_srcm",
      Seq((6L, "a", 3L), (7L, "b", 100L)).toDF("k", "g", "v"))
    MatView.refreshAggView(spark, lh, "mv_aggm")
    assert(minmax() == Map("a" -> ((3L, 90L)), "b" -> ((5L, 100L))))

    // delete the stored max of 'a' (90) AND the stored min of 'b' (5):
    // both groups must rescan and land on the true new extrema
    TableIO.deleteFromTable(spark, lh, "mv_srcm", "k = 3 OR k = 4")
    MatView.refreshAggView(spark, lh, "mv_aggm")
    assert(minmax() == Map("a" -> ((3L, 50L)), "b" -> ((7L, 100L))))

    // deleting a NON-extremum row must not disturb min/max
    TableIO.deleteFromTable(spark, lh, "mv_srcm", "k = 2")
    MatView.refreshAggView(spark, lh, "mv_aggm")
    assert(minmax() == Map("a" -> ((3L, 10L)), "b" -> ((7L, 100L))))
    // (k=2 held v=50 — 'a' max WAS 50 after the last rescan, so this
    // delete actually re-triggers the rescan path; the point stands:
    // result equals the full recompute)
    val full = TableIO.selectTable(spark, lh, "mv_srcm")
      .groupBy("g").agg(min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(minmax() == full)
    TableIO.dropTable(spark, lh, "mv_srcm")
    TableIO.dropTable(spark, lh, "mv_aggm")
  }

  test("same refresh window: a row inserted as the new extremum then " +
      "deleted again never leaks into min/max (candidate-extremum rescan)") {
    val base = Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("k", "g", "v")
    TableIO.writeTable(spark, lh, "mv_srcw", base)
    TableIO.enableChangeFeed(spark, lh, "mv_srcw")
    MatView.createAggView(spark, lh, "mv_aggw", "mv_srcw", Seq("g"),
      Seq.empty, minCols = Seq("v"), maxCols = Seq("v"))
    // one refresh window folds BOTH commits: insert 999 (new max), then
    // delete that very row — comparing removals against the STORED max
    // alone would let 999 survive as the folded maximum
    TableIO.appendTable(spark, lh, "mv_srcw",
      Seq((9L, "a", 999L), (10L, "a", 1L)).toDF("k", "g", "v"))
    TableIO.deleteFromTable(spark, lh, "mv_srcw", "k = 9 OR k = 10")
    MatView.refreshAggView(spark, lh, "mv_aggw")
    val row = TableIO.selectTable(spark, lh, "mv_aggw")
      .select("g", "mv_count", "min_v", "max_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(row.toSeq == Seq(("a", 2L, 10L, 20L)),
      s"window-transient extrema must not leak: ${row.toSeq}")
    TableIO.dropTable(spark, lh, "mv_srcw")
    TableIO.dropTable(spark, lh, "mv_aggw")
  }

  test("streaming ingest + incremental refresh: the view tracks a live " +
      "stream batch by batch (bronze table -> maintained aggregate)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val src = mem.toDF().toDF("k", "g", "v")
    // seed the versioned table + CDF + view BEFORE the stream starts
    TableIO.writeTable(spark, lh, "mv_stream_src",
      Seq((0L, "g0", 1L)).toDF("k", "g", "v"))
    TableIO.enableChangeFeed(spark, lh, "mv_stream_src")
    MatView.createAggView(spark, lh, "mv_stream_agg", "mv_stream_src",
      Seq("g"), Seq("v"))
    val q = graft.lakehouse.ext.EventWindows.streamIngest(src, spark, lh,
      "mv_stream_src", accumulate = true)
    try {
      mem.addData((1L, "g0", 10L), (2L, "g1", 5L))
      q.processAllAvailable()
      MatView.refreshAggView(spark, lh, "mv_stream_agg")
      assert(viewRows("mv_stream_agg") == fullRecompute("mv_stream_src"))
      mem.addData((3L, "g1", 7L), (4L, "g2", 2L))
      q.processAllAvailable()
      MatView.refreshAggView(spark, lh, "mv_stream_agg")
      val got = viewRows("mv_stream_agg")
      assert(got == fullRecompute("mv_stream_src"))
      assert(got == Set(("g0", 2L, 11L), ("g1", 2L, 12L), ("g2", 1L, 2L)))
    } finally q.stop()
    TableIO.dropTable(spark, lh, "mv_stream_src")
    TableIO.dropTable(spark, lh, "mv_stream_agg")
  }

  test("maintainAggView: continuous maintenance follows source commits " +
      "including rewrites, and a checkpoint restart resumes cleanly") {
    TableIO.writeTable(spark, lh, "mv_cm_src",
      (1L to 40L).map(i => (i, s"g${i % 4}", i)).toDF("k", "g", "v"))
    TableIO.enableChangeFeed(spark, lh, "mv_cm_src")
    MatView.createAggView(spark, lh, "mv_cm_agg", "mv_cm_src",
      Seq("g"), Seq("v"))
    val ckpt = Files.createTempDirectory("mv_cm_ckpt").toString
    val q = MatView.maintainAggView(spark, lh, "mv_cm_agg",
      checkpoint = Some(ckpt))
    try {
      // an append AND a rewrite commit (merge) AND a delete
      TableIO.appendTable(spark, lh, "mv_cm_src",
        Seq((41L, "g4", 100L)).toDF("k", "g", "v"))
      TableIO.mergeTable(spark, lh, "mv_cm_src",
        Seq((1L, "g1", 50L)).toDF("k", "g", "v"), Seq("k"))
      TableIO.deleteFromTable(spark, lh, "mv_cm_src", "g = 'g2'")
      q.processAllAvailable()
      assert(viewRows("mv_cm_agg") == fullRecompute("mv_cm_src"))
    } finally q.stop()
    // restart from the same checkpoint picks up commits made while down
    TableIO.appendTable(spark, lh, "mv_cm_src",
      Seq((42L, "g5", 7L)).toDF("k", "g", "v"))
    val q2 = MatView.maintainAggView(spark, lh, "mv_cm_agg",
      checkpoint = Some(ckpt))
    try {
      q2.processAllAvailable()
      assert(viewRows("mv_cm_agg") == fullRecompute("mv_cm_src"))
    } finally q2.stop()
    TableIO.dropTable(spark, lh, "mv_cm_src")
    TableIO.dropTable(spark, lh, "mv_cm_agg")
  }

  test("replaceKeyedRows on a CDF-enabled target stages the row-level " +
      "events (update pair, delete, insert) atomically — CDF chains " +
      "through keyed replaces") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "rkr_cdf", base)
    TableIO.enableChangeFeed(spark, lh, "rkr_cdf")
    val sinceV = Versioned.latestVersion(
      Catalog.tablePath(lh, "rkr_cdf")).get
    // k=1 replaced (update pair), k=2 removed with no replacement
    // (delete), k=9 is a brand-new key in the removal set (insert)
    TableIO.replaceKeyedRows(spark, lh, "rkr_cdf",
      Seq(1L, 2L, 9L).toDF("k"),
      Seq((1L, "A"), (9L, "new")).toDF("k", "s"), Seq("k"))
    val events = TableIO.readChangeFeed(spark, lh, "rkr_cdf", sinceV)
      .select("k", "s", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(events == Set(
      (1L, "a", "update_preimage"), (1L, "A", "update_postimage"),
      (2L, "b", "delete"), (9L, "new", "insert")), events.toString)
    // a replacement key OUTSIDE the removal set fails loudly (its rows
    // would be indistinguishable from kept rows in the staged files)
    val ex = intercept[IllegalArgumentException] {
      TableIO.replaceKeyedRows(spark, lh, "rkr_cdf",
        Seq(1L).toDF("k"), Seq((5L, "X")).toDF("k", "s"), Seq("k"))
    }
    assert(ex.getMessage.contains("removal set"), ex.getMessage)
    TableIO.dropTable(spark, lh, "rkr_cdf")
  }
}
