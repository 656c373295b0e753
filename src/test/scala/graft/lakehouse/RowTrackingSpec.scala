package graft.lakehouse

import java.nio.file.Files

/** Row tracking (Delta row IDs): stable per-row identity — fresh files
  * compute base+row_index from manifest stats (zero storage), rewrites
  * materialize ids physically, and OPTIMIZE / DELETE / UPDATE never
  * change a surviving row's id. */
class RowTrackingSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("rowtrack_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_rt", "lh_rt").lakehouses.head
  }

  private def ids(table: String): Map[Int, Long] =
    TableIO.selectTableWithRowIds(spark, lh, table)
      .select("k", TableIO.RowIdColName).as[(Int, Long)].collect().toMap

  test("enable backfills existing files; appends continue above the watermark") {
    TableIO.writeTable(spark, lh, "rt1",
      (1 to 10).toDF("k").orderBy("k").coalesce(1))
    TableIO.enableRowTracking(spark, lh, "rt1")
    val first = ids("rt1")
    assert(first.values.toSet == (0L until 10L).toSet, first)
    assert(first(1) == 0L && first(10) == 9L) // path-order backfill, file in k order
    TableIO.appendTable(spark, lh, "rt1",
      (11 to 15).toDF("k").orderBy("k").coalesce(1))
    val after = ids("rt1")
    assert(after.filter(_._1 <= 10) == first, "existing ids must not move")
    assert(after.filter(_._1 > 10).values.toSet == (10L until 15L).toSet)
    TableIO.dropTable(spark, lh, "rt1")
  }

  test("OPTIMIZE materializes ids — compaction never changes row identity") {
    TableIO.writeTable(spark, lh, "rt2",
      (1 to 6).toDF("k").orderBy("k").coalesce(1))
    TableIO.enableRowTracking(spark, lh, "rt2")
    // fragment: several small appends
    (7 to 9).foreach(i =>
      TableIO.appendTable(spark, lh, "rt2", Seq(i).toDF("k")))
    val before = ids("rt2")
    val filesBefore = TableIO.currentFiles(lh, "rt2").size
    TableIO.compactTable(spark, lh, "rt2")
    assert(TableIO.currentFiles(lh, "rt2").size < filesBefore)
    assert(ids("rt2") == before,
      "row ids must survive compaction byte-for-byte")
    // and the ids survive a SECOND compaction of already-materialized files
    TableIO.appendTable(spark, lh, "rt2", Seq(10).toDF("k"))
    TableIO.compactTable(spark, lh, "rt2")
    assert(ids("rt2").filter(_._1 <= 9) == before)
    TableIO.dropTable(spark, lh, "rt2")
  }

  test("DELETE preserves survivor ids in both rewrite and DV modes") {
    TableIO.writeTable(spark, lh, "rt3",
      (1 to 8).toDF("k").orderBy("k").coalesce(1))
    TableIO.enableRowTracking(spark, lh, "rt3")
    val before = ids("rt3")
    TableIO.deleteFromTable(spark, lh, "rt3", "k = 3") // rewrite mode
    val afterRewrite = ids("rt3")
    assert(afterRewrite == before - 3, s"$afterRewrite vs $before")
    TableIO.deleteFromTable(spark, lh, "rt3", "k = 5", deletionVectors = true)
    assert(ids("rt3") == before - 3 - 5)
    TableIO.dropTable(spark, lh, "rt3")
  }

  test("UPDATE changes content, not identity") {
    TableIO.writeTable(spark, lh, "rt4",
      Seq((1, 10), (2, 20), (3, 30)).toDF("k", "v").orderBy("k").coalesce(1))
    TableIO.enableRowTracking(spark, lh, "rt4")
    val before = ids("rt4")
    TableIO.updateTable(spark, lh, "rt4", "k = 2", Map("v" -> "v * 100"))
    assert(ids("rt4") == before)
    assert(TableIO.selectTable(spark, lh, "rt4").filter("k = 2")
      .select("v").as[Int].head() == 2000)
    TableIO.dropTable(spark, lh, "rt4")
  }

  test("ids are unique forever: a rewrite's retired span is never reissued") {
    TableIO.writeTable(spark, lh, "rt5",
      (1 to 4).toDF("k").orderBy("k").coalesce(1))
    TableIO.enableRowTracking(spark, lh, "rt5")
    TableIO.compactTable(spark, lh, "rt5") // materializes 0..3
    TableIO.appendTable(spark, lh, "rt5",
      (5 to 6).toDF("k").orderBy("k").coalesce(1))
    val all = ids("rt5")
    assert(all.values.toSet.size == all.size, s"duplicate ids: $all")
    assert(all.filter(_._1 <= 4).values.toSet == (0L until 4L).toSet)
    // the fresh span starts ABOVE everything ever assigned (the rewrite
    // consumed watermark space; gaps are fine, reuse is not)
    assert(all.filter(_._1 >= 5).values.forall(_ >= 4L))
    TableIO.dropTable(spark, lh, "rt5")
  }

  test("ANALYZE (recomputeStats) preserves every file's base row id") {
    TableIO.writeTable(spark, lh, "rt8",
      (1 to 5).toDF("k").orderBy("k").coalesce(1))
    TableIO.enableRowTracking(spark, lh, "rt8")
    TableIO.appendTable(spark, lh, "rt8",
      (6 to 7).toDF("k").orderBy("k").coalesce(1))
    val before = ids("rt8")
    TableIO.recomputeStats(spark, lh, "rt8")
    assert(ids("rt8") == before,
      "fresh stats must carry the __baseRowId span through ANALYZE")
    TableIO.dropTable(spark, lh, "rt8")
  }

  test("clones inherit row identity: same ids in shallow and deep clones") {
    TableIO.writeTable(spark, lh, "rt9",
      (1 to 6).toDF("k").orderBy("k").coalesce(1))
    TableIO.enableRowTracking(spark, lh, "rt9")
    TableIO.compactTable(spark, lh, "rt9") // mix materialized + stats-based
    TableIO.appendTable(spark, lh, "rt9",
      Seq(7).toDF("k"))
    val src = ids("rt9")
    TableIO.cloneTable(spark, lh, "rt9", "rt9_shallow")
    TableIO.cloneTable(spark, lh, "rt9", "rt9_deep", deep = true)
    assert(ids("rt9_shallow") == src)
    assert(ids("rt9_deep") == src)
    Seq("rt9", "rt9_shallow", "rt9_deep").foreach(TableIO.dropTable(spark, lh, _))
  }

  test("MERGE INTO preserves ids for updated rows; inserts take fresh ids") {
    TableIO.writeTable(spark, lh, "rt10",
      Seq((1, 10), (2, 20), (3, 30)).toDF("k", "v").orderBy("k").coalesce(1))
    TableIO.enableRowTracking(spark, lh, "rt10")
    val before = ids("rt10")
    val source = Seq((2, 200), (4, 400)).toDF("k", "v")
    TableIO.mergeInto(spark, lh, "rt10", source, Seq("k"), Seq(
      TableIO.MergeClause.MatchedUpdate(Map("v" -> "s.v"), None),
      TableIO.MergeClause.NotMatchedInsert(None, None)))
    val after = ids("rt10")
    assert(after.filter(_._1 <= 3) == before,
      s"updated/untouched rows must keep their ids: $after vs $before")
    assert(after.contains(4) && !before.values.toSet.contains(after(4)),
      s"the inserted row needs a FRESH id: $after")
    assert(after.values.toSet.size == after.size, s"duplicate ids: $after")
    // content actually merged
    assert(TableIO.selectTable(spark, lh, "rt10").filter("k = 2")
      .select("v").as[Int].head() == 200)
    TableIO.dropTable(spark, lh, "rt10")
  }

  test("plain reads are unchanged and the feature gates unknown readers") {
    TableIO.writeTable(spark, lh, "rt6", Seq(1, 2).toDF("k"))
    TableIO.enableRowTracking(spark, lh, "rt6")
    // normal select: no id column leaks
    assert(TableIO.selectTable(spark, lh, "rt6").columns.toSeq == Seq("k"))
    // feature recorded so a row-id-unaware reader refuses loudly
    val tdir = Catalog.tablePath(lh, "rt6")
    val m = Versioned.readManifest(tdir, Versioned.latestVersion(tdir).get).get
    assert(Versioned.featuresOf(m.meta).contains("rowTracking"))
    // un-enabled table refuses the id read
    TableIO.writeTable(spark, lh, "rt7", Seq(1).toDF("k"))
    intercept[IllegalArgumentException] {
      TableIO.selectTableWithRowIds(spark, lh, "rt7")
    }
    Seq("rt6", "rt7").foreach(TableIO.dropTable(spark, lh, _))
  }
}
