package graft.lakehouse

import java.nio.file.{Files, Paths}

/** Column mapping (rename / drop WITHOUT rewriting data): the commit is
  * metadata-only, reads alias physical→logical, later writes stay
  * physical-consistent, data skipping keeps pruning on the renamed name,
  * and a column re-added after a drop reads null from pre-drop files
  * instead of resurrecting their retired bytes. */
class ColumnMappingSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("colmap_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_cm", "lh_cm").lakehouses.head
  }

  private def fileState(name: String): Set[(String, Long)] =
    TableIO.currentFiles(lh, name).map(p =>
      p.toString -> Files.getLastModifiedTime(p).toMillis).toSet

  test("rename is metadata-only: same files, same bytes, new name on read") {
    val base = (1 to 100).map(i => (i.toLong, s"v$i", i * 2.0)).toDF("k", "s", "x")
    TableIO.writeTable(spark, lh, "r1", base)
    val before = fileState("r1")
    TableIO.renameColumn(spark, lh, "r1", "x", "score")
    assert(fileState("r1") == before, "rename rewrote data files")
    val got = TableIO.selectTable(spark, lh, "r1")
    assert(got.columns.toSeq == Seq("k", "s", "score"))
    assert(got.filter($"k" === 7L).head().getAs[Double]("score") == 14.0)
  }

  test("readTable keeps pruning on the renamed column (stats keyed physical)") {
    val df = spark.range(0, 20000).selectExpr("id AS k", "id * 3 AS v")
      .repartitionByRange(8, $"k").sortWithinPartitions("k")
    TableIO.writeTable(spark, lh, "r2", df)
    TableIO.renameColumn(spark, lh, "r2", "k", "key_id")
    val total = TableIO.currentFiles(lh, "r2").size
    val got = TableIO.readTable(spark, lh, "r2",
      condition = "key_id >= 100 AND key_id <= 200")
    assert(got.count() == 101)
    assert(got.inputFiles.length < total,
      s"renamed column stopped pruning (${got.inputFiles.length}/$total)")
  }

  test("append after rename: new files write the physical name, one read " +
      "schema spans old and new files") {
    val base = (1 to 50).map(i => (i.toLong, i * 1.0)).toDF("k", "x")
    TableIO.writeTable(spark, lh, "r3", base)
    TableIO.renameColumn(spark, lh, "r3", "x", "score")
    TableIO.appendTable(spark, lh, "r3",
      Seq((1000L, 999.0)).toDF("k", "score"))
    val got = TableIO.selectTable(spark, lh, "r3")
    assert(got.count() == 51)
    assert(got.filter($"k" === 1000L).head().getAs[Double]("score") == 999.0)
    assert(got.filter($"k" === 5L).head().getAs[Double]("score") == 5.0)
    // merge keeps working post-rename too (file-level rewrite, mapped write)
    TableIO.mergeTable(spark, lh, "r3",
      Seq((5L, 50.0)).toDF("k", "score"), Seq("k"))
    val merged = TableIO.selectTable(spark, lh, "r3")
    assert(merged.filter($"k" === 5L).head().getAs[Double]("score") == 50.0)
    assert(merged.count() == 51)
  }

  test("rename chains and rename-back resolve to the original physical name") {
    val base = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "r4", base)
    TableIO.renameColumn(spark, lh, "r4", "s", "t")
    TableIO.renameColumn(spark, lh, "r4", "t", "u")
    assert(TableIO.selectTable(spark, lh, "r4").columns.toSeq == Seq("k", "u"))
    assert(TableIO.selectTable(spark, lh, "r4")
      .filter($"k" === 3L).head().getString(1) == "v3")
    TableIO.renameColumn(spark, lh, "r4", "u", "s") // back to the original
    val back = TableIO.selectTable(spark, lh, "r4")
    assert(back.columns.toSeq == Seq("k", "s"))
    assert(back.filter($"k" === 3L).head().getString(1) == "v3")
  }

  test("dropColumn is metadata-only and a re-added column reads null from " +
      "pre-drop files (no resurrection)") {
    val base = (1 to 40).map(i => (i.toLong, s"secret$i", i * 1.0))
      .toDF("k", "c", "x")
    TableIO.writeTable(spark, lh, "d1", base)
    val before = fileState("d1")
    TableIO.dropColumn(spark, lh, "d1", "c")
    assert(fileState("d1") == before, "drop rewrote data files")
    assert(TableIO.selectTable(spark, lh, "d1").columns.toSeq == Seq("k", "x"))
    // re-add a column named c: pre-drop rows must read NULL, not secretN
    TableIO.appendTable(spark, lh, "d1",
      Seq((1000L, 5.0, "fresh")).toDF("k", "x", "c"))
    val got = TableIO.selectTable(spark, lh, "d1")
    assert(got.filter($"k" === 3L).head().getAs[String]("c") == null,
      "dropped bytes resurrected")
    assert(got.filter($"k" === 1000L).head().getAs[String]("c") == "fresh")
  }

  test("pruning after drop + re-add never serves the retired column's " +
      "stats (regression)") {
    val base = (1 to 100).map(i => (i.toLong, i.toLong, s"v$i"))
      .toDF("k", "a", "s").coalesce(1)
    TableIO.writeTable(spark, lh, "dp1", base)
    TableIO.dropColumn(spark, lh, "dp1", "a")
    // re-added 'a' gets a fresh physical slot; old file's logical a = null
    TableIO.appendTable(spark, lh, "dp1",
      (1 to 10).map(i => (1000L + i, s"n$i", 100L + i))
        .toDF("k", "s", "a").coalesce(1))
    // top-k must come from the NEW column's values — the retired column's
    // [1,100] stats would wrongly prune the new file and return garbage
    val top = TableIO.prunedTopK(spark, lh, "dp1", "a", 3)
      .select("a").as[Long].collect()
    assert(top.toSeq == Seq(101L, 102L, 103L), top.toSeq)
    // IS NULL must include the pre-drop file's rows (logical a null there);
    // the retired stats say nullCount=0 and would prune it
    assert(TableIO.prunedScanNull(spark, lh, "dp1", "a", isNull = true)
      .count() == 100)
    // a range only the RETIRED column satisfied must return empty
    assert(TableIO.prunedScan(spark, lh, "dp1", "a",
      Some(1L), Some(50L)).count() == 0)
    // equality point-lookup on a retired value: empty, not resurrect
    assert(TableIO.prunedScanEq(spark, lh, "dp1", "a", 5L).count() == 0)
  }

  test("rename rejects partition and constraint-referenced columns") {
    val base = (1 to 30).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i))
      .toDF("k", "g", "v")
    TableIO.writeTable(spark, lh, "r5", base, partitionBy = Seq("g"))
    intercept[IllegalArgumentException] {
      TableIO.renameColumn(spark, lh, "r5", "g", "grp")
    }
    TableIO.writeTable(spark, lh, "r6", base)
    TableIO.addCheckConstraint(spark, lh, "r6", "v_pos", "v >= 0")
    intercept[IllegalArgumentException] {
      TableIO.renameColumn(spark, lh, "r6", "v", "val")
    }
    intercept[IllegalArgumentException] {
      TableIO.dropColumn(spark, lh, "r6", "v")
    }
    // unrelated columns still rename fine under a constraint
    TableIO.renameColumn(spark, lh, "r6", "k", "key_id")
    assert(TableIO.selectTable(spark, lh, "r6").columns.contains("key_id"))
  }

  test("a change feed spanning a rename fails loudly (one column, two names)") {
    val base = (1 to 20).map(i => (i.toLong, i * 1.0)).toDF("k", "x")
    TableIO.writeTable(spark, lh, "cf1", base)
    TableIO.enableChangeFeed(spark, lh, "cf1")
    val v0 = Versioned.latestVersion(Catalog.tablePath(lh, "cf1")).get
    TableIO.appendTable(spark, lh, "cf1", Seq((100L, 1.0)).toDF("k", "x"))
    TableIO.renameColumn(spark, lh, "cf1", "x", "score")
    TableIO.appendTable(spark, lh, "cf1", Seq((101L, 2.0)).toDF("k", "score"))
    val e = intercept[IllegalStateException] {
      TableIO.readChangeFeed(spark, lh, "cf1", v0).collect()
    }
    assert(e.getMessage.contains("rename"))
    // a range entirely AFTER the rename works
    val vAfter = Versioned.latestVersion(Catalog.tablePath(lh, "cf1")).get - 1
    val feed = TableIO.readChangeFeed(spark, lh, "cf1", vAfter)
    assert(feed.columns.contains("score"))
    assert(feed.count() == 1)
  }

  test("time travel reads pre-rename versions with their own schema") {
    val base = (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("k", "x")
    TableIO.writeTable(spark, lh, "r7", base)
    val v1 = Versioned.latestVersion(Catalog.tablePath(lh, "r7")).get
    TableIO.renameColumn(spark, lh, "r7", "x", "score")
    assert(TableIO.selectTableVersion(spark, lh, "r7", v1)
      .columns.toSeq == Seq("k", "x"))
    assert(TableIO.selectTable(spark, lh, "r7")
      .columns.toSeq == Seq("k", "score"))
  }

  test("identity declarations follow column renames (watermark intact); " +
      "dropping a declared identity column is rejected") {
    TableIO.writeTable(spark, lh, "cmid", Seq("a").toDF("s"))
    TableIO.setIdentityColumn(spark, lh, "cmid", "id")
    TableIO.appendTable(spark, lh, "cmid", Seq("b", "c").toDF("s")) // 1, 2
    TableIO.renameColumn(spark, lh, "cmid", "id", "row_id")
    // assignment continues under the NEW name, above the old watermark
    TableIO.appendTable(spark, lh, "cmid", Seq("d").toDF("s"))
    val ids = TableIO.selectTable(spark, lh, "cmid")
      .collect().flatMap(r => Option(r.getAs[java.lang.Long]("row_id"))
        .map(_.longValue)).toSet
    assert(ids == Set(1L, 2L, 3L), ids)
    // explicit values still rejected under the new name
    intercept[IllegalArgumentException] {
      TableIO.appendTable(spark, lh, "cmid",
        Seq((9L, "z")).toDF("row_id", "s"))
    }
    // dropping the column with a live declaration is refused
    val ex = intercept[IllegalArgumentException] {
      TableIO.dropColumn(spark, lh, "cmid", "row_id")
    }
    assert(ex.getMessage.contains("identity"), ex.getMessage)
    TableIO.dropTable(spark, lh, "cmid")
  }
}
