package graft.lakehouse

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Row-level change data feed: merge/delete commits record pre/post images
  * atomically with the commit; appends derive inserts from the manifest
  * diff; compaction is invisible; the feed reconstructs every event. */
class ChangeFeedSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("cdf_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_cdf", "lh_cdf").lakehouses.head
  }

  private def feed(table: String, since: Long) =
    TableIO.readChangeFeed(spark, lh, table, since)
      .select("k", "v", "_change_type", "_commit_version")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
      .toSeq.sorted

  test("merge records pre/post images + inserts; append derives inserts; " +
      "delete records deletions; compaction is invisible") {
    TableIO.writeTable(spark, lh, "cdft",
      Seq((1, 10.0), (2, 20.0)).toDF("k", "v"))
    TableIO.enableChangeFeed(spark, lh, "cdft")
    val tdir = Catalog.tablePath(lh, "cdft")
    val v0 = Versioned.latestVersion(tdir).get

    TableIO.appendTable(spark, lh, "cdft", Seq((3, 30.0)).toDF("k", "v"))
    TableIO.mergeTable(spark, lh, "cdft",
      Seq((1, 11.0), (4, 40.0)).toDF("k", "v"), Seq("k"))
    TableIO.deleteFromTable(spark, lh, "cdft", "k = 2")
    TableIO.compactTable(spark, lh, "cdft")

    val events = feed("cdft", v0)
    assert(events == Seq(
      (1, 10.0, "update_preimage"),
      (1, 11.0, "update_postimage"),
      (2, 20.0, "delete"),
      (3, 30.0, "insert"),
      (4, 40.0, "insert")), s"got $events")

    // feed windows compose: since the merge version, only merge+delete show
    val vAfterAppend = Versioned.committedVersions(tdir)
      .filter(_ > v0).min
    val tail = feed("cdft", vAfterAppend)
    assert(!tail.exists(_._1 == 3) && tail.exists(_._1 == 4))
    TableIO.dropTable(spark, lh, "cdft")
  }

  test("the feed flag survives an overwrite, and the overwrite itself " +
      "streams as delete+insert events") {
    TableIO.writeTable(spark, lh, "cdfo", Seq((1, 10.0)).toDF("k", "v"))
    TableIO.enableChangeFeed(spark, lh, "cdfo")
    val tdir = Catalog.tablePath(lh, "cdfo")
    val v0 = Versioned.latestVersion(tdir).get
    TableIO.writeTable(spark, lh, "cdfo", Seq((2, 20.0)).toDF("k", "v"))
    // flag carried: a later merge still records its sidecar
    TableIO.mergeTable(spark, lh, "cdfo", Seq((2, 21.0)).toDF("k", "v"), Seq("k"))
    val events = feed("cdfo", v0)
    assert(events == Seq(
      (1, 10.0, "delete"), // overwrite removed the old row
      (2, 20.0, "insert"), // ...and inserted the new one
      (2, 20.0, "update_preimage"), (2, 21.0, "update_postimage")),
      s"got $events")
    TableIO.dropTable(spark, lh, "cdfo")
  }

  test("a swept feed baseline fails loudly instead of silently skipping") {
    TableIO.writeTable(spark, lh, "swept", Seq((1, "a")).toDF("k", "s"))
    val e = intercept[IllegalStateException] {
      TableIO.changeFeedAtPath(spark, Catalog.tablePath(lh, "swept"),
        sinceVersion = 9999L, untilVersion = None)
    }
    assert(e.getMessage.contains("re-baseline"))
    TableIO.dropTable(spark, lh, "swept")
  }

  test("rewrites WITHOUT the feed enabled fail the reader loudly") {
    TableIO.writeTable(spark, lh, "nofeed", Seq((1, "a")).toDF("k", "s"))
    val v0 = Versioned.latestVersion(Catalog.tablePath(lh, "nofeed")).get
    TableIO.mergeTable(spark, lh, "nofeed", Seq((1, "A")).toDF("k", "s"), Seq("k"))
    val e = intercept[IllegalStateException] {
      TableIO.readChangeFeed(spark, lh, "nofeed", v0).collect()
    }
    assert(e.getMessage.contains("enableChangeFeed"))
    TableIO.dropTable(spark, lh, "nofeed")
  }

  test("an empty feed window returns an empty, well-typed frame") {
    TableIO.writeTable(spark, lh, "quiet", Seq((1, "a")).toDF("k", "s"))
    val cur = Versioned.latestVersion(Catalog.tablePath(lh, "quiet")).get
    val df = TableIO.readChangeFeed(spark, lh, "quiet", cur)
    assert(df.count() == 0 &&
      df.columns.contains("_change_type") &&
      df.columns.contains("_commit_version"))
    TableIO.dropTable(spark, lh, "quiet")
  }
}
