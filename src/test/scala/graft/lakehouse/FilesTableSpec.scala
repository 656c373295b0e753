package graft.lakehouse

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The per-file metadata table: built from the manifest alone, consistent
  * with the table's logical content and with describeDetail's totals. */
class FilesTableSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("ft_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_ft", "lh_ft").lakehouses.head
  }

  test("filesTable: one row per manifest entry; logical rows sum to the " +
      "table count; DV'd files report their deleted rows") {
    TableIO.writeTable(spark, lh, "ft",
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "s"))
    TableIO.appendTable(spark, lh, "ft",
      (101 to 150).map(i => (i.toLong, s"v$i")).toDF("k", "s"))
    TableIO.deleteFromTable(spark, lh, "ft", "k <= 10",
      deletionVectors = true)
    val ft = TableIO.filesTable(spark, lh, "ft")
    val rows = ft.collect()
    assert(rows.nonEmpty)
    // logical rows (physical minus DV'd) must equal what a reader sees
    val logical = ft.agg(sum("logical_rows")).head().getLong(0)
    assert(logical == TableIO.selectTable(spark, lh, "ft").count())
    // the DV delete rewrote nothing: some file carries dv_deleted_rows
    assert(ft.filter(col("dv_deleted_rows") > 0).count() >= 1)
    // every entry carries stats and a positive recorded size
    assert(rows.forall(_.getAs[Boolean]("has_stats")))
    assert(rows.forall(_.getAs[Long]("size_bytes") > 0))
    // totals agree with describeDetail (same manifest, two views)
    val detail = TableIO.describeDetail(spark, lh, "ft").head()
    assert(rows.length.toLong == detail.getAs[Long]("num_files"))
    assert(logical == detail.getAs[Long]("num_rows"))
    assert(ft.select("version").head().getLong(0) ==
      detail.getAs[Long]("version"))
    TableIO.dropTable(spark, lh, "ft")
  }

  test("filesTable is metadata-only: no data file is opened") {
    TableIO.writeTable(spark, lh, "ft2",
      (1 to 10).map(i => (i, s"x$i")).toDF("k", "s"))
    val plan = TableIO.filesTable(spark, lh, "ft2")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan parquet"),
      s"filesTable must come from the manifest, not a scan: $plan")
    TableIO.dropTable(spark, lh, "ft2")
  }
}
