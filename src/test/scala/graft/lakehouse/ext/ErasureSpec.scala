package graft.lakehouse.ext

import java.nio.file.Files

import graft.lakehouse.{Catalog, LakehouseProps, SparkSuite, TableIO}
import org.apache.spark.sql.functions._

class ErasureSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("erasure_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_erase", "lh_erase").lakehouses.head
  }

  test("eraseWhere: audited per-table deletes, residual zero, " +
      "pre-erasure version still time-travelable") {
    TableIO.writeTable(spark, lh, "e_users",
      (1L to 20L).map(i => (i, s"u$i")).toDF("uid", "name"))
    TableIO.writeTable(spark, lh, "e_events",
      (1L to 100L).map(i => (i, i % 20 + 1)).toDF("eid", "uid"))
    val report = Erasure.eraseWhere(spark, lh, Seq(
      "e_users" -> "uid % 5 = 0",
      "e_events" -> "uid % 5 = 0"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(report("e_users") == ((20L, 4L, 16L, 0L)))
    assert(report("e_events") == ((100L, 20L, 80L, 0L)))
    // no surviving references to the forgotten keys
    assert(TableIO.selectTable(spark, lh, "e_events")
      .filter(col("uid") % 5 === 0).count() == 0)
    // the pre-erasure version remains reachable for the retention window
    val v0 = TableIO.selectTableVersion(spark, lh, "e_users", 1L).count()
    assert(v0 == 20L)
  }

  test("eraseWhere: null-predicate rows survive (coalesce false), " +
      "empty target list refused") {
    TableIO.writeTable(spark, lh, "e_null",
      Seq((1L, Some(10L)), (2L, None), (3L, Some(15L)))
        .toDF("k", "maybe"))
    val rep = Erasure.eraseWhere(spark, lh,
      Seq("e_null" -> "maybe % 2 = 0")).head()
    assert(rep.getAs[Long]("rows_deleted") == 1L)
    assert(rep.getAs[Long]("rows_after") == 2L) // null row kept
    intercept[IllegalArgumentException] {
      Erasure.eraseWhere(spark, lh, Nil)
    }
  }
}
