package graft.lakehouse

import org.apache.spark.sql.functions.col

/** Declared FOREIGN KEYs: informational metadata commits with validated
  * declaration and an on-demand referential audit (SQL MATCH SIMPLE null
  * semantics). */
class ForeignKeySpec extends SparkSuite {
  import spark.implicits._

  private lazy val lh = {
    val dir = java.nio.file.Files.createTempDirectory("fk").toString
    Catalog.registerLocalWorkspace(dir, "ws_fk", "lh_fk").lakehouses.head
  }

  test("declaration validates existing data, audit reports orphans, " +
      "null child keys match vacuously, drop removes the declaration") {
    TableIO.writeTable(spark, lh, "parent",
      Seq((1L, "a"), (2L, "b")).toDF("pk", "pv"))
    TableIO.writeTable(spark, lh, "child",
      Seq((10L, Some(1L)), (11L, Some(2L)), (12L, None)).toDF("ck", "ref"))
    TableIO.addForeignKey(spark, lh, "child", "fk_ref", Seq("ref"),
      "parent", Seq("pk"))
    val decl = TableIO.foreignKeysOf(
      graft.lakehouse.Versioned.readManifest(
        Catalog.tablePath(lh, "child"),
        graft.lakehouse.Versioned.latestVersion(
          Catalog.tablePath(lh, "child")).get).get.meta)
    assert(decl == Map("fk_ref" -> ((Seq("ref"), "parent", Seq("pk")))),
      decl)
    // informational: an orphaning append still lands...
    TableIO.appendTable(spark, lh, "child",
      Seq((13L, Some(99L))).toDF("ck", "ref"))
    // ...and the audit reports exactly the orphan key
    val bad = TableIO.validateForeignKey(spark, lh, "child", Seq("ref"),
      "parent", Seq("pk")).collect().map(_.getLong(0)).toSeq
    assert(bad == Seq(99L), bad)
    TableIO.dropForeignKey(spark, lh, "child", "fk_ref")
    assert(TableIO.foreignKeysOf(
      graft.lakehouse.Versioned.readManifest(
        Catalog.tablePath(lh, "child"),
        graft.lakehouse.Versioned.latestVersion(
          Catalog.tablePath(lh, "child")).get).get.meta).isEmpty)
  }

  test("declaring over violating data refuses unless validate = false") {
    TableIO.writeTable(spark, lh, "p2", Seq((1L, "a")).toDF("pk", "pv"))
    TableIO.writeTable(spark, lh, "c2",
      Seq((1L, 1L), (2L, 9L)).toDF("ck", "ref"))
    intercept[IllegalArgumentException] {
      TableIO.addForeignKey(spark, lh, "c2", "fk", Seq("ref"),
        "p2", Seq("pk"))
    }
    // NOT VALID declaration records intent without the audit
    TableIO.addForeignKey(spark, lh, "c2", "fk", Seq("ref"),
      "p2", Seq("pk"), validate = false)
    val bad = TableIO.validateForeignKey(spark, lh, "c2", Seq("ref"),
      "p2", Seq("pk")).collect().map(_.getLong(0)).toSeq
    assert(bad == Seq(9L), bad)
  }
}
