package graft.lakehouse

import java.nio.file.{Files, Paths}

/** VACUUM DRY RUN: the report must predict the sweep (same decision
  * code), and must never touch the table. */
class VacuumReportSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("vr_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_vr", "lh_vr").lakehouses.head
  }

  test("a young healthy table reports nothing to sweep") {
    TableIO.writeTable(spark, lh, "vr1", (1 to 10).toDF("k"))
    val report = Versioned.vacuumReport(Catalog.tablePath(lh, "vr1"))
    assert(report.isEmpty, report)
    TableIO.dropTable(spark, lh, "vr1")
  }

  test("the report predicts the zero-age sweep and is itself read-only") {
    TableIO.writeTable(spark, lh, "vr2", (1 to 50).toDF("k"))
    (1 to 4).foreach(i =>
      TableIO.writeTable(spark, lh, "vr2", (1 to 50).map(_ + i).toDF("k")))
    val dir = Catalog.tablePath(lh, "vr2")
    val before = Files.walk(Paths.get(dir)).count()
    val report = Versioned.vacuumReport(dir, retainAgeMs = 0L)
    // read-only: nothing moved
    assert(Files.walk(Paths.get(dir)).count() == before)
    // 5 overwrites with Retain=2: old versions' markers/manifests and
    // their replaced data files must be predicted
    assert(report.exists(_._1 == "marker"), report)
    assert(report.exists(_._1 == "data"), report)
    val predicted = report.map(_._2).toSet
    // current version's files must NEVER be predicted
    val current = Versioned.readManifest(dir,
      Versioned.latestVersion(dir).get).get.files.toSet
    assert(predicted.intersect(current).isEmpty,
      predicted.intersect(current))
    // the sweep deletes everything predicted...
    Versioned.vacuum(dir, retainAgeMs = 0L)
    val gone = predicted.filterNot(p =>
      Files.exists(Paths.get(dir).resolve(p)))
    assert(gone == predicted, predicted -- gone)
    // ...and the table still reads
    assert(TableIO.selectTable(spark, lh, "vr2").count() == 50)
    // steady state: nothing left to predict
    assert(Versioned.vacuumReport(dir, retainAgeMs = 0L).isEmpty)
    TableIO.dropTable(spark, lh, "vr2")
  }

  test("crashed-writer scratch and orphan txn refs are predicted with " +
      "their categories") {
    TableIO.writeTable(spark, lh, "vr3", (1 to 5).toDF("k"))
    val dir = Paths.get(Catalog.tablePath(lh, "vr3"))
    // fake a crashed writer's staging dir and an orphan txn ref
    val staging = dir.resolve(".staging-deadbeef")
    Files.createDirectories(staging)
    Files.write(staging.resolve("part-x.parquet"), Array[Byte](1, 2))
    Files.write(dir.resolve(s"${Versioned.TxnRefPrefix}99_cafe"),
      "/nonexistent".getBytes)
    val report = Versioned.vacuumReport(dir.toString, retainAgeMs = 0L)
    assert(report.exists { case (c, p) =>
      c == "scratch" && p.contains(".staging-deadbeef") }, report)
    assert(report.exists { case (c, p) =>
      c == "txnref" && p.contains("_txnref_99_cafe") }, report)
    TableIO.dropTable(spark, lh, "vr3")
  }
}
