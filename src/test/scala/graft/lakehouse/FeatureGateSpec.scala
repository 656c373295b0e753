package graft.lakehouse

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Delta-style table-features protocol gating: versions list the features
  * their correct interpretation requires; readers and writers fail LOUDLY
  * on an unknown feature instead of silently misreading a table written by
  * a newer implementation (ignoring deletion vectors resurrects rows;
  * ignoring column mapping reads renamed columns wrongly). */
class FeatureGateSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("fg_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_fg", "lh_fg").lakehouses.head
  }

  test("feature-introducing operations record their requirement, and it " +
      "sticks across later commits") {
    TableIO.writeTable(spark, lh, "fg1",
      (1 to 20).map(i => (i, s"s$i")).toDF("k", "s"))
    TableIO.deleteFromTable(spark, lh, "fg1", "k = 1",
      deletionVectors = true)
    TableIO.renameColumn(spark, lh, "fg1", "s", "t")
    val dir = Catalog.tablePath(lh, "fg1")
    def features(): Set[String] = Versioned.featuresOf(
      Versioned.readManifest(dir, Versioned.latestVersion(dir).get).get.meta)
    // (deltaManifests may ride along — those commits delta-encode)
    assert(Set("deletionVectors", "columnMapping").subsetOf(features()),
      features())
    // an ordinary append carries the requirements forward (sticky)
    TableIO.appendTable(spark, lh, "fg1", Seq((99, "x")).toDF("k", "t"))
    assert(Set("deletionVectors", "columnMapping").subsetOf(features()),
      features())
    TableIO.dropTable(spark, lh, "fg1")
  }

  test("an unknown required feature fails reads AND writes loudly") {
    TableIO.writeTable(spark, lh, "fg2",
      (1 to 10).map(i => (i, s"s$i")).toDF("k", "s"))
    val dir = Catalog.tablePath(lh, "fg2")
    val v = Versioned.latestVersion(dir).get
    // a newer implementation's table: inject a feature we don't know
    Files.write(Paths.get(dir, s"_manifest_$v"),
      "\n#graft.features=futureMagic".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)
    val exR = intercept[IllegalStateException] {
      TableIO.selectTable(spark, lh, "fg2").count()
    }
    assert(exR.getMessage.contains("futureMagic"), exR.getMessage)
    val exW = intercept[IllegalStateException] {
      TableIO.appendTable(spark, lh, "fg2", Seq((99, "x")).toDF("k", "s"))
    }
    assert(exW.getMessage.contains("futureMagic"), exW.getMessage)
    // cleanup bypasses the read path (dropTable is filesystem-level)
    TableIO.dropTable(spark, lh, "fg2")
  }

  test("feature requirements survive overwrite and ride clones") {
    TableIO.writeTable(spark, lh, "fg4",
      (1 to 20).map(i => (i, s"s$i")).toDF("k", "s"))
    TableIO.deleteFromTable(spark, lh, "fg4", "k = 1",
      deletionVectors = true)
    // overwrite: the DV refs vanish with the data, but the requirement
    // is STICKY — a down-level writer must still be rejected
    TableIO.writeTable(spark, lh, "fg4",
      (1 to 5).map(i => (i, s"n$i")).toDF("k", "s"))
    val dir = Catalog.tablePath(lh, "fg4")
    def features(d: String): Set[String] = Versioned.featuresOf(
      Versioned.readManifest(d, Versioned.latestVersion(d).get).get.meta)
    assert(features(dir).contains("deletionVectors"), features(dir))
    // clones carry the requirements with the DV refs they reference
    TableIO.deleteFromTable(spark, lh, "fg4", "k = 2",
      deletionVectors = true)
    TableIO.cloneTable(spark, lh, "fg4", "fg4_clone")
    val cdir = Catalog.tablePath(lh, "fg4_clone")
    assert(features(cdir).contains("deletionVectors"), features(cdir))
    Seq("fg4", "fg4_clone").foreach(TableIO.dropTable(spark, lh, _))
  }

  test("delta-encoded manifests declare the deltaManifests feature") {
    TableIO.writeTable(spark, lh, "fg3",
      (1 to 10).map(i => (i, s"s$i")).toDF("k", "s"))
    TableIO.appendTable(spark, lh, "fg3", Seq((99, "x")).toDF("k", "s"))
    val dir = Catalog.tablePath(lh, "fg3")
    val m2 = Versioned.readManifest(dir, 2).get
    assert(Versioned.featuresOf(m2.meta).contains("deltaManifests"))
    TableIO.dropTable(spark, lh, "fg3")
  }
}
