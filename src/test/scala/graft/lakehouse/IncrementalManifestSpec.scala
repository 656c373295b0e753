package graft.lakehouse

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Delta-encoded manifests: base-pinned commits record only removed paths
  * and added entries against their base version — commit METADATA is
  * O(touched files), never O(table) — with a full manifest (checkpoint)
  * forced every [[Versioned.CheckpointInterval]] versions so resolution
  * replays a bounded chain. Retention keeps chain-dependency manifests
  * alive past their own versions' expiry; a broken chain fails loudly. */
class IncrementalManifestSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("im_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_im", "lh_im").lakehouses.head
  }

  private def manifestLines(tableDir: String, v: Long): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(Paths.get(tableDir, s"_manifest_$v"),
      StandardCharsets.UTF_8).asScala.toSeq
  }
  private def isDelta(tableDir: String, v: Long): Boolean =
    manifestLines(tableDir, v).exists(_.startsWith("#graft.basedOn="))

  test("appends write O(batch) delta manifests that resolve to the full " +
      "file list; checkpoints write full manifests") {
    TableIO.writeTable(spark, lh, "im1",
      (1 to 40).map(i => (i, s"s$i")).toDF("k", "s")) // v1: full
    val dir = Catalog.tablePath(lh, "im1")
    (2 to 9).foreach { i =>
      TableIO.appendTable(spark, lh, "im1",
        Seq((100 + i, s"n$i")).toDF("k", "s")) // v2..v9
    }
    // v2..v7 and v9 are base-pinned non-checkpoint commits -> delta;
    // v8 (CheckpointInterval) is a forced full manifest
    ((2 to 7) :+ 9).foreach(v => assert(isDelta(dir, v), s"v$v not delta"))
    assert(!isDelta(dir, 8), "v8 should be a full checkpoint")
    // a delta append's manifest is a handful of lines (schema + meta +
    // 1 added entry), NOT the full file list
    val v9 = manifestLines(dir, 9)
    val m9 = Versioned.readManifest(dir, 9).get
    assert(v9.size < m9.entries.size,
      s"delta manifest has ${v9.size} lines for ${m9.entries.size} entries")
    assert(v9.count(l => l.nonEmpty && !l.startsWith("#") &&
      !l.startsWith("{")) == 1, "append delta should add exactly one entry")
    // resolution equals reality: every entry resolves, stats ride along,
    // and the table reads all 48 rows
    assert(m9.entries.size == Versioned.readManifest(dir, 8).get.entries.size + 1)
    assert(m9.entries.forall(_.stats.isDefined))
    assert(TableIO.selectTable(spark, lh, "im1").count() == 48)
    // the resolved meta never leaks the encoding key
    assert(!m9.meta.contains(Versioned.BasedOnKey))
    TableIO.dropTable(spark, lh, "im1")
  }

  test("a stats-changed inherited file (DV delete) rides the delta as " +
      "remove + re-add and keeps its deletion vector") {
    TableIO.writeTable(spark, lh, "im2",
      (1 to 30).map(i => (i, s"s$i")).toDF("k", "s"))
    TableIO.appendTable(spark, lh, "im2",
      (31 to 60).map(i => (i, s"s$i")).toDF("k", "s")) // v2: delta
    TableIO.deleteFromTable(spark, lh, "im2", "k = 5",
      deletionVectors = true) // v3: delta, entry for k=5's file changes stats
    val dir = Catalog.tablePath(lh, "im2")
    assert(isDelta(dir, 3))
    val m3 = Versioned.readManifest(dir, 3).get
    // same physical files as v2 (DV deletes rewrite nothing)...
    assert(m3.files.toSet == Versioned.readManifest(dir, 2).get.files.toSet)
    // ...but one entry's stats now carry the vector, and the read honors it
    assert(m3.entries.count(e => Versioned.dvRefOf(e).isDefined) == 1)
    assert(TableIO.selectTable(spark, lh, "im2").count() == 59)
    TableIO.dropTable(spark, lh, "im2")
  }

  test("retention keeps chain-dependency manifests until survivors' " +
      "chains move past them; aggressive vacuum never breaks resolution") {
    TableIO.writeTable(spark, lh, "im3",
      (1 to 20).map(i => (i, s"s$i")).toDF("k", "s"))
    (2 to 5).foreach(i => TableIO.appendTable(spark, lh, "im3",
      Seq((100 + i, s"n$i")).toDF("k", "s")))
    val dir = Catalog.tablePath(lh, "im3")
    // age-0 vacuum drops v1..v3's markers (count floor keeps v4, v5) but
    // v1's manifest must survive: v4/v5 resolve through the v1 chain
    Versioned.vacuum(dir, retainAgeMs = 0L)
    assert(!Files.exists(Paths.get(dir, "_commit_1")))
    assert(Files.exists(Paths.get(dir, "_manifest_1")),
      "chain-dep manifest swept while a survivor still resolves through it")
    assert(TableIO.selectTable(spark, lh, "im3").count() == 24)
    // more commits roll the chain past a checkpoint; once nothing chains
    // below v8, repeated vacuums clear the lingering dep manifests
    (6 to 10).foreach(i => TableIO.appendTable(spark, lh, "im3",
      Seq((100 + i, s"n$i")).toDF("k", "s")))
    Versioned.vacuum(dir, retainAgeMs = 0L)
    Versioned.vacuum(dir, retainAgeMs = 0L) // second pass: deps exited
    assert(!Files.exists(Paths.get(dir, "_manifest_1")),
      "dep manifest should clear once survivors' chains pass the checkpoint")
    assert(TableIO.selectTable(spark, lh, "im3").count() == 29)
    TableIO.dropTable(spark, lh, "im3")
  }

  test("a delta whose base manifest is missing fails loudly instead of " +
      "serving a partial table") {
    TableIO.writeTable(spark, lh, "im4",
      (1 to 10).map(i => (i, s"s$i")).toDF("k", "s"))
    TableIO.appendTable(spark, lh, "im4", Seq((99, "x")).toDF("k", "s"))
    val dir = Catalog.tablePath(lh, "im4")
    assert(isDelta(dir, 2))
    Files.delete(Paths.get(dir, "_manifest_1")) // simulated corruption
    val ex = intercept[IllegalStateException] {
      Versioned.readManifest(dir, 2)
    }
    assert(ex.getMessage.contains("delta"), ex.getMessage)
    TableIO.dropTable(spark, lh, "im4")
  }

  test("large-diff commits fall back to full manifests (a delta bigger " +
      "than half the list buys nothing)") {
    TableIO.writeTable(spark, lh, "im5",
      (1 to 50).map(i => (i, s"s$i")).toDF("k", "s"))
    // UPDATE rewrites every file -> diff ~ 2x the list -> full manifest
    TableIO.updateTable(spark, lh, "im5", "k >= 1", Map("s" -> "'u'"))
    val dir = Catalog.tablePath(lh, "im5")
    assert(!isDelta(dir, 2), "an all-files rewrite should write full")
    assert(TableIO.selectTable(spark, lh, "im5")
      .filter($"s" === "u").count() == 50)
    TableIO.dropTable(spark, lh, "im5")
  }
}
