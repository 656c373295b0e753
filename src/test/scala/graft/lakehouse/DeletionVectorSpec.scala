package graft.lakehouse

import java.nio.file.{Files, Paths}

/** Deletion vectors: row-level DELETE with ZERO data-file rewrites — the
  * scale contract is that a sparse delete's commit cost is O(deleted rows)
  * (sidecar bytes), never O(touched files) parquet rewriting, while every
  * read path (scans, pruned scans, time travel, CDF, streaming, clones,
  * counts) keeps seeing exactly the logical surviving rows. */
class DeletionVectorSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("dv_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_dv", "lh_dv").lakehouses.head
  }

  private def fileState(name: String): Map[String, (Long, Long)] =
    TableIO.currentFiles(lh, name).map { p =>
      p.toString -> (Files.size(p), Files.getLastModifiedTime(p).toMillis)
    }.toMap

  private def dvEntries(name: String): Seq[(String, Long)] = {
    val dir = Catalog.tablePath(lh, name)
    val m = Versioned.latestVersion(dir)
      .flatMap(Versioned.readManifest(dir, _)).get
    m.entries.flatMap(e => Versioned.dvRefOf(e).map { case (_, n) =>
      e.path -> n })
  }

  test("DV delete: correct rows, zero data files rewritten") {
    val df = (1 to 1000).map(i => (i, i % 7, s"v$i")).toDF("k", "g", "s")
      .repartition(4)
    TableIO.writeTable(spark, lh, "dv1", df)
    val before = fileState("dv1")
    assert(before.size >= 2)

    val info = TableIO.deleteFromTable(spark, lh, "dv1", "g = 3",
      deletionVectors = true)
    // manifest-derived LOGICAL row count subtracts vectored rows
    val expectKept = (1 to 1000).count(_ % 7 != 3)
    assert(info.rowCount == expectKept)

    // every data file: same path, same bytes, same mtime — nothing rewrote
    assert(fileState("dv1") == before,
      "a deletion-vector delete rewrote data files")
    assert(dvEntries("dv1").nonEmpty)

    val got = TableIO.selectTable(spark, lh, "dv1")
      .select("k").as[Int].collect().sorted
    assert(got.toSeq == (1 to 1000).filter(_ % 7 != 3))
  }

  test("second DV delete merges into existing vectors; no-match delete " +
      "commits a no-op") {
    val df = (1 to 500).map(i => (i, s"v$i")).toDF("k", "s").repartition(3)
    TableIO.writeTable(spark, lh, "dv2", df)
    TableIO.deleteFromTable(spark, lh, "dv2", "k <= 100",
      deletionVectors = true)
    val info2 = TableIO.deleteFromTable(spark, lh, "dv2",
      "k > 100 AND k <= 150", deletionVectors = true)
    assert(info2.rowCount == 350)
    // merged: per-file counts sum to all 150 deletions
    assert(dvEntries("dv2").map(_._2).sum == 150)
    val got = TableIO.selectTable(spark, lh, "dv2")
      .select("k").as[Int].collect().sorted
    assert(got.toSeq == (151 to 500))

    val info3 = TableIO.deleteFromTable(spark, lh, "dv2", "k > 9999",
      deletionVectors = true)
    assert(info3.rowCount == 350)
  }

  test("NULL conditions keep their rows (SQL three-valued DELETE)") {
    val df = Seq((1, Some(10)), (2, None), (3, Some(30)))
      .toDF("k", "v")
    TableIO.writeTable(spark, lh, "dv_null", df)
    TableIO.deleteFromTable(spark, lh, "dv_null", "v < 20",
      deletionVectors = true)
    val kept = TableIO.selectTable(spark, lh, "dv_null")
      .select("k").as[Int].collect().sorted
    assert(kept.toSeq == Seq(2, 3), "NULL-condition row must survive")
  }

  test("time travel to the pre-delete version still sees every row") {
    val df = (1 to 200).map(i => (i, s"v$i")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "dv3", df)
    val dir = Catalog.tablePath(lh, "dv3")
    val v1 = Versioned.latestVersion(dir).get
    TableIO.deleteFromTable(spark, lh, "dv3", "k % 2 = 0",
      deletionVectors = true)
    assert(TableIO.selectTable(spark, lh, "dv3").count() == 100)
    assert(TableIO.selectTableVersion(spark, lh, "dv3", v1).count() == 200)
  }

  test("pruned scans and prunedTopK stay exact over DV'd files") {
    val df = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "x")
    TableIO.writeTable(spark, lh, "dv4", df, sortBy = Seq("k"))
    TableIO.deleteFromTable(spark, lh, "dv4", "k >= 100 AND k < 200",
      deletionVectors = true)
    val pruned = TableIO.prunedScan(spark, lh, "dv4", "k",
      Some(50L), Some(250L)).select("k").as[Long].collect().sorted
    assert(pruned.toSeq ==
      ((50L to 99L) ++ (200L to 250L)))
    // top-k over a DV'd table: the k-prefix argument is unprovable, must
    // fall back to the (DV-filtered) full sort and stay correct
    val top = TableIO.prunedTopK(spark, lh, "dv4", "k", 5)
      .select("k").as[Long].collect()
    assert(top.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("CDF: a DV delete emits row-level delete events") {
    val df = (1 to 50).map(i => (i, s"v$i")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "dv5", df)
    TableIO.enableChangeFeed(spark, lh, "dv5")
    val dir = Catalog.tablePath(lh, "dv5")
    val v = Versioned.latestVersion(dir).get
    TableIO.deleteFromTable(spark, lh, "dv5", "k <= 10",
      deletionVectors = true)
    val feed = TableIO.readChangeFeed(spark, lh, "dv5", v)
    val deletes = feed.filter($"_change_type" === "delete")
      .select("k").as[Int].collect().sorted
    assert(deletes.toSeq == (1 to 10))
  }

  test("compaction materializes vectors: clean files, no DV refs, same rows") {
    val df = (1 to 400).map(i => (i, s"v$i")).toDF("k", "s").repartition(4)
    TableIO.writeTable(spark, lh, "dv6", df)
    TableIO.deleteFromTable(spark, lh, "dv6", "k % 4 = 0",
      deletionVectors = true)
    assert(dvEntries("dv6").nonEmpty)
    TableIO.compactTable(spark, lh, "dv6")
    assert(dvEntries("dv6").isEmpty, "compaction must clear vectors")
    val got = TableIO.selectTable(spark, lh, "dv6")
      .select("k").as[Int].collect().sorted
    assert(got.toSeq == (1 to 400).filterNot(_ % 4 == 0))
  }

  test("changes-since fails loudly across a DV delete (not silently " +
      "additive); ignoreRewrites opts back in") {
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "dv7", df)
    val dir = Catalog.tablePath(lh, "dv7")
    val v1 = Versioned.latestVersion(dir).get
    TableIO.deleteFromTable(spark, lh, "dv7", "k <= 10",
      deletionVectors = true)
    val e = intercept[IllegalStateException] {
      TableIO.readChangesSince(spark, lh, "dv7", v1).count()
    }
    assert(e.getMessage.contains("deletion"))
    assert(TableIO.readChangesSince(spark, lh, "dv7", v1,
      ignoreRewrites = true).count() == 0)
  }

  test("shallow clone of a DV'd table reads the logical rows") {
    val df = (1 to 300).map(i => (i, s"v$i")).toDF("k", "s").repartition(2)
    TableIO.writeTable(spark, lh, "dv8src", df)
    TableIO.deleteFromTable(spark, lh, "dv8src", "k > 250",
      deletionVectors = true)
    TableIO.cloneTable(spark, lh, "dv8src", "dv8clone")
    // the clone wrote no data files of its own
    val cloneDir = Paths.get(Catalog.tablePath(lh, "dv8clone"))
    val dataFiles = Files.list(cloneDir).iterator()
    var parquets = 0
    while (dataFiles.hasNext) {
      if (dataFiles.next().toString.endsWith(".parquet")) parquets += 1
    }
    assert(parquets == 0)
    val got = TableIO.selectTable(spark, lh, "dv8clone")
      .select("k").as[Int].collect().sorted
    assert(got.toSeq == (1 to 250))
  }

  test("vacuum keeps referenced sidecars, sweeps orphaned ones") {
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "dv9", df)
    TableIO.deleteFromTable(spark, lh, "dv9", "k <= 20",
      deletionVectors = true)
    val dir = Paths.get(Catalog.tablePath(lh, "dv9"))
    val m = Versioned.readManifest(dir.toString,
      Versioned.latestVersion(dir.toString).get).get
    val sidecars = m.entries.flatMap(e => Versioned.dvRefOf(e).map(_._1))
    assert(sidecars.nonEmpty)
    // an orphan sidecar (no manifest references it)
    val orphan = DeletionVectors.write(dir.toString, Array(1L, 5L))
    // age everything out, keep only what's referenced
    Versioned.vacuum(dir.toString, retainAgeMs = 0L)
    sidecars.foreach(s => assert(Files.exists(dir.resolve(s)),
      s"referenced sidecar $s was swept"))
    assert(!Files.exists(dir.resolve(orphan)), "orphan sidecar survived")
    // table still reads correctly after the sweep
    assert(TableIO.selectTable(spark, lh, "dv9").count() == 80)
  }

  test("rewrite-mode delete after a DV delete does NOT resurrect " +
      "vectored rows (regression)") {
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("k", "s").coalesce(1)
    TableIO.writeTable(spark, lh, "dv10", df)
    TableIO.enableChangeFeed(spark, lh, "dv10")
    TableIO.deleteFromTable(spark, lh, "dv10", "k <= 10",
      deletionVectors = true)
    val dir = Catalog.tablePath(lh, "dv10")
    val v = Versioned.latestVersion(dir).get
    // rewrite-mode delete touches the same (DV-carrying) file
    TableIO.deleteFromTable(spark, lh, "dv10", "k = 50")
    val got = TableIO.selectTable(spark, lh, "dv10")
      .select("k").as[Int].collect().sorted
    assert(got.toSeq == (11 to 100).filterNot(_ == 50),
      "rewrite resurrected DV-deleted rows")
    // and its CDF event is ONLY k=50 — not the already-deleted rows
    val feed = TableIO.readChangeFeed(spark, lh, "dv10", v)
    assert(feed.filter($"_change_type" === "delete")
      .select("k").as[Int].collect().toSeq == Seq(50))
  }

  test("sidecar codec: delta encoding round-trips, merged unions") {
    val a = Array(3L, 4L, 5L, 1000L, 1000000L)
    val dir = Files.createTempDirectory("dvc").toString
    val name = DeletionVectors.write(dir, a)
    assert(DeletionVectors.read(Paths.get(dir).resolve(name)).toSeq == a.toSeq)
    val b = Array(1L, 4L, 999L, 1000L, 2000000L)
    assert(DeletionVectors.merged(a, b).toSeq ==
      Seq(1L, 3L, 4L, 5L, 999L, 1000L, 1000000L, 2000000L))
    assert(DeletionVectors.merged(Array.empty[Long], b).toSeq == b.toSeq)
  }
}
