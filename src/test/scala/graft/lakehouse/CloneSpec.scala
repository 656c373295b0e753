package graft.lakehouse

import java.nio.file.{Files, Paths}

/** Shallow CLONE contracts (Delta CLONE semantics): the clone commit is
  * metadata-only (zero data files written), reads equal the source, per-file
  * stats ride along (data skipping works on the clone), writes to the clone
  * never touch the source (and vice versa), and a full compact materializes
  * the clone into an independent table. */
class CloneSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("clone_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_clone", "lh_clone").lakehouses.head
  }

  private def dataFilesUnder(name: String): Seq[String] = {
    val dir = Paths.get(Catalog.tablePath(lh, name))
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")).map(_.toString).toSeq
    } finally s.close()
  }

  test("clone is zero-copy: no data files land in the clone dir, reads equal source") {
    val base = (1 to 200).map(i => (i.toLong, s"v$i", i % 7)).toDF("k", "s", "g")
    TableIO.writeTable(spark, lh, "c_src", base)
    TableIO.cloneTable(spark, lh, "c_src", "c_dst")
    assert(dataFilesUnder("c_dst").isEmpty, "shallow clone copied data files")
    val src = TableIO.selectTable(spark, lh, "c_src").collect().toSet
    val dst = TableIO.selectTable(spark, lh, "c_dst").collect().toSet
    assert(dst == src)
    TableIO.dropTable(spark, lh, "c_dst")
    TableIO.dropTable(spark, lh, "c_src")
  }

  test("clone of a hive-partitioned table keeps partition columns and values") {
    val base = (1 to 120).map(i =>
      (i.toLong, s"v$i", if (i % 2 == 0) "even" else "odd")).toDF("k", "s", "g")
    TableIO.writeTable(spark, lh, "cp_src", base, partitionBy = Seq("g"))
    TableIO.cloneTable(spark, lh, "cp_src", "cp_dst")
    val dst = TableIO.selectTable(spark, lh, "cp_dst")
    assert(dst.columns.toSeq == Seq("k", "s", "g"))
    val byG = dst.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("even" -> 60L, "odd" -> 60L))
    // appends to the partitioned clone keep the layout
    TableIO.appendTable(spark, lh, "cp_dst",
      Seq((1000L, "x", "even")).toDF("k", "s", "g"))
    assert(TableIO.selectTable(spark, lh, "cp_dst").count() == 121)
    assert(TableIO.selectTable(spark, lh, "cp_src").count() == 120)
    TableIO.dropTable(spark, lh, "cp_dst")
    TableIO.dropTable(spark, lh, "cp_src")
  }

  test("writes to the clone diverge it; the source never changes") {
    val base = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "cd_src", base)
    val srcFilesBefore = TableIO.currentFiles(lh, "cd_src")
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
    TableIO.cloneTable(spark, lh, "cd_src", "cd_dst")
    TableIO.mergeTable(spark, lh, "cd_dst",
      Seq((1L, "CHANGED")).toDF("k", "s"), Seq("k"))
    TableIO.appendTable(spark, lh, "cd_dst", Seq((500L, "new")).toDF("k", "s"))
    // clone sees its own writes
    val dst = TableIO.selectTable(spark, lh, "cd_dst")
    assert(dst.count() == 101)
    assert(dst.filter($"k" === 1L).head().getString(1) == "CHANGED")
    // source is untouched: same rows, same files, same mtimes
    val src = TableIO.selectTable(spark, lh, "cd_src")
    assert(src.count() == 100)
    assert(src.filter($"k" === 1L).head().getString(1) == "v1")
    val srcFilesAfter = TableIO.currentFiles(lh, "cd_src")
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
    assert(srcFilesAfter == srcFilesBefore)
    TableIO.dropTable(spark, lh, "cd_dst")
    TableIO.dropTable(spark, lh, "cd_src")
  }

  test("merge on the clone rewrites only touched foreign files; the rest stay references") {
    val base = (1 to 400).map(i => (i.toLong, s"v$i", i % 4)).toDF("k", "s", "g")
    TableIO.writeTable(spark, lh, "cm_src", base, partitionBy = Seq("g"))
    TableIO.cloneTable(spark, lh, "cm_src", "cm_dst")
    TableIO.mergeTable(spark, lh, "cm_dst",
      Seq((4L, "S4", 0)).toDF("k", "s", "g"), Seq("k"))
    // g=1/2/3 partitions still read from the source pool by reference
    val dstDir = Catalog.tablePath(lh, "cm_dst")
    val m = Versioned.readManifest(dstDir,
      Versioned.latestVersion(dstDir).get).get
    val foreign = m.entries.map(_.path).filter(p => Paths.get(p).isAbsolute)
    assert(foreign.nonEmpty, "merge materialized every foreign reference")
    assert(foreign.forall(_.contains("/cm_src/")))
    val local = m.entries.map(_.path).filterNot(p => Paths.get(p).isAbsolute)
    assert(local.nonEmpty, "merge staged no local rewrite")
    assert(TableIO.selectTable(spark, lh, "cm_dst").count() == 400)
    TableIO.dropTable(spark, lh, "cm_dst")
    TableIO.dropTable(spark, lh, "cm_src")
  }

  test("per-file stats ride along: readTable data skipping prunes on the clone") {
    val base = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .repartitionByRange(8, $"k").sortWithinPartitions("k")
    TableIO.writeTable(spark, lh, "cs_src", base)
    TableIO.cloneTable(spark, lh, "cs_src", "cs_dst")
    val dstDir = Catalog.tablePath(lh, "cs_dst")
    val m = Versioned.readManifest(dstDir,
      Versioned.latestVersion(dstDir).get).get
    assert(m.entries.forall(_.stats.nonEmpty), "clone dropped per-file stats")
    val df = TableIO.readTable(spark, lh, "cs_dst",
      condition = "k >= 10 AND k <= 20")
    assert(df.count() == 11)
    assert(df.inputFiles.length < m.entries.size,
      s"no files pruned on the clone (${df.inputFiles.length} of ${m.entries.size})")
    TableIO.dropTable(spark, lh, "cs_dst")
    TableIO.dropTable(spark, lh, "cs_src")
  }

  test("compact materializes the clone: no foreign references remain") {
    val base = (1 to 300).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "cc_src", base)
    TableIO.cloneTable(spark, lh, "cc_src", "cc_dst")
    TableIO.compactTable(spark, lh, "cc_dst")
    val dstDir = Catalog.tablePath(lh, "cc_dst")
    val m = Versioned.readManifest(dstDir,
      Versioned.latestVersion(dstDir).get).get
    assert(m.entries.map(_.path).forall(p => !Paths.get(p).isAbsolute),
      "compact left foreign references")
    // now the source can be dropped without breaking the clone
    TableIO.dropTable(spark, lh, "cc_src")
    assert(TableIO.selectTable(spark, lh, "cc_dst").count() == 300)
    TableIO.dropTable(spark, lh, "cc_dst")
  }

  test("clone carries the evolved partition spec and drop tombstones") {
    val base = (1 to 40).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", s"secret$i")).toDF("k", "g", "c")
    TableIO.writeTable(spark, lh, "cm2_src", base)
    TableIO.evolvePartitioning(spark, lh, "cm2_src", Seq("g"))
    TableIO.dropColumn(spark, lh, "cm2_src", "c")
    TableIO.cloneTable(spark, lh, "cm2_src", "cm2_dst")
    // appends on the clone follow the source's declared (evolved) layout
    TableIO.appendTable(spark, lh, "cm2_dst",
      Seq((100L, "a")).toDF("k", "g"))
    val newFiles = TableIO.currentFiles(lh, "cm2_dst").map(_.toString)
      .filterNot(_.contains("/cm2_src/"))
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("/g=")),
      s"clone ignored the evolved spec: $newFiles")
    // re-adding the dropped column on the clone must NOT resurrect bytes
    TableIO.appendTable(spark, lh, "cm2_dst",
      Seq((101L, "b", "fresh")).toDF("k", "g", "c"))
    val got = TableIO.selectTable(spark, lh, "cm2_dst")
    assert(got.filter($"k" === 3L).head().getAs[String]("c") == null,
      "dropped bytes resurrected through the clone")
    assert(got.filter($"k" === 101L).head().getAs[String]("c") == "fresh")
    TableIO.dropTable(spark, lh, "cm2_dst")
    TableIO.dropTable(spark, lh, "cm2_src")
  }

  test("clone of a clone flattens: references point at the original pool, one hop deep") {
    val base = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "c3_src", base)
    TableIO.cloneTable(spark, lh, "c3_src", "c3_mid")
    TableIO.cloneTable(spark, lh, "c3_mid", "c3_leaf")
    val leafDir = Catalog.tablePath(lh, "c3_leaf")
    val m = Versioned.readManifest(leafDir,
      Versioned.latestVersion(leafDir).get).get
    assert(m.entries.map(_.path).forall(_.contains("/c3_src/")))
    assert(TableIO.selectTable(spark, lh, "c3_leaf").count() == 50)
    Seq("c3_leaf", "c3_mid", "c3_src").foreach(TableIO.dropTable(spark, lh, _))
  }

  test("deep clone: fully detached byte copies — stats carry over, DV " +
      "refs re-point locally, dropping the source leaves the clone whole") {
    val df = (1 to 200).map(i => (i, if (i % 2 == 0) "a" else "b", s"v$i"))
      .toDF("k", "g", "s")
    TableIO.writeTable(spark, lh, "dc_src", df, partitionBy = Seq("g"))
    TableIO.deleteFromTable(spark, lh, "dc_src", "k <= 20",
      deletionVectors = true)
    val expected = TableIO.selectTable(spark, lh, "dc_src")
      .collect().map(r => (r.getInt(0), r.getString(2))).toSet
    TableIO.cloneTable(spark, lh, "dc_src", "dc_deep", deep = true)
    val dstDir = Catalog.tablePath(lh, "dc_deep")
    val m = Versioned.readManifest(dstDir,
      Versioned.latestVersion(dstDir).get).get
    // no absolute references anywhere — the clone owns every byte
    assert(m.entries.forall(e => !java.nio.file.Paths.get(e.path).isAbsolute))
    assert(m.entries.forall(e => Versioned.dvRefOf(e).forall { case (p, _) =>
      !java.nio.file.Paths.get(p).isAbsolute }))
    // stats carried verbatim (no recompute): __bytes present, rows known
    assert(m.entries.forall(_.stats.exists(_.contains("\"__bytes\""))))
    assert(TableIO.tableRowCount(lh, "dc_deep").contains(180L))
    // hive layout reproduced
    assert(m.files.forall(_.contains("g=")))
    // the detachment guarantee: obliterate the source, clone still serves
    TableIO.dropTable(spark, lh, "dc_src")
    val got = TableIO.selectTable(spark, lh, "dc_deep")
      .collect().map(r => (r.getInt(0), r.getString(2))).toSet
    assert(got == expected && got.size == 180)
    assert(TableIO.checkTable(spark, lh, "dc_deep").count() == 0)
    TableIO.dropTable(spark, lh, "dc_deep")
  }

  test("clones carry generated/identity declarations and the identity " +
      "watermark — a clone can never reuse the source's ids") {
    TableIO.writeTable(spark, lh, "cp_src2",
      Seq(("a", 1L), ("b", 1L)).toDF("s", "bucket"))
    TableIO.setGeneratedColumn(spark, lh, "cp_src2", "bucket", "1")
    TableIO.setIdentityColumn(spark, lh, "cp_src2", "id")
    TableIO.appendTable(spark, lh, "cp_src2", Seq("c").toDF("s")) // id 1
    TableIO.cloneTable(spark, lh, "cp_src2", "cp_dst2")
    // identity continues ABOVE the source's watermark on the clone
    TableIO.appendTable(spark, lh, "cp_dst2", Seq("d").toDF("s"))
    val cloneIds = TableIO.selectTable(spark, lh, "cp_dst2")
      .collect().flatMap(r => Option(r.getAs[java.lang.Long]("id"))
        .map(_.longValue)).toSet
    assert(cloneIds == Set(1L, 2L), cloneIds)
    // generated column still computes on the clone
    assert(TableIO.selectTable(spark, lh, "cp_dst2")
      .filter(org.apache.spark.sql.functions.col("s") === "d")
      .head().getAs[Long]("bucket") == 1L)
    // ...and still validates
    intercept[IllegalArgumentException] {
      TableIO.appendTable(spark, lh, "cp_dst2",
        Seq(("e", 7L)).toDF("s", "bucket"))
    }
    Seq("cp_src2", "cp_dst2").foreach(TableIO.dropTable(spark, lh, _))
  }

  test("deep clone of a shallow clone materializes the references") {
    TableIO.writeTable(spark, lh, "dm_src",
      (1 to 60).map(i => (i, s"x$i")).toDF("k", "s"))
    TableIO.cloneTable(spark, lh, "dm_src", "dm_shallow")
    TableIO.cloneTable(spark, lh, "dm_shallow", "dm_deep", deep = true)
    val dstDir = Catalog.tablePath(lh, "dm_deep")
    val m = Versioned.readManifest(dstDir,
      Versioned.latestVersion(dstDir).get).get
    assert(m.entries.forall(e => !java.nio.file.Paths.get(e.path).isAbsolute))
    TableIO.dropTable(spark, lh, "dm_src")
    TableIO.dropTable(spark, lh, "dm_shallow")
    assert(TableIO.selectTable(spark, lh, "dm_deep").count() == 60)
    Seq("dm_deep").foreach(TableIO.dropTable(spark, lh, _))
  }
}
