package graft.lakehouse

import java.nio.file.Files

class TableIOSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("tio_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_tio", "lh_tio").lakehouses.head
  }

  test("getSQL: projection, escaping, distinct-as-group-by") {
    assert(TableIO.getSQL("t", Seq("a", "b c")) == "SELECT a, `b c` FROM t")
    assert(TableIO.getSQL("t", Seq("a"), distinct = true)
      == "SELECT a FROM t GROUP BY a")
    assert(TableIO.getSQL("t", Seq("*")) == "SELECT * FROM t")
  }

  test("write/select/read/drop round-trip + registry") {
    val df = Seq((1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)).toDF("k", "g", "v")
    val info = TableIO.writeTable(spark, lh, "t1", df)
    assert(info.rowCount == 3 && info.colCount == 3)
    assert(Catalog.getTables(lh).contains("t1"))
    assert(Catalog.allTables.contains("t1"))

    val full = TableIO.selectTable(spark, lh, "t1")
    assert(full.count() == 3)

    val filtered = TableIO.readTable(spark, lh, "t1", Seq("k", "v"), "v > 2.0")
    assert(filtered.columns.toSeq == Seq("k", "v"))
    assert(filtered.count() == 2)

    val distinct = TableIO.getColsFromTable(spark, lh, "t1", Seq("g"), distinct = true)
    assert(distinct.count() == 2)

    TableIO.dropTable(spark, lh, "t1")
    assert(!Catalog.getTables(lh).contains("t1"))
    assert(!Catalog.allTables.contains("t1"))
  }

  test("writeTable partitionBy produces hive-style layout") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "g")
    TableIO.writeTable(spark, lh, "t2", df, partitionBy = Seq("g"))
    val sub = Catalog.getTables(lh)
    assert(sub.contains("t2"))
    val dir = new java.io.File(TableIO.currentDataPath(lh, "t2"))
    assert(dir.listFiles().exists(_.getName.startsWith("g=")))
    val back = TableIO.selectTable(spark, lh, "t2")
    assert(back.count() == 2)
    TableIO.dropTable(spark, lh, "t2")
  }

  test("versioned overwrite: readers keep a consistent snapshot") {
    val v1 = Seq((1, "one"), (2, "two")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "tv", v1)
    val readerOnV1 = TableIO.selectTable(spark, lh, "tv")
    assert(readerOnV1.count() == 2)

    // overwrite while the v1 reader is still alive
    val v2 = Seq((10, "ten"), (20, "twenty"), (30, "thirty")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "tv", v2)

    // the old reader still scans the immutable v1 snapshot...
    assert(readerOnV1.count() == 2)
    assert(readerOnV1.select("k").collect().map(_.getInt(0)).toSet == Set(1, 2))
    // ...and a fresh read resolves to v2
    val readerOnV2 = TableIO.selectTable(spark, lh, "tv")
    assert(readerOnV2.count() == 3)
    assert(Versioned.latestVersion(Catalog.tablePath(lh, "tv")).contains(2L))

    // a third commit sweeps v1 (retention = 2) but keeps v2
    TableIO.writeTable(spark, lh, "tv", v1)
    val tdir = new java.io.File(Catalog.tablePath(lh, "tv"))
    val versions = tdir.listFiles().map(_.getName).filter(_.startsWith("_v")).toSet
    assert(versions == Set("_v2", "_v3"), s"got $versions")
    TableIO.dropTable(spark, lh, "tv")
  }

  test("a crashed writer's orphaned version dir never wedges the table") {
    val v1 = Seq((1, "a")).toDF("k", "s")
    TableIO.writeTable(spark, lh, "trace", v1)
    // simulate a writer that died mid-write, leaving a partial _v2
    val orphan = java.nio.file.Paths.get(Catalog.tablePath(lh, "trace"), "_v2")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-junk.parquet"),
      Array[Byte](1, 2, 3))
    // the next commit skips past the orphan instead of colliding with it
    TableIO.writeTable(spark, lh, "trace", Seq((2, "b"), (3, "c")).toDF("k", "s"))
    assert(Versioned.latestVersion(Catalog.tablePath(lh, "trace")).contains(3L))
    assert(TableIO.selectTable(spark, lh, "trace").count() == 2)
    // and the orphan is swept once it falls out of the retention window
    TableIO.writeTable(spark, lh, "trace", v1) // -> _v4; sweeps <= 2
    assert(!java.nio.file.Files.exists(orphan))
    assert(TableIO.selectTable(spark, lh, "trace").count() == 1)
    TableIO.dropTable(spark, lh, "trace")
  }

  test("interleaved commits stay monotonic; slow writer cannot move table back") {
    val tdir = Catalog.tablePath(lh, "trace2")
    TableIO.writeTable(spark, lh, "trace2", Seq((1, "a")).toDF("k", "s")) // v1
    // writer A claims its version and, mid-write, writer B runs a complete
    // allocate+write+commit cycle (simulated by nesting B inside A's write)
    var innerPath = ""
    val outerPath = Versioned.commit(tdir) { target =>
      innerPath = Versioned.commit(tdir) { t2 =>
        Seq((3, "c")).toDF("k", "s").write.mode("append").parquet(t2)
      }
      Seq((2, "b")).toDF("k", "s").write.mode("append").parquet(target)
    }
    // B allocated PAST A's claimed dir and committed first; A's later commit
    // lands as an earlier version — latest stays the max committed marker
    assert(outerPath.endsWith("_v2") && innerPath.endsWith("_v3"),
      s"$outerPath / $innerPath")
    assert(Versioned.latestVersion(tdir).contains(3L))
    assert(Versioned.isCommitted(tdir, 2L)) // superseded but committed
    assert(TableIO.selectTable(spark, lh, "trace2").head().getInt(0) == 3)
    TableIO.dropTable(spark, lh, "trace2")
  }

  test("writeTable sortBy clusters files into near-disjoint key ranges") {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val df = spark.range(0, 20000).selectExpr(
      "cast(rand(7) * 1000000 as long) AS k", "id AS payload").repartition(8)
    // AQE coalesces this tiny fixture to one range partition (sub-MB
    // shuffle); disable coalescing so the clustering property is observable
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try TableIO.writeTable(spark, lh, "tsorted", df, sortBy = Seq("k"))
    finally prev match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
    val ranges = spark.read.parquet(TableIO.currentDataPath(lh, "tsorted"))
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    // consecutive files must not overlap (range partitioning boundary rows
    // aside, lo of file i+1 >= hi of file i)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(lo2 >= hi1, ranges.mkString(","))
      case _ =>
    }
    // row count preserved through the clustering rewrite
    assert(TableIO.selectTable(spark, lh, "tsorted").count() == 20000)
    TableIO.dropTable(spark, lh, "tsorted")
  }

  test("mergeTable upserts by key; time travel reads prior versions") {
    val base = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("k", "s", "v")
    TableIO.writeTable(spark, lh, "tmerge", base)
    val updates = Seq((2, "b2", 99), (4, "d", 40)).toDF("k", "s", "v")
    val info = TableIO.mergeTable(spark, lh, "tmerge", updates, Seq("k"))
    assert(info.rowCount == 4) // 1,3 kept; 2 updated; 4 inserted
    val rows = TableIO.selectTable(spark, lh, "tmerge")
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(rows == Map(1 -> ("a", 10), 2 -> ("b2", 99), 3 -> ("c", 30),
      4 -> ("d", 40)))
    // version 1 (pre-merge) is still readable within the retention window
    val v1 = TableIO.selectTableVersion(spark, lh, "tmerge", 1L)
    assert(v1.count() == 3)
    assert(v1.filter($"k" === 2).head().getString(1) == "b")
    intercept[IllegalArgumentException] {
      TableIO.selectTableVersion(spark, lh, "tmerge", 99L)
    }
    TableIO.dropTable(spark, lh, "tmerge")
  }

  test("mergeTable rejects duplicate update keys; maintenance keeps partitioning") {
    val base = Seq((1, "x", "a"), (2, "y", "b")).toDF("k", "s", "g")
    TableIO.writeTable(spark, lh, "tpart", base, partitionBy = Seq("g"))
    intercept[IllegalArgumentException] {
      TableIO.mergeTable(spark, lh, "tpart",
        Seq((2, "y2", "b"), (2, "y3", "b")).toDF("k", "s", "g"), Seq("k"))
    }
    // a clean merge preserves the hive layout through the rewrite
    TableIO.mergeTable(spark, lh, "tpart",
      Seq((3, "z", "a")).toDF("k", "s", "g"), Seq("k"))
    val dir = new java.io.File(TableIO.currentDataPath(lh, "tpart"))
    assert(dir.listFiles().exists(_.getName.startsWith("g=")),
      dir.listFiles().map(_.getName).mkString(","))
    assert(TableIO.selectTable(spark, lh, "tpart").count() == 3)
    // compaction preserves it too
    TableIO.compactTable(spark, lh, "tpart")
    val dir2 = new java.io.File(TableIO.currentDataPath(lh, "tpart"))
    assert(dir2.listFiles().exists(_.getName.startsWith("g=")))
    TableIO.dropTable(spark, lh, "tpart")
  }

  test("compactTable merges small files into a new atomic version") {
    val df = spark.range(0, 10000).selectExpr("id AS k", "id % 7 AS g")
      .repartition(16) // 16 small files
    TableIO.writeTable(spark, lh, "tcomp", df)
    def parquetFiles(): Int = {
      val d = new java.io.File(TableIO.currentDataPath(lh, "tcomp"))
      d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    assert(parquetFiles() == 16)
    val v1 = Versioned.latestVersion(Catalog.tablePath(lh, "tcomp"))
    val info = TableIO.compactTable(spark, lh, "tcomp") // tiny -> 1 file
    assert(parquetFiles() == 1)
    assert(info.rowCount == 10000)
    assert(Versioned.latestVersion(Catalog.tablePath(lh, "tcomp"))
      .exists(v => v1.exists(_ < v)))
    // contents identical after compaction
    assert(TableIO.selectTable(spark, lh, "tcomp")
      .agg(org.apache.spark.sql.functions.sum("k")).head().getLong(0)
      == (9999L * 10000L) / 2)
    TableIO.dropTable(spark, lh, "tcomp")
  }

  test("pre-protocol directories stay readable; legacy files swept later") {
    val legacyDir = Catalog.tablePath(lh, "tlegacy")
    Seq((7, "x")).toDF("k", "s").write.parquet(legacyDir) // no pointer file
    assert(TableIO.selectTable(spark, lh, "tlegacy").count() == 1)
    def legacyFiles(): Int = new java.io.File(legacyDir).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(legacyFiles() > 0)
    // first versioned commit leaves the legacy copy (grace for readers)...
    TableIO.writeTable(spark, lh, "tlegacy", Seq((8, "y")).toDF("k", "s"))
    assert(legacyFiles() > 0)
    // ...the second sweeps it
    TableIO.writeTable(spark, lh, "tlegacy", Seq((9, "z")).toDF("k", "s"))
    assert(legacyFiles() == 0)
    assert(TableIO.selectTable(spark, lh, "tlegacy").count() == 1)
    TableIO.dropTable(spark, lh, "tlegacy")
  }

  test("selectTable on a missing table surfaces the root cause") {
    val e = intercept[Exception](TableIO.selectTable(spark, lh, "nope").collect())
    assert(e.getMessage.toLowerCase.contains("nope")
      || TableIO.rootCause(e).getMessage.toLowerCase.contains("path"))
  }

  test("sqlQueryDataFrame: multi-view join") {
    val a = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val b = Seq((1, 10.0)).toDF("id", "w")
    val out = QueryApi.sqlQueryDataFrame(spark, Seq(a, b), Seq("qa_t", "qb_t"),
      "SELECT qa_t.id, v, w FROM qa_t JOIN qb_t ON qa_t.id = qb_t.id")
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(1))
    intercept[IllegalArgumentException](
      QueryApi.sqlQueryDataFrame(spark, Seq(a), Seq("x", "y"), "SELECT 1"))
  }
}
