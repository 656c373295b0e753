package graft.lakehouse

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Per-file column stats (manifest data skipping), stat-pruned scans, and
  * file-level DELETE. */
class DataSkippingSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("skip_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_skip", "lh_skip").lakehouses.head
  }

  private def withFixedPartitions[A](f: => A): A = {
    // AQE coalesces tiny fixtures into one file; pin partitions so the
    // multi-file clustering property is observable at test scale
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("manifests record per-file min/max; clustered range scans prune most files") {
    val df = spark.range(0, 40000).selectExpr("id AS k", "id % 97 AS payload")
      .repartition(8)
    withFixedPartitions {
      TableIO.writeTable(spark, lh, "clustered", df, sortBy = Seq("k"))
    }
    val tdir = Catalog.tablePath(lh, "clustered")
    val m = Versioned.readManifest(tdir, Versioned.latestVersion(tdir).get).get
    assert(m.entries.size > 1, "fixture should span multiple files")
    assert(m.entries.forall(_.stats.nonEmpty), "every file needs stats")

    // narrow range over the k-clustered table: most files must prune away
    val Some((spec, total)) =
      TableIO.pruneFiles(lh, "clustered", "k", Some(100L), Some(200L))
    assert(total == m.entries.size)
    assert(spec.relFiles.size < total,
      s"pruned ${spec.relFiles.size} of $total — clustering should skip files")

    // and the pruned result is EXACTLY the unpruned filtered result
    val pruned = TableIO.prunedScan(spark, lh, "clustered", "k",
      Some(100L), Some(200L)).orderBy("k").collect()
    val full = TableIO.selectTable(spark, lh, "clustered")
      .filter($"k" >= 100L && $"k" <= 200L).orderBy("k").collect()
    assert(pruned.sameElements(full) && pruned.length == 101)
    TableIO.dropTable(spark, lh, "clustered")
  }

  test("pruning is conservative on unclustered data and string columns") {
    val df = Seq((5L, "banana"), (1L, "apple"), (9L, "cherry"), (3L, "apricot"))
      .toDF("k", "s").repartition(2)
    withFixedPartitions { TableIO.writeTable(spark, lh, "uncl", df) }
    val got = TableIO.prunedScan(spark, lh, "uncl", "s",
      Some("apple"), Some("apricot")).select("s").collect()
      .map(_.getString(0)).toSet
    assert(got == Set("apple", "apricot"))
    // open-ended ranges work too
    assert(TableIO.prunedScan(spark, lh, "uncl", "k", lo = Some(5L), hi = None)
      .count() == 2)
    TableIO.dropTable(spark, lh, "uncl")
  }

  test("timestamp stats prune by PARSED value, not string rendering") {
    // java.sql.Timestamp.toString renders '...56.0' where Spark's stat
    // string is '...56' — a raw string compare would prune the boundary row
    val ts = java.sql.Timestamp.valueOf("2024-01-01 12:34:56")
    val rows = (0 until 1000).map(i =>
      (i.toLong, new java.sql.Timestamp(ts.getTime + i * 60000L)))
      .toDF("k", "t")
    withFixedPartitions {
      TableIO.writeTable(spark, lh, "tsed", rows.repartition(4), sortBy = Seq("t"))
    }
    // range pinned exactly at a recorded max: the boundary row must survive
    val got = TableIO.prunedScan(spark, lh, "tsed", "t", Some(ts), Some(ts))
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 0L,
      s"boundary timestamp row lost to string-compare pruning: ${got.length}")
    // and equality probing by the boxed timestamp type works end to end
    val mid = new java.sql.Timestamp(ts.getTime + 500 * 60000L)
    assert(TableIO.prunedScan(spark, lh, "tsed", "t", Some(mid), Some(mid))
      .count() == 1)
    TableIO.dropTable(spark, lh, "tsed")
  }

  test("prunedTopK reads only the files that can hold the k extremes") {
    val df = spark.range(0, 40000).selectExpr("id AS k", "id % 97 AS payload")
      .repartition(8)
    withFixedPartitions {
      TableIO.writeTable(spark, lh, "topk", df, sortBy = Seq("k"))
    }
    val total = TableIO.currentFiles(lh, "topk").size
    assert(total > 2)
    val top = TableIO.prunedTopK(spark, lh, "topk", "k", 50,
      ascending = true, tieBreak = Seq("payload"))
    assert(top.inputFiles.length < total,
      s"top-k over a clustered table must prune (${top.inputFiles.length}/$total)")
    val want = TableIO.selectTable(spark, lh, "topk")
      .orderBy("k", "payload").limit(50).collect()
    assert(top.collect().sameElements(want))
    // descending twin
    val bot = TableIO.prunedTopK(spark, lh, "topk", "k", 50,
      ascending = false, tieBreak = Seq("payload"))
    val wantD = TableIO.selectTable(spark, lh, "topk")
      .orderBy($"k".desc, $"payload".desc).limit(50).collect()
    assert(bot.inputFiles.length < total)
    assert(bot.collect().sameElements(wantD))
    TableIO.dropTable(spark, lh, "topk")
  }

  test("prunedTopK counts only NON-NULL rows toward the k-row prefix") {
    // file A: few non-null values but many nulls; file B holds the real
    // answers — counting total rows would bound on A and wrongly prune B
    val a = (1 to 2).map(i => (Some(i.toLong), "a")) ++
      (1 to 98).map(_ => (None: Option[Long], "a"))
    val b = (3 to 102).map(i => (Some(i.toLong), "b"))
    val df = (a ++ b).toDF("k", "src")
    withFixedPartitions {
      TableIO.writeTable(spark, lh, "nulltopk",
        df.repartitionByRange(2, $"src")) // co-locate: A null-heavy, B dense
    }
    // the premise must hold or the regression cover is vacuous
    val tdir = Catalog.tablePath(lh, "nulltopk")
    assert(Versioned.readManifest(tdir,
      Versioned.latestVersion(tdir).get).get.entries.size == 2)
    val top = TableIO.prunedTopK(spark, lh, "nulltopk", "k", 10,
      ascending = true, tieBreak = Seq("src"))
    val got = top.collect().map(_.getLong(0)).toSeq
    assert(got == (1L to 10L).toSeq,
      s"null-heavy file must not satisfy the prefix: got $got")
    TableIO.dropTable(spark, lh, "nulltopk")
  }

  test("null-count stats prune IS NULL / IS NOT NULL scans") {
    // file A dense, file B all-null, file C mixed
    val df = ((1 to 100).map(i => (Some(i.toLong), "a")) ++
      (1 to 100).map(_ => (None: Option[Long], "b")) ++
      (1 to 50).map(i => (if (i % 2 == 0) Some(i.toLong) else None, "c")))
      .toDF("v", "src")
    withFixedPartitions {
      TableIO.writeTable(spark, lh, "nulls",
        df.repartitionByRange(3, $"src"))
    }
    val Some((isNullSpec, total)) = TableIO.pruneFilesNull(lh, "nulls", "v", isNull = true)
    val Some((notNullSpec, _)) = TableIO.pruneFilesNull(lh, "nulls", "v", isNull = false)
    assert(total >= 3)
    assert(isNullSpec.relFiles.size < total, "dense file should prune for IS NULL")
    assert(notNullSpec.relFiles.size < total, "all-null file should prune for IS NOT NULL")
    assert(TableIO.prunedScanNull(spark, lh, "nulls", "v", isNull = true).count() == 125)
    assert(TableIO.prunedScanNull(spark, lh, "nulls", "v", isNull = false).count() == 125)
    TableIO.dropTable(spark, lh, "nulls")
  }

  test("readTable mines its condition for automatic file skipping") {
    val df = spark.range(0, 40000).selectExpr("id AS k", "id % 97 AS payload")
      .repartition(8)
    withFixedPartitions {
      TableIO.writeTable(spark, lh, "autoskip", df, sortBy = Seq("k"))
    }
    val total = TableIO.currentFiles(lh, "autoskip").size
    assert(total > 2)
    // mixed condition: two recognizable range conjuncts + one opaque one
    val got = TableIO.readTable(spark, lh, "autoskip",
      condition = "k >= 100 AND k <= 200 AND payload % 2 = 0")
    assert(got.inputFiles.length < total,
      s"condition should prune files (${got.inputFiles.length}/$total)")
    val want = TableIO.selectTable(spark, lh, "autoskip")
      .filter("k >= 100 AND k <= 200 AND payload % 2 = 0")
    assert(got.orderBy("k").collect().sameElements(want.orderBy("k").collect()))
    // fully opaque conditions stay conservative and correct
    val opaque = TableIO.readTable(spark, lh, "autoskip",
      condition = "payload % 97 = 3")
    assert(opaque.count() ==
      TableIO.selectTable(spark, lh, "autoskip").filter("payload % 97 = 3").count())
    TableIO.dropTable(spark, lh, "autoskip")
  }

  test("inherited files keep their stats through merge commits") {
    val df = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
      .repartition(4)
    withFixedPartitions { TableIO.writeTable(spark, lh, "keep", df, sortBy = Seq("k")) }
    TableIO.mergeTable(spark, lh, "keep",
      Seq((1L, 999L)).toDF("k", "v"), Seq("k"))
    val tdir = Catalog.tablePath(lh, "keep")
    val m = Versioned.readManifest(tdir, Versioned.latestVersion(tdir).get).get
    assert(m.entries.forall(_.stats.nonEmpty),
      "inherited entries must carry their original stats")
    TableIO.dropTable(spark, lh, "keep")
  }

  test("deleteFromTable rewrites only files containing matches; NULL " +
      "condition rows are kept") {
    val base = (1 to 100).map(i =>
      (i, if (i % 10 == 0) None else Some(i * 1.0),
        if (i % 2 == 0) "a" else "b")).toDF("k", "score", "g")
    TableIO.writeTable(spark, lh, "del1", base, partitionBy = Seq("g"))
    val before = TableIO.currentFiles(lh, "del1").map(p =>
      p.toString -> Files.getLastModifiedTime(p).toMillis).toMap

    // delete even keys with score < 30 — only partition g=a holds matches
    val info = TableIO.deleteFromTable(spark, lh, "del1", "g = 'a' AND score < 30")
    val after = TableIO.currentFiles(lh, "del1").map(p =>
      p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    val beforeB = before.filter(_._1.contains("/g=b/"))
    assert(beforeB.toSet.subsetOf(after.toSet), "g=b files were rewritten")

    val remaining = TableIO.selectTable(spark, lh, "del1")
    // deleted: even k in [2,28] with non-null score -> 2..28 even minus k=10,20
    assert(info.rowCount == 100 - 12)
    // NULL-scoring rows (k=10, 20) survive: condition evaluates NULL, not true
    val keys = remaining.select("k").collect().map(_.getInt(0)).toSet
    assert(keys.contains(10) && keys.contains(20) && !keys.contains(2))
    TableIO.dropTable(spark, lh, "del1")
  }

  test("delete with no matches inherits everything (zero-write commit)") {
    TableIO.writeTable(spark, lh, "del2", Seq((1, "x"), (2, "y")).toDF("k", "s"))
    val before = TableIO.currentFiles(lh, "del2").map(_.toString).toSet
    val v0 = Versioned.latestVersion(Catalog.tablePath(lh, "del2")).get
    TableIO.deleteFromTable(spark, lh, "del2", "k > 100")
    assert(TableIO.currentFiles(lh, "del2").map(_.toString).toSet == before)
    assert(Versioned.latestVersion(Catalog.tablePath(lh, "del2")).get == v0 + 1)
    assert(TableIO.selectTable(spark, lh, "del2").count() == 2)
    TableIO.dropTable(spark, lh, "del2")
  }
}
