package graft.lakehouse

import java.nio.file.Files

/** Z-order clustering: interleave math, skew-proof quantile bucketing, and
  * the property that motivates it — file pruning on EVERY clustered
  * dimension, where 1-D sortBy prunes on only one. */
class ZorderSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("zorder_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_z", "lh_z").lakehouses.head
  }

  private def withFixedPartitions[A](f: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("interleave: Morton-curve bit layout, msb first, round-robin") {
    // 2 cols, 8 bits each, a's msb first: (10101010, 01010101) zips to
    // 0b1001100110011001... = 0x9999
    assert(Zorder.interleave(Array(0xAA, 0x55)) == 0x9999L)
    assert(Zorder.interleave(Array(0, 0)) == 0L)
    assert(Zorder.interleave(Array(0xFF, 0xFF)) == 0xFFFFL)
    // one col degenerates to the identity (sortBy equivalence)
    assert(Zorder.interleave(Array(0xC3)) == 0xC3L)
    // adjacent buckets stay adjacent on the curve within a dyadic block:
    // monotone in each arg with the other fixed
    val fixed = 0x80
    val zs = (0 until 256).map(b => Zorder.interleave(Array(fixed, b)))
    assert(zs == zs.sorted, "curve must be monotone in the minor dimension")
  }

  test("withZValue: nulls land in bucket 0; types line up") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, 20.0), (null, 30.0), (4L, null))
      .toDF("a", "b")
    val z = Zorder.withZValue(df, Seq("a", "b"))
    assert(z.columns.contains("__z") && !z.columns.exists(_.startsWith("__zl")))
    val rows = z.collect().map(r => (Option(r.get(0)), r.getLong(2))).toMap
    // the all-null dimension contributes 0 bits -> null-a row sorts before
    // every non-null-a row within the same b bucket region
    assert(rows(None) < rows(Some(4L)),
      "null must bucket lowest (NULLS FIRST clustering)")
    intercept[IllegalArgumentException] {
      // arrays have no linear order to bucket on
      Zorder.withZValue(Seq((Seq(1, 2), 1)).toDF("a", "i"), Seq("a"))
    }
  }

  test("quantile bucketing is skew-proof: a range outlier cannot compress the bulk") {
    // uniform-bucketing over [1, 1e12] would put 9999 of 10000 rows in
    // bucket 0; data-quantile cuts ignore the outlier's magnitude
    val df = ((1 to 9999).map(_.toDouble) :+ 1e12).toDF("v")
    val z = Zorder.withZValue(df, Seq("v")).select("__z").distinct().count()
    assert(z > 200, s"outlier compressed the curve to $z buckets")
  }

  test("z-ordered write prunes files on BOTH dimensions; 1-D sort only on one") {
    // two independent uniform dims — the adversarial case for 1-D sort
    val df = spark.range(0, 40000)
      .selectExpr("(id * 48271) % 40000 AS x", "(id * 16807) % 40000 AS y")
      .repartition(16)
    withFixedPartitions {
      // the suite session pins 4 shuffle partitions; the clustering
      // parallelism (== output file count) follows it, so raise it to make
      // per-dimension pruning observable at fixture scale
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      try {
        TableIO.writeTable(spark, lh, "zboth", df, zorderBy = Seq("x", "y"))
        TableIO.writeTable(spark, lh, "xonly", df, sortBy = Seq("x"))
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    def prunedCount(table: String, c: String): (Int, Int) = {
      val Some((spec, total)) =
        TableIO.pruneFiles(lh, table, c, Some(1000L), Some(3000L))
      (spec.relFiles.size, total)
    }
    val (zx, ztot) = prunedCount("zboth", "x")
    val (zy, _) = prunedCount("zboth", "y")
    val (sx, stot) = prunedCount("xonly", "x")
    val (sy, _) = prunedCount("xonly", "y")
    assert(ztot > 4, "fixture must span enough files to show pruning")
    assert(zx < ztot && zy < ztot,
      s"zorder must prune both dims (x: $zx/$ztot, y: $zy/$ztot)")
    assert(sx < stot, "1-D sort must prune its own dim")
    assert(sy == stot, "1-D sort cannot prune the other dim")
    // and correctness: pruned scan == full filtered scan on both dims
    for (c <- Seq("x", "y")) {
      val pruned = TableIO.prunedScan(spark, lh, "zboth", c,
        Some(1000L), Some(3000L)).orderBy("x", "y").collect()
      val full = TableIO.selectTable(spark, lh, "zboth")
        .filter(s"$c >= 1000 AND $c <= 3000").orderBy("x", "y").collect()
      assert(pruned.sameElements(full))
    }
    TableIO.dropTable(spark, lh, "zboth")
    TableIO.dropTable(spark, lh, "xonly")
  }

  test("string dimensions z-cluster too: both a string and a numeric " +
      "range prune after a mixed zorder write") {
    val df = spark.range(0, 40000)
      .selectExpr(
        "concat('user_', lpad(CAST((id * 48271) % 40000 AS STRING), 6, '0')) AS name",
        "(id * 16807) % 40000 AS score")
      .repartition(16)
    withFixedPartitions {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      try TableIO.writeTable(spark, lh, "zmixed", df,
        zorderBy = Seq("name", "score"))
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val Some((sSpec, total)) = TableIO.pruneFiles(lh, "zmixed", "name",
      Some("user_010000"), Some("user_012000"))
    val Some((nSpec, _)) = TableIO.pruneFiles(lh, "zmixed", "score",
      Some(1000L), Some(3000L))
    assert(total > 4)
    assert(sSpec.relFiles.size < total,
      s"string dim must prune (${sSpec.relFiles.size}/$total)")
    assert(nSpec.relFiles.size < total,
      s"numeric dim must prune (${nSpec.relFiles.size}/$total)")
    // correctness on the string dimension
    val pruned = TableIO.prunedScan(spark, lh, "zmixed", "name",
      Some("user_010000"), Some("user_012000")).orderBy("name", "score").collect()
    val full = TableIO.selectTable(spark, lh, "zmixed")
      .filter($"name" >= "user_010000" && $"name" <= "user_012000")
      .orderBy("name", "score").collect()
    assert(pruned.sameElements(full) && pruned.nonEmpty)
    TableIO.dropTable(spark, lh, "zmixed")
  }

  test("compactTable(zorderBy) re-clusters an unsorted table in place") {
    val df = spark.range(0, 20000)
      .selectExpr("(id * 48271) % 20000 AS x", "(id * 16807) % 20000 AS y")
      .repartition(8)
    withFixedPartitions {
      TableIO.writeTable(spark, lh, "reclust", df) // unclustered
      val before = TableIO.pruneFiles(lh, "reclust", "y",
        Some(100L), Some(600L)).get
      assert(before._1.relFiles.size == before._2,
        "unclustered table should not prune")
      TableIO.compactTable(spark, lh, "reclust", targetFileBytes = 16 * 1024,
        zorderBy = Seq("x", "y"))
    }
    val (spec, total) = TableIO.pruneFiles(lh, "reclust", "y",
      Some(100L), Some(600L)).get
    assert(total > 2 && spec.relFiles.size < total,
      s"optimize-zorder should enable pruning (${spec.relFiles.size}/$total)")
    assert(TableIO.selectTable(spark, lh, "reclust").count() == 20000)
    TableIO.dropTable(spark, lh, "reclust")
  }

  test("hilbertIndex: bijective over the 2-D grid and every curve step " +
      "moves to a grid NEIGHBOR (the defining Hilbert property, which " +
      "Morton lacks); 1-D passes through") {
    val side = 1 << Zorder.BitsPerCol // 256
    val cells = for (x <- 0 until side; y <- 0 until side) yield (x, y)
    val indexed = cells.map { case (x, y) =>
      (Zorder.hilbertIndex(Array(x, y)), x, y) }
    // bijection onto 0 .. side^2 - 1
    assert(indexed.map(_._1).sorted == (0L until side.toLong * side))
    // unit-step adjacency along the whole curve
    val walk = indexed.sortBy(_._1)
    walk.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump at ($x1,$y1)->($x2,$y2)")
    }
    // Morton, by contrast, jumps: count the non-unit steps it takes
    val mortonWalk = cells.map { case (x, y) =>
      (Zorder.interleave(Array(x, y)), x, y) }.sortBy(_._1)
    val mortonJumps = mortonWalk.sliding(2).count {
      case Seq((_, x1, y1), (_, x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) != 1 }
    assert(mortonJumps > 0)
    assert(Zorder.hilbertIndex(Array(173)) == 173L)
  }

  test("hilbert clustering prunes on every clustered dimension; " +
      "clusterIncremental clusters ONLY post-baseline files") {
    val df = spark.range(0, 20000)
      .selectExpr("(id * 48271) % 20000 AS x", "(id * 16807) % 20000 AS y")
      .repartition(8)
    withFixedPartitions {
      TableIO.writeTable(spark, lh, "hil1", df)
      TableIO.compactTable(spark, lh, "hil1", targetFileBytes = 16 * 1024,
        zorderBy = Seq("x", "y"), hilbert = true)
    }
    val (spec, total) = TableIO.pruneFiles(lh, "hil1", "y",
      Some(100L), Some(600L)).get
    assert(total > 2 && spec.relFiles.size < total,
      s"hilbert clustering should enable pruning (${spec.relFiles.size}/$total)")
    val (specX, _) = TableIO.pruneFiles(lh, "hil1", "x",
      Some(100L), Some(600L)).get
    assert(specX.relFiles.size < total)
    assert(TableIO.selectTable(spark, lh, "hil1").count() == 20000)

    // incremental pass: append unclustered data, cluster only that
    val dir = Catalog.tablePath(lh, "hil1")
    val clustered = Versioned.latestVersion(dir)
      .flatMap(Versioned.readManifest(dir, _)).get.files.toSet
    withFixedPartitions {
      TableIO.appendTable(spark, lh, "hil1", spark.range(20000, 40000)
        .selectExpr("(id * 48271) % 20000 AS x", "(id * 16807) % 20000 AS y")
        .repartition(4))
      TableIO.clusterIncremental(spark, lh, "hil1", Seq("x", "y"),
        targetFileBytes = 16 * 1024, hilbert = true)
    }
    val m2 = Versioned.latestVersion(dir)
      .flatMap(Versioned.readManifest(dir, _)).get
    // every originally-clustered file survives BY REFERENCE
    assert(clustered.subsetOf(m2.files.toSet),
      "incremental clustering must not rewrite the clustered baseline")
    assert(TableIO.selectTable(spark, lh, "hil1").count() == 40000)
    // a second incremental run with nothing new inherits everything
    val filesBefore = m2.files.toSet
    TableIO.clusterIncremental(spark, lh, "hil1", Seq("x", "y"))
    val m3 = Versioned.latestVersion(dir)
      .flatMap(Versioned.readManifest(dir, _)).get
    assert(m3.files.toSet == filesBefore)
    TableIO.dropTable(spark, lh, "hil1")
  }
}
