package graft.lakehouse

import java.nio.file.Files

/** Per-file Bloom filters: the bitset math (no false negatives, bounded
  * false positives) and the equality-probe file skipping built on it. */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("bloom_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_bloom", "lh_bloom").lakehouses.head
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

  // a cheap 64-bit mixer standing in for xxhash64 in the pure-bitset tests
  private def mix(i: Long): Long = {
    var h = i * -7046029254386353131L
    h ^= h >>> 32; h *= -4417276706812531889L; h ^= h >>> 29
    h
  }

  test("bitset: no false negatives ever; false positives bounded by sizing") {
    val agg = new Bloom.Agg(Bloom.DefaultBits)
    val words = (0L until 10000L).map(mix).foldLeft(agg.zero)(agg.reduce)
    assert((0L until 10000L).forall(i => Bloom.mayContain(words, mix(i))),
      "a bloom filter must never report an inserted value absent")
    val fps = (100000L until 110000L).count(i => Bloom.mayContain(words, mix(i)))
    // n=10k, m=64Ki, k=5 -> fpp = (1-e^(-kn/m))^k ~ 4.3%; allow slack
    assert(fps < 700, s"$fps/10000 false positives — sizing broken")
    // base64 roundtrip preserves the bitset
    val rt = Bloom.decode(Bloom.encode(words))
    assert(rt.sameElements(words))
  }

  test("equality probe prunes files lacking the key; results stay exact") {
    // high-cardinality UNCLUSTERED keys: min/max ranges all overlap, so any
    // pruning observed here is the bloom's doing
    val df = spark.range(0, 40000)
      .selectExpr("xxhash64(id) % 1000000000 AS k", "id AS payload")
      .repartition(8)
    withFixedPartitions {
      TableIO.writeTable(spark, lh, "pts", df, bloomFilterFor = Seq("k"))
    }
    val tdir = Catalog.tablePath(lh, "pts")
    val m = Versioned.readManifest(tdir, Versioned.latestVersion(tdir).get).get
    assert(m.entries.size > 4)
    assert(m.entries.forall(_.stats.exists(_.contains(Bloom.StatsPrefix + "k"))))

    // a key that exists in exactly one file
    val probe = TableIO.selectTable(spark, lh, "pts")
      .selectExpr("k").head.getLong(0)
    val Some((presentSpec, total)) = TableIO.pruneFilesEq(spark, lh, "pts", "k", probe)
    assert(presentSpec.relFiles.nonEmpty && presentSpec.relFiles.size < total,
      s"present-key probe kept ${presentSpec.relFiles.size}/$total files")
    val got = TableIO.prunedScanEq(spark, lh, "pts", "k", probe)
      .orderBy("payload").collect()
    val want = TableIO.selectTable(spark, lh, "pts")
      .filter($"k" === probe).orderBy("payload").collect()
    assert(got.sameElements(want) && got.nonEmpty)

    // an absent key: (almost) everything prunes; result is exactly empty
    val Some((absentSpec, _)) =
      TableIO.pruneFilesEq(spark, lh, "pts", "k", -1234567890123L)
    assert(absentSpec.relFiles.size <= 1,
      s"absent-key probe kept ${absentSpec.relFiles.size} files")
    assert(TableIO.prunedScanEq(spark, lh, "pts", "k", -1234567890123L).count() == 0)
    TableIO.dropTable(spark, lh, "pts")
  }

  test("maintenance commits keep collecting blooms for indexed columns") {
    TableIO.writeTable(spark, lh, "keepb",
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "s"),
      bloomFilterFor = Seq("k"))
    TableIO.appendTable(spark, lh, "keepb",
      Seq((1001L, "new")).toDF("k", "s"))
    val tdir = Catalog.tablePath(lh, "keepb")
    val m = Versioned.readManifest(tdir, Versioned.latestVersion(tdir).get).get
    assert(m.entries.forall(_.stats.exists(_.contains(Bloom.StatsPrefix + "k"))),
      "appended files must get blooms for the table's indexed columns")
    // probe for the appended key finds it
    assert(TableIO.prunedScanEq(spark, lh, "keepb", "k", 1001L).count() == 1)
    TableIO.dropTable(spark, lh, "keepb")
  }
}
