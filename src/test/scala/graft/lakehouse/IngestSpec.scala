package graft.lakehouse

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

/** COPY INTO: idempotent file ingestion with a versioned loaded-file
  * ledger. The contract under test: same directory twice = no-op, new
  * files load alone, racing loaders never double-load, the ledger rides
  * RESTORE/overwrite with the data, and schema mismatches fail loudly. */
class IngestSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("ingest_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_ing", "lh_ing").lakehouses.head
  }

  private def srcDir(): String =
    Files.createTempDirectory("ingest_src").toString

  private def writeCsv(dir: String, name: String, rows: Seq[(Int, String)],
      header: String = "k,s"): Unit = {
    val lines = header +: rows.map { case (k, s) => s"$k,$s" }
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes(UTF_8))
  }

  private val kvSchema = StructType(Seq(
    StructField("k", IntegerType), StructField("s", StringType)))

  private def rowsOf(table: String): Set[(Int, String)] =
    TableIO.selectTable(spark, lh, table).as[(Int, String)].collect().toSet

  test("copyInto loads once, reloads as a no-op, and loads only new files") {
    val src = srcDir()
    writeCsv(src, "b1.csv", Seq(1 -> "a", 2 -> "b"))
    val r1 = Ingest.copyInto(spark, lh, "ing1", src,
      schema = Some(kvSchema))
    assert(r1.filesLoaded == 1 && r1.rowsLoaded == 2, r1)
    // identical re-run: nothing loads, nothing commits
    val vBefore = Versioned.latestVersion(Catalog.tablePath(lh, "ing1"))
    val r2 = Ingest.copyInto(spark, lh, "ing1", src, schema = Some(kvSchema))
    assert(r2.filesLoaded == 0 && r2.filesSkipped == 1, r2)
    assert(Versioned.latestVersion(Catalog.tablePath(lh, "ing1")) == vBefore)
    // a new file loads alone; the old one stays skipped
    writeCsv(src, "b2.csv", Seq(3 -> "c"))
    val r3 = Ingest.copyInto(spark, lh, "ing1", src, schema = Some(kvSchema))
    assert(r3.filesLoaded == 1 && r3.filesSkipped == 1 &&
      r3.rowsLoaded == 1, r3)
    assert(rowsOf("ing1") == Set(1 -> "a", 2 -> "b", 3 -> "c"))
    TableIO.dropTable(spark, lh, "ing1")
  }

  test("hidden and underscore files are not loadable; force reloads") {
    val src = srcDir()
    writeCsv(src, "b1.csv", Seq(1 -> "a"))
    writeCsv(src, "_SUCCESS.csv", Seq(9 -> "x"))
    writeCsv(src, ".hidden.csv", Seq(8 -> "y"))
    val r1 = Ingest.copyInto(spark, lh, "ing2", src, schema = Some(kvSchema))
    assert(r1.filesLoaded == 1, r1)
    assert(rowsOf("ing2") == Set(1 -> "a"))
    val r2 = Ingest.copyInto(spark, lh, "ing2", src,
      schema = Some(kvSchema), force = true)
    assert(r2.filesLoaded == 1, r2)
    assert(TableIO.selectTable(spark, lh, "ing2").count() == 2)
    // force's nonce'd batch must not mask later increments
    writeCsv(src, "b2.csv", Seq(2 -> "b"))
    val r3 = Ingest.copyInto(spark, lh, "ing2", src, schema = Some(kvSchema))
    assert(r3.filesLoaded == 1 && r3.rowsLoaded == 1, r3)
    TableIO.dropTable(spark, lh, "ing2")
  }

  test("schema alignment: extra and missing source columns fail loudly; " +
      "identity columns are engine-assigned") {
    val src = srcDir()
    writeCsv(src, "b1.csv", Seq(1 -> "a", 2 -> "b"))
    // table with an identity column: csv lacking it still loads (the
    // read schema is the table's minus identity, so csv positions match)
    TableIO.writeTable(spark, lh, "ing3",
      Seq((10L, 0, "seed")).toDF("rid", "k", "s"))
    TableIO.setIdentityColumn(spark, lh, "ing3", "rid")
    val r1 = Ingest.copyInto(spark, lh, "ing3", src)
    assert(r1.filesLoaded == 1 && r1.rowsLoaded == 2, r1)
    val ids = TableIO.selectTable(spark, lh, "ing3")
      .select("rid").as[Long].collect().toSeq
    assert(ids.distinct.size == 3, ids) // unique engine-assigned ids
    // a source column the table lacks is an error, not a silent drop
    val src2 = srcDir()
    Files.write(Paths.get(src2, "bad.csv"),
      "k,s,extra\n5,e,zzz".getBytes(UTF_8))
    val exExtra = intercept[IllegalArgumentException] {
      Ingest.copyInto(spark, lh, "ing3", src2, schema = Some(StructType(
        kvSchema.fields :+ StructField("extra", StringType))))
    }
    assert(exExtra.getMessage.contains("extra"), exExtra.getMessage)
    // a missing non-identity column is an error, not a null-fill
    val exMissing = intercept[IllegalArgumentException] {
      Ingest.copyInto(spark, lh, "ing3", src2, schema = Some(StructType(
        Seq(StructField("k", IntegerType)))))
    }
    assert(exMissing.getMessage.contains("lacks column"),
      exMissing.getMessage)
    TableIO.dropTable(spark, lh, "ing3")
  }

  test("racing loaders of the same source never double-load") {
    val src = srcDir()
    writeCsv(src, "b1.csv", Seq(1 -> "a", 2 -> "b", 3 -> "c"))
    TableIO.writeTable(spark, lh, "ing4",
      Seq((0, "seed")).toDF("k", "s"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val results = (1 to 4).map(_ => pool.submit(
        new java.util.concurrent.Callable[Ingest.CopyResult] {
          def call(): Ingest.CopyResult =
            Ingest.copyInto(spark, lh, "ing4", src, schema = Some(kvSchema))
        }))
        .map(_.get())
      assert(results.map(_.filesLoaded).sum == 1, results)
    } finally pool.shutdown()
    assert(rowsOf("ing4") == Set(0 -> "seed", 1 -> "a", 2 -> "b", 3 -> "c"))
    TableIO.dropTable(spark, lh, "ing4")
  }

  test("the ledger restores with the data and resets on overwrite") {
    val src = srcDir()
    writeCsv(src, "b1.csv", Seq(1 -> "a"))
    Ingest.copyInto(spark, lh, "ing5", src, schema = Some(kvSchema))
    val dir = Catalog.tablePath(lh, "ing5")
    val vAfterB1 = Versioned.latestVersion(dir).get
    writeCsv(src, "b2.csv", Seq(2 -> "b"))
    Ingest.copyInto(spark, lh, "ing5", src, schema = Some(kvSchema))
    assert(rowsOf("ing5") == Set(1 -> "a", 2 -> "b"))
    // RESTORE to before b2: its rows leave AND its ledger entry leaves,
    // so the next ingest brings b2 back
    TableIO.restoreTable(spark, lh, "ing5", vAfterB1)
    assert(rowsOf("ing5") == Set(1 -> "a"))
    val rAgain = Ingest.copyInto(spark, lh, "ing5", src,
      schema = Some(kvSchema))
    assert(rAgain.filesLoaded == 1, rAgain)
    assert(rowsOf("ing5") == Set(1 -> "a", 2 -> "b"))
    // overwrite wipes the data AND the load history
    TableIO.writeTable(spark, lh, "ing5", Seq((9, "z")).toDF("k", "s"))
    val rAfterOw = Ingest.copyInto(spark, lh, "ing5", src,
      schema = Some(kvSchema))
    assert(rAfterOw.filesLoaded == 2, rAfterOw)
    assert(rowsOf("ing5") == Set(9 -> "z", 1 -> "a", 2 -> "b"))
    TableIO.dropTable(spark, lh, "ing5")
  }

  test("ledger keys consolidate past the threshold without losing history") {
    val prev = Ingest.ConsolidateAt
    Ingest.ConsolidateAt = 3
    try {
      val src = srcDir()
      (1 to 5).foreach { i =>
        writeCsv(src, s"b$i.csv", Seq(i -> s"v$i"))
        Ingest.copyInto(spark, lh, "ing6", src, schema = Some(kvSchema))
      }
      val dir = Catalog.tablePath(lh, "ing6")
      val meta = Versioned.readManifest(dir,
        Versioned.latestVersion(dir).get).get.meta
      val keys = meta.keys.filter(_.startsWith(Ingest.KeyPrefix))
      assert(keys.size <= Ingest.ConsolidateAt, keys)
      // consolidation preserved the history: everything still skips
      val r = Ingest.copyInto(spark, lh, "ing6", src, schema = Some(kvSchema))
      assert(r.filesLoaded == 0 && r.filesSkipped == 5, r)
      assert(Ingest.loadHistory(spark, lh, "ing6").count() == 5)
      TableIO.dropTable(spark, lh, "ing6")
    } finally Ingest.ConsolidateAt = prev
  }

  test("a reordered or truncated csv header fails the load instead of " +
      "mis-mapping columns") {
    val src = srcDir()
    // header order disagrees with the schema: enforceSchema=false makes
    // Spark validate it loudly
    Files.write(Paths.get(src, "b1.csv"), "s,k\na,1".getBytes(UTF_8))
    val ex = intercept[Exception] {
      Ingest.copyInto(spark, lh, "ing11", src, schema = Some(kvSchema))
        .toString // force
    }
    assert(ex.getMessage.toLowerCase.contains("header") ||
      ex.getMessage.toLowerCase.contains("csv"), ex.getMessage)
    TableIO.dropTable(spark, lh, "ing11")
  }

  test("a parquet source with an extra column is refused against an " +
      "existing table (footer reality check, not declared schema)") {
    TableIO.writeTable(spark, lh, "ing12",
      Seq((1, "a")).toDF("k", "s"))
    val psrc = srcDir()
    Seq((2, "b", 9.9)).toDF("k", "s", "oops").coalesce(1)
      .write.mode("overwrite").parquet(psrc)
    val ex = intercept[IllegalArgumentException] {
      Ingest.copyInto(spark, lh, "ing12", psrc, format = "parquet")
    }
    assert(ex.getMessage.contains("oops"), ex.getMessage)
    TableIO.dropTable(spark, lh, "ing12")
  }

  test("an orphaned ledger sidecar (crash before commit) is ignored") {
    val src = srcDir()
    writeCsv(src, "b1.csv", Seq(1 -> "a"))
    TableIO.writeTable(spark, lh, "ing7", Seq((0, "seed")).toDF("k", "s"))
    // fake a crashed loader: sidecar present, no meta key committed
    val ledger = Paths.get(Catalog.tablePath(lh, "ing7"), Ingest.LedgerDir)
    Files.createDirectories(ledger)
    Files.write(ledger.resolve("deadbeefdeadbeef.json"),
      """[{"path":"ghost.csv","size":1,"mtime":1}]""".getBytes(UTF_8))
    val r = Ingest.copyInto(spark, lh, "ing7", src, schema = Some(kvSchema))
    assert(r.filesLoaded == 1, r) // the orphan protected nothing
    TableIO.dropTable(spark, lh, "ing7")
  }

  test("json and parquet sources round-trip typed columns") {
    val src = srcDir()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("d", DateType),
      StructField("x", DoubleType)))
    Files.write(Paths.get(src, "b1.json"),
      """{"id":1,"d":"2024-03-01","x":1.5}
        |{"id":2,"d":"2024-03-02","x":-0.25}""".stripMargin.getBytes(UTF_8))
    Ingest.copyInto(spark, lh, "ing8", src, format = "json",
      schema = Some(schema))
    val got = TableIO.selectTable(spark, lh, "ing8")
      .orderBy("id").collect().toSeq
    assert(got.map(_.getLong(0)) == Seq(1L, 2L))
    assert(got.map(_.getDate(1).toString) ==
      Seq("2024-03-01", "2024-03-02"))
    assert(got.map(_.getDouble(2)) == Seq(1.5, -0.25))
    // parquet self-describes: no schema argument needed on a new table
    val psrc = srcDir()
    Seq((1L, "p")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(psrc)
    val rp = Ingest.copyInto(spark, lh, "ing9", psrc, format = "parquet")
    assert(rp.rowsLoaded == 1, rp)
    TableIO.dropTable(spark, lh, "ing8")
    TableIO.dropTable(spark, lh, "ing9")
  }

  test("csv/json without a schema, table, or inference opt-in is refused") {
    val src = srcDir()
    writeCsv(src, "b1.csv", Seq(1 -> "a"))
    val ex = intercept[IllegalArgumentException] {
      Ingest.copyInto(spark, lh, "ing10", src)
    }
    assert(ex.getMessage.contains("inferSchema"), ex.getMessage)
    // the opt-in works
    val r = Ingest.copyInto(spark, lh, "ing10", src,
      options = Map("inferSchema" -> "true"))
    assert(r.rowsLoaded == 1, r)
    TableIO.dropTable(spark, lh, "ing10")
  }

  test("orc sources load self-describing and incrementally, like parquet") {
    val src = srcDir()
    Seq((1, "a"), (2, "b")).toDF("k", "s").coalesce(1)
      .write.mode("append").orc(src)
    val r1 = Ingest.copyInto(spark, lh, "ing_orc", src, format = "orc")
    assert(r1.rowsLoaded == 2, r1)
    // second run: no-op; new file: loads alone
    assert(Ingest.copyInto(spark, lh, "ing_orc", src,
      format = "orc").filesLoaded == 0)
    Seq((3, "c")).toDF("k", "s").coalesce(1).write.mode("append").orc(src)
    val r2 = Ingest.copyInto(spark, lh, "ing_orc", src, format = "orc")
    assert(r2.rowsLoaded == 1, r2)
    assert(rowsOf("ing_orc") == Set((1, "a"), (2, "b"), (3, "c")))
    TableIO.dropTable(spark, lh, "ing_orc")
  }

  test("text sources land line-per-row as a `value` column") {
    val src = srcDir()
    Files.write(Paths.get(src, "a.log"), "one\ntwo".getBytes(UTF_8))
    val r1 = Ingest.copyInto(spark, lh, "ing_txt", src, format = "text")
    assert(r1.rowsLoaded == 2, r1)
    Files.write(Paths.get(src, "b.log"), "three".getBytes(UTF_8))
    val r2 = Ingest.copyInto(spark, lh, "ing_txt", src, format = "text")
    assert(r2.rowsLoaded == 1, r2)
    assert(TableIO.selectTable(spark, lh, "ing_txt")
      .as[String].collect().toSet == Set("one", "two", "three"))
    TableIO.dropTable(spark, lh, "ing_txt")
  }

  test("binaryfile sources land whole files as binary blobs with metadata") {
    val src = srcDir()
    Files.write(Paths.get(src, "img1.bin"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(src, "img2.bin"), Array[Byte](4, 5))
    val r1 = Ingest.copyInto(spark, lh, "ing_bin", src, format = "binaryfile")
    assert(r1.rowsLoaded == 2, r1)
    // idempotent re-run, then an incremental blob
    assert(Ingest.copyInto(spark, lh, "ing_bin", src,
      format = "binaryfile").filesLoaded == 0)
    Files.write(Paths.get(src, "img3.bin"), Array[Byte](9))
    assert(Ingest.copyInto(spark, lh, "ing_bin", src,
      format = "binaryfile").rowsLoaded == 1)
    val got = TableIO.selectTable(spark, lh, "ing_bin")
      .selectExpr("length", "content").as[(Long, Array[Byte])]
      .collect().map { case (l, c) => (l, c.toSeq) }.toSet
    assert(got == Set((3L, Seq[Byte](1, 2, 3)), (2L, Seq[Byte](4, 5)),
      (1L, Seq[Byte](9))))
    TableIO.dropTable(spark, lh, "ing_bin")
  }

  test("replayQuarantine: fixed rows recover to gold, the quarantine " +
      "drains to what still fails, repeated replays converge") {
    import graft.lakehouse.ext.Quality
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val checks = Seq(Quality.NotNull("v"), Quality.InRange("p", 0.0, 100.0))
    val batch = Seq(
      (1L, Some(10L), 5.0),    // clean
      (2L, None, 5.0),         // null v  -> fixable
      (3L, Some(7L), -1.0),    // bad p   -> not fixable by the fix below
      (4L, None, -2.0)         // both    -> still bad after fix
    ).toDF("k", "v", "p")
    val (g0, q0) = Ingest.appendWithQuarantine(spark, lh, "rq_gold",
      "rq_quar", batch, checks)
    assert(g0 == 1L && q0 == 3L)
    val (rec, still) = Ingest.replayQuarantine(spark, lh, "rq_gold",
      "rq_quar", df => df.withColumn("v", coalesce(col("v"), lit(0L))),
      checks)
    assert(rec == 1L && still == 2L)
    val gold = TableIO.selectTable(spark, lh, "rq_gold")
      .select("k").as[Long].collect().toSet
    assert(gold == Set(1L, 2L))
    val quar = TableIO.selectTable(spark, lh, "rq_quar")
      .select("k", "failed_checks").as[(Long, String)].collect().toMap
    assert(quar.keySet == Set(3L, 4L))
    assert(quar(3L) == "in_range:p" && quar(4L) == "in_range:p")
    // a second replay with the same fix recovers nothing and converges
    val (rec2, still2) = Ingest.replayQuarantine(spark, lh, "rq_gold",
      "rq_quar", df => df, checks)
    assert(rec2 == 0L && still2 == 2L)
    // replay against a missing quarantine refuses loudly
    intercept[IllegalArgumentException] {
      Ingest.replayQuarantine(spark, lh, "rq_gold", "rq_nope",
        df => df, checks)
    }
    TableIO.dropTable(spark, lh, "rq_gold")
    TableIO.dropTable(spark, lh, "rq_quar")
  }

  test("replayQuarantine: a crash between the gold append and the " +
      "quarantine overwrite cannot duplicate recovered rows") {
    import graft.lakehouse.ext.Quality
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val checks = Seq(Quality.NotNull("v"))
    val batch = Seq((1L, Some(10L)), (2L, None)).toDF("k", "v")
    Ingest.appendWithQuarantine(spark, lh, "rq2_gold", "rq2_quar",
      batch, checks)
    // simulate the crashed first half of a replay: the gold append (with
    // its txn:replay watermark stamping the drained quarantine version)
    // landed, the quarantine overwrite did not
    val qDir = Catalog.tablePath(lh, "rq2_quar")
    val qv = Versioned.latestVersion(qDir).get
    TableIO.appendTable(spark, lh, "rq2_gold",
      Seq((2L, Some(0L))).toDF("k", "v"),
      extraMeta = Map("txn:replay:rq2_quar" -> qv.toString))
    // the re-run sees the watermark, skips the gold append, and still
    // drains the quarantine
    val (rec, still) = Ingest.replayQuarantine(spark, lh, "rq2_gold",
      "rq2_quar", df => df.withColumn("v", coalesce(col("v"), lit(0L))),
      checks)
    assert(rec == 1L && still == 0L)
    val gold = TableIO.selectTable(spark, lh, "rq2_gold")
      .select("k").as[Long].collect().toList.sorted
    assert(gold == List(1L, 2L), s"recovered row duplicated: $gold")
    // a FRESH drain (the quarantine has moved past the watermark) is not
    // blocked: new bad rows quarantine, replay recovers them into gold
    Ingest.appendWithQuarantine(spark, lh, "rq2_gold", "rq2_quar",
      Seq((3L, Option.empty[Long])).toDF("k", "v"), checks)
    val (rec2, _) = Ingest.replayQuarantine(spark, lh, "rq2_gold",
      "rq2_quar", df => df.withColumn("v", coalesce(col("v"), lit(0L))),
      checks)
    assert(rec2 == 1L)
    val gold2 = TableIO.selectTable(spark, lh, "rq2_gold")
      .select("k").as[Long].collect().toList.sorted
    assert(gold2 == List(1L, 2L, 3L), gold2)
    TableIO.dropTable(spark, lh, "rq2_gold")
    TableIO.dropTable(spark, lh, "rq2_quar")
  }
}
