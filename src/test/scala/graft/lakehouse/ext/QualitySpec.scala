package graft.lakehouse.ext

import graft.lakehouse.SparkSuite

class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("expectations: each check type counts exactly its violations") {
    val df = Seq(
      (Some(1L), Some(10.0), Some("O")),
      (Some(1L), Some(-5.0), Some("X")), // dup key, below range, bad value
      (None, Some(2000.0), None), // null key, above range; null status OK
      (Some(3L), None, Some("F")) // null range value OK
    ).toDF("k", "v", "s")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Quality.expectations(df, Seq(
        Quality.NotNull("k"),
        Quality.InRange("v", 0.0, 1000.0),
        Quality.AcceptedValues("s", Seq("O", "F")),
        Quality.Unique(Seq("k")),
        Quality.ForeignKey("k", parent, "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null:k" -> 1L,
      "in_range:v" -> 2L,
      "accepted_values:s" -> 1L,
      "unique:k" -> 1L, // two rows with k=1 -> 1 extra
      "foreign_key:k" -> 1L // k=3 has no parent; nulls are not violations
    ), got.toString)
  }

  test("expectations: clean table reports zero violations per check") {
    val df = Seq((1L, 5.0), (2L, 6.0)).toDF("k", "v")
    val got = Quality.expectations(df, Seq(
        Quality.NotNull("k"), Quality.Unique(Seq("k"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L), got.toString)
  }

  test("diffSnapshots: added/removed/changed/unchanged, null-safe compare") {
    val before = Seq((1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]))
      .toDF("k", "v")
    val after = Seq((2L, Some("B")), (3L, Option.empty[String]), (4L, Some("d")))
      .toDF("k", "v")
    val got = Quality.diffSnapshots(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "changed",
      3L -> "unchanged", 4L -> "added"), got.toString)
  }

  test("diffSnapshots rejects mismatched non-key schemas") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "x")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Quality.diffSnapshots(a, b, Seq("k"))
    }
  }

  test("gateExpectations tags failures in declaration order with SQL " +
      "null semantics; cross-row checks refused") {
    val df = Seq(
      (Some(1L), Some(10.0), "O"),   // clean
      (None, Some(10.0), "O"),       // not_null fails
      (Some(3L), Some(-5.0), "X"),   // in_range + accepted_values fail
      (Some(4L), None, "O")          // null range value: passes (SQL)
    ).toDF("k", "v", "s")
    val checks = Seq(Quality.NotNull("k"),
      Quality.InRange("v", 0.0, 100.0),
      Quality.AcceptedValues("s", Seq("O", "F")))
    val got = Quality.gateExpectations(df, checks)
      .select($"s", $"k", $"failed_checks").collect()
      .map(r => (Option(r.get(1)), r.getSeq[String](2).toList)).toMap
    assert(got(Some(1L)) == Nil)
    assert(got(None) == List("not_null:k"))
    assert(got(Some(3L)) == List("in_range:v", "accepted_values:s"),
      "declaration order")
    assert(got(Some(4L)) == Nil, "null range value passes; only " +
      "NotNull polices nulls")
    intercept[IllegalArgumentException] {
      Quality.gateExpectations(df, Seq(Quality.Unique(Seq("k"))))
    }
  }

  test("appendWithQuarantine splits a batch into both tables with " +
      "reasons recorded") {
    import graft.lakehouse.{Catalog, Ingest, TableIO}
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("quar").toString,
      "ws_quar", "lh_quar").lakehouses.head
    val batch = Seq(
      (Some(1L), 10.0), (Some(2L), -3.0), (None, 5.0)
    ).toDF("k", "v")
    val checks = Seq(Quality.NotNull("k"), Quality.InRange("v", 0.0, 100.0))
    val (ok, bad) = Ingest.appendWithQuarantine(spark, lh, "gold",
      "gold_quarantine", batch, checks)
    assert((ok, bad) == (1L, 2L), (ok, bad))
    assert(TableIO.selectTable(spark, lh, "gold").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    val q = TableIO.selectTable(spark, lh, "gold_quarantine").collect()
      .map(r => Option(r.get(0)) -> r.getString(2)).toMap
    assert(q == Map(Some(2L) -> "in_range:v", None -> "not_null:k"), q)
    // second batch APPENDS to both existing tables
    val (ok2, bad2) = Ingest.appendWithQuarantine(spark, lh, "gold",
      "gold_quarantine", Seq((Some(9L), 1.0), (None, 1.0)).toDF("k", "v"),
      checks)
    assert((ok2, bad2) == (1L, 1L))
    assert(TableIO.selectTable(spark, lh, "gold").count() == 2)
    assert(TableIO.selectTable(spark, lh, "gold_quarantine").count() == 3)
  }

  test("appendWithQuarantine creates BOTH destinations on first use (an " +
      "all-passing batch still creates the quarantine table) and commits " +
      "the batch marker with each half") {
    import graft.lakehouse.{Catalog, Ingest, TableIO, Versioned}
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("quar2").toString,
      "ws_quar2", "lh_quar2").lakehouses.head
    val checks = Seq(Quality.NotNull("k"))
    val (ok, bad) = Ingest.appendWithQuarantine(spark, lh, "g2", "q2",
      Seq((Some(1L), 1.0)).toDF("k", "v"), checks,
      extraMeta = Map("txn:app" -> "0"))
    assert((ok, bad) == (1L, 0L))
    // the quarantine table EXISTS and reads empty — a reader never
    // depends on a failure having happened
    assert(TableIO.selectTable(spark, lh, "q2").count() == 0)
    def meta(name: String): Option[String] = {
      val d = Catalog.tablePath(lh, name)
      Versioned.latestVersion(d).flatMap(Versioned.readManifest(d, _))
        .flatMap(_.meta.get("txn:app"))
    }
    // the marker committed atomically with BOTH halves (the empty
    // quarantine half as a marker-only version)
    assert(meta("g2").contains("0") && meta("q2").contains("0"))
    // landGold=false re-lands only the missing half on replay
    val (ok2, bad2) = Ingest.appendWithQuarantine(spark, lh, "g2", "q2",
      Seq((Some(2L), 1.0), (None, 1.0)).toDF("k", "v"), checks,
      extraMeta = Map("txn:app" -> "1"), landGold = false)
    assert((ok2, bad2) == (0L, 1L))
    assert(TableIO.selectTable(spark, lh, "g2").count() == 1,
      "skipped half must not re-land")
    assert(TableIO.selectTable(spark, lh, "q2").count() == 1)
    assert(meta("g2").contains("0") && meta("q2").contains("1"))
  }

  test("corpusDiff: unchanged/edited by id, re-keyed separated from " +
      "genuine churn by content hash") {
    import spark.implicits._
    val a = Seq(
      (1L, "same"), (2L, "will edit"), (3L, "will rekey"),
      (4L, "will vanish")).toDF("doc_id", "text")
    val b = Seq(
      (1L, "same"),            // unchanged
      (2L, "edited now"),      // edited
      (30L, "will rekey"),     // same bytes, new id
      (5L, "brand new")        // added
    ).toDF("doc_id", "text")
    val r = graft.lakehouse.ext.Quality.corpusDiff(a, b, "doc_id", "text")
      .head()
    assert(r.getAs[Long]("n_unchanged") == 1L)
    assert(r.getAs[Long]("n_edited") == 1L)
    assert(r.getAs[Long]("n_removed") == 2L) // ids 3 and 4 left
    assert(r.getAs[Long]("n_added") == 2L)   // ids 30 and 5 arrived
    assert(r.getAs[Long]("n_rekeyed") == 1L) // but id 3's bytes moved to 30
  }

  test("filterSweep: one aggregation drives every threshold; null " +
      "scores count only in denominators; duplicate thresholds raise") {
    val d = Seq((1L, Some(100), 10L), (2L, Some(500), 20L),
      (3L, Some(900), 40L), (4L, None, 30L))
      .toDF("id", "score", "ntok")
    val out = Quality.filterSweep(d, "score", "ntok", Seq(0, 500, 1000))
      .orderBy("threshold").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // totals: 4 docs, 100 tokens (null-scored doc included)
    assert(out.toSeq == Seq(
      (0, 3L, 70L, 750L, 700L),
      (500, 2L, 60L, 500L, 600L),
      (1000, 0L, 0L, 0L, 0L)), out.mkString(","))
    intercept[IllegalArgumentException] {
      Quality.filterSweep(d, "score", "ntok", Seq(1, 1))
    }
  }

  test("brierDecomposition: hand computation, and the Murphy identity " +
      "brier = rel - res + unc holds for within-bin-constant scores") {
    import spark.implicits._
    // bin 1: (100,0),(100,1); bin 9: (900,1),(900,1)
    val d = Seq((100L, 0), (100L, 1), (900L, 1), (900L, 1))
      .toDF("score", "label")
    val r = Quality.brierDecomposition(d, "score", "label", bins = 10)
      .head()
    assert(math.abs(r.getAs[Double]("brier") - 0.21) < 1e-12, r.toString)
    assert(math.abs(r.getAs[Double]("reliability") - 0.085) < 1e-12)
    assert(math.abs(r.getAs[Double]("resolution") - 0.0625) < 1e-12)
    assert(math.abs(r.getAs[Double]("uncertainty") - 0.1875) < 1e-12)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_occupied_bins") == 2L)
    assert(math.abs(r.getAs[Double]("brier") -
      (r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
        r.getAs[Double]("uncertainty"))) < 1e-12, "Murphy identity")
  }

  test("youdenThreshold: picks the separating cut on a clean split, " +
      "ties go to the smaller threshold") {
    import spark.implicits._
    // scores 100/200 negative, 800/900 positive -> any cut in (200,800]
    // separates perfectly; the smallest distinct score that does is 800
    val d = Seq((100L, 0), (200L, 0), (800L, 1), (900L, 1))
      .toDF("score", "label")
    val r = Quality.youdenThreshold(d, "score", "label").head()
    assert(r.getAs[Long]("threshold") == 800L, r.toString)
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 0L &&
      r.getAs[Long]("fn") == 0L && r.getAs[Long]("tn") == 2L)
    assert(r.getAs[Double]("youden_j") == 1.0)
    // all-same-label degenerate: j_den = 0 -> one row still comes back
    // (threshold defined, youden_j is 0/0 -> null)
    val deg = Seq((100L, 1), (900L, 1)).toDF("score", "label")
    val dr = Quality.youdenThreshold(deg, "score", "label").collect()
    assert(dr.length == 1 && dr.head.getAs[Long]("j_den") == 0L)
    assert(dr.head.isNullAt(dr.head.fieldIndex("youden_j")))
  }

  test("isotonicCalibration: the textbook violator pools — y=[1,0,0,1] " +
      "calibrates to [1/3,1/3,1/3,1] — and the fit is monotone") {
    import spark.implicits._
    // scores 10/20/30/40 land in bins 1..4 at bins=100
    val d = Seq((10L, 1), (20L, 0), (30L, 0), (40L, 1))
      .toDF("score", "label")
    val got = Quality.isotonicCalibration(d, "score", "label", bins = 100)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getAs[Double]("calibrated"))).toSeq
    assert(got.map(_._1) == Seq(1, 2, 3, 4))
    assert(got.take(3).forall(c => math.abs(c._2 - 1.0 / 3) < 1e-15),
      got.mkString(","))
    assert(got.last._2 == 1.0)
    assert(got.map(_._2).sliding(2).forall(p => p(0) <= p(1)),
      "isotonic fit must be monotone non-decreasing")
  }

  test("liftTable: top bin captures its positives at the exact lift, " +
      "bottom cumulative row is the base rate (lift 1000)") {
    import spark.implicits._
    // bin 9: 2 rows 2 pos; bin 0: 2 rows 0 pos -> base rate 1/2
    val d = Seq((950L, 1), (990L, 1), (10L, 0), (20L, 0))
      .toDF("score", "label")
    val got = Quality.liftTable(d, "score", "label", bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(6), r.getLong(7))).toSeq
    // bin 0: lift 0; cum over both bins = base rate -> 1000, capture 1000
    assert(got == Seq(
      (0, 2L, 0L, 0L, 1000L, 1000L),
      (9, 2L, 2L, 2000L, 2000L, 1000L)), got.mkString(","))
  }
}
