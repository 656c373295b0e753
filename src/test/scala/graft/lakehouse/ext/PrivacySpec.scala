package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions.col

class PrivacySpec extends SparkSuite {
  import spark.implicits._

  private def people = Seq(
    // (zip, age_band, diagnosis)
    ("10001", "20s", "flu"), ("10001", "20s", "flu"),
    ("10001", "20s", "flu"), ("10001", "20s", "cold"),
    ("10001", "20s", "asthma"), // class of 5: k-ok, 3 diagnoses
    ("10002", "30s", "flu"), ("10002", "30s", "flu"),
    ("10002", "30s", "flu"), // class of 3: k-violating, HOMOGENEOUS
    ("10003", "40s", "cold") // singleton: violates both
  ).toDF("zip", "age_band", "diagnosis")

  test("kAnonymityViolations finds exactly the classes below k") {
    val got = Privacy.kAnonymityViolations(people, Seq("zip", "age_band"), 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("10002", "30s", 3L), ("10003", "40s", 1L)), got)
  }

  test("lDiversityViolations flags homogeneous classes even when k-sized; " +
      "nulls count as one sensitive value") {
    val got = Privacy.lDiversityViolations(people, Seq("zip", "age_band"),
        "diagnosis", 3L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    // 10001/20s has 3 distinct diagnoses (compliant at l=3); the flu-only
    // class and the singleton violate
    assert(got == Set(("10002", 3L, 1L), ("10003", 1L, 1L)), got)
    val withNulls = Seq(("z", "a", null), ("z", "a", null),
      ("z", "a", "flu")).toDF("zip", "age_band", "diagnosis")
    val g2 = Privacy.lDiversityViolations(withNulls, Seq("zip", "age_band"),
        "diagnosis", 3L)
      .collect().map(r => r.getLong(3))
    assert(g2.toSeq == Seq(2L), "null must count as one value: " + g2.toSeq)
  }

  test("kAnonymitySummary reports the release-gate numbers exactly") {
    val r = Privacy.kAnonymitySummary(people, Seq("zip", "age_band"), 5L)
      .head()
    assert(r.getLong(0) == 9L, "n_rows")
    assert(r.getLong(1) == 3L, "n_classes")
    assert(r.getLong(2) == 1L, "min_class_size")
    assert(r.getLong(3) == 4L, "rows_at_risk")
    assert(r.getLong(4) == 444L, "at_risk_permille = 4000 div 9")
  }

  test("guards: empty quasi set, degenerate k/l, sensitive-in-quasi refused") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityViolations(people, Nil, 5L)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityViolations(people, Seq("zip"), 1L)
    }
    intercept[IllegalArgumentException] {
      Privacy.lDiversityViolations(people, Seq("zip", "diagnosis"),
        "diagnosis", 2L)
    }
  }

  test("piiInventory: per-group typed counts, affected docs, permille") {
    import spark.implicits._
    val df = Seq(
      ("s1", "mail me at a@b.com or c@d.org"),          // 2 emails
      ("s1", "see https://x.io/a and https://y.io/b"),  // 2 urls
      ("s1", "clean prose only"),
      ("s2", "call +1 555-123-4567 now"),               // 1 phone
      ("s2", null.asInstanceOf[String])
    ).toDF("src", "text")
    val out = Privacy.piiInventory(df, "text", "src").orderBy("src").collect()
    val s1 = out(0)
    assert(s1.getAs[Long]("n_docs") == 3L)
    assert(s1.getAs[Long]("n_emails") == 2L &&
      s1.getAs[Long]("n_urls") == 2L && s1.getAs[Long]("n_phones") == 0L)
    assert(s1.getAs[Long]("docs_with_email") == 1L &&
      s1.getAs[Long]("docs_with_url") == 1L)
    assert(s1.getAs[Long]("docs_with_pii") == 2L)
    assert(s1.getAs[Long]("pii_docs_permille") == 666L)
    val s2 = out(1)
    assert(s2.getAs[Long]("n_docs") == 2L &&
      s2.getAs[Long]("n_phones") == 1L &&
      s2.getAs[Long]("docs_with_pii") == 1L &&
      s2.getAs[Long]("pii_docs_permille") == 500L)
  }

  test("licenseInventory: one row per family, dual-licensed docs count " +
      "in each, unmarked complements, case-folded detection") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Released under the MIT License, enjoy"),
      (2L, "THE APACHE LICENSE 2.0 GOVERNS. Also MIT License terms."),
      (3L, "no declarations here"),
      (4L, "This work is in the Public Domain (CC0)"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Privacy.licenseInventory(docs, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("mit") == ((2L, 400L)))             // docs 1 and 2
    assert(out("apache") == ((1L, 200L)))          // case-folded
    assert(out("public_domain") == ((1L, 200L)))
    assert(out("creative_commons") == ((1L, 200L))) // CC0 in doc 4
    assert(out("gpl") == ((0L, 0L)) && out("bsd") == ((0L, 0L)))
    assert(out("all_rights_reserved") == ((0L, 0L)))
    assert(out("unmarked") == ((2L, 400L)))        // docs 3 and null
    assert(out.size == 8)
  }

  test("fairnessAudit: exact per-group parity and equalized-odds rates, " +
      "NULL where undefined") {
    import spark.implicits._
    // group a: 4 rows, labels (1,1,0,0), preds (1,0,1,0):
    //   sel 500, tp=1/pos=2 -> tpr 500, fp=1/neg=2 -> fpr 500
    // group b: 2 rows, all positive, preds (1,1):
    //   sel 1000, tpr 1000, fpr NULL (no negatives)
    // group c: 2 rows, all negative, preds (0,0):
    //   sel 0, tpr NULL, fpr 0
    val df = Seq(
      ("a", 1, 1), ("a", 1, 0), ("a", 0, 1), ("a", 0, 0),
      ("b", 1, 1), ("b", 1, 1),
      ("c", 0, 0), ("c", 0, 0))
      .toDF("grp0", "y", "p")
    val got = Privacy.fairnessAudit(df, "grp0", col("y") === 1,
        col("p") === 1)
      .orderBy("grp").collect()
    def row(i: Int) = {
      val r = got(i)
      (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("sel_permille"),
        Option(r.getAs[java.lang.Long]("tpr_permille")),
        Option(r.getAs[java.lang.Long]("fpr_permille")))
    }
    assert(row(0) == (("a", 4L, 500L, Some(500L), Some(500L))),
      got.mkString(","))
    assert(row(1) == (("b", 2L, 1000L, Some(1000L), None)))
    assert(row(2) == (("c", 2L, 0L, None, Some(0L))))
  }
}
