package graft.lakehouse.ext

import graft.lakehouse.SparkSuite

class PatternScanSpec extends SparkSuite {
  import spark.implicits._

  private def hits(text: String, pats: Seq[String]): Map[String, Long] =
    PatternScan.multiPatternHits(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", pats)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

  test("counts every occurrence including overlapping and nested " +
      "matches (the dictionary-suffix chain)") {
    // "aaa": "aa" at 0 and 1; "a" at 0,1,2
    assert(hits("aaa", Seq("a", "aa")) == Map("a" -> 3L, "aa" -> 2L))
    // nested a ⊂ ta ⊂ table all fire at the shared end positions
    assert(hits("table", Seq("a", "ta", "table")) ==
      Map("a" -> 1L, "ta" -> 1L, "table" -> 1L))
    // failure links across pattern boundaries: "ushers" classic
    assert(hits("ushers", Seq("he", "she", "his", "hers")) ==
      Map("he" -> 1L, "she" -> 1L, "hers" -> 1L))
  }

  test("case-insensitive, null/empty text yields no rows, patterns " +
      "absent from the text yield no rows") {
    assert(hits("TABLE Table taBLe", Seq("table")) == Map("table" -> 3L))
    assert(hits("", Seq("x")) == Map.empty[String, Long])
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "xy"))
      .toDF("doc_id", "text")
    val got = PatternScan.multiPatternHits(df, "doc_id", "text", Seq("x"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, "x", 1L)), got.mkString(","))
  }

  test("scorecard aggregates docs and occurrences per pattern") {
    val df = Seq((1L, "spark table table"), (2L, "a table"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val got = PatternScan.patternScorecard(df, "doc_id", "text",
      Seq("table", "zzz")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("table" -> ((2L, 3L))), got.toString)
  }

  test("redactPatterns: hand splices, overlapping hits merge to one " +
      "island, clean docs pass through, full coverage empties") {
    def sha16(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(16)
    val docs = Seq(
      (0L, "xx table yy"),     // one span -> "xx  yy"
      (1L, "tabletable"),      // adjacent spans merge -> ""
      (2L, "clean text"),      // untouched
      (3L, "ABBA"),            // overlapping "abb"+"bba" merge -> ""
      (4L, "a hash, a table")  // two disjoint islands
    ).toDF("doc_id", "text")
    val got = PatternScan.redactPatterns(docs, "doc_id", "text",
      Seq("table", "hash", "abb", "bba")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(got(0L) == ((1L, 5L, 6L, sha16("xx  yy"))), got(0L).toString)
    assert(got(1L) == ((1L, 10L, 0L, sha16(""))), got(1L).toString)
    assert(got(2L) == ((0L, 0L, 10L, sha16("clean text"))), got(2L).toString)
    assert(got(3L) == ((1L, 4L, 0L, sha16(""))), got(3L).toString)
    assert(got(4L) == ((2L, 9L, 6L, sha16("a , a "))), got(4L).toString)
  }

  test("scanAndRedact: one pass carries BOTH the hit census and the " +
      "redaction; null text keeps the row with empty hits") {
    val docs = Seq((1L, "a table, a hash"), (2L, "no hits here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val pats = Seq("table", "hash", "a")
    val got = PatternScan.scanAndRedact(docs, "doc_id", "text", pats)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 3)
    assert(got(1L).getMap[String, Long](1).toMap ==
      Map("table" -> 1L, "hash" -> 1L, "a" -> 4L))
    assert(got(1L).getLong(2) == 4L, "4 merged islands") // a|table|a|hash
    assert(got(2L).getMap[String, Long](1).isEmpty &&
      got(2L).getLong(2) == 0L && got(2L).getLong(4) == 12L)
    assert(got(3L).getMap[String, Long](1).isEmpty && got(3L).isNullAt(2))
    // the two public views replay the shared pass identically
    val viaHits = PatternScan.multiPatternHits(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaHits == Set((1L, "table", 1L), (1L, "hash", 1L), (1L, "a", 4L)))
  }

  test("automaton refuses empty patterns and case-folded duplicates; " +
      "scan scales to many patterns in one pass") {
    intercept[IllegalArgumentException] {
      PatternScan.multiPatternHits(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", Seq("ok", ""))
    }
    // "Foo" and "foo" collide after folding: both ids end at one node
    // and the hit Map would keep one key silently — must refuse loudly
    val dup = intercept[IllegalArgumentException] {
      PatternScan.multiPatternHits(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", Seq("Foo", "bar", "foo"))
    }
    assert(dup.getMessage.contains("foo"), dup.getMessage)
    // 200 patterns, one pass: every pattern pi = "p<i>x" occurs once
    val pats = (0 until 200).map(i => s"p${i}x")
    val text = pats.mkString(" ")
    val got = hits(text, pats)
    assert(got.size == 200 && got.values.forall(_ == 1L))
  }

  test("multiPatternHits and redactPatterns are STREAMING-safe: the " +
      "stateless kernel runs unchanged on a stream, batch-equal") {
    implicit val sqlCtx = spark.sqlContext
    val pats = Seq("a", "table", "hash")
    val rows = Seq((1L, "a table, a hash"), (2L, "no hits here"),
      (3L, "table a table"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = PatternScan.multiPatternHits(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", pats)
      .writeStream.format("memory").queryName("ps_stream")
      .outputMode("append").start()
    val q2 = PatternScan.redactPatterns(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", pats)
      .writeStream.format("memory").queryName("ps_redact_stream")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable(); q2.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable(); q2.processAllAvailable()
      val gotHits = spark.table("ps_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batchHits = PatternScan.multiPatternHits(
          rows.toDF("doc_id", "text"), "doc_id", "text", pats)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(gotHits == batchHits && gotHits.nonEmpty, gotHits.toString)
      val gotRed = spark.table("ps_redact_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
      val batchRed = PatternScan.redactPatterns(
          rows.toDF("doc_id", "text"), "doc_id", "text", pats)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
        .toSet
      assert(gotRed == batchRed, gotRed.toString)
    } finally { q.stop(); q2.stop() }
  }
}
