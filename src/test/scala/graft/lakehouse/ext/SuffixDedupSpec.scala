package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class SuffixDedupSpec extends SparkSuite {
  import spark.implicits._

  private def sha16(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString.take(16)
  }

  test("duplicateSpanCensus: hand-planted cross-doc and in-doc repeats " +
      "at a power-of-two span length") {
    val docs = Seq(
      (0L, "abcdefg"),   // abcd @ 0
      (1L, "xxabcdyy"),  // abcd @ 2
      (2L, "zzzzzzzz")   // zzzz @ 0..4 (in-doc run)
    ).toDF("doc_id", "text")
    val got = SuffixDedup.duplicateSpanCensus(docs, "doc_id", "text", 4)
      .orderBy("span_sha").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSet == Set(
      (sha16("abcd"), 2L, 2L, 0L, 0L),
      (sha16("zzzz"), 5L, 1L, 2L, 0L)), got.toSeq.toString)
  }

  test("duplicateSpanCensus: non-power-of-two span exercises the " +
      "composite (rank_p(i), rank_p(i+L-p)) key; no false merges on " +
      "shared prefixes shorter than L") {
    val docs = Seq(
      (0L, "qqABCDEFqq"),
      (1L, "ABCDEFzz"),
      (2L, "ABCDXXXX") // shares only 4 < 6 chars with the planted span
    ).toDF("doc_id", "text")
    val got = SuffixDedup.duplicateSpanCensus(docs, "doc_id", "text", 6)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSet == Set((sha16("ABCDEF"), 2L, 2L, 0L, 2L)),
      got.toSeq.toString)
  }

  test("duplicateSpanCensus: partition-invariant and truncated suffixes " +
      "never contaminate full-window groups") {
    val docs = (0L until 40L).map { i =>
      val body = if (i % 5 == 0) "SHARED_SPAN_PAYLOAD_" + ("x" * 10)
        else s"unique_$i" + ("y" * 20)
      (i, body)
    }.toDF("doc_id", "text")
    def run(parts: Int) =
      SuffixDedup.duplicateSpanCensus(docs.repartition(parts),
        "doc_id", "text", 12)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val a = run(1)
    assert(a == run(7), "partitioning changed the census")
    // the planted 30-char shared body yields 30-12+1 = 19 span groups,
    // each with one occurrence in all 8 planted docs
    val planted = a.filter(_._2 == 8L)
    assert(planted.size == 19, s"expected 19 shared groups, got ${planted.size}")
    assert(planted.forall(_._3 == 8L), "all 8 docs in every group")
  }

  test("removeDuplicateSpans: covered chars splice out, overlapping " +
      "windows merge to maximal intervals, clean docs pass through, " +
      "fully-covered docs empty") {
    val docs = Seq(
      (0L, "abcdefg"),        // abcd @ 0 -> "efg"
      (1L, "xxabcdyy"),       // abcd @ 2 -> "xxyy"
      (2L, "zzzzzzzz"),       // zzzz run merges to [0,8) -> ""
      (3L, "qrstuv"),         // no duplicated window -> untouched
      (4L, "ppabcdqqabcdpp")  // two disjoint intervals -> "ppqqpp"
    ).toDF("doc_id", "text")
    val got = SuffixDedup.removeDuplicateSpans(docs, "doc_id", "text", 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(got(0L) == ((1L, 4L, 3L, sha16("efg"))), got(0L).toString)
    assert(got(1L) == ((1L, 4L, 4L, sha16("xxyy"))), got(1L).toString)
    assert(got(2L) == ((1L, 8L, 0L, sha16(""))), got(2L).toString)
    assert(got(3L) == ((0L, 0L, 6L, sha16("qrstuv"))), got(3L).toString)
    assert(got(4L) == ((2L, 8L, 6L, sha16("ppqqpp"))), got(4L).toString)
    // partition invariance of the whole removal
    val reparted = SuffixDedup.removeDuplicateSpans(
      docs.repartition(7), "doc_id", "text", 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(reparted == got, "partitioning changed the removal")
  }

  test("removeDuplicateSpans: docs shorter than spanLen pass through " +
      "with zero counts instead of vanishing") {
    val docs = Seq(
      (0L, "abcdefg"),   // long enough, clean
      (1L, "abc"),       // shorter than spanLen = 4
      (2L, ""),          // empty
      (3L, "xxabcdyyabcdzz") // real duplicated window
    ).toDF("doc_id", "text")
    val got = SuffixDedup.removeDuplicateSpans(docs, "doc_id", "text", 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L),
      s"short docs must survive: ${got.keySet}")
    assert(got(1L) == ((0L, 0L, 3L, sha16("abc"))), got(1L).toString)
    assert(got(2L) == ((0L, 0L, 0L, sha16(""))), got(2L).toString)
    assert(got(3L) == ((2L, 8L, 6L, sha16("xxyyzz"))), got(3L).toString)
  }
}
