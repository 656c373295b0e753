package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

/** Positional index + exact phrase search: hand-counted matches,
  * overlap/repeat edge cases, and the index's numbering contract. */
class SearchSpec extends SparkSuite {
  import spark.implicits._

  private def matches(docs: Seq[(Long, String)], phrases: Seq[String])
      : Map[(String, Long), Long] = {
    val idx = Search.positionalIndex(docs.toDF("doc_id", "text"),
      "doc_id", "text")
    Search.phraseMatches(idx, "doc_id", phrases).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("hand-counted phrase occurrences, including overlapping and " +
      "multi-occurrence matches") {
    val docs = Seq(
      (1L, "the quick fox and the quick fox again"),
      (2L, "quick the fox"),
      (3L, "a a a a"))
    val got = matches(docs,
      Seq("the quick fox", "quick fox", "a a", "fox the"))
    assert(got(("the quick fox", 1L)) == 2L)
    assert(got(("quick fox", 1L)) == 2L)
    assert(!got.contains(("the quick fox", 2L)),
      "order matters: bag-of-words presence is not a phrase match")
    // overlapping matches all count: "a a" in "a a a a" starts at 1, 2, 3
    assert(got(("a a", 3L)) == 3L)
    assert(!got.contains(("fox the", 1L)) && !got.contains(("fox the", 2L)))
  }

  test("tokenization contract: case-insensitive, whitespace runs " +
      "collapse, positions rank over the filtered sequence") {
    val docs = Seq((7L, "  Big   TABLE  scan "))
    assert(matches(docs, Seq("big table scan")) ==
      Map(("big table scan", 7L) -> 1L))
    // index numbering: 1-based over filtered tokens
    val idx = Search.positionalIndex(docs.toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](2).toList).toMap
    assert(idx("big") == List(1L) && idx("table") == List(2L) &&
      idx("scan") == List(3L), idx)
  }

  test("a phrase longer than the document and an absent token both miss") {
    val docs = Seq((1L, "x y"))
    val got = matches(docs, Seq("x y z", "x q"))
    assert(got.isEmpty, got)
  }

  test("updatePositionalIndex equals a from-scratch rebuild: new docs " +
      "add postings, re-ingested docs replace theirs, others untouched") {
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("w", "id", "positions")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getSeq[Int](2).toList)).toSet
    val base = Seq((1L, "a b a"), (2L, "b c")).toDF("id", "text")
    val idx = Search.positionalIndex(base, "id", "text")
    // doc 2 re-ingested with new text, doc 3 brand new
    val batch = Seq((2L, "c c"), (3L, "a d")).toDF("id", "text")
    val updated = Search.updatePositionalIndex(idx, batch, "id", "text")
    val effective = Seq((1L, "a b a"), (2L, "c c"), (3L, "a d"))
      .toDF("id", "text")
    val rebuilt = Search.positionalIndex(effective, "id", "text")
    assert(canon(updated) == canon(rebuilt))
    // doc 2's old 'b' posting is gone, its new 'c' postings are in
    assert(!canon(updated).contains(("b", 2L, List(1))))
    assert(canon(updated).contains(("c", 2L, List(1, 2))))
  }
}
