package graft.lakehouse.ext

import graft.lakehouse.SparkSuite

class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  test("editDistanceOnePairs: insert/substitute found, transposition " +
      "(distance 2) generates a candidate but is filtered exactly") {
    // act vs cat share deletion variants ('at', 'ct') so the index
    // proposes them — the levenshtein filter must reject (distance 2)
    val df = Seq("cat bat cats act", "cat", null.asInstanceOf[String])
      .toDF("text")
    val out = FuzzyJoin.editDistanceOnePairs(df, "text")
      .orderBy("a", "b")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // act pairs with nothing: act~cat and act~bat both share variants
    // ('at'/'ct') but sit at distance 2
    assert(out.toSeq == Seq(
      ("bat", "cat", 1L, 2L),   // substitution; cat appears twice
      ("cat", "cats", 2L, 1L))) // insertion
  }

  test("editDistanceOnePairs: case-insensitive tokenization, no " +
      "self-pairs, empty corpus yields empty result") {
    val df = Seq("Cat CAT cat").toDF("text")
    assert(FuzzyJoin.editDistanceOnePairs(df, "text").count() == 0)
    val empty = Seq("", "   ").toDF("text")
    assert(FuzzyJoin.editDistanceOnePairs(empty, "text").count() == 0)
  }
}
