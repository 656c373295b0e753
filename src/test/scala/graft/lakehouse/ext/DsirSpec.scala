package graft.lakehouse.ext

import graft.lakehouse.SparkSuite

/** Integer-quantized DSIR: target-like documents must outrank off-domain
  * ones, the arithmetic must be pure integer (determinism = exact re-run
  * equality), and the n-gram edges (short docs, absent-in-target grams)
  * must hold. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "le chat noir dort"),          // in-domain (french-ish)
    (2L, "the quick brown fox jumps"),  // off-domain
    (3L, "le chien noir court"),        // in-domain-ish (shares grams)
    (4L, "data table scan filter"),     // off-domain
    (5L, "le")                          // single word: unigrams only
  ).toDF("doc_id", "text")

  private val target = Seq(
    (100L, "le chat dort"),
    (101L, "le chien noir")
  ).toDF("doc_id", "text")

  test("target-like documents outrank off-domain ones deterministically") {
    val top = Dsir.selectTopK(corpus, target, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val rank = top.map(_._1).toSeq
    // every shared-vocabulary doc ranks above every disjoint one
    assert(rank.indexOf(1L) < rank.indexOf(2L), rank)
    assert(rank.indexOf(3L) < rank.indexOf(4L), rank)
    assert(rank.indexOf(5L) < rank.indexOf(2L), rank)
    // deterministic: an identical re-run returns identical scores
    val again = Dsir.selectTopK(corpus, target, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(top.toSeq == again.toSeq)
  }

  test("gram bag: unigrams always, bigrams only for 2+ word docs, " +
      "multiplicities kept") {
    val g = Dsir.gramCounts(
      Seq((1L, "a b a"), (2L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(g == Set(
      (1L, "a", 2L), (1L, "b", 1L),
      (1L, "a b", 1L), (1L, "b a", 1L),
      (2L, "solo", 1L)), g)
  }

  test("weights: absent-in-target grams get the add-one floor, never zero") {
    val w = Dsir.importanceWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w.keySet.exists(_.contains("fox"))) // off-domain gram present
    assert(w.values.forall(_ >= 0), w)
    // "le" appears in both targets and often in corpus: weight above the
    // floor of a target-absent gram like "fox"
    assert(w("le") > w("fox"), (w("le"), w("fox")))
  }

  test("scale shape: gram strings never shuffle (hashed keys only) and " +
      "no (id, gram) pre-aggregation exchange exists") {
    val df = Dsir.selectTopK(corpus, target, "doc_id", "text", k = 5)
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    // every exchange partitions on the hashed gram key or the doc id —
    // an (id, gram) compound exchange would mean the occurrence stream
    // was compression-shuffled before the gram-keyed work that already
    // partial-aggregates it
    val exchanges = physical.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, physical.take(3000))
    assert(!exchanges.exists(l => l.contains("gram#")),
      "gram strings crossed an exchange:\n" + exchanges.mkString("\n"))
    assert(!exchanges.exists(l => l.contains("doc_id#") && l.contains("g#")),
      "(id, gram) compression shuffle reappeared:\n" +
        exchanges.mkString("\n"))
  }

  test("k truncates and ties break by id ascending") {
    val two = Seq((7L, "x y"), (8L, "x y")).toDF("doc_id", "text")
    val t = Seq((9L, "x y")).toDF("doc_id", "text")
    val got = Dsir.selectTopK(two, t, "doc_id", "text", k = 1).collect()
    assert(got.length == 1 && got.head.getLong(0) == 7L,
      got.mkString(","))
  }
}
