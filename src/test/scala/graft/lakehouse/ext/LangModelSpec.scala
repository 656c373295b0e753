package graft.lakehouse.ext

import graft.lakehouse.SparkSuite

class LangModelSpec extends SparkSuite {
  import spark.implicits._

  test("trainBigramCounts: exact adjacent-pair counts over lowercased, " +
      "whitespace-normalized tokens") {
    val docs = Seq((1L, "A b  a b"), (2L, " b a ")).toDF("doc_id", "text")
    val got = LangModel.trainBigramCounts(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // doc1: (a,b),(b,a),(a,b); doc2: (b,a) — leading/extra spaces drop out
    assert(got == Set(("a", "b", 2L), ("b", "a", 2L)), got.toString)
  }

  test("bigramSurprise: unseen count over the held-out side only") {
    val train = Seq((1L, "a b c")).toDF("doc_id", "text")
    val score = Seq((10L, "a b x c"), (11L, "z")).toDF("doc_id", "text")
    val got = LangModel.bigramSurprise(train, score, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toList.sortBy(_._1)
    // doc10 bigrams: (a,b) seen, (b,x) unseen, (x,c) unseen; doc11: none (1 token)
    assert(got == List((10L, 3L, 2L, 2.0 / 3.0)), got.toString)
  }

  test("crossEntropy matches the hand-computed add-one-smoothed model") {
    // train "a b a b": bigrams (a,b)x2, (b,a)x1; c1: a->2, b->1; V=2
    // score "a b c": P(b|a)=(2+1)/(2+2)=3/4, P(c|b)=(0+1)/(1+2)=1/3
    // bits = (-log2(3/4) - log2(1/3)) / 2 = -log2(1/4)/2 = 1.0
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a b c")).toDF("doc_id", "text")
    val r = LangModel.crossEntropy(train, score, "doc_id", "text").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_bigrams") == 2L)
    assert(math.abs(r(0).getAs[Double]("bits_per_bigram") - 1.0) < 1e-9, r(0).toString)
  }

  test("crossEntropy: fully-unseen predecessors fall back to the uniform " +
      "1/V floor (no division by zero, no NaN)") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val score = Seq((10L, "x y")).toDF("doc_id", "text")
    val r = LangModel.crossEntropy(train, score, "doc_id", "text").collect()
    // V=2: P(y|x) = (0+1)/(0+2) = 1/2 -> 1 bit
    assert(math.abs(r(0).getAs[Double]("bits_per_bigram") - 1.0) < 1e-9, r(0).toString)
  }

  test("cooccurrenceCounts: hand-counted window pairs, canonical order, " +
      "window=1 equals unordered bigram counts") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    // window=2 pairs by position: (a,b) (a,c) (b,c) (a,b) (a,c) -> note
    // (c,a) and (b,a) canonicalize; self-pair (a,a) at distance 3 is
    // outside the window
    val got = LangModel.cooccurrenceCounts(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("b", "c") -> 1L),
      got)
    val w1 = LangModel.cooccurrenceCounts(docs, "doc_id", "text", 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // adjacent pairs of "a b c a": (a,b) (b,c) (c,a) -> canonical (a,c)
    assert(w1 == Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("a", "c") -> 1L),
      w1)
    // minCount prunes
    assert(LangModel.cooccurrenceCounts(docs, "doc_id", "text", 2,
      minCount = 2L).count() == 2)
  }

  test("pmiRank: a pair of rare exclusive companions outscores a pair " +
      "of promiscuous frequent words at equal pair count") {
    // x and y co-occur only with each other (rare, exclusive);
    // a and b are everywhere (frequent, incidental)
    val docs = Seq(
      (1L, "x y a b"), (2L, "x y b a"), (3L, "a b a b"), (4L, "b a b a"))
      .toDF("doc_id", "text")
    val got = LangModel.pmiRank(docs, "doc_id", "text", window = 1,
        minCount = 2L)
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(got(("x", "y")) > got(("a", "b")),
      s"exclusive companions must outrank: $got")
  }

  test("crossEntropyPortable: decimal-exact sum equals hand computation " +
      "and is invariant to partitioning; <2-token docs emit no row") {
    // train: "a b a c" -> bigrams (a,b),(b,a),(a,c); c12: ab=1, ba=1,
    // ac=1; c1: a=2, b=1; V = 3
    val train = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val score = Seq((10L, "a b"), (11L, "a z"), (12L, "a"))
      .toDF("doc_id", "text")
    def bits(c12: Long, c1: Long): java.math.BigDecimal =
      new java.math.BigDecimal(
        -(math.log((c12 + 1).toDouble / (c1 + 3).toDouble) / math.log(2.0)))
        .setScale(18, java.math.RoundingMode.HALF_UP)
    val out = LangModel.crossEntropyPortable(train, score, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(10L, 11L), "doc 12 has no bigram")
    assert(out(0)._2 == 1L &&
      out(0)._3 == bits(1, 2).doubleValue / 1.0)
    assert(out(1)._2 == 1L &&
      out(1)._3 == bits(0, 2).doubleValue / 1.0)
    val repart = LangModel.crossEntropyPortable(
      train.repartition(4), score.repartition(3), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == repart.toSeq)
  }


  test("perplexityBuckets: equal-count tiers ordered by bits, head " +
      "holds the most reference-like docs, deterministic") {
    val train = Seq((100L, "a b a b a b c")).toDF("doc_id", "text")
    val score = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c c c c"),
      (4L, "z z z"), (5L, "a b a"), (6L, "b c a b"))
      .toDF("doc_id", "text")
    val out = LangModel.perplexityBuckets(train, score, "doc_id", "text",
      buckets = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    assert(out.length == 6)
    val byBucket = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byBucket == Map(0 -> 2, 1 -> 2, 2 -> 2), byBucket.toString)
    // bucket boundaries respect the bits ordering
    val maxHead = out.filter(_._3 == 0).map(_._2).max
    val minTail = out.filter(_._3 == 2).map(_._2).min
    assert(maxHead <= minTail)
    // the all-OOV doc must land in the tail
    assert(out.find(_._1 == 4L).get._3 == 2)
    val again = LangModel.perplexityBuckets(train.repartition(3),
      score.repartition(4), "doc_id", "text", 3).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3))).sortBy(_._1)
    assert(out.sortBy(_._1).toSeq == again.toSeq)
  }


  test("persisted LM: batch folds equal the one-shot model in any " +
      "order, and scoring against the frozen tables equals " +
      "crossEntropyPortable exactly") {
    import graft.lakehouse.{Catalog, TableIO}
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("lm_test").toString,
      "ws_lm", "lh_lm").lakehouses.head
    val train = Seq((1L, "a b a c"), (2L, "b a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a b x"), (11L, "c a")).toDF("doc_id", "text")
    def build(prefix: String, batches: Seq[org.apache.spark.sql.DataFrame]) = {
      TableIO.dropTable(spark, lh, s"${prefix}_bigrams")
      TableIO.dropTable(spark, lh, s"${prefix}_tokens")
      batches.foreach(b =>
        LangModel.lmTableUpdate(spark, lh, prefix, b, "doc_id", "text"))
      LangModel.scoreAgainstLmTable(spark, lh, prefix, score, "doc_id",
        "text").orderBy("doc_id").collect().map(_.toSeq).toSeq
    }
    val oneShot = build("lm_a", Seq(train))
    val twoFolds = build("lm_b",
      Seq(train.filter($"doc_id" === 1L), train.filter($"doc_id" === 2L)))
    val reversed = build("lm_c",
      Seq(train.filter($"doc_id" === 2L), train.filter($"doc_id" === 1L)))
    assert(oneShot == twoFolds && oneShot == reversed)
    val fromScratch = LangModel.crossEntropyPortable(train, score,
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(oneShot == fromScratch,
      s"persisted=$oneShot scratch=$fromScratch")
  }


  test("conditionalBigramEntropy: deterministic continuations -> 0 bits, " +
    "hand-computed branching case") {
    import spark.implicits._
    // every w1 has one continuation: H = 0
    val det = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val d = LangModel.conditionalBigramEntropy(det, "doc_id", "text").head()
    assert(d.getAs[Long]("n_bigrams") == 4L &&
      math.abs(d.getAs[Double]("entropy_bits")) < 1e-12)
    // "a b a c": a -> {b, c} uniformly (1 bit each), b -> a (0 bits)
    // H = (1/3)(1*1 + 0 + 1*1) = 2/3 bits
    val br = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val b = LangModel.conditionalBigramEntropy(br, "doc_id", "text").head()
    assert(b.getAs[Long]("n_bigrams") == 3L &&
      b.getAs[Long]("vocab_w1") == 2L &&
      math.abs(b.getAs[Double]("entropy_bits") - 2.0 / 3.0) < 1e-12)
  }
}
