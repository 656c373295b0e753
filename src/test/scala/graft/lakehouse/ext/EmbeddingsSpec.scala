package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSuite {
  import spark.implicits._

  test("l2Kernel: unit norm, zero-vector passthrough, order-stable sum") {
    val v = Embeddings.l2Kernel(Seq(3.0, 4.0))
    assert(math.abs(v(0) - 0.6) < 1e-15 && math.abs(v(1) - 0.8) < 1e-15)
    assert(Embeddings.l2Kernel(Seq(0.0, 0.0)).toSeq == Seq(0.0, 0.0))
    val n = Embeddings.l2Kernel(Seq(1.0, 1.0, 1.0))
    assert(math.abs(n.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("quantizeKernel: symmetric int8, half-away-from-zero rounding") {
    val (scale, q) = Embeddings.quantizeKernel(Seq(1.0, -0.5, 0.25, 0.0))
    assert(scale == 1.0 / 127.0)
    assert(q.toSeq == Seq(127, -64, 32, 0)) // -63.5 -> -64 (away from zero)
    val (s0, q0) = Embeddings.quantizeKernel(Seq(0.0, 0.0))
    assert(s0 == 0.0 && q0.toSeq == Seq(0, 0))
  }

  test("quantize roundtrip error is bounded by scale/2") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val out = Embeddings.withInt8Quantized(emb, "embedding")
      .select($"vec_id", $"q8_scale",
        transform($"embedding", x => x.cast("double")).as("v"), $"embedding_q8")
      .collect()
    out.foreach { r =>
      val scale = r.getDouble(1)
      val v = r.getSeq[Double](2)
      val q = r.getSeq[Int](3)
      v.zip(q).foreach { case (x, qi) =>
        assert(math.abs(x - qi * scale) <= scale / 2 + 1e-12,
          s"vec ${r.getLong(0)}: $x vs ${qi * scale}")
      }
    }
  }

  test("withL2Normalized produces unit vectors on fixture data") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val norms = Embeddings.withL2Normalized(emb, "embedding")
      .select(aggregate($"embedding_norm", lit(0.0), (a, x) => a + x * x))
      .collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9, n.toString))
  }

  test("JL projection: golden hand-replay, padding, and partition " +
      "invariance") {
    // hand-replay a 2-vector case against jlSign directly
    val df = Seq((1L, Seq(0.5, -1.25, 2.0)), (2L, Seq(3.0))).toDF("id", "v")
    val got = Embeddings.withJlProjection(df, "v", outDim = 4, dim = 3,
        scale = 100L)
      .orderBy("id").collect().map(_.getSeq[Long](2))
    val q1 = Seq(50L, -125L, 200L)
    val exp1 = (0 until 4).map(i =>
      (0 until 3).map(j => Embeddings.jlSign(i, j) * q1(j)).sum)
    // the 1-component vector projects as if zero-padded
    val exp2 = (0 until 4).map(i => Embeddings.jlSign(i, 0) * 300L)
    assert(got(0).toSeq == exp1, s"${got(0)} vs $exp1")
    assert(got(1).toSeq == exp2, s"${got(1)} vs $exp2")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val once = Embeddings.withJlProjection(emb, "embedding", 16, 64)
      .select("vec_id", "embedding_jl").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val again = Embeddings.withJlProjection(emb.repartition(7), "embedding",
        16, 64)
      .select("vec_id", "embedding_jl").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(once == again, "projection is a pure per-row function")
  }

  test("JL projection preserves dot products in expectation: " +
      "<Pa,Pb>/outDim tracks <qa,qb> on fixture pairs") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(40)
    val r = 16
    val rows = Embeddings.withJlProjection(emb, "embedding", r, 64)
      .select($"vec_id", transform($"embedding",
        x => floor(x.cast("double") * 1000000L).cast("long")).as("q"),
        $"embedding_jl")
      .collect()
      .map(x => (x.getLong(0), x.getSeq[Long](1), x.getSeq[Long](2)))
    def dot(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    // across many pairs the SIGNED dot products must agree far more often
    // than chance and the average relative estimator error must be
    // bounded — per-pair JL error at r=16 is large, the aggregate is not
    val pairs = for (i <- rows.indices; j <- rows.indices if i < j)
      yield (rows(i), rows(j))
    val errs = pairs.map { case ((_, qa, pa), (_, qb, pb)) =>
      val exact = dot(qa, qb)
      val est = dot(pa, pb) / r
      val denom = math.sqrt(dot(qa, qa)) * math.sqrt(dot(qb, qb))
      (est - exact) / (if (denom == 0.0) 1.0 else denom)
    }
    val meanAbs = errs.map(math.abs).sum / errs.length
    // 1/sqrt(16) = 0.25 is the single-pair noise scale; the mean |error|
    // over ~780 pairs sits well inside it
    assert(meanAbs < 0.25, s"mean normalized JL error $meanAbs")
  }

  test("labelCentroidSeparation: aligned labels ~1000, orthogonal 0, " +
      "opposed ~-1000; null vectors drop") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(2.0f, 0.0f)),       // +x
      (1, Seq(3.0f, 0.0f)),                              // +x too
      (2, Seq(0.0f, 5.0f)),                              // +y
      (3, Seq(-1.0f, 0.0f)),                             // -x
      (3, null.asInstanceOf[Seq[Float]])
    ).toDF("label", "embedding")
    val out = Embeddings.labelCentroidSeparation(df, "embedding", "label")
      .orderBy("label_a", "label_b")
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    assert(out((0, 1)) == ((2L, 1L, 1000L)))   // same direction
    assert(out((0, 2)) == ((2L, 1L, 0L)))      // orthogonal
    assert(out((0, 3)) == ((2L, 1L, -1000L)))  // opposed (null row dropped)
    assert(out((2, 3)) == ((1L, 1L, 0L)))
  }

  test("meanPoolFixedPoint: hand-computed integer means incl. " +
      "negatives, null vectors drop, partitioning invariant") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, -1.0f)),
      (0, Seq(2.0f, -2.0f)),
      (1, Seq(0.5f, 0.0f)),
      (1, null.asInstanceOf[Seq[Float]])
    ).toDF("label", "embedding")
    def run(parts: Int) = Embeddings.meanPoolFixedPoint(
        df.repartition(parts), "label", "embedding", scale = 10L)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val a = run(1)
    assert(a == run(3), "partitioning changed the pooled vectors")
    // label 0: dims (10+20) div 2 = 15, (-10-20) div 2 = -15
    assert(a((0, 0)) == ((15L, 2L)) && a((0, 1)) == ((-15L, 2L)))
    // label 1: single surviving vector, floor(0.5*10)=5
    assert(a((1, 0)) == ((5L, 1L)) && a((1, 1)) == ((0L, 1L)))
  }

  test("labelCentroidSeparation: exceeding the DECIMAL(38) budget " +
      "raises instead of silently NULLing the alignment") {
    import spark.implicits._
    // one vector per label at 1e6: quantized sums ~2^20*1e6 ~ 1e12, so
    // each squared norm ~2e24 >> the 1e18 budget
    val df = Seq((0, Seq(1e6f, 1e6f)), (1, Seq(1e6f, -1e6f)))
      .toDF("label", "embedding")
    val e = intercept[Throwable] {
      Embeddings.labelCentroidSeparation(df, "embedding", "label").collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("budget exceeded"), chain)
  }
  test("hashedBowEmbed: deterministic sparse cells; repeated tokens sum; " +
      "null/empty text drops") {
    val df = Seq((1L, "alpha alpha beta"), (2L, null.asInstanceOf[String]),
      (3L, "   ")).toDF("doc_id", "text")
    val cells = Embeddings.hashedBowEmbed(df, "doc_id", "text", dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(cells.forall(_._1 == 1L), "null/blank docs must produce no cells")
    assert(cells.map(_._3.abs).sum == 3L,
      "three token occurrences must contribute |v| summing to 3")
    val again = Embeddings.hashedBowEmbed(df, "doc_id", "text", dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(cells.sortBy(c => (c._1, c._2)).toSeq ==
      again.sortBy(c => (c._1, c._2)).toSeq)
    assert(cells.forall(c => c._2 >= 0 && c._2 < 64))
  }

  test("hashedBowTopK: integer dot products rank correctly, self excluded") {
    // hand-built cells: q=1 has (0 -> 2, 1 -> -1); doc 2 dot = 2*3 + -1*1
    // = 5; doc 3 dot = 2*1 = 2; doc 4 shares no pos -> absent
    val cells = Seq((1L, 0, 2L), (1L, 1, -1L),
      (2L, 0, 3L), (2L, 1, 1L), (3L, 0, 1L), (4L, 5, 9L))
      .toDF("doc_id", "pos", "v")
    val out = Embeddings.hashedBowTopK(cells, Seq(1L), "doc_id", k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1, 2L, 5L), (1L, 2, 3L, 2L)))
  }

  test("hashedBowTopKFor: identical results to the filter-from-cells " +
      "shape (embedding is per-document)") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta"),
      (3L, "gamma delta"), (4L, "unrelated words here"))
      .toDF("doc_id", "text")
    val cells = Embeddings.hashedBowEmbed(docs, "doc_id", "text", dim = 32)
    val a = Embeddings.hashedBowTopK(cells, Seq(1L, 3L), "doc_id", k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val b = Embeddings.hashedBowTopKFor(docs, "doc_id", "text",
      Seq(1L, 3L), k = 5, dim = 32)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq && a.nonEmpty)
  }


  test("pairCosineHistogram: identical vectors pile into the top " +
      "bucket, orthogonal into bucket 0; odd vector drops; layout " +
      "invariant") {
    // 4 identical vectors + 2 orthogonal + 1 odd-one-out
    val vs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(1f, 0f)), (4L, Array(1f, 0f)),
      (5L, Array(0f, 1f)), (6L, Array(2f, 0f)),
      (7L, Array(3f, 4f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.pairCosineHistogram(vs, "vec_id", "embedding",
      seed = 3L).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 3L, s"7 vectors -> 3 pairs: $out")
    val again = Embeddings.pairCosineHistogram(vs.repartition(5),
      "vec_id", "embedding", 3L).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == again)
    // all-identical corpus: every pair lands in the cos=1.0 bucket (10)
    val dup = (1L to 8L).map(i => (i, Array(1f, 2f))).toDF("vec_id",
      "embedding")
    val d = Embeddings.pairCosineHistogram(dup, "vec_id", "embedding", 3L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(d == Map(10 -> 4L), d.toString)
    // null/empty vectors drop before pairing
    val withNull = vs.unionByName(Seq(
      (8L, null.asInstanceOf[Array[Float]]), (9L, Array.empty[Float]))
      .toDF("vec_id", "embedding"))
    assert(Embeddings.pairCosineHistogram(withNull, "vec_id",
      "embedding", 3L).collect().map(_.getLong(1)).sum == 3L)
  }

  test("powerIterationTopComponent recovers a planted dominant direction " +
    "and is partition-order independent") {
    // 40 rows along (3,4)/5 with tiny orthogonal jitter: the dominant
    // right singular vector is ~(0.6, 0.8) -> components ~(614, 819).
    val rows = (1 to 40).map { i =>
      val eps = (i % 5 - 2) * 0.01
      (i.toLong, Seq((3.0 - 4.0 * eps).toFloat, (4.0 + 3.0 * eps).toFloat))
    }.toDF("vec_id", "embedding")
    val got = Embeddings.powerIterationTopComponent(rows, "embedding",
        iterations = 2)
      .orderBy("pos").collect().map(_.getAs[Long]("component"))
    assert(got.length == 2)
    val ratio = got(1).toDouble / got(0).toDouble
    assert(math.abs(ratio - 4.0 / 3.0) < 0.05,
      s"expected ~4:3 direction, got ${got.mkString(",")}")
    // unit-ish norm at scale 1024
    val n = math.sqrt((got(0) * got(0) + got(1) * got(1)).toDouble)
    assert(math.abs(n - 1024.0) < 3.0)
    val again = Embeddings.powerIterationTopComponent(rows.repartition(7),
        "embedding", iterations = 2)
      .orderBy("pos").collect().map(_.getAs[Long]("component"))
    assert(got.toSeq == again.toSeq)
  }

  test("quantizationErrorHistogram: all mass in the lowest buckets for " +
    "well-scaled vectors, pair count = floor(n/2)") {
    import spark.implicits._
    val vecs = (0 until 10).map { i =>
      (i.toLong, Seq.tabulate(8)(j => ((i + j) % 5 - 2).toFloat / 2))
    }.toDF("vec_id", "embedding")
    val got = Embeddings.quantizationErrorHistogram(vecs, "vec_id",
      "embedding", seed = 3L).collect()
    assert(got.map(_.getLong(1)).sum == 5L, "5 pairs from 10 vectors")
    // int8 over [-1, 1] keeps cosine error well under 2%: bucket < 200
    assert(got.forall(_.getInt(0) < 200),
      s"unexpectedly large quantization error: ${got.mkString(",")}")
  }

  test("mutualNearestPairs: tight twins pair mutually, a one-sided " +
    "nearest neighbor does not") {
    import spark.implicits._
    // 1<->2 and 3<->4 are mutual; 5's nn is 2 (tie with 4 breaks to the
    // smaller id) but 2's nn is 1 -> 5 pairs with nobody
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(0.1f, 0.9f)),
      (5L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val got = Embeddings.mutualNearestPairs(vecs, "vec_id", "embedding")
      .orderBy("id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L), (3L, 4L)),
      got.mkString(","))
    assert(got.forall(_._3 > 0.99))
  }

  test("knnLooEval: same-label twins score perfectly, a boundary " +
    "vector whose neighbor crosses labels counts as wrong") {
    import spark.implicits._
    // 1/2 tight A pair, 3/4 tight B pair, 5 is A but nearest to 4 (B)
    val vecs = Seq(
      (1L, Array(1f, 0f), "A"), (2L, Array(0.9f, 0.1f), "A"),
      (3L, Array(0f, 1f), "B"), (4L, Array(0.1f, 0.9f), "B"),
      (5L, Array(0.6f, 0.8f), "A"))
      .toDF("vec_id", "embedding", "label")
    val got = Embeddings.knnLooEval(vecs, "vec_id", "embedding", "label")
      .orderBy("label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("A", 3L, 2L, 666L), ("B", 2L, 2L, 1000L)),
      got.mkString(","))
  }

  test("knnLooEval / mutualNearestPairs: an oversize frame fails the " +
    "maxCandidates guard loudly without collecting past the bound") {
    import spark.implicits._
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array(i.toFloat, 1f), if (i % 2 == 0) "A" else "B")
    }.toDF("vec_id", "embedding", "label")
    val e1 = intercept[IllegalArgumentException] {
      Embeddings.knnLooEval(vecs, "vec_id", "embedding", "label",
        maxCandidates = 10).collect()
    }
    assert(e1.getMessage.contains("maxCandidates"))
    val e2 = intercept[IllegalArgumentException] {
      Embeddings.mutualNearestPairs(vecs, "vec_id", "embedding",
        maxCandidates = 10).collect()
    }
    assert(e2.getMessage.contains("maxCandidates"))
    // at exactly the bound both still run (the +1 probe row is the only
    // thing past the limit, never the corpus)
    val ok = Embeddings.mutualNearestPairs(vecs, "vec_id", "embedding",
      maxCandidates = 20)
    assert(ok.collect().nonEmpty)
  }
}
