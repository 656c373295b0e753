package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  /** Reference top-k computed driver-side with plain Scala math. */
  def bruteForce(k: Int, queryIds: Seq[Long]): Map[Long, Seq[(Long, Double)]] = {
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    queryIds.map { q =>
      q -> all.toSeq.map { case (id, v) => (id, cos(all(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k)
    }.toMap
  }

  test("cosineTopK matches driver-side brute force exactly") {
    val queries = emb.filter($"vec_id" < 3)
    val got = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(r => (r.getLong(1), r.getDouble(3))).toSeq)
      .toMap
    val want = bruteForce(5, Seq(0L, 1L, 2L))
    Seq(0L, 1L, 2L).foreach { q =>
      assert(got(q).map(_._1) == want(q).map(_._1), s"ids for query $q")
      got(q).zip(want(q)).foreach { case ((_, gs), (_, ws)) =>
        assert(math.abs(gs - ws) < 1e-12)
      }
    }
    // self is always rank 1 with cosine ~1
    Seq(0L, 1L, 2L).foreach(q => assert(got(q).head._1 == q))
  }

  test("cosineTopK tolerates null embeddings in the corpus") {
    val emb3 = emb.limit(10).unionByName(
      spark.sql("SELECT CAST(99999 AS BIGINT) AS vec_id, " +
        "CAST(NULL AS ARRAY<FLOAT>) AS embedding, CAST(0 AS INT) AS label"))
    val out = Similarity.cosineTopK(emb3, emb.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 5).collect()
    assert(out.length == 5)
    assert(!out.exists(_.getLong(1) == 99999L)) // null vector never ranks
  }

  test("zero vectors score cosine 0.0 (never NaN) and never outrank " +
      "real matches") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))) // failed-embedding sentinel
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(rows, rows.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 3).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(!out.values.exists(_.isNaN), out.toString)
    assert(out(2L) == 0.0, "zero vector must score 0.0")
    // and it ranks LAST, not first (NaN would sort above everything)
    val ranked = Similarity.cosineTopK(rows,
      rows.filter($"vec_id" === 0), "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(ranked.last == 2L, ranked.toSeq)
    // semanticDedup must not treat everything as a dup of the zero vector
    val kept = Dedup.semanticDedup(rows, "vec_id", "embedding",
      threshold = 0.95, nClusters = 1).collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L), kept) // only 1 is a true near-dup of 0
  }

  test("ivfTopK: deterministic, self-hit first, high recall vs exact") {
    val queries = emb.filter($"vec_id" < 3)
    val got = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nLists = 8, nProbe = 3)
      .collect().groupBy(_.getLong(0))
    val exact = bruteForce(5, Seq(0L, 1L, 2L))
    Seq(0L, 1L, 2L).foreach { q =>
      val rows = got(q).sortBy(_.getInt(2))
      assert(rows.head.getLong(1) == q, s"query $q self-hit")
      // probing 3/8 cells should recover most of the exact top-5
      val recall = rows.map(_.getLong(1)).toSet
        .intersect(exact(q).map(_._1).toSet).size
      assert(recall >= 3, s"query $q recall $recall/5")
    }
  }

  test("ivfTopKPortable: nProbe = nLists degenerates to exact search, " +
      "bit-for-bit") {
    val queries = emb.filter($"vec_id" < 3)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding",
        k = 5).orderBy("query_id", "rank").collect().toSeq
    val ivf = Similarity.ivfTopKPortable(emb, queries, "vec_id",
        "embedding", k = 5, nLists = 8, nProbe = 8)
      .orderBy("query_id", "rank").collect().toSeq
    assert(ivf == exact)
  }

  test("ivfTopKPortable: bit-identical across partitionings, self-hit, " +
      "useful recall at nProbe 3/8") {
    val queries = emb.filter($"vec_id" < 3)
    def run(parts: Int) = Similarity.ivfTopKPortable(emb.repartition(parts),
        queries, "vec_id", "embedding", k = 5, nLists = 8, nProbe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val a = run(1).toSet
    assert(a == run(5).toSet, "partitioning changed the portable IVF result")
    val exact = bruteForce(5, Seq(0L, 1L, 2L))
    val byQuery = a.groupBy(_._1)
    Seq(0L, 1L, 2L).foreach { q =>
      val rows = byQuery(q).toSeq.sortBy(_._3)
      assert(rows.head._2 == q, s"query $q self-hit")
      val recall = rows.map(_._2).toSet
        .intersect(exact(q).map(_._1).toSet).size
      assert(recall >= 3, s"query $q recall $recall/5")
    }
  }

  test("lshTopKPortable: bit-identical across partitionings, rank-1 " +
      "self-hit, candidates confined to probed buckets") {
    val queries = emb.filter($"vec_id" < 3)
    def run(parts: Int) = Similarity.lshTopKPortable(emb.repartition(parts),
        queries, "vec_id", "embedding", k = 5, numPlanes = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val a = run(1).toSet
    assert(a == run(5).toSet, "partitioning changed the portable LSH result")
    val byQuery = a.groupBy(_._1)
    Seq(0L, 1L, 2L).foreach { q =>
      val rows = byQuery(q).toSeq.sortBy(_._3)
      // identical vector = identical bucket: the query always finds itself
      assert(rows.head._2 == q, s"query $q should self-match first")
      assert(rows.length <= 5)
    }
  }

  test("lshTopK: rank-1 self-hit and subset-of-bruteforce sanity") {
    val queries = emb.filter($"vec_id" < 3)
    val got = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().groupBy(_.getLong(0))
    // every query finds at least itself (identical vector = same bucket)
    Seq(0L, 1L, 2L).foreach { q =>
      val rows = got(q).sortBy(_.getInt(2))
      assert(rows.head.getLong(1) == q, s"query $q should self-match first")
      assert(rows.length <= 5)
    }
  }

  test("vector kernels compile under CODEGEN_ONLY for provably " +
      "non-nullable arrays (no silent interpreter fallback)") {
    // Over a non-nullable, no-null-element array input Spark pins the
    // expression's isNull to a literal and never declares the variable; a
    // kernel that unconditionally assigns ev.isNull then fails Janino and
    // every projection quietly interprets. CODEGEN_ONLY turns that silent
    // fallback into a hard error, pinning the fix.
    import graft.lakehouse.functions.VectorFunctions._
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val e = spark.range(16).selectExpr("id as vec_id",
        "transform(sequence(1, 8), x -> cast(x as double)) as v")
      val got = e.select(
          graft_dot(col("v"), col("v")).as("d"),
          graft_cosine(col("v"), col("v")).as("c"))
        .agg(sum("d"), min("c"), max("c")).head()
      assert(got.getDouble(0) == 16.0 * (1 to 8).map(x => x * x).sum)
      assert(math.abs(got.getDouble(1) - 1.0) < 1e-12 &&
        math.abs(got.getDouble(2) - 1.0) < 1e-12)
      // nullable path still works and still nulls on a null element
      val withNull = spark.sql(
        "select array(cast(1.0 as double), cast(null as double)) as v")
      assert(withNull.select(graft_dot(col("v"), col("v"))).head().isNullAt(0))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("ivfRecallSweep: recall is monotone in probe width and exact at " +
    "probe = nLists; every probe row materializes") {
    import spark.implicits._
    // 12 clusterable integer-ish vectors
    val vecs = (0 until 12).map { i =>
      val base = Array.fill(4)(0.0f)
      base(i % 4) = 10.0f + i
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val got = Similarity.ivfRecallSweep(vecs,
      vecs.filter($"vec_id" < 3), "vec_id", "embedding", k = 5,
      nLists = 4, probes = Seq(1, 2, 4)).orderBy("n_probe").collect()
    assert(got.length == 3)
    val recalls = got.map(_.getAs[Long]("recall_permille"))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"recall must be monotone, got ${recalls.toSeq}")
    assert(recalls.last == 1000L, "probe-all == exact")
    assert(got.forall(_.getAs[Long]("n_expected") == 15L))
  }

  test("opqTopK: learned rotation is orthogonal; identity mode equals " +
      "pqTopK bit-for-bit; recall >= plain PQ on rotation-hostile data") {
    // latent axis-clustered 8-dim data MIXED by 45-degree Givens
    // rotations that straddle every m=4 subspace boundary — the exact
    // shape where axis-aligned PQ loses and OPQ recovers (Ge '13 §1)
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16, 8)(if (rnd.nextBoolean()) 4.0 else -4.0)
    def mix(v: Array[Double]): Array[Double] = {
      val o = v.clone()
      val c = math.cos(math.Pi / 4); val s = math.sin(math.Pi / 4)
      for ((a, b) <- Seq((0, 2), (1, 3), (4, 6), (5, 7))) {
        val x = o(a); val y = o(b)
        o(a) = c * x - s * y; o(b) = s * x + c * y
      }
      o
    }
    val rows = (0 until 512).map { i =>
      val base = centers(i % 16)
      val v = Array.tabulate(8)(j => base(j) + rnd.nextGaussian() * 0.1)
      (i.toLong, mix(v).map(_.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 8)
    // orthogonality of the trained rotation: R^T R = I within 1e-9
    val sample = rows.map(_._2.map(_.toDouble)).toArray
    val r = Similarity.trainOpqRotation(sample, m = 4, codebookSize = 4,
      opqIters = 8, kmeansIters = 10, seed = 42L)
    for (i <- 0 until 8; j <- 0 until 8) {
      val dot = (0 until 8).map(t => r(t)(i) * r(t)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"R^T R ($i,$j) = $dot")
    }
    // identity mode (opqIterations = 0) is exactly pqTopK
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("query_id", "rank").collect().toSeq
    assert(rowsOf(Similarity.opqTopK(df, queries, "vec_id", "embedding",
        k = 5, m = 4, codebookSize = 8, reRank = 1000, opqIterations = 0))
      == rowsOf(Similarity.pqTopK(df, queries, "vec_id", "embedding",
        k = 5, m = 4, codebookSize = 8, reRank = 1000)))
    // recall@5 against exact cosine: OPQ >= PQ at the same index bytes
    val exact = Similarity.cosineTopK(df, queries, "vec_id", "embedding",
        k = 5).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1))).toSet
    def recall(d: org.apache.spark.sql.DataFrame): Int =
      d.collect().map(rw => (rw.getLong(0), rw.getLong(1)))
        .count(exact.contains)
    val pqR = recall(Similarity.pqTopK(df, queries, "vec_id", "embedding",
      k = 5, m = 4, codebookSize = 4))
    val opqR = recall(Similarity.opqTopK(df, queries, "vec_id",
      "embedding", k = 5, m = 4, codebookSize = 4, opqIterations = 8))
    assert(opqR >= pqR, s"OPQ recall $opqR < PQ recall $pqR")
  }
}
