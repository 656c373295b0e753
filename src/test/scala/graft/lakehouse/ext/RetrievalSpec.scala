package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  test("rrfFuse: hand-computed fusion of two rankings") {
    // system A ranks (10, 20, 30); system B ranks (20, 40)
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val s = 1000000000000L
    val expect = Seq(
      // 20: 1/62 + 1/61 — found by both systems, wins
      (20L, 1, s / 62 + s / 61, 2L),
      (10L, 2, s / 61, 1L), // rank 1 in A
      (40L, 3, s / 62, 1L), // rank 2 in B
      (30L, 4, s / 63, 1L)) // rank 3 in A
    assert(got.toSeq == expect, got.toSeq)
  }

  test("rrfFuse tie-breaks: equal score → more systems win, then smaller id") {
    // id 2 (system A, rank 5) and id 1 (system B, rank 5): equal scores,
    // equal system counts → smaller id ranks first
    val a = Seq((2L, 5)).toDF("id", "rank")
    val b = Seq((1L, 5)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 1), (2L, 2)), got.toSeq)
    // n_systems dominates when scores tie ACROSS different system counts:
    // id 9 at rank 30 twice (2·s/90) vs id 8 at rank 15 once (s/75) —
    // different scores, sanity-check ordering by score first
    val c = Seq((9L, 30), (8L, 15)).toDF("id", "rank")
    val d = Seq((9L, 30)).toDF("id", "rank")
    val got2 = Retrieval.rrfFuse(Seq(c, d), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // 2·(s div 90) = 22222222220 > s div 75 = 13333333333
    assert(got2.toSeq == Seq((9L, 1, 2L), (8L, 2, 1L)), got2.toSeq)
  }

  test("rrfFuse truncates at k with deterministic order") {
    val a = (1 to 100).map(i => (i.toLong, i)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a), "id", "rank", k = 7)
      .collect().map(_.getLong(0))
    assert(got.toSeq == (1L to 7L).toSeq)
  }

  test("rrfFuse refuses empty input") {
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Nil, "id", "rank", k = 5)
    }
  }

  test("retrievalMetrics: hand-computed recall@k and MRR numerators, " +
      "zero-hit queries still reported") {
    val ranking = Seq(
      ("qa", 10L, 1), ("qa", 20L, 2), ("qa", 30L, 3), ("qa", 40L, 4),
      ("qb", 50L, 1), ("qb", 60L, 2)
    ).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      ("qa", 20L), ("qa", 40L), ("qa", 99L), // 3 relevant, 2 in top-3? rank4 cut
      ("qb", 77L) // relevant but never retrieved
    ).toDF("query_id", "doc_id")
    val got = Retrieval.retrievalMetrics(ranking, qrels, "query_id",
        "doc_id", "rank", k = 3)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val s = 1000000000000L
    // qa: top-3 = {10,20,30}; hits = {20} → recall 1/3 → 333‰; first at 2
    assert(got("qa") == (3L, 1L, 333L, s / 2), got("qa"))
    // qb: no relevant retrieved → all zeros, but the row EXISTS
    assert(got("qb") == (1L, 0L, 0L, 0L), got("qb"))
  }

  test("retrievalMetrics: duplicate qrel rows do not double-count") {
    val ranking = Seq(("q", 1L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(("q", 1L), ("q", 1L)).toDF("query_id", "doc_id")
    val r = Retrieval.retrievalMetrics(ranking, qrels, "query_id",
      "doc_id", "rank", k = 5).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (1L, 1L, 1000L), r)
  }

  test("pairSetEval: orientation/repeats normalize away, one-sided " +
      "pairs score, empty sides give NULL ratios") {
    // predicted: (1,2) twice + reversed, (3,4); truth: (2,1), (5,6)
    val pred = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val truth = Seq((2L, 1L), (5L, 6L)).toDF("a", "b")
    val r = Retrieval.pairSetEval(pred, truth).head()
    assert(r.getAs[Long]("n_pred") == 2L)
    assert(r.getAs[Long]("n_truth") == 2L)
    assert(r.getAs[Long]("tp") == 1L)
    assert(r.getAs[Long]("precision_permille") == 500L)
    assert(r.getAs[Long]("recall_permille") == 500L)
    // self-pairs and nulls are dropped before scoring
    val degenerate = Seq((7L, 7L)).toDF("a", "b")
    val r2 = Retrieval.pairSetEval(degenerate, truth).head()
    assert(r2.getAs[Long]("n_pred") == 0L &&
      r2.isNullAt(r2.fieldIndex("precision_permille")) &&
      r2.getAs[Long]("recall_permille") == 0L)
  }

  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("rrfFuse/retrievalMetrics: malformed rankings fail loudly " +
      "instead of silently dropping a system's contribution") {
    val good = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val zeroRank = Seq((1L, 0)).toDF("doc_id", "rank")
    // k0 = 0 would let a 0 rank divide by zero -> rejected up front
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(good), "doc_id", "rank", k = 5, k0 = 0L)
    }
    val e1 = intercept[Throwable] {
      Retrieval.rrfFuse(Seq(good, zeroRank), "doc_id", "rank", k = 5)
        .collect()
    }
    assert(messageChain(e1).contains("malformed ranking"), messageChain(e1))
    val qrels = Seq(("q", 1L)).toDF("query_id", "doc_id")
    val e2 = intercept[Throwable] {
      Retrieval.retrievalMetrics(
        Seq(("q", 1L, 0)).toDF("query_id", "doc_id", "rank"),
        qrels, "query_id", "doc_id", "rank", k = 5).collect()
    }
    assert(messageChain(e2).contains("malformed ranking"), messageChain(e2))
  }
  test("hardNegatives: labeled docs drop, survivors re-rank densely in " +
      "original order; malformed ranks raise") {
    val ranking = Seq(("q1", 10L, 1), ("q1", 11L, 2), ("q1", 12L, 3),
      ("q2", 20L, 1), ("q2", 21L, 2))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq(("q1", 11L), ("q2", 20L), ("q2", 99L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.hardNegatives(ranking, qrels, "query_id",
        "doc_id", "rank")
      .orderBy("query_id", "neg_rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(("q1", 1, 10L, 1), ("q1", 2, 12L, 3),
      ("q2", 1, 21L, 2)))
    val bad = Seq(("q1", 10L, 0)).toDF("query_id", "doc_id", "rank")
    val e = intercept[Exception] {
      Retrieval.hardNegatives(bad, qrels, "query_id", "doc_id", "rank")
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("ndcgAtK: hand-computed graded DCG/IDCG, unjudged docs gain 0, " +
      "all-zero qrels give NULL ndcg, partitioning invariant") {
    val ranking = Seq(("q1", 10L, 1), ("q1", 11L, 2), ("q1", 12L, 3),
      ("q2", 20L, 1))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq(("q1", 10L, 3L), ("q1", 12L, 1L), ("q1", 99L, 2L),
      ("q2", 20L, 0L))
      .toDF("query_id", "doc_id", "grade")
    def g(grade: Long, rank: Long): java.math.BigDecimal =
      new java.math.BigDecimal(
        grade.toDouble / (math.log(rank.toDouble + 1.0) / math.log(2.0)))
        .setScale(18, java.math.RoundingMode.HALF_UP)
    val out = Retrieval.ndcgAtK(ranking, qrels, "query_id", "doc_id",
      "rank", "grade", k = 10).orderBy("query_id").collect()
    val q1 = out(0)
    // dcg = 3/log2(2) + 0/log2(3) + 1/log2(4); idcg ranks grades 3,2,1
    val dcg = g(3, 1).add(g(0, 2)).add(g(1, 3)).doubleValue
    val idcg = g(3, 1).add(g(2, 2)).add(g(1, 3)).doubleValue
    assert(q1.getLong(1) == 3L)
    assert(q1.getDouble(2) == dcg && q1.getDouble(3) == idcg)
    assert(q1.getDouble(4) == dcg / idcg)
    val q2 = out(1)
    assert(q2.getDouble(3) == 0.0 && q2.isNullAt(4),
      "all-zero grades must yield NULL ndcg, not 0/0")
    val again = Retrieval.ndcgAtK(ranking.repartition(4),
      qrels.repartition(3), "query_id", "doc_id", "rank", "grade", 10)
      .orderBy("query_id").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("mmrRerank: diversity beats a near-duplicate of the first pick") {
    // query [1,0]: a=[0.9,0.3] (rel ≈ 948‰), b=[0.89,0.31] (near-dup of
    // a, rel ≈ 944‰, sim(b,a) ≈ 999‰), c=[0.3,0.9] (rel ≈ 316‰,
    // sim(c,a) ≈ 600‰). Pure relevance ranks a,b,c; at λ=0.3 the
    // near-dup's ~999‰ penalty outweighs its relevance edge and c is
    // selected second.
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (10L, Seq(0.9f, 0.3f)),
      (11L, Seq(0.89f, 0.31f)),
      (12L, Seq(0.3f, 0.9f))).toDF("vec_id", "embedding")
    val got = Retrieval.mmrRerank(rows.filter(col("vec_id") >= 10L),
        rows.filter(col("vec_id") === 0L), "vec_id", "embedding",
        candK = 3, selectK = 3, lambdaPermille = 300)
      .orderBy("sel_rank").collect()
      .map(r => (r.getAs[Int]("sel_rank"), r.getAs[Long]("vec_id")))
    assert(got.toSeq == Seq((1, 10L), (2, 12L), (3, 11L)))
    // at λ=1.0 MMR degenerates to pure relevance order
    val rel = Retrieval.mmrRerank(rows.filter(col("vec_id") >= 10L),
        rows.filter(col("vec_id") === 0L), "vec_id", "embedding",
        candK = 3, selectK = 3, lambdaPermille = 1000)
      .orderBy("sel_rank").collect().map(_.getAs[Long]("vec_id"))
    assert(rel.toSeq == Seq(10L, 11L, 12L))
  }

  test("mmrRerank: ties break to the smaller id and scores are " +
    "partition-order independent") {
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (21L, Seq(0.5f, 0.5f)),
      (20L, Seq(0.5f, 0.5f)),
      (22L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    def run(parts: Int) = Retrieval.mmrRerank(
        rows.filter(col("vec_id") >= 20L).repartition(parts),
        rows.filter(col("vec_id") === 0L), "vec_id", "embedding",
        candK = 3, selectK = 2, lambdaPermille = 700)
      .orderBy("sel_rank").collect()
      .map(r => (r.getAs[Int]("sel_rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("mmr_score"))).toSeq
    val a = run(1)
    assert(a.map(_._2) == Seq(20L, 21L))
    assert(a == run(5))
  }

  test("passAtK: exact falling-factorial rationals, full-success and " +
      "zero-success edges, tasks with n < k excluded") {
    // A: n=5,c=1 -> 1 - C(4,3)/C(5,3) = 36/60; B: n=3,c=0 -> 0;
    // C: n=3,c=3 -> 1; D: n=2 -> excluded
    val rows = Seq(
      ("A", 1), ("A", 0), ("A", 0), ("A", 0), ("A", 0),
      ("B", 0), ("B", 0), ("B", 0),
      ("C", 1), ("C", 1), ("C", 1),
      ("D", 1), ("D", 1)).toDF("task", "ok")
    val got = Retrieval.passAtK(rows, "task", col("ok") === 1, k = 3)
      .orderBy("n", "c").collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("c"),
        r.getAs[Long]("n_tasks"), r.getAs[Long]("pass_num"),
        r.getAs[Long]("pass_den"), r.getAs[Double]("pass_at_3"))).toSeq
    assert(got == Seq(
      (3L, 0L, 1L, 0L, 6L, 0.0),
      (3L, 3L, 1L, 6L, 6L, 1.0),
      (5L, 1L, 1L, 36L, 60L, 0.6)), got.mkString(","))
    intercept[IllegalArgumentException] {
      Retrieval.passAtK(rows, "task", col("ok") === 1, k = 7)
    }
  }

  test("averagePrecisionAtK: hand-computed AP and the zero-hit query") {
    val ranking = (1 to 5).map(r => ("q1", r.toLong, r)) ++
      (1 to 5).map(r => ("q2", (100 + r).toLong, r))
    val qrels = Seq(("q1", 1L), ("q1", 3L), ("q1", 5L),
      ("q2", 999L))
    val got = Retrieval.averagePrecisionAtK(
        ranking.toDF("query_id", "doc_id", "rank"),
        qrels.toDF("query_id", "doc_id"),
        "query_id", "doc_id", "rank", k = 5)
      .orderBy("query_id").collect()
    // q1: hits at ranks 1,3,5 -> AP = (1/1 + 2/3 + 3/5)/3
    assert(got(0).getAs[Long]("n_rel") == 3L)
    assert(got(0).getAs[Long]("hits") == 3L)
    assert(math.abs(got(0).getAs[Double]("ap") -
      (1.0 + 2.0 / 3.0 + 3.0 / 5.0) / 3.0) < 1e-12)
    // q2: nothing retrieved is relevant -> AP = 0, not null
    assert(got(1).getAs[Long]("hits") == 0L)
    assert(got(1).getAs[Double]("ap") == 0.0)
  }

  test("averagePrecisionAtK divides by min(n_rel, k)") {
    // 3 relevant docs but k=2: perfect top-2 retrieval scores AP=1.
    val ranking = Seq(("q", 1L, 1), ("q", 2L, 2))
    val qrels = Seq(("q", 1L), ("q", 2L), ("q", 3L))
    val r = Retrieval.averagePrecisionAtK(
      ranking.toDF("query_id", "doc_id", "rank"),
      qrels.toDF("query_id", "doc_id"),
      "query_id", "doc_id", "rank", k = 2).head()
    assert(math.abs(r.getAs[Double]("ap") - 1.0) < 1e-12)
  }

  test("rankBiasedOverlap: identical, disjoint, and partial lists") {
    def rk(ids: Seq[Long]) =
      ids.zipWithIndex.map { case (id, i) => (id, i + 1) }
        .toDF("doc_id", "rank")
    val same = Retrieval.rankBiasedOverlap(
      rk(Seq(10, 20, 30)), rk(Seq(10, 20, 30)), "doc_id", "rank", k = 3)
      .head()
    // overlap_d = d -> rbo = 1/2 + 1/4 + 1/8
    assert(same.getAs[Long]("overlap_at_k") == 3L)
    assert(math.abs(same.getAs[Double]("rbo") - 0.875) < 1e-12)
    val disjoint = Retrieval.rankBiasedOverlap(
      rk(Seq(1, 2, 3)), rk(Seq(7, 8, 9)), "doc_id", "rank", k = 3).head()
    assert(disjoint.getAs[Long]("overlap_at_k") == 0L)
    assert(disjoint.getAs[Double]("rbo") == 0.0)
    // swapped tail: S=(1,2), T=(2,1) at k=2 -> overlap@1 = 0, overlap@2 = 2
    // rbo = (0/1)/2 + (2/2)/4 = 0.25
    val partial = Retrieval.rankBiasedOverlap(
      rk(Seq(1, 2)), rk(Seq(2, 1)), "doc_id", "rank", k = 2).head()
    assert(partial.getAs[Long]("overlap_at_k") == 2L)
    assert(math.abs(partial.getAs[Double]("rbo") - 0.25) < 1e-12)
  }

  test("errAtK: hand-computed cascade on grades (3, 0, 1)") {
    // R = (7/8, 0, 1/8): ERR = 7/8 + 0 + (1/3)(1/8)(1/8) = 0.875 + 1/192
    val ranking = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq(("q", 1L, 3L), ("q", 3L, 1L))
      .toDF("query_id", "doc_id", "grade")
    val r = Retrieval.errAtK(ranking, qrels, "query_id", "doc_id",
      "rank", "grade", k = 3, gmax = 3).head()
    assert(r.getAs[Long]("n_graded") == 2L)
    assert(math.abs(r.getAs[Double]("err") - (0.875 + 1.0 / 192.0))
      < 1e-12, r.toString)
  }

  test("errAtK: perfect first hit saturates; out-of-range grades refuse") {
    val ranking = Seq(("q", 1L, 1)).toDF("query_id", "doc_id", "rank")
    val perfect = Seq(("q", 1L, 3L)).toDF("query_id", "doc_id", "grade")
    val r = Retrieval.errAtK(ranking, perfect, "query_id", "doc_id",
      "rank", "grade", k = 3, gmax = 3).head()
    assert(math.abs(r.getAs[Double]("err") - 0.875) < 1e-12)
    val bad = Seq(("q", 1L, 9L)).toDF("query_id", "doc_id", "grade")
    val e = intercept[Throwable] {
      Retrieval.errAtK(ranking, bad, "query_id", "doc_id", "rank",
        "grade", k = 3, gmax = 3).collect()
    }
    assert(e.toString.contains("errAtK") ||
      Option(e.getCause).exists(_.toString.contains("errAtK")), e.toString)
  }

  test("bradleyTerryScores: two players converge to the exact w-ratio MLE") {
    // A beats B 3x, B beats A 1x: MLE ratio 3:1; the fixed-point MM
    // lands exactly on (1.5e6, 0.5e6) after round 1 and stays there.
    val g = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")))
      .toDF("winner", "loser")
    val got = Retrieval.bradleyTerryScores(g, "winner", "loser",
        iterations = 2)
      .orderBy("player").collect()
      .map(r => (r.getAs[String]("player"), r.getAs[Long]("games"),
        r.getAs[Long]("wins"), r.getAs[Long]("bt_score")))
    assert(got.toSeq == Seq(("A", 4L, 3L, 1500000L),
      ("B", 4L, 1L, 500000L)), got.mkString(","))
  }

  test("bradleyTerryScores: zero-win players rest at 0; order invariance") {
    val g = Seq(("A", "C"), ("A", "C"), ("B", "C"), ("A", "B"))
      .toDF("winner", "loser")
    def run(parts: Int) = Retrieval.bradleyTerryScores(
        g.repartition(parts), "winner", "loser", iterations = 3)
      .orderBy("player").collect()
      .map(r => (r.getAs[String]("player"), r.getAs[Long]("bt_score")))
      .toSeq
    val got = run(1)
    assert(got == run(7), "MM fold must be partition-order free")
    val m = got.toMap
    assert(m("C") == 0L, s"zero-win player must rest at 0: $got")
    assert(m("A") > m("B") && m("B") > 0L, got.mkString(","))
  }
}
