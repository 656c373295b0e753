package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — the canonical RAG retrieval shape: a
  * lexical ranking (BM25, [[TextStats.bm25TopK]]) and a vector ranking
  * (cosine top-k, [[Similarity.cosineTopK]]) fused into one list.
  */
object Retrieval {

  /** A rank column, validated per row: ranks are 1-based by definition,
    * and a 0/negative/NULL rank would otherwise flow into `scale div
    * (k0 + rank)`-style integer divisions where non-ANSI Spark turns a
    * divide-by-zero into NULL and the enclosing sum()/min() silently
    * drops it — a malformed ranking must fail loudly, not skew the
    * fusion. */
  private def guardedRank(rank: org.apache.spark.sql.Column, op: String,
      as: String = "__rank"): org.apache.spark.sql.Column = {
    val r = rank.cast("long")
    when(r.isNull || r < 1L, raise_error(lit(
        s"$op: malformed ranking — ranks must be >= 1 and non-null")))
      .otherwise(r).as(as)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fused score = Σ_systems 1/(k0 + rank). Computed in INTEGER
    * arithmetic — each contribution is `scale div (k0 + rank)` — so the
    * fused ordering is bit-identical on every engine (the float form's
    * sum is order-sensitive). With the default scale = 10^12,
    * consecutive-rank contributions differ by scale/((k0+r)(k0+r+1)) —
    * still > 10^5 at rank 1000 — so integer truncation cannot collapse
    * genuinely different RRF scores at any practical depth. Remaining
    * ties break on (n_systems desc, id asc): documents found by MORE
    * retrievers win.
    *
    * Rank-based by construction: fusing never touches the systems'
    * incomparable raw scores (BM25 logs vs cosines) — the whole point
    * of RRF over score interpolation.
    *
    * 100 TB shape: the inputs are already top-k rankings (bounded
    * frames); the fuse is a union, ONE aggregation over ≤ Σk rows, and
    * a TakeOrdered — metadata-scale work regardless of corpus size.
    * Each input must carry one row per id (a ranking, not a log). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, k0: Long = 60L, scale: Long = 1000000000000L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    // k0 = 0 would make a (malformed) 0-valued rank divide by zero, which
    // non-ANSI Spark returns as NULL and sum() silently DROPS — that
    // system's contribution would vanish instead of erroring
    require(k >= 1 && k0 >= 1 && scale >= 1,
      "rrfFuse needs k >= 1, k0 >= 1 and scale >= 1")
    val tagged = rankings.map(r =>
        r.select(col(idCol), guardedRank(col(rankCol), "rrfFuse")))
      .reduce(_ unionByName _)
    val fused = tagged
      .groupBy(idCol)
      .agg(sum(expr(s"${scale}L div (${k0}L + __rank)")).as("rrf_score"),
        count(lit(1)).as("n_systems"))
      .orderBy(col("rrf_score").desc, col("n_systems").desc, col(idCol).asc)
      .limit(k)
    // the rank window runs over the ≤ k TakeOrdered survivors only
    fused.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_score").desc, col("n_systems").desc,
            col(idCol).asc)))
      .select(col(idCol), col("rank"), col("rrf_score"), col("n_systems"))
  }

  /** Retrieval evaluation against relevance judgments (qrels): per
    * query — relevant total, hits in the top `k`, recall@k (exact
    * integer permille), and the reciprocal rank of the FIRST relevant
    * hit as `scale div rank` (the MRR numerator, same integer encoding
    * as [[rrfFuse]] so it is engine-exact; 0 when nothing relevant
    * ranked). Queries with judgments but no hits still report (their
    * recall is 0) — evaluation must see the misses.
    *
    * 100 TB shape: judgment sets are eval-sized and ride a broadcast
    * into the join against the (already top-k-bounded) ranking; both
    * aggregations group on the query key with map-side combine. */
  def retrievalMetrics(ranking: DataFrame, qrels: DataFrame,
      queryCol: String, idCol: String, rankCol: String, k: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(k >= 1 && scale >= 1)
    val judged = qrels.select(col(queryCol), col(idCol)).distinct()
    val perQueryRel = judged.groupBy(queryCol)
      .agg(count(lit(1)).as("n_rel"))
    val hits = ranking.filter(col(rankCol) <= k)
      .select(col(queryCol), col(idCol),
        guardedRank(col(rankCol), "retrievalMetrics", "__r"))
      .join(broadcast(judged), Seq(queryCol, idCol))
      .groupBy(queryCol)
      .agg(count(lit(1)).as("hits"), min("__r").as("__first"))
    perQueryRel.join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr("(coalesce(hits, 0L) * 1000) div n_rel").as("recall_permille"),
        coalesce(expr(s"${scale}L div __first"), lit(0L)).as("rr_scaled"))
  }

  /** Precision/recall of a predicted PAIR set against a ground-truth
    * pair set (the detector-evaluation report: how good is an LSH /
    * threshold-join dedup candidate generator against known duplicates):
    * one row — predicted count, truth count, true positives, exact
    * integer permille precision and recall. Pairs normalize to
    * (min, max) and dedupe on both sides, so orientation and repeats
    * can't skew the score; empty sides report NULL for the undefined
    * ratio instead of faking a number.
    *
    * Scale shape: ONE full-outer join on the pair key + ONE global
    * fold — both inputs are already pair-scale (bounded by the
    * detectors that made them), never corpus-scale. */
  def pairSetEval(predicted: DataFrame, truth: DataFrame,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    def canon(df: DataFrame, tag: String) = df.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .withColumn(tag, lit(1L))
    canon(predicted, "__p").join(canon(truth, "__t"),
        Seq("a", "b"), "full_outer")
      .agg(
        sum(coalesce(col("__p"), lit(0L))).as("n_pred"),
        sum(coalesce(col("__t"), lit(0L))).as("n_truth"),
        sum(coalesce(col("__p"), lit(0L)) * coalesce(col("__t"), lit(0L)))
          .as("tp"))
      .select(
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision_permille",
        when(col("n_pred") > 0, expr("(tp * 1000) div n_pred")))
      .withColumn("recall_permille",
        when(col("n_truth") > 0, expr("(tp * 1000) div n_truth")))
  }
  /** nDCG@k with graded relevance (Järvelin & Kekäläinen '02), made
    * ORACLE-PORTABLE the q266 way: each position's gain
    * `grade / log2(rank+1)` is one IEEE double expression replicated
    * op-for-op (the log via ln/ln, the q61 precedent), and the DCG/IDCG
    * SUMS are carried in exact DECIMAL(38,18) so partitioning can never
    * reorder floating additions; the final nDCG is one double division
    * of the two exact sums. Unjudged ranked docs gain 0; IDCG ranks the
    * query's qrels by (grade desc, doc asc) cut at k; queries whose
    * qrels carry no positive grade get a NULL nDCG (0/0 is "nothing to
    * rank", not a score). Ranks validate >= 1 like the rest of this
    * file.
    *
    * 100 TB shape: the ranking input is top-k-bounded per query and the
    * qrels are eval-sized — the join broadcasts the qrels, the IDCG
    * window partitions over those same bounded qrels, and the output is
    * |queries| rows. */
  def ndcgAtK(ranking: DataFrame, qrels: DataFrame, queryCol: String,
      docCol: String, rankCol: String, gradeCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "ndcgAtK: k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    def gain(grade: org.apache.spark.sql.Column,
        rank: org.apache.spark.sql.Column) =
      (grade.cast("double") /
        (log(rank.cast("double") + 1.0) / log(lit(2.0).cast("double"))))
        .cast("decimal(38,18)")
    val q = qrels.select(col(queryCol), col(docCol),
      col(gradeCol).cast("long").as("__g"))
    val ranked = ranking.select(col(queryCol), col(docCol),
        guardedRank(col(rankCol), "ndcgAtK"))
      .filter(col("__rank") <= k)
    val dcg = ranked.join(broadcast(q), Seq(queryCol, docCol), "left")
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_ranked"),
        sum(gain(coalesce(col("__g"), lit(0L)), col("__rank")))
          .as("__dcg"))
    val iw = Window.partitionBy(col(queryCol))
      .orderBy(col("__g").desc, col(docCol).asc)
    val idcg = q.withColumn("__ir", row_number().over(iw))
      .filter(col("__ir") <= k)
      .groupBy(col(queryCol))
      .agg(sum(gain(col("__g"), col("__ir"))).as("__idcg"))
    dcg.join(idcg, Seq(queryCol), "left")
      .select(col(queryCol), col("n_ranked"),
        col("__dcg").cast("double").as("dcg"),
        coalesce(col("__idcg").cast("double"), lit(0.0)).as("idcg"),
        when(coalesce(col("__idcg"), lit(java.math.BigDecimal.ZERO)) > 0,
          col("__dcg").cast("double") / col("__idcg").cast("double"))
          .as("ndcg"))
  }

  /** Hard-negative mining for retrieval training (the DPR recipe,
    * Karpukhin '20): per query, the top-ranked documents that are NOT
    * relevance-labeled become ranked negatives -- the near-misses a
    * contrastive trainer learns the most from. One LEFT ANTI join of the
    * ranking against the qrels, then negatives re-rank densely (original
    * order preserved) so a downstream sampler takes the first n.
    *
    * 100 TB shape: the ranking input is already top-k-bounded per query,
    * so the anti-join touches |queries| * k rows with the eval-sized
    * qrels riding a broadcast -- metadata-scale regardless of corpus
    * size; the re-rank window partitions by query over those same
    * bounded rows. Ranks validate per row (>= 1, non-null) like every
    * operator in this file -- a malformed ranking fails loudly. */
  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
    * 1998): greedily select `selectK` of each query's top-`candK`
    * candidates maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s) — the
    * diversified-retrieval shape that keeps a RAG context window or a
    * curated sample from filling up with near-duplicates. Both rel and
    * sim are COSINE similarities (the unnormalized-dot form degenerates:
    * a near-duplicate's penalty scales with its own relevance, so it is
    * never displaced), made ENGINE-PORTABLE by construction: vectors
    * quantize to integers (`floor(x·scale)`, the LSH trick), dots and
    * squared norms are exact integers, and the cosine is floored to a
    * permille integer through one fixed IEEE op sequence
    * (1000·dot/(√uu·√vv) — sqrt and divide are correctly rounded on
    * every engine, so the floor is bit-stable); λ is a permille integer
    * — the greedy argmax (ties to the smaller id) is then bit-identical
    * on any engine. Zero vectors get cosine 0.
    *
    * Scale shape: candidate generation is the one corpus-sized job (dot +
    * per-query top-candK window); the greedy runs in a compiled kernel
    * over each query's OWN ≤ candK candidates (candK²·dim integer ops per
    * query row — bounded, never corpus-sized), so the whole rerank is
    * linear in |queries| after the scan. The kernel is order-independent
    * (argmax with explicit tie-break), so the unordered collect_list is
    * safe. Output: (query_id, sel_rank, vec_id, mmr_score). */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, candK: Int, selectK: Int,
      lambdaPermille: Int = 700, scale: Long = 1024L): DataFrame = {
    require(candK >= 1 && selectK >= 1 && selectK <= candK &&
      lambdaPermille >= 0 && lambdaPermille <= 1000,
      "mmrRerank needs 1 <= selectK <= candK and lambda in [0, 1000]")
    val lam = lambdaPermille.toLong
    val oneMinusLam = 1000L - lam
    def qz(c: Column): Column =
      transform(c, x => floor(x.cast("double") * scale).cast("long"))
    def sq(vec: String): Column =
      expr(s"aggregate($vec, 0L, (acc, x) -> acc + x * x)")
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"), qz(col(vecCol)).as("cvec"))
      .withColumn("cc", sq("cvec"))
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"), qz(col(vecCol)).as("qvec"))
      .withColumn("qq", sq("qvec"))
    val dot = expr(
      "aggregate(zip_with(cvec, qvec, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
    val rel = c.join(broadcast(q))
      .withColumn("rel",
        when(col("cc") === 0L || col("qq") === 0L, lit(0L))
          .otherwise(floor(lit(1000.0) * dot.cast("double") /
            (sqrt(col("cc").cast("double")) * sqrt(col("qq").cast("double"))))
            .cast("long")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("vec_id").asc)
    val cands = rel.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= candK)
    val greedy = udf((cs: Seq[Row]) => {
      val ids = cs.map(_.getAs[Long]("vec_id")).toArray
      val rels = cs.map(_.getAs[Long]("rel")).toArray
      val vecs = cs.map(_.getAs[Seq[Long]]("cvec").toArray).toArray
      val nrm2 = vecs.map(v => v.foldLeft(0L)((a, x) => a + x * x))
      def cosPermille(i: Int, j: Int): Long = {
        if (nrm2(i) == 0L || nrm2(j) == 0L) 0L
        else {
          var d = 0L; var t = 0
          val (vi, vj) = (vecs(i), vecs(j))
          while (t < vi.length) { d += vi(t) * vj(t); t += 1 }
          math.floor(1000.0 * d.toDouble /
            (math.sqrt(nrm2(i).toDouble) * math.sqrt(nrm2(j).toDouble))).toLong
        }
      }
      val n = ids.length
      val picked = new Array[Boolean](n)
      val maxSim = new Array[Long](n) // max sim to the selected set so far
      val out = Seq.newBuilder[(Int, Long, Long)]
      var step = 1
      while (step <= math.min(selectK, n)) {
        var best = -1; var bestScore = 0L
        var i = 0
        while (i < n) {
          if (!picked(i)) {
            val s = lam * rels(i) -
              (if (step == 1) 0L else oneMinusLam * maxSim(i))
            if (best < 0 || s > bestScore ||
              (s == bestScore && ids(i) < ids(best))) {
              best = i; bestScore = s
            }
          }
          i += 1
        }
        out += ((step, ids(best), bestScore))
        picked(best) = true
        var j = 0
        while (j < n) {
          if (!picked(j)) {
            val s = cosPermille(best, j)
            if (s > maxSim(j) || step == 1) maxSim(j) = s
          }
          j += 1
        }
        step += 1
      }
      out.result()
    })
    cands.groupBy("query_id")
      .agg(collect_list(struct(col("vec_id"), col("rel"), col("cvec"))).as("cs"))
      .select(col("query_id"), explode(greedy(col("cs"))).as("s"))
      .select(col("query_id"), col("s._1").cast("int").as("sel_rank"),
        col("s._2").as("vec_id"), col("s._3").as("mmr_score"))
  }

  def hardNegatives(ranking: DataFrame, qrels: DataFrame,
      queryCol: String, docCol: String, rankCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val guarded = ranking.select(col(queryCol), col(docCol),
      guardedRank(col(rankCol), "hardNegatives"))
    val negatives = guarded.join(
      broadcast(qrels.select(col(queryCol), col(docCol))),
      Seq(queryCol, docCol), "left_anti")
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("__rank").asc, col(docCol).asc)
    negatives.withColumn("neg_rank", row_number().over(w))
      .select(col(queryCol), col("neg_rank").cast("int").as("neg_rank"),
        col(docCol), col("__rank").cast("int").as("orig_rank"))
  }

  /** Unbiased pass@k estimator (Chen et al. 2021, "Evaluating Large
    * Language Models Trained on Code", eq. 1) from per-task attempt
    * logs: with n attempts and c successes, pass@k = 1 − C(n−c,k)/C(n,k)
    * = 1 − Π_{j<k}(n−c−j)/(n−j) — the probability a random size-k sample
    * of the attempts contains a success. Held as an EXACT BIGINT
    * rational via the falling-factorial products (k ≤ 6 keeps the
    * products inside 63 bits up to n ≈ 10⁹ attempts/task), one IEEE
    * division for the readable column. ONE count aggregation over
    * (task), then a GROUP BY the bounded (n, c) profile — at 100 TB the
    * output is |distinct (n,c)| rows, never |tasks|. Tasks with fewer
    * than k attempts can't be estimated and are excluded (their (n,c)
    * profiles simply don't appear — the caller sees the support drop). */
  def passAtK(df: DataFrame, taskCol: String, successCol: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 6, "passAtK needs k in [1, 6]")
    val perTask = df.filter(col(taskCol).isNotNull)
      .groupBy(col(taskCol).as("__t"))
      .agg(count(lit(1)).as("n"),
        sum(successCol.cast("long")).as("c"))
    def falling(base: Column): Column =
      (0 until k).map(j => base - lit(j.toLong))
        .reduce(_ * _).cast("long")
    perTask.filter(col("n") >= k)
      .groupBy("n", "c")
      .agg(count(lit(1)).as("n_tasks"))
      .select(col("n").cast("long").as("n"), col("c").cast("long").as("c"),
        col("n_tasks"),
        (falling(col("n")) -
          when(col("n") - col("c") >= k, falling(col("n") - col("c")))
            .otherwise(lit(0L))).as("pass_num"),
        falling(col("n")).as("pass_den"))
      .withColumn(s"pass_at_$k",
        col("pass_num").cast("double") / col("pass_den").cast("double"))
  }

  /** Average precision at k per query (the area under the
    * precision-recall walk; its mean over queries is MAP):
    * AP = Σ_{hits h} P@rank(h) / min(n_rel, k). Each precision term
    * hit_no/rank is one IEEE division captured as exact DECIMAL(38,18)
    * (the fold is order-free), the final AP one double division — the
    * [[ndcgAtK]] portability recipe. Unjudged ranked docs contribute
    * nothing; queries with no retrieved relevant doc score 0 (they ARE
    * defined — the system found nothing). Ranks validate >= 1.
    *
    * 100 TB shape: rankings are top-k-bounded per query, qrels are
    * eval-sized and broadcast; the hit numbering windows over ≤ k rows
    * per query; output is \|queries\| rows. */
  def averagePrecisionAtK(ranking: DataFrame, qrels: DataFrame,
      queryCol: String, idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, "averagePrecisionAtK: k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val judged = qrels.select(col(queryCol), col(idCol)).distinct()
    val perQueryRel = judged.groupBy(queryCol)
      .agg(count(lit(1)).as("n_rel"))
    val w = Window.partitionBy(queryCol).orderBy("__r")
    val hits = ranking.filter(col(rankCol) <= k)
      .select(col(queryCol), col(idCol),
        guardedRank(col(rankCol), "averagePrecisionAtK", "__r"))
      .join(broadcast(judged), Seq(queryCol, idCol))
      .withColumn("__hitno", row_number().over(w))
      .withColumn("__term",
        (col("__hitno").cast("double") / col("__r").cast("double"))
          .cast("decimal(38,18)"))
      .groupBy(queryCol)
      .agg(count(lit(1)).as("hits"), sum("__term").as("__num"))
    perQueryRel.join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("__num").cast("double"), lit(0.0)) /
          least(col("n_rel"), lit(k.toLong)).cast("double")).as("ap"))
  }

  /** Expected reciprocal rank @k (Chapelle et al. CIKM '09 — the
    * cascade-model metric that, unlike nDCG/MAP, models a user STOPPING
    * at the first satisfying result): ERR = Σ_r (1/r)·R_r·Π_{i<r}(1−R_i)
    * with R = (2^g − 1)/2^gmax over integer grades g ∈ [0, gmax].
    * Every cascade factor is the exact rational (2^gmax+1−2^{g_i})/2^gmax,
    * so the prefix products are EXACT integers (bounded by (2^gmax)^k —
    * the gmax·k ≤ 50 guard keeps them in int64) carried by a bounded
    * per-query kernel over the ≤ k collected ranks; each rank's term is
    * then ONE IEEE division num/(r·2^{gmax·r}) folded as exact
    * DECIMAL(38,18). Unjudged ranked docs grade 0 (they never stop the
    * cascade); out-of-range grades refuse loudly. Output per query:
    * n_graded (ranked docs with positive grade), err.
    *
    * 100 TB shape: rankings are top-k-bounded, qrels broadcast; the
    * kernel folds ≤ k rows per query. */
  def errAtK(ranking: DataFrame, qrels: DataFrame, queryCol: String,
      docCol: String, rankCol: String, gradeCol: String, k: Int,
      gmax: Int = 3): DataFrame = {
    require(k >= 1 && gmax >= 1 && gmax <= 5 && gmax * k <= 50,
      "errAtK needs k >= 1, gmax in [1, 5], gmax*k <= 50 (int64 prefix)")
    val judged = qrels
      .select(col(queryCol), col(docCol), col(gradeCol).cast("long").as("__g"))
      .distinct()
    val graded = ranking.filter(col(rankCol) <= k)
      .select(col(queryCol), col(docCol),
        guardedRank(col(rankCol), "errAtK", "__r"))
      .join(broadcast(judged), Seq(queryCol, docCol), "left")
      .select(col(queryCol), col("__r"),
        coalesce(col("__g"), lit(0L)).as("__g"))
    val top = 1L << gmax
    val kernel = udf((rows: Seq[org.apache.spark.sql.Row]) => {
      val sorted = rows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      // dense-rank contract, enforced loudly: the per-rank denominator
      // r·2^(gmax·r) assumes exactly r−1 retrieved positions precede
      // rank r — a rank gap (or tie) would silently deflate ERR by
      // 2^(gmax·missing). Re-rank with row_number() first.
      sorted.iterator.zipWithIndex.foreach { case ((r, _), i) =>
        require(r == i + 1L,
          s"errAtK: ranks must be dense 1..n per query (rank $r at " +
            s"position ${i + 1}) — re-rank with row_number() first")
      }
      var carry = 1L
      sorted.map { case (r, g) =>
        require(g >= 0 && g <= gmax,
          s"errAtK: grade $g outside [0, $gmax]")
        val num = ((1L << g) - 1L) * carry
        carry *= (top + 1L - (1L << g))
        (r, num)
      }
    })
    graded.groupBy(queryCol)
      .agg(collect_list(struct(col("__r"), col("__g"))).as("__l"),
        sum(when(col("__g") > 0, 1L).otherwise(0L)).as("n_graded"))
      .select(col(queryCol), col("n_graded"),
        explode(kernel(col("__l"))).as("__t"))
      .select(col(queryCol), col("n_graded"),
        (col("__t._2").cast("double") /
          expr(s"cast(__t._1 * shiftleft(1L, " +
            s"cast(__t._1 * $gmax as int)) as double)"))
          .cast("decimal(38,18)").as("__term"))
      .groupBy(queryCol)
      .agg(max("n_graded").as("n_graded"),
        sum("__term").cast("double").as("err"))
  }

  /** Bradley–Terry preference scores from a pairwise-comparison log
    * (Bradley & Terry '52; the model under RLHF preference data):
    * p(i beats j) = sᵢ/(sᵢ+sⱼ), fit by `iterations` rounds of the MM
    * update sᵢ ← wᵢ / Σⱼ nᵢⱼ/(sᵢ+sⱼ) (Hunter '04), renormalized to
    * mean `scale` each round. EVERYTHING is fixed-point integer — each
    * denominator term is (nᵢⱼ·scale²) div (sᵢ+sⱼ), the update is one
    * integer division, the renormalization one more — so the fit
    * replays bit-identically on any engine (a float MM fold is
    * partition-order-sensitive). Zero-win players rest at score 0 (the
    * model's true degenerate MLE direction, reported not hidden).
    *
    * 100 TB shape: ONE aggregation collapses the game log into the
    * bounded \|players\|² pair matrix; every MM round runs on that
    * matrix + the \|players\|-row score frame (localCheckpointed per
    * round to keep plans flat). Output per player: games, wins,
    * bt_score. */
  def bradleyTerryScores(games: DataFrame, winnerCol: String,
      loserCol: String, iterations: Int = 2,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 8,
      "bradleyTerryScores needs iterations in [1, 8]")
    require(scale >= 1000 && scale <= 1000000L,
      "bradleyTerryScores needs scale in [1000, 1000000]")
    val pairs = games
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .groupBy(least(col(winnerCol), col(loserCol)).as("a"),
        greatest(col(winnerCol), col(loserCol)).as("b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(winnerCol) <= col(loserCol), 1L).otherwise(0L))
          .as("wa"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val edges = pairs.select(col("a").as("i"), col("b").as("j"), col("n"))
        .unionByName(
          pairs.select(col("b").as("i"), col("a").as("j"), col("n")))
        .localCheckpoint(true)
      val perPlayer = edges.groupBy(col("i").as("p"))
        .agg(sum("n").as("games"))
        .join(
          pairs.select(col("a").as("p"), col("wa").as("w"))
            .unionByName(pairs.select(col("b").as("p"),
              (col("n") - col("wa")).as("w")))
            .groupBy("p").agg(sum("w").as("wins")),
          Seq("p"))
        .localCheckpoint(true)
      val k = perPlayer.count()
      require(k >= 2 && k <= 100000,
        s"bradleyTerryScores: $k players — needs [2, 100000] (the MM " +
          "rounds run on the |players|^2 pair matrix; bucket or filter " +
          "the comparison log first)")
      val sq = scale * scale
      var s = perPlayer.select(col("p"), lit(scale).as("s"))
        .localCheckpoint(true)
      var it = 0
      while (it < iterations) {
        val denom = edges
          .join(s.select(col("p").as("i"), col("s").as("si")), Seq("i"))
          .join(s.select(col("p").as("j"), col("s").as("sj")), Seq("j"))
          .filter(col("si") + col("sj") > 0)
          .groupBy(col("i").as("p"))
          .agg(sum(expr(s"(n * ${sq}L) div (si + sj)")).as("den"))
        val raw = perPlayer.join(denom, Seq("p"), "left")
          .select(col("p"),
            when(col("den") > 0, expr(s"(wins * ${sq}L) div den"))
              .otherwise(lit(0L)).as("sr"))
        val total = raw.agg(sum("sr").as("__t"))
        s = raw.crossJoin(broadcast(total))
          .select(col("p"),
            when(col("__t") > 0,
              expr(s"(sr * (${k}L * ${scale}L)) div __t"))
              .otherwise(lit(0L)).as("s"))
          .localCheckpoint(true)
        it += 1
      }
      perPlayer.join(s, Seq("p"))
        .select(col("p").as("player"), col("games"), col("wins"),
          col("s").as("bt_score"))
    } finally pairs.unpersist(false)
  }

  /** Rank-biased overlap between two top-k rankings (Webber, Moffat &
    * Zobel, TOIS 2010), truncated at depth k (the prefix "min RBO" —
    * no extrapolation): RBO = (1−p)·Σ_{d=1..k} p^{d−1}·|S₁:d ∩ T₁:d|/d.
    * p is fixed at ½ so every weight (1−p)·p^{d−1} = 2^{−d} is EXACTLY
    * representable and the per-depth term is one IEEE chain over the
    * exact integer overlap — no pow() call whose libm rounding could
    * differ across engines (stated: ½ is more top-weighted than the
    * paper's illustrative 0.9; the weight choice is the caller-visible
    * contract). Overlap at depth d is the count of ids whose max(rank
    * in S, rank in T) ≤ d — one inner join + one cumulative count on
    * the ≤ k joined rows. Returns one row: k, overlap_at_k, rbo.
    *
    * 100 TB shape: both inputs are top-k-bounded; everything after the
    * id join runs on ≤ k rows. */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, idCol: String,
      rankCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 62, "rankBiasedOverlap needs k in [1, 62]")
    import org.apache.spark.sql.expressions.Window
    val sa = a.filter(col(rankCol) <= k)
      .select(col(idCol).as("__id"),
        guardedRank(col(rankCol), "rankBiasedOverlap", "__ra"))
    val sb = b.filter(col(rankCol) <= k)
      .select(col(idCol).as("__id"),
        guardedRank(col(rankCol), "rankBiasedOverlap", "__rb"))
    val joined = sa.join(sb, Seq("__id"))
      .select(greatest(col("__ra"), col("__rb")).as("__d"))
      .groupBy("__d").agg(count(lit(1)).as("__c"))
    // complete depth frame 1..k with the cumulative overlap at each depth
    val depths = a.sparkSession.range(1, k + 1).toDF("d")
    val overlap = depths.join(joined, col("d") >= col("__d"), "left")
      .groupBy("d").agg(sum(coalesce(col("__c"), lit(0L))).as("o"))
    val term = (col("o").cast("double") / col("d").cast("double") /
      expr("shiftleft(1L, cast(d as int))").cast("double"))
    overlap.agg(
        lit(k.toLong).as("k"),
        max(when(col("d") === k, col("o"))).cast("long").as("overlap_at_k"),
        sum(term.cast("decimal(38,18)")).cast("double").as("rbo"))
  }
}
