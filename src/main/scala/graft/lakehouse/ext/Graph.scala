package graft.lakehouse.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge lists (the representation that
  * scales: adjacency stays sharded, iterations are joins + partial-agg
  * shuffles, nothing is ever collected). Connected components lives in
  * [[Dedup.connectedComponents]]; this hosts rank-style iteration.
  */
object Graph {

  /** One rank unit = 1e-12 of total rank mass. */
  val Unit: Long = 1000000000000L

  /** Fixed-point PageRank over the UNDIRECTED graph of `edges`:
    * `iterations` rounds of
    * `r'(v) = (100-d)·U/(100·N) + (d · Σ_{u~v} (r(u) div deg(u))) div 100`
    * with every quantity a BIGINT count of 1e-12 rank units and every
    * division a floor division — so the result is bit-identical on ANY
    * engine (plain float PageRank is partition-order-dependent: the
    * contribution sum is an unordered IEEE reduction). The deliberate
    * quantization error is ≤ deg(u) units (~1e-12) per vertex per round —
    * irrelevant for ranking, essential for cross-engine verification.
    *
    * Scale shape: the symmetrized edge list is computed once and
    * persisted; each round is one broadcast-or-shuffle join of ranks onto
    * edges plus one partial-aggregated shuffle on the destination key —
    * O(E) per round, the textbook distributed PageRank plan. Ranks are
    * eagerly localCheckpoint'ed each round so the plan never grows with
    * the iteration count (the same flat-lineage trick as connected
    * components). Output: (v, rank_units, rank). */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // both directions emitted in ONE pass over the input (a union of two
    // projections would evaluate the upstream edge plan twice)
    val sym = edges.select(explode(array(
        struct(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"),
          col(srcCol).cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist()
    val deg = sym.groupBy(col("src").as("v"))
      .agg(count(lit(1)).as("deg")).persist()
    try {
      val n = deg.count()
      require(n > 0, "empty graph")
      val base = ((100L - dampingPct) * Unit) / (100L * n)
      var ranks = deg.select(col("v"), lit(Unit / n).as("rank_units"))
        .localCheckpoint()
      // the rank/degree frames are O(V); when V is broadcastable each
      // round becomes ONE map-side join over the O(E) edge list + ONE
      // partial-agg shuffle of per-vertex contributions — the edge list
      // itself is never shuffled. Past the vertex cap (billions of
      // vertices at 100 TB) the hint drops out and Spark shuffle-joins
      // on the edge partitioning instead — the textbook fallback.
      val hint: DataFrame => DataFrame =
        if (n <= 10000000L) broadcast(_) else identity
      for (i <- 1 to iterations) {
        val contrib = ranks.join(hint(deg), "v")
          .select(col("v").as("u"), expr("rank_units div deg").as("c"))
        val incoming = sym.join(hint(contrib), sym("src") === col("u"))
          .groupBy(col("dst").as("v"))
          .agg(sum("c").as("in_units"))
        val next = deg.select(col("v"))
          .join(hint(incoming), Seq("v"), "left")
          .select(col("v"),
            (lit(base) +
              expr(s"($dampingPct * coalesce(in_units, 0L)) div 100"))
              .as("rank_units"))
        // flat-lineage trick only when the chain could actually grow deep:
        // every eager checkpoint is a full job, and for a handful of
        // rounds one pipelined plan (persisted edges + reused broadcast
        // exchanges) beats 3-4 materialization barriers
        ranks = if (iterations > 4 && i < iterations) next.localCheckpoint()
          else next
      }
      ranks.withColumn("rank", col("rank_units").cast("double") / Unit)
    } finally { sym.unpersist(); deg.unpersist() }
  }

  /** k-core peeling: `rounds` rounds of "drop every vertex whose degree
    * in the surviving subgraph is < k" over the UNDIRECTED graph — the
    * standard iterative refinement whose fixed point is the k-core
    * (Seidman 1983; one peel round per pass is exactly the distributed
    * formulation, each round ONE degree aggregation + two semi-joins =
    * O(E)). Rounds are explicit (the [[pageRankFixedPoint]] replay
    * contract) so any engine can re-run the identical computation; a
    * chain graph peels one layer per round, so callers size `rounds` to
    * the expected peel depth (degeneracy ordering depth, usually tiny on
    * real corpora). Output: every surviving vertex with its degree
    * inside the surviving subgraph. */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "kCorePeel needs k >= 1, rounds >= 1")
    val sym0 = edges.select(explode(array(
        struct(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"),
          col(srcCol).cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    var sym = sym0.localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = sym.groupBy(col("src").as("v"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("v")
      // the keep-set is O(V); AQE broadcasts it while it is small and
      // degrades to shuffle semi-joins on the edge partitioning at
      // billions of vertices — no size probe job needed.
      // Each localCheckpoint keeps the lineage flat across rounds (the
      // pageRank trick) — without it round r's plan re-runs rounds 1..r-1.
      sym = sym
        .join(keep.withColumnRenamed("v", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("v", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
    }
    sym.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003): for every
    * NON-adjacent vertex pair sharing at least one neighbor,
    * score(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w)), returned as the
    * top-`topN` pairs. Wedges are generated IN-ROW from each center's
    * sorted adjacency array (never a self-join of the edge list) and
    * immediately partial-aggregated on the canonical pair key; per-wedge
    * 1/ln terms are floor-scaled 1e12-unit LONGS (order-free integer
    * fold → cross-engine, and primitive-speed where a >18-digit decimal
    * sum would fold BigDecimal objects). Centers with degree > `maxDeg` are
    * skipped — the documented hub cap: a celebrity hub contributes
    * ~1/ln(huge) ≈ 0 per wedge yet deg² wedge work, so capping bounds
    * the blowup at O(V·maxDeg²) while moving scores by at most
    * |hubs|/ln(maxDeg). Top-N is TakeOrdered (score desc, then pair —
    * deterministic), never a global sort. */
  def adamicAdarTopPairs(edges: DataFrame, srcCol: String, dstCol: String,
      topN: Int, maxDeg: Int = 1024): DataFrame = {
    require(topN >= 1 && maxDeg >= 2, "adamicAdarTopPairs needs topN >= 1, maxDeg >= 2")
    // no up-front edge distinct: duplicate sightings of an edge collapse
    // inside the adjacency collect_set, so the canonical edge stream
    // flows straight into the ONE aggregation shuffle
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
    // the O(V) adjacency frame feeds BOTH wedge generation and the
    // known-edge index; persist so the edge aggregation runs once
    // (plan-level exchange reuse does not cross the two consumers)
    val adjAll = adjacencyOf(canon).persist()
    try {
      // eager O(topN) materialization (the triangleCounts pattern);
      // TakeOrdered, never a global sort. The topN rows come back as a
      // direct collect into a tiny local frame instead of a trailing
      // localCheckpoint — same single job, no block-manager round trip.
      val out = scoredPairs(adjAll, maxDeg)
        .orderBy(col("score_scaled").desc, col("u").asc, col("v").asc)
        .limit(topN)
        .select(col("u"), col("v"),
          (col("score_scaled").cast("double") / lit(1e12)).as("aa_score"))
      val spark = out.sparkSession
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.collect().toSeq, 1), out.schema)
    } finally adjAll.unpersist(false)
  }

  /** Packed wedge pairs via a tight-loop kernel, NOT nested
    * transform(slice(...)) lambdas: higher-order functions evaluate
    * interpreted (outside codegen), and at deg ≤ maxDeg a center emits
    * O(deg²) values — the q279 gram-set lesson. Each (u, v) pair PACKS
    * into one primitive long (u·2³¹ + v; the adjacency array is sorted
    * so u < v by construction) — the O(V·deg²) wedge stream then flows
    * as unboxed longs through explode, shuffle, hash-aggregate, and the
    * known-edge anti-join, instead of allocating a struct row per
    * wedge. Loud refusal beyond 31-bit vertex ids (re-key first).
    * Shared by [[adamicAdarTopPairs]] and [[linkPredictionTopPairs]]. */
  // Array[Long] (not Seq[Long]) on BOTH sides: the primitive-array
  // signature lets the UDF deserializer take UnsafeArrayData.toLongArray
  // — zero per-element boxing on the O(deg²) hot path.
  private[ext] val packedWedgeUdf = udf((arr: Array[Long]) => {
    val n = arr.length
    require(n == 0 ||
      (arr(0) >= 0L && arr(n - 1) < 2147483648L),
      "wedge generation packs pairs into int64: vertex ids must be " +
        "in [0, 2^31) — re-key the graph first")
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0; var i = 0
    while (i < n - 1) {
      val hi = arr(i) * 2147483648L
      var j = i + 1
      while (j < n) { out(k) = hi + arr(j); k += 1; j += 1 }
      i += 1
    }
    out
  })

  /** Common-neighbors link prediction with the classic exact-integer
    * score triad per non-adjacent pair (Liben-Nowell & Kleinberg CIKM
    * '03's baselines; the log-weighted variant lives at
    * [[adamicAdarTopPairs]]): shared-neighbor count cn, Jaccard
    * permille cn·1000 div (deg_u + deg_v − cn), and preferential
    * attachment deg_u·deg_v. Wedges enumerate from centers with degree
    * in [2, maxDeg] (the same documented hub cap — a celebrity center
    * is deg² wedge work for ~0 evidence), while Jaccard/PA use the TRUE
    * distinct degrees from the uncapped adjacency. Every score is an
    * exact integer — nothing to drift. Top-N is TakeOrdered on
    * (cn desc, u, v), never a global sort.
    *
    * Scale shape: the [[adamicAdarTopPairs]] plan with an integer count
    * in place of the float fold — one adjacency aggregation, the
    * packed-long wedge stream, one pair count, one anti-join, two O(V)
    * degree joins on the topN-bounded survivors.
    *
    * Round-10 stage audit (sf0.1 interleaved medians, 7 passes): full
    * 1.18 s = adjacency 0.37 + wedge-agg/anti-join/limit 0.69 + degree
    * joins & checkpoint 0.12. The anti-join is already a broadcast
    * (fusing known edges into the wedge aggregation via a sentinel
    * weight measured SLOWER, 1.30 s — it breaks the pipelined stage);
    * the persist/localCheckpoint pair adds ~0.1 s, not a full pass.
    * Remaining time is the 1.2M-wedge aggregation plus per-stage job
    * floor — no structural waste found; the plan holds at 100×. */
  def linkPredictionTopPairs(edges: DataFrame, srcCol: String,
      dstCol: String, topN: Int, maxDeg: Int = 1024): DataFrame = {
    require(topN >= 1 && maxDeg >= 2,
      "linkPredictionTopPairs needs topN >= 1, maxDeg >= 2")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
    val adjAll = adjacencyOf(canon).persist()
    try {
      val cn = adjAll
        .filter(size(col("nbrs")).between(2, maxDeg))
        .select(explode(packedWedgeUdf(col("nbrs"))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("cn"))
        .join(adjAll.select(col("w"), explode(col("nbrs")).as("n"))
            .filter(col("w") < col("n"))
            .select((col("w") * lit(2147483648L) + col("n")).as("pk")),
          Seq("pk"), "left_anti")
        .select(expr("pk div 2147483648L").as("u"),
          expr("pk % 2147483648L").as("v"), col("cn"))
        // cut to the survivors BEFORE the degree joins
        .orderBy(col("cn").desc, col("u"), col("v"))
        .limit(topN)
      val deg = adjAll.select(col("w"),
        size(col("nbrs")).cast("long").as("deg"))
      // direct collect of the ≤ topN result rows into a local frame (same
      // single job the trailing localCheckpoint ran, minus the
      // block-manager round trip)
      val out = cn.join(deg.select(col("w").as("u"), col("deg").as("deg_u")),
          Seq("u"))
        .join(deg.select(col("w").as("v"), col("deg").as("deg_v")),
          Seq("v"))
        .select(col("u"), col("v"), col("cn"), col("deg_u"), col("deg_v"),
          expr("(cn * 1000) div (deg_u + deg_v - cn)")
            .as("jaccard_permille"),
          (col("deg_u") * col("deg_v")).as("pref_attach"))
        .orderBy(col("cn").desc, col("u"), col("v"))
      val spark = out.sparkSession
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.collect().toSeq, 1), out.schema)
    } finally adjAll.unpersist(false)
  }

  /** Sorted distinct adjacency per vertex from canonical (a < b)
    * self-loop-free edges — ONE aggregation shuffle. */
  private def adjacencyOf(canon: DataFrame): DataFrame = {
    val sym = canon.select(explode(array(
        struct(col("a").as("w"), col("b").as("n")),
        struct(col("b").as("w"), col("a").as("n")))).as("e"))
      .select(col("e.w").as("w"), col("e.n").as("n"))
    sym.groupBy("w").agg(sort_array(collect_set(col("n"))).as("nbrs"))
  }

  /** The un-materialized scored-pair frame behind [[adamicAdarTopPairs]]
    * (package-private so plan-shape tests can assert the wedge
    * generation is in-row, which the checkpoint above hides).
    * `canon` must be canonical (a < b) self-loop-free edges; duplicate
    * sightings are fine — they collapse in the adjacency set. */
  private[graft] def adamicAdarPairs(canon: DataFrame, maxDeg: Int): DataFrame =
    scoredPairs(adjacencyOf(canon), maxDeg)

  /** Wedge-scored non-adjacent pairs from a prebuilt adjacency frame.
    * Per-center term as a FLOOR-SCALED LONG (1e12 units), not
    * DECIMAL(38,18): >18-digit decimal aggregation folds BigDecimal
    * objects, one per wedge; a primitive long folds at codegen speed and
    * floor() is the cross-engine double→int contract. Overflow headroom:
    * a pair's score is bounded by its shared-center count × 1e12 — 9.2M
    * shared neighbors before int64 saturates. */
  private def scoredPairs(adjAll: DataFrame, maxDeg: Int): DataFrame = {
    val adj = adjAll
      .filter(size(col("nbrs")).between(2, maxDeg))
      .withColumn("term",
        floor(lit(1e12) / log(size(col("nbrs")).cast("double")))
          .cast("long"))
    adj.select(col("term"), explode(packedWedgeUdf(col("nbrs"))).as("pk"))
      .groupBy("pk").agg(sum("term").as("score_scaled"))
      // known edges derive from the UNFILTERED adjacency (an edge whose
      // endpoint degrees fall outside the center cap still exists) — no
      // second pass over the raw edge stream
      .join(adjAll.select(col("w"), explode(col("nbrs")).as("n"))
          .filter(col("w") < col("n"))
          .select((col("w") * lit(2147483648L) + col("n")).as("pk")),
        Seq("pk"), "left_anti")
      .select(expr("pk div 2147483648L").as("u"),
        expr("pk % 2147483648L").as("v"), col("score_scaled"))
  }

  /** Exact per-vertex triangle counts via degree-ordered edge iteration
    * (the compact form of Suri & Vassilvitskii WWW'11's MR node-iterator).
    * Every undirected edge is oriented from its lower endpoint to its
    * higher endpoint under the total order (degree, vertex-id); each
    * oriented edge (u, w) then finds its closings as the set intersection
    * of the two endpoints' out-neighbor lists — a triangle {u, w, c} with
    * u lowest is discovered exactly once, at edge (u, w) with c the
    * common out-neighbor. The orientation is the whole scale story: a
    * vertex's out-degree under (deg, id) order is O(√E) even for
    * celebrity hubs, so the intersection work is bounded by
    * Σ_{(u,w)∈E} (outdeg(u)+outdeg(w)) = O(E^1.5), the provable optimum
    * for exact counting — and unlike the two-join wedge-closing form, the
    * O(E^1.5) wedge set is never MATERIALIZED or shuffled: it is
    * enumerated inside a per-edge `array_intersect` and immediately
    * reduced.
    *
    * Plan shape: one distinct to canonicalize edges, one degree
    * aggregation (O(V), broadcast back onto edges), one groupBy to build
    * the out-adjacency arrays (total size O(E)), two joins of the edge
    * list against the adjacency frame (AQE broadcasts it while V is
    * small; past the broadcast cap they degrade to shuffle joins on the
    * endpoint keys — the textbook fallback), one explode + partial-agg
    * count. Nothing collects. Self-loops are dropped; parallel edges
    * collapse in the distinct. Output: (v, triangles) for EVERY vertex
    * of the graph, zero-filled — deterministic full coverage. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
      .persist()
    try {
      val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("d"))
        .persist()
      // orient low (deg, id) -> high (deg, id)
      val o = und
        .join(broadcast(deg).withColumnRenamed("v", "a")
          .withColumnRenamed("d", "da"), "a")
        .join(broadcast(deg).withColumnRenamed("v", "b")
          .withColumnRenamed("d", "db"), "b")
        .select(
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            col("a")).otherwise(col("b")).as("u"),
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            col("b")).otherwise(col("a")).as("w"))
        .persist()
      // out-adjacency arrays: O(E) total payload split across O(V) rows;
      // outdeg = O(√E) under the orientation so no single row explodes.
      // SHUFFLE_HASH (not broadcast): the adjacency frame is O(E) — at
      // scale it can never broadcast, and at small scale the two
      // broadcast-build jobs AQE would otherwise insert cost more wall
      // than the hash shuffles they save; hash (not sort-merge) because
      // the build side is bounded per key (one row per vertex)
      val adj = o.groupBy("u").agg(collect_list(col("w")).as("nbrs"))
        .hint("SHUFFLE_HASH")
      val adjW = adj.select(col("u").as("w"), col("nbrs").as("nbrs_w"))
      // every edge's u has at least this out-edge, so the inner joins
      // keep exactly the edges whose BOTH endpoints have out-neighbors
      // (an edge whose w has none closes no triangle)
      val tris = o.join(adj, Seq("u")).join(adjW, Seq("w"))
        .select(col("u"), col("w"),
          explode(array_intersect(col("nbrs"), col("nbrs_w"))).as("c"))
      val perVertex = tris
        .select(explode(array(col("u"), col("w"), col("c"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("triangles"))
      // eager O(V) materialization so both caches can be released on exit
      // (the ngramJaccardPairs pattern); lineage stays flat for callers
      val out = deg.select("v").join(perVertex, Seq("v"), "left")
        .select(col("v"), coalesce(col("triangles"), lit(0L)).as("triangles"))
        .localCheckpoint()
      o.unpersist(false)
      deg.unpersist(false)
      out
    } finally { und.unpersist(false) }
  }

  /** Degree assortativity — Pearson correlation of end-point degrees
    * over the undirected edge set (both orientations, the standard
    * convention; Newman 2002): positive r = hubs link to hubs
    * (social-graph shape), negative = hubs link to leaves (star /
    * bipartite shape) — the one-number summary a graph pipeline reads
    * before trusting degree-based sampling or k-core thresholds.
    * Degrees are integers, so all five moments fold EXACTLY as
    * DECIMAL(38,0); the final r is one fixed-order IEEE step —
    * cross-engine hash-stable. Over BOTH orientations the x/y moment
    * streams are mirror images — sy = sx and syy = sxx exactly — so the
    * kernel folds each undirected edge ONCE (du+dv, du·dv, du²+dv²) and
    * doubles the totals, halving the probe scan. Scale: dedup + degree
    * count + two BROADCAST joins of the edge list against the O(V)
    * degree frame (pinned — left to AQE the 2m-row edge frame shuffled
    * twice on its endpoints; measured 14.7 s → 1.0 s at sf0.1) + one
    * partial-aggregated moment fold; nothing quadratic, nothing
    * collected. No checkpoints: the probe and both broadcast builds
    * hang off the SAME distinct-shuffle and degree-aggregation
    * exchanges, which ReuseExchange dedupes — the edge list and the
    * degree count each compute once (plan-asserted via the reuse pin
    * in GraphSpec; dropping the r11 localCheckpoints removed two
    * materialization jobs, 1.16 → ~0.8 s steady at sf0.1). */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
      .localCheckpoint() // feeds the probe AND the degree build once
    val deg = e0.select(explode(array(col("a"), col("b"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("dg"))
    // both probes reference the IDENTICAL broadcast plan (aliases, not
    // renamed projections) so the AQE stage cache builds it once
    val m = e0
      .join(broadcast(deg).as("d1"), col("a") === col("d1.w"))
      .join(broadcast(deg).as("d2"), col("b") === col("d2.w"))
      .select(col("d1.dg").as("du"), col("d2.dg").as("dv"))
      .agg(
        (count(lit(1)) * 2).cast("decimal(38,0)").as("mm"),
        sum((col("du") + col("dv")).cast("decimal(38,0)")).as("sx"),
        (sum((col("du") * col("dv")).cast("decimal(38,0)")) * 2).as("sxy"),
        sum((col("du") * col("du") + col("dv") * col("dv"))
          .cast("decimal(38,0)")).as("sxx"),
        count(lit(1)).as("cnt"))
    val num = col("mm") * col("sxy") - col("sx") * col("sx")
    val d1 = col("mm") * col("sxx") - col("sx") * col("sx")
    m.select(
      when(d1 > 0,
        num.cast("double") /
          (sqrt(d1.cast("double")) * sqrt(d1.cast("double"))))
        .as("assortativity"),
      col("cnt").as("n_edges"))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani CMU-TR'02,
    * hard-clamp variant) in EXACT integer masses: seeds carry unit mass
    * on their own label forever (clamped each round); every other
    * vertex accumulates its neighbors' label masses — after r rounds a
    * vertex's mass for label L counts the label-L-seeded walks of
    * length ≤ r reaching it, an integer any engine replays (the float
    * normalized variant is fold-order-dependent). Prediction = argmax
    * mass, ties to the smaller label. Rounds are explicit (the
    * [[pageRankFixedPoint]] replay contract); each round is one O(E)
    * join + one partial-agg shuffle of (v, label) mass cells. Output:
    * every vertex reached, with (label, mass, is_seed). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedIdCol: String, seedLabelCol: String,
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && rounds <= 4, "rounds in [1, 4]")
    val sym = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .distinct()
      .select(explode(array(
        struct(col("a").as("v"), col("b").as("n")),
        struct(col("b").as("v"), col("a").as("n")))).as("e"))
      .select(col("e.v").as("v"), col("e.n").as("n"))
      .persist()
    val seed = seeds
      .filter(col(seedIdCol).isNotNull && col(seedLabelCol).isNotNull)
      .select(col(seedIdCol).cast("long").as("v"),
        col(seedLabelCol).cast("long").as("label"))
      .distinct().persist()
    try {
      var mass = seed.select(col("v"), col("label"), lit(1L).as("m"))
        .localCheckpoint()
      for (i <- 1 to rounds) {
        val prop = sym
          .join(broadcast(mass.select(col("v").as("n"), col("label"),
            col("m"))), Seq("n"))
          .groupBy("v", "label").agg(sum("m").as("m"))
          // hard clamp: seeds keep exactly their own unit mass
          .join(seed.select(col("v")), Seq("v"), "left_anti")
        mass = seed.select(col("v"), col("label"), lit(1L).as("m"))
          .unionAll(prop)
        if (i < rounds) mass = mass.localCheckpoint()
      }
      mass.groupBy("v")
        .agg(max(struct(col("m"), (-col("label")).as("nl"),
          col("label").as("l"))).as("best"))
        .join(broadcast(seed.select(col("v"), lit(true).as("is_seed"))),
          Seq("v"), "left")
        .select(col("v"), col("best.l").as("label"),
          col("best.m").as("mass"),
          coalesce(col("is_seed"), lit(false)).as("is_seed"))
    } finally { sym.unpersist(); seed.unpersist() }
  }

  /** Weisfeiler–Lehman vertex-color census (1968 WL refinement, the
    * graph-fingerprinting workhorse behind WL kernels and graph dedup):
    * colors start as degrees, and each round recolors every vertex as
    * the 60-bit sha of "ownColor|sortedNeighborColors" — after r rounds
    * two vertices share a color only if their radius-r neighborhoods
    * are (WL-)isomorphic, and the color MULTISET is the graph's
    * fingerprint. Everything is integer/sha (engine-portable); each
    * round is one join of the O(V) color frame onto the O(E) symmetric
    * edge list + one sorted-collect aggregation. Returns the top-K
    * (color, n_vertices) census rows, ties to the smaller color. */
  def wlColorCensus(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 2, topK: Int = 50): DataFrame = {
    require(rounds >= 1 && rounds <= 4, "rounds in [1, 4]")
    require(topK >= 1, "topK >= 1")
    val sym = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .distinct()
      .select(explode(array(
        struct(col("a").as("v"), col("b").as("n")),
        struct(col("b").as("v"), col("a").as("n")))).as("e"))
      .select(col("e.v").as("v"), col("e.n").as("n"))
      .persist()
    try {
      var colors = sym.groupBy("v").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      for (i <- 1 to rounds) {
        colors = sym
          .join(broadcast(colors.withColumnRenamed("v", "n")
            .withColumnRenamed("c", "nc")), Seq("n"))
          .groupBy("v")
          .agg(array_join(transform(array_sort(collect_list(col("nc"))),
            x => x.cast("string")), ",").as("__ns"))
          .join(broadcast(colors), Seq("v"))
          .select(col("v"),
            expr("cast(conv(substring(sha2(concat(cast(c as string), " +
              "'|', __ns), 256), 1, 15), 16, 10) as bigint)").as("c"))
        // the census consumes the final round once — only intermediate
        // rounds pay the eager materialization (each feeds two joins)
        if (i < rounds) colors = colors.localCheckpoint()
      }
      colors.groupBy("c").agg(count(lit(1)).as("n_vertices"))
        .orderBy(col("n_vertices").desc, col("c").asc)
        .limit(topK)
        .withColumnRenamed("c", "color")
    } finally sym.unpersist(false)
  }

  /** Local clustering coefficient per vertex: C(v) = 2·T(v)/(d(v)·(d(v)−1))
    * — how close each vertex's neighborhood is to a clique (Watts &
    * Strogatz '98), in exact permille integers over [[triangleCounts]]'s
    * exact per-vertex triangles plus one degree aggregation. Vertices of
    * degree < 2 report null (the coefficient is undefined, not zero).
    * Scale shape inherits triangleCounts' O(E^1.5) bound; the extra
    * degree frame is one O(E) aggregation joined on the O(V) output. */
  def localClusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // canonicalize ONCE and feed both consumers — the upstream edge
    // generation (often itself a join) must not run twice, once for the
    // degree frame and again inside triangleCounts
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = canon.select(col("a").as("v"))
        .unionAll(canon.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("degree"))
      // eager O(V) materialization so the edge cache can be released
      // (the adamicAdar pattern)
      triangleCounts(canon, "a", "b")
        .join(deg, Seq("v"))
        .select(col("v"), col("degree"), col("triangles"),
          when(col("degree") >= 2,
            expr("(triangles * 2000) div (degree * (degree - 1))"))
            .as("coeff_permille"))
        .localCheckpoint()
    } finally canon.unpersist(false)
  }

  /** Fixed-point HITS (Kleinberg, JACM 1999) over the DIRECTED edge
    * list: `iterations` rounds of auth(v) = Σ_{u→v} hub(u) then
    * hub(u) = Σ_{u→v} auth(v), each side renormalized to max = [[Unit]]
    * by the integer map `s' = (s · Unit) div max(s)` — max-normalization
    * instead of the textbook L2 keeps every score a BIGINT any engine
    * replays bit-for-bit (the [[pageRankFixedPoint]] contract; an IEEE
    * Σs² is partition-order-dependent). The deliberate quantization is
    * ≤1 unit (1e-12 of the max) per vertex per round. Scale shape: the
    * distinct edge list persists once; each half-round is one join of
    * the O(V) score frame onto edges + one partial-agg shuffle on the
    * opposite endpoint — O(E) per round, scores broadcast while V fits.
    * Output: (side 'hub'|'auth', v, score_units, score). */
  def hitsFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1 && iterations <= 5,
      "hitsFixedPoint needs 1 <= iterations <= 5")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct().persist()
    try {
      // O(V) frames, each consumed twice (init/round + output): eager
      // materialization beats re-running the distinct shuffle per use
      val srcs = e.select(col("src").as("v")).distinct().localCheckpoint()
      val dsts = e.select(col("dst").as("v")).distinct().localCheckpoint()
      require(srcs.head(1).nonEmpty, "empty graph")
      val hint: DataFrame => DataFrame = broadcast(_)
      def renorm(scoresRaw: DataFrame): DataFrame = {
        // eager O(V) materialization: the raw frame feeds BOTH the max
        // aggregation and the rescale, and the rescaled frame feeds both
        // the next half-round and the output — without the checkpoint
        // every consumer re-runs the O(E) propagation join
        val sc = scoresRaw.localCheckpoint()
        val mx = sc.agg(max("s").as("mx"))
        sc.crossJoin(hint(mx))
          .select(col("v"),
            // raw sums reach indeg·Unit ≈ 2^66 — the product must widen
            expr(s"CAST((CAST(s AS DECIMAL(38,0)) * ${Unit}L) div mx " +
              "AS BIGINT)").as("s"))
          .localCheckpoint()
      }
      var hubs = srcs.select(col("v"), lit(Unit).as("s"))
      var auths: DataFrame = null
      for (_ <- 1 to iterations) {
        auths = renorm(e.join(hint(hubs), e("src") === hubs("v"))
          .groupBy(col("dst").as("v")).agg(sum("s").as("s")))
        // dangling dst-only/src-only vertices keep score 0 by absence;
        // reattach the full vertex set at the end, not per round
        hubs = renorm(e.join(hint(auths), e("dst") === auths("v"))
          .groupBy(col("src").as("v")).agg(sum("s").as("s")))
      }
      val out = srcs.join(hubs, Seq("v"), "left")
        .select(lit("hub").as("side"), col("v"),
          coalesce(col("s"), lit(0L)).as("score_units"))
        .unionAll(dsts.join(auths, Seq("v"), "left")
          .select(lit("auth").as("side"), col("v"),
            coalesce(col("s"), lit(0L)).as("score_units")))
      out.withColumn("score",
        col("score_units").cast("double") / Unit)
    } finally { e.unpersist() }
  }
}
