package graft.lakehouse.ext

import graft.lakehouse.SparkSuite

/** Fixed-point PageRank: hand-computed values on a 3-path, exact mass
  * conservation up to the documented quantization, and symmetry. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("one iteration on the path 1-2-3 matches the hand computation") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 1)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("rank_units"))
      .toMap
    // N=3, r0 = 1e12/3 = 333333333333, base = 15e12/300 = 50000000000
    // endpoints get (85 * (r0 div 2)) div 100, the middle gets 85% of 2*r0
    assert(out == Map(
      1L -> 191666666666L,
      2L -> 616666666666L,
      3L -> 191666666666L))
  }

  test("rank mass is conserved up to quantization; symmetric graph gives " +
      "symmetric ranks; determinism across runs") {
    val edges = (for (i <- 1L to 40L) yield (i, i % 40 + 1))
      .toDF("src", "dst") // a 40-cycle: perfectly symmetric
    val out = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("rank_units"))
    assert(out.length == 40)
    // every vertex identical on a vertex-transitive graph
    assert(out.map(_._2).distinct.length == 1)
    val total = out.map(_._2).sum
    assert(math.abs(total - Graph.Unit) <= 40L * 100L,
      s"mass drifted: $total vs ${Graph.Unit}")
    val again = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("rank_units"))
    assert(again.sortBy(_._1).sameElements(out.sortBy(_._1)))
  }

  test("hub outranks leaves on a star") {
    val edges = (2L to 9L).map(i => (1L, i)).toDF("src", "dst")
    val ranks = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 5)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("rank_units"))
      .toMap
    assert((2L to 9L).forall(l => ranks(1L) > ranks(l)))
    assert((2L to 9L).map(ranks).distinct.size == 1)
  }

  // ---- triangle counting ---------------------------------------------------

  private def triMap(edges: org.apache.spark.sql.DataFrame) =
    Graph.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle counts on hand-built graphs") {
    // K4: every vertex is in C(3,2) = 3 triangles
    val k4 = (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b))
      .toDF("src", "dst")
    assert(triMap(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a triangle with a pendant vertex: the pendant sees zero
    val pend = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    assert(triMap(pend) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    // a 5-cycle is triangle-free but every vertex is still reported
    val c5 = (1L to 5L).map(i => (i, i % 5 + 1)).toDF("src", "dst")
    assert(triMap(c5) == (1L to 5L).map(_ -> 0L).toMap)
  }

  test("orientation invariance: reversed/duplicated/self-loop edges " +
      "change nothing") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val messy = Seq((2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (4L, 1L),
      (2L, 4L), (2L, 2L), (1L, 2L)).toDF("src", "dst")
    assert(triMap(base) == triMap(messy))
    assert(triMap(base) == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("matches the brute-force count on a pseudo-random graph") {
    // deterministic edge set: (i*7 % 30, i*13 % 30) for i in 0..199
    val raw = (0L until 200L).map(i => (i * 7 % 30, i * 13 % 30))
    val edges = raw.toDF("src", "dst")
    val got = triMap(edges)
    val und = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val verts = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val brute = verts.map { v =>
      v -> verts.combinations(2).count {
        case Seq(x, y) => v != x && v != y &&
          und((math.min(v, x), math.max(v, x))) &&
          und((math.min(v, y), math.max(v, y))) &&
          und((math.min(x, y), math.max(x, y)))
        case _ => false
      }.toLong
    }.toMap
    assert(got == brute)
  }

  test("kCorePeel: a chain has no 2-core and peels one layer per round") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    // round 1 drops {1,5}; surviving chain 2-3-4
    val r1 = Graph.kCorePeel(chain, "s", "d", k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    // by round 3 nothing survives — the fixed point of a tree is empty
    assert(Graph.kCorePeel(chain, "s", "d", k = 2, rounds = 3).count() == 0L)
  }

  test("kCorePeel: a triangle with a tail keeps exactly the triangle") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val core = Graph.kCorePeel(g, "s", "d", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("adamicAdarTopPairs: 4-cycle scores its two diagonals, " +
    "excludes adjacent pairs") {
    import spark.implicits._
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val got = Graph.adamicAdarTopPairs(cyc, "s", "d", topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).toSet == Set((1L, 3L), (2L, 4L)))
    // each diagonal shares two degree-2 neighbors: score = 2/ln(2)
    // floor-scaled 1e12-unit terms: exact to ~1e-12 relative
    got.foreach(t => assert(math.abs(t._3 - 2.0 / math.log(2.0)) < 1e-9))
  }

  test("adamicAdarTopPairs: hub cap skips the high-degree center") {
    import spark.implicits._
    // star center 0 with 5 leaves: all leaf pairs share only the hub
    val star = (1L to 5L).map(i => (0L, i)).toDF("s", "d")
    assert(Graph.adamicAdarTopPairs(star, "s", "d", topN = 100,
      maxDeg = 4).count() == 0L)
    assert(Graph.adamicAdarTopPairs(star, "s", "d", topN = 100,
      maxDeg = 5).count() == 10L)
  }

  test("degreeAssortativity: star graph -> -1, cycle (uniform degree) " +
    "-> null denominator guard") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val r = Graph.degreeAssortativity(star, "s", "d").head()
    assert(math.abs(r.getAs[Double]("assortativity") + 1.0) < 1e-12 &&
      r.getAs[Long]("n_edges") == 3L)
    // every vertex of a cycle has degree 2: zero variance -> no r
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val c = Graph.degreeAssortativity(cyc, "s", "d").head()
    assert(c.isNullAt(0) && c.getAs[Long]("n_edges") == 3L)
    // duplicate + reversed + self-loop edges collapse before counting
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 1L), (0L, 2L),
      (0L, 3L)).toDF("s", "d")
    assert(Graph.degreeAssortativity(messy, "s", "d").head()
      .getAs[Long]("n_edges") == 3L)
  }

  test("labelPropagation: mass reaches radius-2, seeds stay clamped, " +
    "ties break to the smaller label") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val oneSeed = Seq((1L, 7L)).toDF("v", "label")
    val got = Graph.labelPropagation(path, "s", "d", oneSeed, "v",
      "label", rounds = 2).orderBy("v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    // radius 2 from seed 1: vertices 1 (clamped), 2, 3; 4 unreached
    assert(got == Seq((1L, 7L, 1L, true), (2L, 7L, 1L, false),
      (3L, 7L, 1L, false)), got.mkString(","))
    // competing seeds: v2 hears label 5 (via 1) and label 2 (via 3) at
    // equal mass -> the smaller label wins
    val twoSeeds = Seq((1L, 5L), (4L, 2L)).toDF("v", "label")
    val mid = Graph.labelPropagation(path, "s", "d", twoSeeds, "v",
      "label", rounds = 2)
      .filter(org.apache.spark.sql.functions.col("v") === 2L).head()
    assert(mid.getLong(1) == 2L && mid.getLong(2) == 1L, mid.toString)
  }

  test("wlColorCensus: path endpoints share a color class, regular " +
    "graphs collapse to one color, census ordered by reach") {
    import spark.implicits._
    // path 1-2-3: endpoints are WL-equivalent, the middle is its own
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val got = Graph.wlColorCensus(path, "s", "d", rounds = 2, topK = 10)
      .collect().map(r => r.getAs[Long]("n_vertices")).toSeq
    assert(got == Seq(2L, 1L), got.mkString(","))
    // two disjoint triangles: 2-regular everywhere -> one color class
    val tris = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("s", "d")
    val t = Graph.wlColorCensus(tris, "s", "d", rounds = 2, topK = 10)
      .collect()
    assert(t.length == 1 && t.head.getAs[Long]("n_vertices") == 6L,
      t.mkString(","))
  }

  test("localClusteringCoefficient: triangle vertices close their " +
    "neighborhoods, the pendant is undefined") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4 on vertex 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("s", "d")
    val got = Graph.localClusteringCoefficient(edges, "s", "d")
      .orderBy("v").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("degree"),
        r.getAs[Long]("triangles"),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(got == Seq(
      (1L, 3L, 1L, Some(333L)),
      (2L, 2L, 1L, Some(1000L)),
      (3L, 2L, 1L, Some(1000L)),
      (4L, 1L, 0L, None)), got.mkString(","))
  }

  test("hitsFixedPoint: hand-traced 2-iteration integer scores on a " +
    "3-edge graph, partition-order independent") {
    import spark.implicits._
    val U = Graph.Unit
    // 1->10, 2->10, 2->11: vertex 2 is the stronger hub (covers both
    // auths), 10 the stronger auth (two in-links)
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("s", "d")
    def run(parts: Int) = Graph.hitsFixedPoint(
        edges.repartition(parts), "s", "d", iterations = 2)
      .orderBy("side", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run(1)
    // iter1: auth 10=U, 11=U div 2; hub 1=(U*U) div (3U/2), 2=U
    // iter2: auth 10=U, 11=(U*U) div (5U/3); hub 1=(U*U) div 1.6e12, 2=U
    assert(got == Seq(
      ("auth", 10L, U),
      ("auth", 11L, 600000000000L), // (U·U) div (5U/3) = 0.6·U exactly
      ("hub", 1L, 625000000000L),
      ("hub", 2L, U)), got.mkString(","))
    assert(run(7) == got, "integer HITS must be partition-order free")
  }

  test("linkPredictionTopPairs: exact cn/jaccard/pref-attach on a hand graph") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4 on 3: the only non-adjacent wedge
    // pairs are (1,4) and (2,4), each sharing center 3.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.linkPredictionTopPairs(edges, "src", "dst",
        topN = 10)
      .collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("cn"), r.getAs[Long]("deg_u"),
        r.getAs[Long]("deg_v"), r.getAs[Long]("jaccard_permille"),
        r.getAs[Long]("pref_attach"))).toSeq
    assert(got == Seq(
      (1L, 4L, 1L, 2L, 1L, 500L, 2L),
      (2L, 4L, 1L, 2L, 1L, 500L, 2L)), got.mkString(","))
  }

  test("linkPredictionTopPairs: duplicate/reversed edge sightings collapse") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (3L, 5L))
      .toDF("src", "dst")
    // adjacency: 1:{2,3}, 2:{1}, 3:{1,5}, 5:{3}; wedges: (2,3) via 1,
    // (1,5) via 3 — neither is an edge.
    val got = Graph.linkPredictionTopPairs(edges, "src", "dst", topN = 10)
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("cn"))).toSeq
    assert(got == Seq((1L, 5L, 1L), (2L, 3L, 1L)), got.mkString(","))
  }
}
