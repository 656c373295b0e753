package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the distribution-shift statistics. */
class StatTestsSpec extends SparkSuite {
  import spark.implicits._

  test("chiSquaredDrift matches the textbook 2x2 computation") {
    // arm 0: 30 a, 10 b; arm 1: 20 a, 40 b.
    // rt(a)=50 rt(b)=50 ct(0)=40 ct(1)=60 n=100
    // e = 20, 30, 20, 30 -> chi2 = 100/20 + 100/30 + 100/20 + 100/30
    val rows = Seq.fill(30)(("a", 0)) ++ Seq.fill(10)(("b", 0)) ++
      Seq.fill(20)(("a", 1)) ++ Seq.fill(40)(("b", 1))
    val r = StatTests.chiSquaredDrift(rows.toDF("cat", "arm"), "cat", "arm")
      .head()
    val expected = 100.0 / 20 + 100.0 / 30 + 100.0 / 20 + 100.0 / 30
    assert(math.abs(r.getAs[Double]("chi2") - expected) < 1e-9)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("n") == 100L)
  }

  test("chiSquaredDrift completes zero cells (category seen in one arm only)") {
    // cat 'c' appears only in arm 1: its arm-0 cell is observed 0 but
    // expected > 0 and must contribute.
    val rows = Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(5)(("c", 1))
    val r = StatTests.chiSquaredDrift(rows.toDF("cat", "arm"), "cat", "arm")
      .head()
    // grid: (a,0)=10 (a,1)=10 (c,0)=0 (c,1)=5; rt(a)=20 rt(c)=5
    // ct(0)=10 ct(1)=15 n=25 -> e: 8, 12, 2, 3
    val expected = 4.0 / 8 + 4.0 / 12 + 4.0 / 2 + 4.0 / 3
    assert(math.abs(r.getAs[Double]("chi2") - expected) < 1e-9)
  }

  test("ksStatistic is exact-integer and finds the max ecdf gap") {
    // arm0 values {1,2,3,4}, arm1 values {3,4,5,6}: D = 2/4 at v=2.
    val df = Seq((1, 0), (2, 0), (3, 0), (4, 0), (3, 1), (4, 1), (5, 1), (6, 1))
      .toDF("v", "arm")
    val r = StatTests.ksStatistic(df, "v", "arm").head()
    assert(r.getAs[Long]("n0") == 4L && r.getAs[Long]("n1") == 4L)
    // at v=2: cum0=2, cum1=0 -> |2*4 - 0*4| = 8; D = 8/16 = 0.5
    assert(r.getAs[Long]("d_num") == 8L)
    assert(r.getAs[Long]("d_permille") == 500L)
  }

  test("ksStatistic D=0 on identical samples, D=1000 permille on disjoint") {
    val same = Seq((1, 0), (2, 0), (1, 1), (2, 1)).toDF("v", "arm")
    assert(StatTests.ksStatistic(same, "v", "arm")
      .head().getAs[Long]("d_num") == 0L)
    val disjoint = Seq((1, 0), (2, 0), (8, 1), (9, 1)).toDF("v", "arm")
    assert(StatTests.ksStatistic(disjoint, "v", "arm")
      .head().getAs[Long]("d_permille") == 1000L)
  }

  test("mutualInformation: independent -> 0 bits; identical -> H(X)") {
    // Perfectly independent 2x2 (all four combos equally likely).
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val r1 = StatTests.mutualInformation(ind, "x", "y").head()
    assert(math.abs(r1.getAs[Double]("mi_bits")) < 1e-12)
    assert(math.abs(r1.getAs[Double]("h_x") - 1.0) < 1e-12)
    // y == x: MI == H(X) == 1 bit for a fair binary variable.
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val r2 = StatTests.mutualInformation(dep, "x", "y").head()
    assert(math.abs(r2.getAs[Double]("mi_bits") - 1.0) < 1e-12)
    assert(r2.getAs[Long]("n") == 4L)
  }

  test("zipfFit recovers the slope of an exact power law") {
    // freq(rank) = 1024 / rank for ranks 1..8 (token names order with
    // their rank so the deterministic tie-break can't reorder).
    val docs = (1 to 8).flatMap { r =>
      Seq.fill(1024 / r)(s"w$r")
    }.mkString(" ")
    val out = StatTests.zipfFit(Seq(docs).toDF("text"), "text", 500).head()
    assert(out.getAs[Long]("n_terms") == 8L)
    assert(math.abs(out.getAs[Double]("slope") - (-1.0)) < 0.01)
    assert(math.abs(out.getAs[Double]("intercept") - math.log(1024.0)) < 0.05)
  }

  test("zipfFit honors topR and ignores empty tokens") {
    val docs = Seq("a a a   b b  c", "a b   ").toDF("text")
    val out = StatTests.zipfFit(docs, "text", 2).head()
    assert(out.getAs[Long]("n_terms") == 2L)
  }
  test("chiSquaredFromCounts(folded batches) == chiSquaredDrift one-shot, " +
    "bit-for-bit") {
    val rows = (1 to 300).map(i => (i, s"c${i % 5}", i % 2))
      .toDF("id", "cat", "arm")
    val oneShot = StatTests.chiSquaredDrift(rows, "cat", "arm")
      .head().toSeq
    val b1 = rows.filter(col("id") <= 130)
    val b2 = rows.filter(col("id") > 130)
    val folded = StatTests.chiSquaredFromCounts(StatTests.foldCategoryCounts(
      Seq(StatTests.categoryCounts(b1, "cat", "arm"),
        StatTests.categoryCounts(b2, "cat", "arm")))).head().toSeq
    assert(folded == oneShot)
  }

  test("markdownToText strips CommonMark syntax, keeps the prose") {
    val md = Seq(
      "# Title\n\n> quote\n\n- one\n- *two*\n\n```\nval x = 1\n```\n\n" +
        "See [docs](http://x) and ![img](u.png) plus `code` and _em_ tail")
      .toDF("md")
    val got = TextStats.withMarkdownText(md, "md")
      .head().getAs[String]("text_clean")
    assert(got == "Title quote one two See docs and img plus code and em tail")
  }

  test("cumulativeFillBins: start-offset window assignment, " +
    "partition-order independent") {
    val files = Seq(
      ("g1", "a", 500L), ("g1", "b", 400L), ("g1", "c", 300L),
      ("g1", "d", 200L), ("g1", "e", 100L),
      ("g2", "f", 50L), ("g2", "g", 40L)).toDF("grp", "key", "w")
    def run(parts: Int) = Packing.cumulativeFillBins(
        files.repartition(parts), Seq("grp"), "w", "key", target = 600L)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[String]("key"),
        r.getAs[Long]("bin"))).toSet
    val plan = run(1)
    assert(plan == run(4))
    // g1 sorted desc: a500 b400 c300 d200 e100; start offsets 0,500,900,
    // 1200,1400 -> div 600 = 0,0,1,2,2 (c straddles the 1200 boundary and
    // stays in window 1 where it starts)
    val byKey = plan.map(t => t._2 -> t._3).toMap
    assert(byKey("a") == 0L && byKey("b") == 0L && byKey("c") == 1L &&
      byKey("d") == 2L && byKey("e") == 2L)
    assert(byKey("f") == 0L && byKey("g") == 0L)
  }
  test("chiSquaredGoodnessOfFit: perfect fit -> 0; missing categories " +
    "still contribute; out-of-universe categories fail loudly") {
    val expected = Seq("a" -> 500, "b" -> 300, "c" -> 200)
    val perfect = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(20)("c")).toDF("cat")
    val r = StatTests.chiSquaredGoodnessOfFit(perfect, "cat", expected)
      .head()
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-12)
    assert(r.getAs[Long]("dof") == 2L && r.getAs[Long]("n") == 100L)
    // category c never observed: e_c = 100*0.2 = 20 -> contributes 20
    val missing = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("cat")
    val m = StatTests.chiSquaredGoodnessOfFit(missing, "cat", expected)
      .head()
    // chi2 = (50-50)^2/50 + (50-30)^2/30 + (0-20)^2/20 = 400/30 + 20
    assert(math.abs(m.getAs[Double]("chi2") - (400.0 / 30 + 20.0)) < 1e-9)
    intercept[Exception] {
      StatTests.chiSquaredGoodnessOfFit(
        Seq("a", "zzz").toDF("cat"), "cat", expected).collect()
    }
  }

  test("cohensKappa: perfect agreement -> 1, independence -> ~0, " +
    "constant raters -> null") {
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    val p = StatTests.cohensKappa(perfect, "a", "b").head()
    assert(math.abs(p.getAs[Double]("kappa") - 1.0) < 1e-12)
    // exactly independent 2x2 (all four cells equal): po = 0.5 = pe
    val ind = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"))
      .toDF("a", "b")
    val i = StatTests.cohensKappa(ind, "a", "b").head()
    assert(math.abs(i.getAs[Double]("kappa")) < 1e-12)
    // both raters constant: pe = 1, kappa undefined -> null
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(StatTests.cohensKappa(const, "a", "b").head().isNullAt(0))
    // a label missing from the diagonal still counts in pe via marginals
    val skew = Seq(("x", "y"), ("y", "x")).toDF("a", "b")
    val k = StatTests.cohensKappa(skew, "a", "b").head()
    assert(k.getAs[Double]("po") == 0.0 &&
      math.abs(k.getAs[Double]("pe") - 0.5) < 1e-12)
  }

  test("calibrationReliability: integer bins, permille means, " +
    "out-of-range scores excluded") {
    val rows = Seq((50L, 0), (149L, 1), (950L, 1), (1000L, 1), (-5L, 1),
      (1500L, 0)).toDF("score", "label")
    val got = graft.lakehouse.ext.Quality.calibrationReliability(
        rows, "score", "label", bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("mean_score_permille"),
        r.getAs[Long]("observed_permille")))
    // -5 and 1500 excluded; 149 -> bin 1; 1000 clamps into bin 9
    assert(got.toSeq == Seq((0, 1L, 50L, 0L), (1, 1L, 149L, 1000L),
      (9, 2L, 975L, 1000L)))
  }

  test("joinKeySkewProfile: loads, shares, and the skew multiple") {
    val df = (Seq.fill(6)("hot") ++ Seq("a", "b", "c", "d")).toDF("k")
    val got = graft.lakehouse.ext.Analytics.joinKeySkewProfile(df, "k", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // hot: 6/10 = 600 permille, skew = 6*5*1000/10 = 3000
    assert(got.head == ("hot", 6L, 600L, 3000L))
    assert(got.length == 3 && got(1)._1 == "a" && got(2)._1 == "b")
  }
  test("streaming drift twin: complete-mode (cat, arm) counts over a " +
    "live stream feed the identical chi-squared as the batch monitor") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Int)]
    val q = StatTests.categoryCounts(mem.toDF().toDF("cat", "arm"),
        "cat", "arm")
      .writeStream.format("memory").queryName("drift_counts_stream")
      .outputMode("complete").start()
    try {
      mem.addData(("a", 0), ("a", 1), ("b", 0))
      q.processAllAvailable()
      mem.addData(("b", 1), ("a", 0), ("c", 1))
      q.processAllAvailable()
      // snapshot the sink: chiSquaredFromCounts self-joins its input and
      // MemoryPlan views don't deduplicate attribute refs across a join
      val streamed = StatTests.chiSquaredFromCounts(
        spark.table("drift_counts_stream").localCheckpoint()).head().toSeq
      val batch = StatTests.chiSquaredDrift(
        Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1), ("a", 0), ("c", 1))
          .toDF("cat", "arm"), "cat", "arm").head().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("kCenterCoreset: farthest-point traversal on a planted geometry, " +
    "partition-order independent") {
    // 1-D line embedded in 2-D: ids 1..9 at x = 0..8 (y = 0), plus an
    // outlier at x = 100. Seed = id 1 (x0); round 2 must pick the
    // outlier; round 3 the far end x8; round 4 the midpoint x4.
    val rows = ((1L to 9L).map(i => (i, Seq((i - 1).toFloat, 0.0f))) :+
      (10L, Seq(100.0f, 0.0f))).toDF("vec_id", "embedding")
    def run(parts: Int) = graft.lakehouse.ext.Clustering.kCenterCoreset(
        rows.repartition(parts), "vec_id", "embedding", k = 4)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("vec_id")))
    val got = run(1)
    assert(got.toSeq == Seq((1, 1L), (2, 10L), (3, 9L), (4, 5L)),
      got.mkString(","))
    assert(got.toSeq == run(5).toSeq)
  }

  test("rankNormalize: ties share a permille, singleton groups map to 0") {
    val df = Seq(("g1", 10), ("g1", 20), ("g1", 20), ("g1", 40),
      ("g2", 7)).toDF("grp", "v")
    val got = graft.lakehouse.ext.Features.rankNormalize(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getAs[Long]("rank_permille"))).toSet
    // g1 ranks: 10->1, 20->2, 20->2, 40->4; n=4 -> (rk-1)*1000 div 3
    assert(got == Set(("g1", 10, 0L), ("g1", 20, 333L), ("g1", 40, 1000L),
      ("g2", 7, 0L)))
  }
  test("poissonBootstrapMeanCI: CI brackets the true mean and is " +
    "deterministic; degenerate data gives a zero-width CI") {
    val df = (1L to 400L).map(i => (i, (i % 100).toInt)).toDF("id", "v")
    val r = StatTests.poissonBootstrapMeanCI(df, "id", "v", b = 40).head()
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < 49.5 && 49.5 < hi, s"CI [$lo, $hi] should bracket 49.5")
    assert(hi - lo < 15.0, "CI suspiciously wide")
    assert(r.getAs[Long]("n_reps") == 40L)
    val again = StatTests.poissonBootstrapMeanCI(df.repartition(7), "id",
      "v", b = 40).head()
    assert(again.getAs[Double]("ci_lo") == lo &&
      again.getAs[Double]("ci_hi") == hi)
    val const = (1L to 50L).map((_, 7)).toDF("id", "v")
    val c = StatTests.poissonBootstrapMeanCI(const, "id", "v", b = 40).head()
    assert(c.getAs[Double]("ci_lo") == 7.0 && c.getAs[Double]("ci_hi") == 7.0)
  }
  test("heapsFit recovers the planted sublinear vocabulary-growth exponent") {
    // doc d contributes d new tokens plus d^2-d filler repeats:
    // V(d) ~ d^2/2 while n(d) ~ d^3/3, so V ~ n^(2/3) -> beta ~ 0.667.
    val docs = (1 to 30).map { d =>
      val fresh = (1 to d).map(i => s"w_${d}_$i")
      val filler = Seq.fill(d * d - d)("the")
      (d.toLong, (fresh ++ filler).mkString(" "))
    }.toDF("doc_id", "text")
    val r = StatTests.heapsFit(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_points") == 30L)
    assert(math.abs(r.getAs[Double]("beta") - 2.0 / 3.0) < 0.05,
      s"beta = ${r.getAs[Double]("beta")}")
  }

  test("sliceAccuracyWilson: hand-checked interval, degenerate p") {
    val df = (Seq.fill(70)(("en", true)) ++ Seq.fill(30)(("en", false)) ++
      Seq.fill(5)(("fr", true))).toDF("lang", "ok")
    val got = StatTests.sliceAccuracyWilson(df, "lang", "ok")
      .orderBy("slice").collect()
    val en = got(0)
    assert(en.getAs[Long]("acc_permille") == 700L)
    // Wilson 95% for 70/100: ~ [0.604, 0.781]
    assert(math.abs(en.getAs[Double]("wilson_lo") - 0.604) < 0.005)
    assert(math.abs(en.getAs[Double]("wilson_hi") - 0.781) < 0.005)
    val fr = got(1)
    // p-hat = 1 at n = 5: the upper bound stays 1, the lower pulls down
    assert(fr.getAs[Long]("acc_permille") == 1000L)
    assert(fr.getAs[Double]("wilson_lo") < 0.6 &&
      fr.getAs[Double]("wilson_hi") <= 1.0 + 1e-9)
  }
  test("populationStabilityIndex: identical distributions -> ~0; a " +
    "shifted arm scores high; clamping keeps outliers in edge bins") {
    val same = (1 to 200).map(i => (i % 100 * 10, i % 2)).toDF("v", "arm")
    val s0 = StatTests.populationStabilityIndex(same, "v", "arm",
      bins = 10, lo = 0L, hi = 1000L).head()
    assert(math.abs(s0.getAs[Double]("psi")) < 0.01)
    assert(s0.getAs[Long]("n0") == 100L && s0.getAs[Long]("n1") == 100L)
    val shifted = ((1 to 100).map(i => (50, 0)) ++
      (1 to 100).map(i => (950, 1))).toDF("v", "arm")
    val s1 = StatTests.populationStabilityIndex(shifted, "v", "arm",
      bins = 10, lo = 0L, hi = 1000L).head()
    assert(s1.getAs[Double]("psi") > 1.0)
    // values far outside [lo, hi) land in the edge bins, not new ones
    val out = Seq((-50, 0), (5000, 1)).toDF("v", "arm")
    val s2 = StatTests.populationStabilityIndex(out, "v", "arm",
      bins = 10, lo = 0L, hi = 1000L).head()
    assert(s2.getAs[Long]("n_occupied_bins") == 2L)
  }
  test("rocAuc: perfect separation -> 1000 permille, reversed -> 0, " +
    "all-ties -> 500; hand-checked mixed case") {
    val perfect = Seq((10, 1), (9, 1), (2, 0), (1, 0)).toDF("s", "y")
    assert(StatTests.rocAuc(perfect, "s", "y").head()
      .getAs[Long]("auc_permille") == 1000L)
    val reversed = Seq((10, 0), (9, 0), (2, 1), (1, 1)).toDF("s", "y")
    assert(StatTests.rocAuc(reversed, "s", "y").head()
      .getAs[Long]("auc_permille") == 0L)
    val allTies = Seq((5, 1), (5, 1), (5, 0), (5, 0)).toDF("s", "y")
    assert(StatTests.rocAuc(allTies, "s", "y").head()
      .getAs[Long]("auc_permille") == 500L)
    // pos scores {3, 1}, neg scores {2, 2}: pairs (3>2)x2 wins,
    // (1<2)x2 losses -> AUC = 2/4 = 0.5; with a tie at 2 for one pos:
    val mixed = Seq((3, 1), (2, 1), (2, 0), (1, 0)).toDF("s", "y")
    val m = StatTests.rocAuc(mixed, "s", "y").head()
    // pos 3: beats neg 2 and neg 1 -> 2 wins; pos 2: beats neg 1 (1 win),
    // ties neg 2 -> num = 2*3 + 1 = 7, denom = 2*2*2 = 8
    assert(m.getAs[Long]("auc_num") == 7L &&
      m.getAs[Long]("auc_denom") == 8L)
    assert(m.getAs[Long]("auc_permille") == 875L)
  }

  test("truncationLossReport: hand arithmetic, groups independent") {
    val df = Seq(("a", 100L), ("a", 1500L), ("b", 50L)).toDF("src", "n")
    val got = TextStats.truncationLossReport(df, "n", "src", cutoff = 1000L)
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(("a", 2L, 1L, 1600L, 500L, 312L),
      ("b", 1L, 0L, 50L, 0L, 0L)))
  }
  test("cramersV: perfect association -> 1, independence -> 0") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("cat", "arm")
    val v1 = StatTests.cramersV(perfect, "cat", "arm").head()
    assert(math.abs(v1.getAs[Double]("v") - 1.0) < 1e-12)
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("cat", "arm")
    assert(math.abs(StatTests.cramersV(ind, "cat", "arm").head()
      .getAs[Double]("v")) < 1e-12)
  }

  test("expectedCalibrationError: perfectly calibrated bins -> 0; a " +
    "fully miscalibrated scorer -> ~its confidence") {
    // score 950 always wrong, score 50 always right: both bins gap big
    val bad = (Seq.fill(10)((950L, 0)) ++ Seq.fill(10)((50L, 1)))
      .toDF("score", "label")
    val e1 = graft.lakehouse.ext.Quality.expectedCalibrationError(
      bad, "score", "label", bins = 10).head()
    assert(e1.getAs[Long]("ece_permille") == 950L,
      s"got ${e1.getAs[Long]("ece_permille")}")
    // score 500 with half positives: gap 0
    val good = (Seq.fill(10)((500L, 1)) ++ Seq.fill(10)((500L, 0)))
      .toDF("score", "label")
    assert(graft.lakehouse.ext.Quality.expectedCalibrationError(
      good, "score", "label", bins = 10).head()
      .getAs[Long]("ece_permille") == 0L)
  }

  test("cliffsDelta: full separation -> ±1000, tie pairs drop out, " +
    "hand-checked mixed case") {
    val sep = Seq((3, 1), (4, 1), (1, 0), (2, 0)).toDF("v", "arm")
    val s = StatTests.cliffsDelta(sep, "v", "arm").head()
    assert(s.getAs[Long]("delta_num") == 4L &&
      s.getAs[Long]("delta_denom") == 4L &&
      s.getAs[Long]("delta_permille") == 1000L)
    val rev = Seq((1, 1), (5, 0)).toDF("v", "arm")
    assert(StatTests.cliffsDelta(rev, "v", "arm").head()
      .getAs[Long]("delta_permille") == -1000L)
    // arm1 {2,3} vs arm0 {1,2}: one tie pair (2,2) contributes 0;
    // wins = 3, losses = 0 -> 3/4 = 750 permille
    val mixed = Seq((2, 1), (3, 1), (2, 0), (1, 0)).toDF("v", "arm")
    val m = StatTests.cliffsDelta(mixed, "v", "arm").head()
    assert(m.getAs[Long]("delta_num") == 3L &&
      m.getAs[Long]("delta_denom") == 4L &&
      m.getAs[Long]("delta_permille") == 750L)
  }

  test("spearmanRho: monotone -> 1, reversed -> -1, tie case matches " +
    "hand-scaled ranks, constant column -> null") {
    val up = Seq((1, 10), (2, 20), (3, 30)).toDF("x", "y")
    assert(math.abs(StatTests.spearmanRho(up, "x", "y").head()
      .getAs[Double]("rho") - 1.0) < 1e-12)
    val down = Seq((1, 30), (2, 20), (3, 10)).toDF("x", "y")
    assert(math.abs(StatTests.spearmanRho(down, "x", "y").head()
      .getAs[Double]("rho") + 1.0) < 1e-12)
    // x = [1,1,2] -> avg ranks [1.5,1.5,3] (scaled [3,3,6]);
    // y = [1,2,3] -> scaled [2,4,6]; rho = 18/sqrt(18*24) = sqrt(3)/2
    val tied = Seq((1, 1), (1, 2), (2, 3)).toDF("x", "y")
    assert(math.abs(StatTests.spearmanRho(tied, "x", "y").head()
      .getAs[Double]("rho") - math.sqrt(3.0) / 2.0) < 1e-12)
    val const = Seq((1, 1), (1, 2)).toDF("x", "y")
    assert(StatTests.spearmanRho(const, "x", "y").head().isNullAt(0))
  }

  test("kruskalWallis: textbook no-tie case, all-tied degenerate case") {
    // groups a={1,2} b={3,4}: ranks 1..4, S_a=3 S_b=7,
    // H = 12/(4*5)*(9/2+49/2) - 3*5 = 2.4; no ties -> corrected == h
    val df = Seq((1, "a"), (2, "a"), (3, "b"), (4, "b")).toDF("v", "g")
    val r = StatTests.kruskalWallis(df, "v", "g").head()
    assert(math.abs(r.getAs[Double]("h") - 2.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("h_corrected") - 2.4) < 1e-12)
    assert(r.getAs[Long]("dof") == 1L && r.getAs[Long]("n") == 4L)
    // every value identical: H = 0 and the tie correction divides by
    // zero -> h_corrected is null, not NaN
    val flat = Seq((5, "a"), (5, "a"), (5, "b")).toDF("v", "g")
    val f = StatTests.kruskalWallis(flat, "v", "g").head()
    assert(math.abs(f.getAs[Double]("h")) < 1e-9)
    assert(f.isNullAt(f.fieldIndex("h_corrected")))
  }

  test("giniConcentration: uniform -> 0, concentrated -> 2/3, " +
    "negative values refused") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 1L),
      ("b", 0L), ("b", 0L), ("b", 4L)).toDF("g", "v")
    val got = StatTests.giniConcentration(df, "v", "g")
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getAs[Long]("gini_permille")))
    assert(got.toSeq == Seq(("a", 0L), ("b", 666L)))
    val neg = Seq(("a", -1L)).toDF("g", "v")
    intercept[Exception] {
      StatTests.giniConcentration(neg, "v", "g").collect()
    }
  }

  test("mannKendallTrend: monotone up/down, flat -> null z, duplicate " +
    "period refused") {
    val up = Seq((1, 10), (2, 20), (3, 30)).toDF("t", "v")
    val r = StatTests.mannKendallTrend(up, "t", "v").head()
    // S = 3, var18 = 3*2*11 = 66, z = 2/sqrt(66/18)
    assert(r.getAs[Long]("s") == 3L && r.getAs[Long]("var18") == 66L)
    assert(math.abs(r.getAs[Double]("z") - 2.0 / math.sqrt(66.0 / 18.0)) < 1e-12)
    val down = Seq((1, 30), (2, 20), (3, 10)).toDF("t", "v")
    val d = StatTests.mannKendallTrend(down, "t", "v").head()
    assert(d.getAs[Long]("s") == -3L)
    assert(math.abs(d.getAs[Double]("z") + 2.0 / math.sqrt(66.0 / 18.0)) < 1e-12)
    val flat = Seq((1, 5), (2, 5), (3, 5)).toDF("t", "v")
    val f = StatTests.mannKendallTrend(flat, "t", "v").head()
    assert(f.getAs[Long]("s") == 0L && f.isNullAt(f.fieldIndex("z")))
    intercept[Exception] {
      StatTests.mannKendallTrend(
        Seq((1, 1), (1, 2)).toDF("t", "v"), "t", "v").collect()
    }
  }

  test("kendallTauB: perfect concordance -> 1, reversed -> -1, tie case " +
    "matches hand counts") {
    val up = Seq((1, 1), (2, 2), (3, 3)).toDF("x", "y")
    val r = StatTests.kendallTauB(up, "x", "y").head()
    assert(r.getAs[Long]("concordant") == 3L &&
      r.getAs[Long]("discordant") == 0L)
    assert(math.abs(r.getAs[Double]("tau_b") - 1.0) < 1e-12)
    val down = Seq((1, 3), (2, 2), (3, 1)).toDF("x", "y")
    assert(math.abs(StatTests.kendallTauB(down, "x", "y").head()
      .getAs[Double]("tau_b") + 1.0) < 1e-12)
    // (1,1) (2,1) (3,2): C=2, D=0, ty=1 tie pair -> tau = 2/sqrt(3*2)
    val tied = Seq((1, 1), (2, 1), (3, 2)).toDF("x", "y")
    val tt = StatTests.kendallTauB(tied, "x", "y").head()
    assert(tt.getAs[Long]("concordant") == 2L &&
      tt.getAs[Long]("discordant") == 0L)
    assert(math.abs(tt.getAs[Double]("tau_b") - 2.0 / math.sqrt(6.0)) < 1e-12)
  }

  test("jensenShannon: disjoint supports -> 1 bit, identical -> 0") {
    val disjoint = Seq(("a", 0), ("a", 0), ("b", 1), ("b", 1)).toDF("cat", "arm")
    val r = StatTests.jensenShannon(disjoint, "cat", "arm").head()
    assert(math.abs(r.getAs[Double]("jsd_bits") - 1.0) < 1e-12)
    assert(r.getAs[Long]("n0") == 2L && r.getAs[Long]("n1") == 2L &&
      r.getAs[Long]("n_cats") == 2L)
    val same = Seq(("a", 0), ("b", 0), ("a", 1), ("b", 1)).toDF("cat", "arm")
    assert(math.abs(StatTests.jensenShannon(same, "cat", "arm").head()
      .getAs[Double]("jsd_bits")) < 1e-12)
  }

  test("fleissKappa: perfect agreement -> 1, hand-checked mixed case, " +
    "unequal rater counts refused") {
    // 2 items, 2 raters each, both raters agree on every item -> kappa 1
    val perfect = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"))
      .toDF("item", "cat")
    val p = StatTests.fleissKappa(perfect, "item", "cat").head()
    assert(math.abs(p.getAs[Double]("kappa") - 1.0) < 1e-12 &&
      p.getAs[Long]("n_items") == 2L && p.getAs[Long]("n_raters") == 2L)
    // item1 = {a,a}, item2 = {a,b}: S2 = 4+2 = 6, A = 2, D1 = 4,
    // c_a = 3, c_b = 1 -> C = 10, D2 = 16;
    // kappa = (2*16 - 10*4) / (4*(16-10)) = -8/24 = -1/3
    val mixed = Seq((1, "a"), (1, "a"), (2, "a"), (2, "b"))
      .toDF("item", "cat")
    val m = StatTests.fleissKappa(mixed, "item", "cat").head()
    assert(m.getAs[Long]("kappa_num") == -8L &&
      m.getAs[Long]("kappa_den") == 24L &&
      math.abs(m.getAs[Double]("kappa") + 1.0 / 3.0) < 1e-12)
    val unequal = Seq((1, "a"), (1, "a"), (2, "b")).toDF("item", "cat")
    intercept[IllegalArgumentException] {
      StatTests.fleissKappa(unequal, "item", "cat")
    }
  }

  test("permutationTestPerGroup: all-equal values -> p = 1000, " +
    "deterministic across runs, degenerate one-arm groups dropped") {
    // every permutation's statistic equals the observed one
    val flat = Seq(("g", 1, 5, 1), ("g", 2, 5, 0), ("g", 3, 5, 0),
      ("g", 4, 5, 1)).toDF("grp", "id", "v", "arm")
    val r = StatTests.permutationTestPerGroup(flat, "grp", "id", "v",
      "arm", m = 16).head()
    assert(r.getAs[Long]("n_exceed") == 16L &&
      r.getAs[Long]("p_permille") == 1000L &&
      r.getAs[Long]("n") == 4L && r.getAs[Long]("n1") == 2L)
    // one-arm groups are not a test: dropped, not fabricated
    val mixed = Seq(("a", 1, 9, 1), ("a", 2, 1, 0),
      ("b", 3, 4, 0), ("b", 4, 5, 0)).toDF("grp", "id", "v", "arm")
    val out = StatTests.permutationTestPerGroup(mixed, "grp", "id", "v",
      "arm", m = 8)
    assert(out.select("grp").collect().map(_.getString(0)).toSeq ==
      Seq("a"))
    // sha-keyed shuffles are deterministic: two runs agree bit-for-bit
    val a1 = out.collect().toSeq
    val a2 = StatTests.permutationTestPerGroup(mixed, "grp", "id", "v",
      "arm", m = 8).collect().toSeq
    assert(a1 == a2)
  }

  test("benjaminiHochberg: textbook step-up rejects through the largest " +
    "passing rank, including a skipped intermediate") {
    // m=5, alpha=0.05: p = .01,.02,.03,.04,.50 -> k/m*alpha thresholds
    // .01,.02,.03,.04,.05; ranks 1..4 all pass -> 4 rejections
    val p = Seq(("t1", 1L, 100L), ("t2", 2L, 100L), ("t3", 3L, 100L),
      ("t4", 4L, 100L), ("t5", 50L, 100L)).toDF("id", "pn", "pd")
    val r = StatTests.benjaminiHochberg(p, "id", "pn", "pd",
      alphaPermille = 50).collect().map(x =>
        x.getAs[String]("id") -> x.getAs[Boolean]("rejected")).toMap
    assert(r == Map("t1" -> true, "t2" -> true, "t3" -> true,
      "t4" -> true, "t5" -> false))
    // step-up property: rank 2 fails its own threshold but rank 3
    // passes, so ranks 1..3 ALL reject.
    // m=3, alpha=.05: thresholds .0166,.0333,.05; p = .001,.034,.045
    val s = Seq(("u1", 1L, 1000L), ("u2", 34L, 1000L),
      ("u3", 45L, 1000L)).toDF("id", "pn", "pd")
    val r2 = StatTests.benjaminiHochberg(s, "id", "pn", "pd",
      alphaPermille = 50).collect().map(x =>
        x.getAs[String]("id") -> x.getAs[Boolean]("rejected")).toMap
    assert(r2 == Map("u1" -> true, "u2" -> true, "u3" -> true))
  }

  test("winsorizedMean: outlier clamps to the p95 bound, raw mean keeps " +
    "it; exact bounds on a hand frame") {
    import spark.implicits._
    // 19 values of 10 and one 1000: p5 bound 10, p95 bound 10 ->
    // winsorized sum 200, mean 10; raw mean 59.5
    val df = (Seq.fill(19)(10) :+ 1000).zipWithIndex
      .map { case (v, i) => ("g", v) }.toDF("grp", "v")
    val r = StatTests.winsorizedMean(df, "grp", "v").head()
    assert(r.getAs[Long]("n") == 20L &&
      r.getAs[Long]("lo_val") == 10L && r.getAs[Long]("hi_val") == 10L &&
      r.getAs[Long]("winsorized_sum") == 200L &&
      r.getAs[Double]("winsorized_mean") == 10.0 &&
      r.getAs[Double]("raw_mean") == 59.5)
  }

  test("correlationMatrix: exact +1/-1 on linear columns, null on a " +
    "constant column, one row per unordered pair") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i, 2 * i, -3 * i + 40, 7))
      .toDF("a", "b", "c", "k")
    val got = StatTests.correlationMatrix(df, Seq(
      "a" -> col("a"), "b" -> col("b"), "c" -> col("c"),
      "k" -> col("k"))).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got.size == 6)
    assert(math.abs(got(("a", "b")).get - 1.0) < 1e-12)
    assert(math.abs(got(("a", "c")).get + 1.0) < 1e-12)
    assert(math.abs(got(("b", "c")).get + 1.0) < 1e-12)
    assert(got(("a", "k")).isEmpty && got(("b", "k")).isEmpty &&
      got(("c", "k")).isEmpty, "zero-variance column -> null corr")
  }

  test("correlationMatrix: bit-stable across partitionings (long chunk " +
    "partials + exact decimal merge)") {
    import spark.implicits._
    // noisy-but-correlated integers; exact moments => every partitioning
    // must fold to the IDENTICAL double, not merely a close one
    val rows = (1 to 997).map(i => (i, 3 * i + (i * i) % 17, 5000 - 2 * i))
    def run(parts: Int) = StatTests.correlationMatrix(
      rows.toDF("x", "y", "z").repartition(parts),
      Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("corr"), r.getAs[Long]("n"))).toMap
    val one = run(1)
    assert(one.size == 3 && one.values.forall(_._2 == 997L))
    assert(math.abs(one(("x", "z"))._1 + 1.0) < 1e-12)
    assert(run(13) == one, "chunked long partials must merge exactly")
  }

  test("scaledLongExact: tie path follows the double's shortest-decimal " +
    "rendering (Spark/DuckDB cast semantics), HALF_UP away from zero") {
    def f(d: Double, scale: Int) =
      StatTests.scaledLongExact(d, math.pow(10, scale), scale)
    // 0.145 is binary-exactly 0.144999… — valueOf semantics round the
    // decimal rendering "0.145" up, matching CAST(0.145 AS DECIMAL(18,2))
    assert(f(0.145, 2) == 15L)
    assert(f(-0.145, 2) == -15L)
    // true dyadic tie: HALF_UP is away-from-zero on both signs
    assert(f(0.125, 2) == 13L)
    assert(f(-0.125, 2) == -13L)
    // fast path (far from the boundary) unchanged
    assert(f(1.234, 2) == 123L && f(-1.234, 2) == -123L)
    assert(f(7.0, 0) == 7L)
  }

  test("brownForsythe matches the hand computation and is " +
      "partition-order independent") {
    // a: v=[0,2,4] -> z=[4,0,4]; b: v=[0,8,16] -> z=[16,0,16]
    // between/N^2 = 96, within = 544/3, F = 96*4/(1*544/3) = 36/17
    val rows = Seq(("a", 0L), ("a", 2L), ("a", 4L),
      ("b", 0L), ("b", 8L), ("b", 16L))
    def run(parts: Int) = StatTests.brownForsythe(
      rows.toDF("g", "v").repartition(parts), "v", "g").head()
    val r = run(1)
    assert(math.abs(r.getAs[Double]("f") - 96.0 * 4 / (544.0 / 3)) < 1e-9,
      r.toString)
    assert(r.getAs[Long]("df1") == 1L && r.getAs[Long]("df2") == 4L)
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(run(7).getAs[Double]("f") == r.getAs[Double]("f"),
      "decimal fold must make F bit-stable across partitionings")
  }

  test("mcnemar: hand-computed discordant chi-squared; null when no " +
      "discordant pairs") {
    // n11=3, n10=4, n01=1, n00=2 -> chi2_cc = (|1-4|-1)^2/5 = 0.8
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(2)((false, false))
    val r = StatTests.mcnemar(rows.toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(r.getAs[Long]("n11") == 3L && r.getAs[Long]("n10") == 4L &&
      r.getAs[Long]("n01") == 1L && r.getAs[Long]("n00") == 2L &&
      r.getAs[Long]("n") == 10L)
    assert(math.abs(r.getAs[Double]("chi2_cc") - 0.8) < 1e-12, r.toString)
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    assert(StatTests.mcnemar(agree, col("a"), col("b")).head()
      .isNullAt(5), "no discordant pairs -> null statistic")
  }

  test("cochranArmitageTrend: perfect monotone trend matches the hand " +
      "computation") {
    // doses 0/1/2, 4 each, positives 0/2/4:
    // T = 48, D = 96, z^2 = T^2/(R(N-R)D/N^2) = 2304/24 = 96
    val rows = Seq.fill(4)((0, 0)) ++
      Seq.fill(2)((1, 1)) ++ Seq.fill(2)((1, 0)) ++ Seq.fill(4)((2, 1))
    val r = StatTests.cochranArmitageTrend(
      rows.toDF("dose", "y"), "dose", "y").head()
    assert(r.getAs[Long]("t_num") == 48L, r.toString)
    assert(r.getAs[Long]("d") == 96L && r.getAs[Long]("r") == 6L &&
      r.getAs[Long]("n") == 12L && r.getAs[Long]("k") == 3L)
    assert(math.abs(r.getAs[Double]("z2") - 96.0) < 1e-9)
    // flat outcome: r = 0 -> guarded null
    val flat = Seq((0, 0), (1, 0), (2, 0)).toDF("dose", "y")
    assert(StatTests.cochranArmitageTrend(flat, "dose", "y").head()
      .isNullAt(5))
  }

  test("newcombeDiffCI: hand-checked Wilson-combined bounds for " +
      "80/100 vs 60/100; arm-count guard fires") {
    val rows = Seq.tabulate(100)(i => ("a", i < 80)) ++
      Seq.tabulate(100)(i => ("b", i < 60))
    val r = StatTests.newcombeDiffCI(rows.toDF("arm", "ok"),
      "arm", col("ok")).head()
    assert(r.getAs[String]("arm_a") == "a" &&
      r.getAs[String]("arm_b") == "b")
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("k_a") == 80L)
    assert(math.abs(r.getAs[Double]("diff") - 0.2) < 1e-12)
    // Wilson(80/100): [0.7112, 0.8666]; Wilson(60/100): [0.5020, 0.6906]
    // (hand arithmetic at 4 digits; the oracle hash pins exact values)
    assert(math.abs(r.getAs[Double]("ci_lo") - 0.0731) < 5e-3,
      r.toString)
    assert(math.abs(r.getAs[Double]("ci_hi") - 0.3218) < 5e-3)
    intercept[Exception] {
      StatTests.newcombeDiffCI(
        (rows :+ (("c", true))).toDF("arm", "ok"), "arm", col("ok"))
        .collect()
    }
  }

  test("overdispersionIndex: [1,2,3] -> dispersion 0.5, chi2 1.0; " +
      "single-row groups drop") {
    val d = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("lone", 5L))
      .toDF("grp", "y")
    val got = StatTests.overdispersionIndex(d, "grp", "y").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "g" && r.getAs[Long]("n") == 3L &&
      r.getAs[Long]("total") == 6L)
    assert(math.abs(r.getAs[Double]("dispersion") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("chi2") - 1.0) < 1e-12)
  }

  test("gTestIndependence matches the textbook 2x2 computation") {
    // Same fixture as the chi-squared spec: e = 20, 30, 20, 30.
    val rows = Seq.fill(30)(("a", 0)) ++ Seq.fill(10)(("b", 0)) ++
      Seq.fill(20)(("a", 1)) ++ Seq.fill(40)(("b", 1))
    val r = StatTests.gTestIndependence(rows.toDF("cat", "arm"),
      "cat", "arm").head()
    // e(a,0)=20 e(b,0)=20 e(a,1)=30 e(b,1)=30
    val expected = 2.0 * (30 * math.log(30.0 / 20) +
      10 * math.log(10.0 / 20) + 20 * math.log(20.0 / 30) +
      40 * math.log(40.0 / 30))
    assert(math.abs(r.getAs[Double]("g") - expected) < 1e-9, r.toString)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("n") == 100L)
  }

  test("gTestIndependence: zero-observed cells contribute 0 (the o*ln o limit)") {
    val rows = Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(5)(("c", 1))
    val r = StatTests.gTestIndependence(rows.toDF("cat", "arm"),
      "cat", "arm").head()
    // e: (a,0)=8 (a,1)=12 (c,0)=2 (c,1)=3; the (c,0)=0 cell adds nothing.
    val expected = 2.0 * (10 * math.log(10.0 / 8) +
      10 * math.log(10.0 / 12) + 5 * math.log(5.0 / 3))
    assert(math.abs(r.getAs[Double]("g") - expected) < 1e-9, r.toString)
  }

  test("cronbachAlpha: exact integer variance numerators and the 2-item alpha") {
    // items a=(1,2,3), b=(2,4,6): item nums 6 + 24 = 30; total t=(3,6,9)
    // num 54 -> alpha = 2*(1 - 30/54) = 8/9.
    val df = Seq((1, 2), (2, 4), (3, 6)).toDF("a", "b")
    val r = StatTests.cronbachAlpha(df, Seq("a", "b")).head()
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("item_var_num") == 30L)
    assert(r.getAs[Long]("total_var_num") == 54L)
    assert(math.abs(r.getAs[Double]("alpha") - 8.0 / 9.0) < 1e-12)
  }

  test("cronbachAlpha: constant total score reports NULL alpha") {
    val df = Seq((1, 3), (2, 2), (3, 1)).toDF("a", "b")
    val r = StatTests.cronbachAlpha(df, Seq("a", "b")).head()
    assert(r.getAs[Long]("total_var_num") == 0L)
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }

  test("friedmanTest: consistent ranking across blocks gives the textbook chi2") {
    // 3 blocks, treatments A<B<C everywhere: R = (3,6,9),
    // chi2 = 12*126/(3*3*4) - 3*3*4 = 6; doubled-rank sum of squares 504.
    val df = Seq(
      (1, "A", 1L), (1, "B", 2L), (1, "C", 3L),
      (2, "A", 4L), (2, "B", 5L), (2, "C", 6L),
      (3, "A", 7L), (3, "B", 8L), (3, "C", 9L))
      .toDF("blk", "trt", "v")
    val r = StatTests.friedmanTest(df, "blk", "trt", sum("v")).head()
    assert(r.getAs[Long]("b") == 3L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("sum_r2_x4") == 504L)
    assert(math.abs(r.getAs[Double]("chi2_f") - 6.0) < 1e-12)
    assert(r.getAs[Long]("dof") == 2L)
  }

  test("friedmanTest: ties take average ranks (doubled-integer form)") {
    // Block 1 all tied at 5: each cell's doubled rank = 2*1 + 3 - 1 = 4
    // (avg rank 2). Block 2 ranks A<B<C -> dr = 2,4,6.
    val df = Seq(
      (1, "A", 5L), (1, "B", 5L), (1, "C", 5L),
      (2, "A", 1L), (2, "B", 2L), (2, "C", 3L))
      .toDF("blk", "trt", "v")
    val r = StatTests.friedmanTest(df, "blk", "trt", sum("v")).head()
    // drsums: A=6, B=8, C=10 -> sum_dr2 = 36+64+100 = 200
    assert(r.getAs[Long]("sum_r2_x4") == 200L, r.toString)
  }

  test("friedmanTest completes missing (block, treatment) cells with 0") {
    // treatment C absent in block 2: its cell ranks as m=0 (lowest).
    val df = Seq(
      (1, "A", 2L), (1, "B", 3L), (1, "C", 4L),
      (2, "A", 5L), (2, "B", 6L))
      .toDF("blk", "trt", "v")
    val r = StatTests.friedmanTest(df, "blk", "trt", sum("v")).head()
    // block2: C=0 -> dr 2, A dr 4, B dr 6; block1: A 2, B 4, C 6.
    // drsums A=6, B=10, C=8 -> 36+100+64 = 200.
    assert(r.getAs[Long]("b") == 2L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("sum_r2_x4") == 200L, r.toString)
  }

  test("splitConformalCoverage: q-hat and coverage replicate a driver-side replay") {
    val rows = (1L to 200L).map(i => (i, i * 3 % 97, "g"))
    val got = StatTests.splitConformalCoverage(
      rows.toDF("id", "v", "grp"), "id", "v", "grp",
      alphaPermille = 100, seed = 21L).head()
    def parity(i: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$i#21".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val cal = rows.filter(r => parity(r._1)).map(_._2)
    val fit = cal.sum / cal.size
    val calS = cal.map(v => math.abs(v - fit)).sorted
    val pos = ((cal.size + 1) * 900 + 999) / 1000
    val qh = calS(pos.toInt - 1)
    val ev = rows.filterNot(r => parity(r._1))
      .map(r => math.abs(r._2 - fit))
    val covered = ev.count(_ <= qh)
    assert(got.getAs[Long]("n_cal") == cal.size.toLong, got.toString)
    assert(got.getAs[Long]("n_eval") == ev.size.toLong)
    assert(got.getAs[Long]("q_hat") == qh)
    assert(got.getAs[Long]("coverage_permille") ==
      covered.toLong * 1000 / ev.size)
    assert(got.getAs[Long]("target_permille") == 900L)
  }

  test("splitConformalCoverage: quantile position beyond n_cal gives " +
      "NULL q-hat and conservative full coverage") {
    val rows = (1L to 40L).map(i => (i, i, "g"))
    val got = StatTests.splitConformalCoverage(
      rows.toDF("id", "v", "grp"), "id", "v", "grp",
      alphaPermille = 1, seed = 21L).head()
    assert(got.isNullAt(got.fieldIndex("q_hat")), got.toString)
    assert(got.getAs[Long]("coverage_permille") == 1000L)
  }

  test("cochranQ: hand-computed statistic on a 3x3 binary grid") {
    // x: b1 (1,1,0), b2 (1,0,0), b3 (1,1,1):
    // Cj = (3,2,1), N = 6, sumCj2 = 14; Ri = (2,1,3), sumRi2 = 14.
    // Q = 2*(3*14 - 36)/(3*6 - 14) = 12/4 = 3.
    val df = Seq(
      (1, "A", 1), (1, "B", 1), (1, "C", 0),
      (2, "A", 1), (2, "B", 0), (2, "C", 0),
      (3, "A", 1), (3, "B", 1), (3, "C", 1))
      .toDF("blk", "trt", "x")
    val r = StatTests.cochranQ(df, "blk", "trt", col("x") === 1).head()
    assert(r.getAs[Long]("b") == 3L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_success") == 6L)
    assert(math.abs(r.getAs[Double]("q") - 3.0) < 1e-12, r.toString)
    assert(r.getAs[Long]("dof") == 2L)
  }

  test("cochranQ: all-success blocks degenerate to NULL; missing cells " +
      "zero-fill") {
    val allOne = Seq((1, "A", 1), (1, "B", 1), (2, "A", 1), (2, "B", 1))
      .toDF("blk", "trt", "x")
    val r = StatTests.cochranQ(allOne, "blk", "trt", col("x") === 1).head()
    assert(r.isNullAt(r.fieldIndex("q")), r.toString)
    // block 2 has no C row at all: its C cell must count as failure
    val sparse = Seq((1, "A", 1), (1, "C", 1), (2, "A", 1))
      .toDF("blk", "trt", "x")
    val s = StatTests.cochranQ(sparse, "blk", "trt", col("x") === 1).head()
    // grid: b1 (A=1, C=1), b2 (A=1, C=0): Cj=(2,1), N=3, sumCj2=5;
    // Ri=(2,1), sumRi2=5; Q = 1*(10-9)/(6-5) = 1.
    assert(s.getAs[Long]("k") == 2L && s.getAs[Long]("b") == 2L)
    assert(math.abs(s.getAs[Double]("q") - 1.0) < 1e-12, s.toString)
  }

  test("hosmerLemeshow: perfectly calibrated integer bins score 0") {
    // v=200 x5 rows with 1 event, v=400 x5 with 2, v=600 x5 with 3,
    // v=800 x5 with 4; bins=2 -> both bins have o = e exactly.
    val rows = (0 until 5).flatMap(i => Seq(
      (200L, if (i < 1) 1 else 0), (400L, if (i < 2) 1 else 0),
      (600L, if (i < 3) 1 else 0), (800L, if (i < 4) 1 else 0)))
    val r = StatTests.hosmerLemeshow(rows.toDF("score", "lab"),
      "score", col("lab"), bins = 2).head()
    assert(r.getAs[Long]("n") == 20L && r.getAs[Long]("n_bins") == 2L)
    assert(r.getAs[Long]("n_degenerate") == 0L)
    assert(math.abs(r.getAs[Double]("hl")) < 1e-12, r.toString)
    assert(r.getAs[Long]("dof") == 0L)
  }

  test("hosmerLemeshow: miscalibrated bin contributes (o-e)^2/(e(1-e/n))") {
    // One bin (bins=2 but one distinct score): v=500 x4 rows, 3 events.
    // e = 4*500/1000 = 2; term = 1/(2*(1-0.5)) = 1.
    val rows = Seq((500L, 1), (500L, 1), (500L, 1), (500L, 0))
    val r = StatTests.hosmerLemeshow(rows.toDF("score", "lab"),
      "score", col("lab"), bins = 2).head()
    assert(r.getAs[Long]("n_bins") == 1L)
    assert(math.abs(r.getAs[Double]("hl") - 1.0) < 1e-12, r.toString)
  }
}
