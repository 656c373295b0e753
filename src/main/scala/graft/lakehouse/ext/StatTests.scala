package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shift test statistics for corpus monitoring — the
  * quantitative layer under the drift reports ([[Analytics.welchTTest]],
  * `Quality.snapshotDrift`): chi-squared homogeneity, two-sample
  * Kolmogorov–Smirnov, mutual information, and a Zipf power-law fit.
  *
  * Every statistic here is ONE hash aggregation over the raw data into a
  * bounded frame (|categories|, |distinct values|, |vocab| rows), then
  * windows/folds over that bounded frame only — at 100 TB the shuffle
  * carries category counts, never rows. Cross-engine exactness uses the
  * repo's established recipe: integer/decimal arithmetic wherever the
  * math is rational, and for transcendental terms a per-cell IEEE double
  * expression replicated op-for-op in the oracle, accumulated exactly as
  * DECIMAL(38,18) (order-free), surfaced as DOUBLE.
  *
  * Reference provenance: the reference pipeline (common.py) carries no
  * statistics beyond counts; this extends its QA surface the way its
  * `dfShape`/profiling utilities suggest (common.py:317 dfShape).
  */
object StatTests {

  /** Pearson chi-squared test of homogeneity: is the distribution of
    * `catCol` the same across the arms of `armCol`? One count
    * aggregation → complete |cats|×|arms| grid (zero-observed cells
    * included — their expected counts still contribute) → per-cell
    * (o−e)²/e in a fixed IEEE op order → exact decimal fold.
    * Returns one row: chi2, dof, n. */
  def chiSquaredDrift(df: DataFrame, catCol: String, armCol: String): DataFrame =
    chiSquaredFromCounts(categoryCounts(df, catCol, armCol))

  /** The (cat, arm, o) count frame [[chiSquaredFromCounts]] consumes —
    * exposed because these counts are ADDITIVE: a drift monitor
    * maintains them incrementally (union + re-sum per batch, the q280
    * persisted-LM contract) and recomputes the statistic from the folded
    * state without ever rescanning the corpus. */
  def categoryCounts(df: DataFrame, catCol: String, armCol: String): DataFrame =
    df.groupBy(col(catCol).as("cat"), col(armCol).as("arm"))
      .agg(count(lit(1)).as("o"))

  /** Fold additive count batches: same shape in, same shape out. */
  def foldCategoryCounts(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "foldCategoryCounts needs at least one batch")
    batches.reduce(_ unionByName _)
      .groupBy("cat", "arm").agg(sum("o").as("o"))
  }

  /** [[chiSquaredDrift]] from a pre-aggregated (cat, arm, o) frame. */
  def chiSquaredFromCounts(obs: DataFrame): DataFrame = {
    val grid = obs.select("cat").distinct()
      .crossJoin(obs.select("arm").distinct())
      .join(obs, Seq("cat", "arm"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val wCat = Window.partitionBy("cat")
    val wArm = Window.partitionBy("arm")
    val wAll = Window.partitionBy()
    val withTot = grid
      .withColumn("rt", sum("o").over(wCat))
      .withColumn("ct", sum("o").over(wArm))
      .withColumn("n", sum("o").over(wAll))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val d = col("o").cast("double") - e
    withTot
      .withColumn("contrib", (d * d / e).cast("decimal(38,18)"))
      .agg(
        sum("contrib").cast("double").as("chi2"),
        ((countDistinct("cat") - 1) * (countDistinct("arm") - 1))
          .cast("long").as("dof"),
        max("n").cast("long").as("n"))
  }

  /** Chi-squared GOODNESS-OF-FIT against a declared distribution (the
    * homogeneity test's one-sample sibling — e.g. Benford's law over
    * leading digits): `expected` (category → permille, summing to 1000)
    * is the category universe, so categories the data never produced
    * still contribute their full expected count. ONE count aggregation;
    * e = n·permille/1000 and (o−e)²/e in a fixed IEEE op order, exact
    * decimal fold. Observed categories outside `expected` fail loudly —
    * silently dropping them would deflate the statistic. */
  def chiSquaredGoodnessOfFit(df: DataFrame, catCol: String,
      expected: Seq[(String, Int)]): DataFrame = {
    require(expected.nonEmpty && expected.map(_._2).sum == 1000 &&
      expected.forall(_._2 > 0),
      "expected permille weights must be positive and sum to 1000")
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df.groupBy(col(catCol).cast("string").as("cat"))
      .agg(count(lit(1)).as("o"))
    val exp = expected.toDF("cat", "permille")
    val bad = obs.join(broadcast(exp), Seq("cat"), "left_anti")
      .agg(count(lit(1)).as("__bad"))
    val grid = broadcast(exp).join(obs, Seq("cat"), "left")
      .crossJoin(broadcast(bad))
      .withColumn("o",
        when(col("__bad") > 0, raise_error(lit(
          "chiSquaredGoodnessOfFit: observed categories outside the " +
            "declared distribution")))
          .otherwise(coalesce(col("o"), lit(0L))))
      .withColumn("n", sum("o").over(Window.partitionBy()))
    val e = col("n").cast("double") * col("permille").cast("double") /
      lit(1000.0)
    val d = col("o").cast("double") - e
    grid
      .withColumn("contrib", (d * d / e).cast("decimal(38,18)"))
      .agg(
        sum("contrib").cast("double").as("chi2"),
        (count(lit(1)) - 1).cast("long").as("dof"),
        max("n").cast("long").as("n"))
  }

  /** Cohen's kappa — chance-corrected agreement between two labelers
    * (heuristic filters, annotators, model versions): ONE confusion
    * aggregation into the bounded \|labels\|² frame, then
    * κ = (p_o − p_e)/(1 − p_e) in a fixed IEEE op order from exact
    * integer counts. Returns one row: kappa, po, pe, n. Null kappa when
    * p_e = 1 (both raters constant — agreement is undefined, not 0). */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val conf = df
      .groupBy(col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("o"))
    // p_e = Σ_k rowtot_k·coltot_k / n² over the label UNIVERSE — a label
    // can be absent from the confusion diagonal while both its marginals
    // exist, so the marginal join must not ride the (a,b) cells.
    val labels = conf.select(col("a").as("k")).union(conf.select(col("b")))
      .distinct()
    val ra = conf.groupBy(col("a").as("k")).agg(sum("o").as("ra"))
    val cb = conf.groupBy(col("b").as("k")).agg(sum("o").as("cb"))
    val diag = labels
      .join(ra, Seq("k"), "left").join(cb, Seq("k"), "left")
      .select(
        coalesce(col("ra"), lit(0L)).as("ra"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .agg(sum(col("ra").cast("decimal(38,0)") * col("cb"))
        .cast("decimal(38,0)").as("sum_racb"))
    val agree = conf.filter(col("a") === col("b"))
      .agg(coalesce(sum("o"), lit(0L)).as("agree"))
    val tot = conf.agg(sum("o").as("n"))
    val j = tot.crossJoin(broadcast(agree)).crossJoin(broadcast(diag))
    val n = col("n").cast("double")
    val po = col("agree").cast("double") / n
    val pe = col("sum_racb").cast("double") / (n * n)
    j.select(
      when(pe < 1.0, (po - pe) / (lit(1.0) - pe)).as("kappa"),
      po.as("po"), pe.as("pe"), col("n").cast("long").as("n"))
  }

  /** Two-sample Kolmogorov–Smirnov D between arm 0 and arm 1 of
    * `armCol` over integer-valued `valueCol`, computed EXACTLY in
    * integers: D = max |cum0·n1 − cum1·n0| / (n0·n1). One conditional
    * count aggregation per distinct value, then cumulative windows over
    * that bounded frame. Returns one row: d_num, n0, n1, d_permille. */
  def ksStatistic(df: DataFrame, valueCol: String, armCol: String): DataFrame = {
    val agg = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(
        count(when(col(armCol) === 0, lit(1))).as("c0"),
        count(when(col(armCol) === 1, lit(1))).as("c1"))
    val wCum = Window.partitionBy().orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    agg
      .withColumn("cum0", sum("c0").over(wCum))
      .withColumn("cum1", sum("c1").over(wCum))
      .withColumn("n0", sum("c0").over(wAll))
      .withColumn("n1", sum("c1").over(wAll))
      .withColumn("gap", abs(col("cum0") * col("n1") - col("cum1") * col("n0")))
      .agg(
        max("gap").cast("long").as("d_num"),
        max("n0").cast("long").as("n0"),
        max("n1").cast("long").as("n1"))
      // Column./ on longs is DOUBLE division — `div` keeps this integer-exact.
      .withColumn("d_permille",
        expr("CAST(d_num * 1000 div (n0 * n1) AS BIGINT)"))
  }

  /** Mutual information I(X;Y) plus marginal entropies H(X), H(Y), in
    * bits. One joint-count aggregation; marginals by windows over the
    * bounded joint frame; per-cell p·log₂ terms in a fixed IEEE op
    * order (ln(x)/ln(2), never log2 — engines' log2 differ), folded as
    * exact decimals. Returns one row: mi_bits, h_x, h_y, n. */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("cxy"))
    val withTot = joint
      .withColumn("cx", sum("cxy").over(Window.partitionBy("x")))
      .withColumn("cy", sum("cxy").over(Window.partitionBy("y")))
      .withColumn("n", sum("cxy").over(Window.partitionBy()))
    def dbl(c: String): Column = col(c).cast("double")
    val ln2 = log(lit(2.0))
    val miTerm = (dbl("cxy") / dbl("n")) *
      (log(dbl("cxy") * dbl("n") / (dbl("cx") * dbl("cy"))) / ln2)
    // H terms divide the per-cell contribution by the marginal count so
    // each (x,y) cell carries its marginal's share — one pass, no
    // second aggregation, and the decimal fold stays order-free.
    val hxTerm = lit(0.0) - (dbl("cx") / dbl("n")) *
      (log(dbl("cx") / dbl("n")) / ln2) * (dbl("cxy") / dbl("cx"))
    val hyTerm = lit(0.0) - (dbl("cy") / dbl("n")) *
      (log(dbl("cy") / dbl("n")) / ln2) * (dbl("cxy") / dbl("cy"))
    withTot
      .withColumn("mi_t", miTerm.cast("decimal(38,18)"))
      .withColumn("hx_t", hxTerm.cast("decimal(38,18)"))
      .withColumn("hy_t", hyTerm.cast("decimal(38,18)"))
      .agg(
        sum("mi_t").cast("double").as("mi_bits"),
        sum("hx_t").cast("double").as("h_x"),
        sum("hy_t").cast("double").as("h_y"),
        max("n").cast("long").as("n"))
  }

  /** Population Stability Index between arm 0 and arm 1 of `armCol`:
    * PSI = Σ_bins (p₀ − p₁)·ln(p₀/p₁) over a DECLARED fixed grid
    * ([lo, hi) split into `bins` equal cells, outliers clamped into the
    * edge cells — the quantile-sketch domain discipline, so any engine
    * bins identically), with add-one count smoothing so empty cells are
    * defined (documented; the industry convention). One count
    * aggregation; per-bin ln terms in a fixed IEEE op order folded as
    * exact decimals. Rule of thumb: < 0.1 stable, > 0.25 shifted. */
  def populationStabilityIndex(df: DataFrame, valueCol: String,
      armCol: String, bins: Int, lo: Long, hi: Long): DataFrame = {
    require(bins >= 2 && hi > lo, "populationStabilityIndex needs bins >= 2, hi > lo")
    val width = (hi - lo + bins - 1) / bins // ceil: covers [lo, hi)
    // integer div, not Column./ (double division on longs)
    val bin = least(greatest(
      expr(s"(CAST($valueCol AS BIGINT) - ${lo}L) div ${width}L"),
      lit(0L)), lit(bins - 1L)).cast("long")
    val counts = df.filter(col(valueCol).isNotNull)
      .withColumn("__bin", bin)
      .groupBy("__bin")
      .agg(
        count(when(col(armCol) === 0, lit(1))).as("c0"),
        count(when(col(armCol) === 1, lit(1))).as("c1"))
    val wAll = Window.partitionBy()
    val withTot = counts
      .withColumn("n0", sum("c0").over(wAll))
      .withColumn("n1", sum("c1").over(wAll))
    def p(cc: String, nn: String): Column =
      (col(cc).cast("double") + lit(1.0)) /
        (col(nn).cast("double") + lit(bins.toDouble))
    val p0 = p("c0", "n0")
    val p1 = p("c1", "n1")
    withTot
      .withColumn("term", ((p0 - p1) * log(p0 / p1)).cast("decimal(38,18)"))
      .agg(
        sum("term").cast("double").as("psi"),
        max("n0").cast("long").as("n0"),
        max("n1").cast("long").as("n1"),
        count(lit(1)).as("n_occupied_bins"))
  }

  /** EXACT ROC AUC by the Mann–Whitney rank statistic — no curve
    * interpolation, no float ranks: one count aggregation per distinct
    * score, a cumulative window over that bounded frame
    * (the [[ksStatistic]] skeleton), then
    * AUC = (2·wins + ties) / (2·n₊·n₋) entirely in integers (ties get
    * the standard half credit without ever leaving ℤ — everything is
    * scaled by 2). Returns one row: auc_num, auc_denom, auc_permille,
    * n_pos, n_neg. */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val agg = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("v"))
      .agg(
        count(when(col(labelCol).cast("boolean"), lit(1))).as("p"),
        count(when(!col(labelCol).cast("boolean"), lit(1))).as("q"))
    val wBelow = Window.partitionBy().orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    agg
      .withColumn("negs_below", coalesce(sum("q").over(wBelow), lit(0L)))
      .agg(
        sum(col("p") * col("negs_below")).as("__wins"),
        sum(col("p") * col("q")).as("__ties"),
        sum("p").as("n_pos"),
        sum("q").as("n_neg"))
      .select(
        (col("__wins") * 2 + col("__ties")).cast("long").as("auc_num"),
        (col("n_pos") * col("n_neg") * 2).cast("long").as("auc_denom"),
        expr("CAST((__wins * 2 + __ties) * 1000 div (n_pos * n_neg * 2) " +
          "AS BIGINT)").as("auc_permille"),
        col("n_pos").cast("long").as("n_pos"),
        col("n_neg").cast("long").as("n_neg"))
  }

  /** Cramér's V — the [0,1] effect size that makes chi-squared
    * comparable across table sizes: V = √(χ²/(n·(min(r,c)−1))) from
    * [[chiSquaredFromCounts]]'s exact machinery plus one dimension
    * count, in a fixed IEEE op order. The drift DASHBOARD number (χ²
    * grows with n even for trivial shifts; V does not). */
  def cramersV(df: DataFrame, catCol: String, armCol: String): DataFrame = {
    val counts = categoryCounts(df, catCol, armCol)
    val chi2 = chiSquaredFromCounts(counts)
    val dims = counts.agg(
      countDistinct("cat").cast("long").as("r"),
      countDistinct("arm").cast("long").as("c"))
    chi2.crossJoin(broadcast(dims))
      .select(
        sqrt(col("chi2") /
          (col("n").cast("double") *
            (least(col("r"), col("c")) - 1L).cast("double"))).as("v"),
        col("chi2"), col("n"), col("r"), col("c"))
  }

  /** Poisson-bootstrap confidence interval for the mean (the bootstrap
    * that works in one distributed pass — Poisson(1) multiplicities
    * approximate with-replacement resampling, the standard trick at
    * scale): each row contributes to each of `b` replicates with a
    * DETERMINISTIC keyed-hash multiplicity (inverse-CDF thresholds on a
    * permille uniform — engine-portable, seed-stable), replicate means
    * come from exact-decimal sums in a fixed IEEE op order, and the CI
    * is an order-statistic pick over the sorted replicate means (2.5%
    * and 97.5% by integer index). One exploded pass (b× the input — keep
    * b modest), one b-row aggregation, one 1-row fold. */
  def poissonBootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
      b: Int = 40, seed: Long = 7L): DataFrame = {
    require(b >= 4 && b <= 1000, "poissonBootstrapMeanCI needs 4 <= b <= 1000")
    // Poisson(1) inverse CDF at permille resolution:
    // P(0)=.368 P(<=1)=.736 P(<=2)=.920 P(<=3)=.981 P(<=4)=.996
    val u = conv(substring(sha2(concat_ws("#",
      col(idCol).cast("string"), lit(seed.toString),
      col("__b").cast("string")), 256), 1, 8), 16, 10)
      .cast("long") % 1000
    val w = when(u < 368, 0L).when(u < 736, 1L).when(u < 920, 2L)
      .when(u < 981, 3L).when(u < 996, 4L).otherwise(5L)
    val reps = df.filter(col(valueCol).isNotNull)
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__w", w)
      .groupBy("__b")
      .agg(
        sum((col("__w") * col(valueCol).cast("decimal(18,6)"))
          .cast("decimal(38,18)")).as("__swx"),
        sum("__w").as("__sw"))
      .filter(col("__sw") > 0L)
      .select((col("__swx").cast("double") / col("__sw").cast("double"))
        .as("mean_b"))
    val loIdx = b * 25 / 1000
    val hiIdx = math.min(b * 975 / 1000, b - 1)
    reps.agg(sort_array(collect_list("mean_b")).as("ms"),
        count(lit(1)).as("n_reps"))
      .select(
        element_at(col("ms"), loIdx + 1).as("ci_lo"),
        element_at(col("ms"), hiIdx + 1).as("ci_hi"),
        col("n_reps").cast("long").as("n_reps"))
  }

  /** Heaps' law fit — vocabulary growth V(n) ≈ K·n^β over the corpus in
    * `idCol` order ([[zipfFit]]'s companion diagnostic; natural text fits
    * β ≈ 0.4–0.6, machine-generated or duplicated corpora bend the
    * curve): per-token first-occurrence doc and per-doc token counts are
    * two aggregations; cumulative (n, V) checkpoints live on the
    * |docs|-bounded frame; the ln-ln least squares reuses the exact-
    * decimal moment recipe. Returns one row: n_points, beta, ln_k. */
  def heapsFit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df
      .select(col(idCol).cast("long").as("doc"),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val perDoc = tok.groupBy("doc").agg(count(lit(1)).as("toks"))
    val firstSeen = tok.groupBy("tok").agg(min("doc").as("doc"))
      .groupBy("doc").agg(count(lit(1)).as("vnew"))
    val wCum = Window.partitionBy().orderBy("doc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perDoc.join(firstSeen, Seq("doc"), "left")
      .withColumn("n", sum("toks").over(wCum))
      .withColumn("v", sum(coalesce(col("vnew"), lit(0L))).over(wCum))
      .filter(col("n") > 0L && col("v") > 0L)
    val x = log(col("n").cast("double"))
    val y = log(col("v").cast("double"))
    val m = pts
      .withColumn("sx", x.cast("decimal(38,18)"))
      .withColumn("sy", y.cast("decimal(38,18)"))
      .withColumn("sxy", (x * y).cast("decimal(38,18)"))
      .withColumn("sxx", (x * x).cast("decimal(38,18)"))
      .agg(
        count(lit(1)).as("n_points"),
        sum("sx").cast("double").as("__sx"),
        sum("sy").cast("double").as("__sy"),
        sum("sxy").cast("double").as("__sxy"),
        sum("sxx").cast("double").as("__sxx"))
    val np = col("n_points").cast("double")
    val beta = (np * col("__sxy") - col("__sx") * col("__sy")) /
      (np * col("__sxx") - col("__sx") * col("__sx"))
    m.withColumn("beta", beta)
      .withColumn("ln_k", (col("__sy") - beta * col("__sx")) / np)
      .select(col("n_points").cast("long").as("n_points"),
        col("beta"), col("ln_k"))
  }

  /** Per-slice accuracy with a Wilson score interval (the CI that
    * behaves at small n and extreme p̂, unlike the normal approximation):
    * ONE conditional-count aggregation per slice, then the closed-form
    * interval in a fixed IEEE op order from the exact integer counts.
    * The slice whose lower bound dips is the one that needs data — the
    * fairness/robustness readout per language or source. z defaults to
    * 1.96 (95%). */
  def sliceAccuracyWilson(df: DataFrame, sliceCol: String,
      correctCol: String, z: Double = 1.96): DataFrame = {
    val agg = df.filter(col(correctCol).isNotNull)
      .groupBy(col(sliceCol).as("slice"))
      .agg(count(lit(1)).as("n"),
        count(when(col(correctCol).cast("boolean"), lit(1))).as("k"))
    val n = col("n").cast("double")
    val p = col("k").cast("double") / n
    val z2 = z * z
    val denom = lit(1.0) + lit(z2) / n
    val center = (p + lit(z2) / (lit(2.0) * n)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / n +
      lit(z2) / (lit(4.0) * n * n))) / denom
    agg.select(col("slice"), col("n").cast("long").as("n"),
      expr("(k * 1000) div n").as("acc_permille"),
      (center - half).as("wilson_lo"),
      (center + half).as("wilson_hi"))
  }

  /** Zipf power-law fit over the token-frequency spectrum: least-squares
    * slope/intercept of ln(freq) on ln(rank) for the `topR` most frequent
    * whitespace tokens (rank ties broken by token text — deterministic).
    * One vocabulary aggregation; the rank window's input is bounded by
    * the Aggregate; moment sums are exact decimals. A healthy natural
    * corpus fits slope ≈ −1. Returns one row: n_terms, slope, intercept. */
  def zipfFit(df: DataFrame, textCol: String, topR: Int = 500): DataFrame = {
    val counts = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val ranked = counts
      .withColumn("rank", row_number().over(
        Window.partitionBy().orderBy(col("cnt").desc, col("tok").asc)))
      .filter(col("rank") <= topR)
    val x = log(col("rank").cast("double"))
    val y = log(col("cnt").cast("double"))
    val m = ranked
      .withColumn("sx", x.cast("decimal(38,18)"))
      .withColumn("sy", y.cast("decimal(38,18)"))
      .withColumn("sxy", (x * y).cast("decimal(38,18)"))
      .withColumn("sxx", (x * x).cast("decimal(38,18)"))
      .agg(
        count(lit(1)).as("n_terms"),
        sum("sx").cast("double").as("__sx"),
        sum("sy").cast("double").as("__sy"),
        sum("sxy").cast("double").as("__sxy"),
        sum("sxx").cast("double").as("__sxx"))
    val n = col("n_terms").cast("double")
    val slope = (n * col("__sxy") - col("__sx") * col("__sy")) /
      (n * col("__sxx") - col("__sx") * col("__sx"))
    m
      .withColumn("slope", slope)
      .withColumn("intercept", (col("__sy") - slope * col("__sx")) / n)
      .select(col("n_terms").cast("long").as("n_terms"),
        col("slope"), col("intercept"))
  }
}
