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

  /** Cliff's delta — the ordinal effect size behind [[rocAuc]]'s rank
    * statistic: δ = (#(x₁>x₀) − #(x₁<x₀)) / (n₁·n₀) over all cross-arm
    * pairs, computed EXACTLY from one count-per-distinct-value
    * aggregation plus cumulative windows over that bounded frame — never
    * the n₁·n₀ pair join. δ = 2·AUC − 1 algebraically, but reported in
    * its own [−1, 1] convention (|δ| < .147 negligible, < .33 small,
    * < .474 medium — Romano et al. 2006). Integer division is applied to
    * |num| then re-signed so Spark's `div` (truncation) and any oracle's
    * floor division agree on negatives. */
  def cliffsDelta(df: DataFrame, valueCol: String, armCol: String): DataFrame = {
    val agg = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(
        count(when(col(armCol) === 0, lit(1))).as("c0"),
        count(when(col(armCol) === 1, lit(1))).as("c1"))
    val wBelow = Window.partitionBy().orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    agg
      .withColumn("below0", coalesce(sum("c0").over(wBelow), lit(0L)))
      .withColumn("n0", sum("c0").over(wAll))
      .agg(
        sum(col("c1") * col("below0")).as("__wins"),
        sum(col("c1") * (col("n0") - col("below0") - col("c0"))).as("__losses"),
        sum("c1").as("n1"),
        max("n0").as("n0"))
      .select(
        (col("__wins") - col("__losses")).cast("long").as("delta_num"),
        (col("n1") * col("n0")).cast("long").as("delta_denom"),
        (signum(col("__wins") - col("__losses")).cast("long") *
          expr("CAST(abs(__wins - __losses) * 1000 div (n1 * n0) AS BIGINT)"))
          .cast("long").as("delta_permille"),
        col("n1").cast("long").as("n1"),
        col("n0").cast("long").as("n0"))
  }

  /** Spearman rank correlation ρ between two columns, EXACT through the
    * rank stage: average ranks are held as integers scaled by 2 (a tie
    * group's average rank is always a multiple of ½), computed from one
    * count-per-distinct-value aggregation per column + a cumulative
    * window over that frame, joined back to the rows; Pearson's
    * moments over the scaled ranks accumulate as DECIMAL(38,0) — exact —
    * and only the final ρ = num/(√d₁·√d₂) leaves ℤ, in a fixed IEEE op
    * order. No float ranks, no per-row global window. The cumulative
    * frame is \|distinct values\| rows — for continuous columns at corpus
    * scale, quantize first (the [[populationStabilityIndex]] fixed-grid
    * discipline) so the frame stays bounded. */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("__x"), col(yCol).as("__y"))
    // (distinct value -> 2·avg-rank) frame: 2·belowCount + count + 1
    def rank2(c: String, out: String): DataFrame = {
      val wBelow = Window.partitionBy().orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      base.groupBy(col(c).as("v")).agg(count(lit(1)).as("c"))
        .withColumn(out,
          lit(2L) * coalesce(sum("c").over(wBelow), lit(0L)) + col("c") + 1L)
        .select(col("v").as(c), col(out))
    }
    val j = base
      .join(rank2("__x", "r2x"), Seq("__x"))
      .join(rank2("__y", "r2y"), Seq("__y"))
    val m = j.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("r2x").cast("decimal(38,0)")).as("sx"),
      sum(col("r2y").cast("decimal(38,0)")).as("sy"),
      sum((col("r2x") * col("r2y")).cast("decimal(38,0)")).as("sxy"),
      sum((col("r2x") * col("r2x")).cast("decimal(38,0)")).as("sxx"),
      sum((col("r2y") * col("r2y")).cast("decimal(38,0)")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val d1 = col("n") * col("sxx") - col("sx") * col("sx")
    val d2 = col("n") * col("syy") - col("sy") * col("sy")
    m.select(
      when(d1 > 0 && d2 > 0,
        num.cast("double") / (sqrt(d1.cast("double")) * sqrt(d2.cast("double"))))
        .as("rho"),
      col("n").cast("long").as("n"))
  }

  /** Kruskal–Wallis H — "does `valueCol`'s distribution differ across
    * the groups of `groupCol`?", the k-sample generalization of the
    * rank tests above. Tie-averaged ranks are exact 2×-scaled integers
    * from one count-per-distinct-value aggregation + a cumulative window
    * over that frame; per-group rank sums are exact; with the ×2
    * scaling, H = 3·Σ(S_j²/n_j)/(N(N+1)) − 3(N+1), each S_j²/n_j term a
    * single IEEE division of exact integers folded as exact decimals.
    * The tie-correction factor C = 1 − Σ(t³−t)/(N³−N) comes from the
    * same value-counts frame; h_corrected = h/C. Returns one row:
    * h, h_corrected, dof, n. */
  def kruskalWallis(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(valueCol).as("__v"), col(groupCol).as("__g"))
    val counts = base.groupBy(col("__v").as("v")).agg(count(lit(1)).as("c"))
    val wBelow = Window.partitionBy().orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = counts
      .withColumn("r2",
        lit(2L) * coalesce(sum("c").over(wBelow), lit(0L)) + col("c") + 1L)
    val tie = ranks.agg(
      sum(col("c") * col("c") * col("c") - col("c")).as("tie_num"),
      sum("c").as("n"))
    val perGroup = base.join(ranks.select(col("v").as("__v"), col("r2")), Seq("__v"))
      .groupBy("__g")
      .agg(sum("r2").as("s2"), count(lit(1)).as("nj"))
    // S_j (unscaled rank sum) = s2/2; Σ S_j²/n_j = Σ s2²/(4·n_j)
    val terms = perGroup
      .withColumn("term",
        ((col("s2").cast("decimal(38,0)") * col("s2")).cast("double") /
          col("nj").cast("double")).cast("decimal(38,18)"))
      .agg(sum("term").cast("double").as("sum_terms"),
        count(lit(1)).as("k"))
    val j = terms.crossJoin(broadcast(tie))
    val nD = col("n").cast("double")
    // Σ S_j²/n_j = sum_terms/4 (S_j = s2_j/2), so the 12/(N(N+1)) factor
    // folds to 3/(N(N+1)) against the unscaled sum.
    val h = lit(3.0) * col("sum_terms") / (nD * (nD + 1.0)) -
      lit(3.0) * (nD + 1.0)
    j.select(
      h.as("h"),
      when(col("tie_num") < col("n") * col("n") * col("n") - col("n"),
        h / (lit(1.0) - col("tie_num").cast("double") /
          (nD * nD * nD - nD)))
        .as("h_corrected"),
      (col("k") - 1).cast("long").as("dof"),
      col("n").cast("long").as("n"))
  }

  /** Gini concentration coefficient of `valueCol` within each group —
    * "how unevenly is corpus volume spread across this slice?" (0 =
    * perfectly even, →1 = one member holds everything). EXACT in
    * integers: with values sorted ascending inside each group and
    * 1-indexed by row_number, G·(n·Σx) = 2·Σ(i·xᵢ) − (n+1)·Σx — the
    * Σ(i·xᵢ) sum is invariant to how row_number breaks ties between
    * equal values, so no tie-break column is needed and any engine
    * reproduces it. One window shuffle on the group key, one
    * aggregation. Requires non-negative values (checked). */
  def giniConcentration(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val w = Window.partitionBy("__g").orderBy("__v")
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        when(col(valueCol) < 0, raise_error(lit(
          "giniConcentration requires non-negative values")))
          .otherwise(col(valueCol)).cast("long").as("__v"))
      .withColumn("__i", row_number().over(w))
      .groupBy(col("__g").as("group"))
      .agg(
        count(lit(1)).as("n"),
        sum("__v").as("total"),
        sum(col("__i") * col("__v")).as("__ws"))
      .filter(col("total") > 0L)
      .select(
        col("group"), col("n").cast("long").as("n"),
        col("total").cast("long").as("total"),
        expr("CAST((2 * __ws - (n + 1) * total) * 1000 div (n * total) " +
          "AS BIGINT)").as("gini_permille"))
  }

  /** Mann–Kendall trend test over a pre-aggregated time series (one row
    * per period — ingest volume per day, mean quality per week): S =
    * Σ_{i<j} sign(v_j − v_i), EXACT by a self-join over the bounded
    * period frame (never the raw rows — aggregate first; duplicate
    * periods are refused loudly). The tie-corrected variance is kept as
    * the exact integer 18·Var = m(m−1)(2m+5) − Σt(t−1)(2t+5); only the
    * final z (with the standard ±1 continuity correction) leaves ℤ.
    * Returns one row: s, m, var18, z. */
  def mannKendallTrend(series: DataFrame, tCol: String, vCol: String): DataFrame = {
    val wT = Window.partitionBy(col(tCol))
    val base = series
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .withColumn("__dup", count(lit(1)).over(wT))
      .withColumn("__v",
        when(col("__dup") > 1, raise_error(lit(
          "mannKendallTrend needs one row per period — aggregate first")))
          .otherwise(col(vCol)))
      .select(col(tCol).as("__t"), col("__v"))
    val a = base.select(col("__t").as("ta"), col("__v").as("va"))
    val b = base.select(col("__t").as("tb"), col("__v").as("vb"))
    val s = a.join(b, col("ta") < col("tb"))
      .agg(coalesce(sum(signum(col("vb") - col("va")).cast("long")), lit(0L))
        .as("s"))
    val ties = base.groupBy("__v").agg(count(lit(1)).as("c"))
      .agg(
        sum(col("c") * (col("c") - 1) * (lit(2L) * col("c") + 5)).as("tie18"),
        sum("c").as("m"))
    s.crossJoin(broadcast(ties))
      .withColumn("var18",
        col("m") * (col("m") - 1) * (lit(2L) * col("m") + 5) - col("tie18"))
      .select(
        col("s").cast("long").as("s"),
        col("m").cast("long").as("m"),
        col("var18").cast("long").as("var18"),
        when(col("var18") <= 0L, lit(null).cast("double"))
          .when(col("s") > 0L,
            (col("s").cast("double") - 1.0) /
              sqrt(col("var18").cast("double") / 18.0))
          .when(col("s") < 0L,
            (col("s").cast("double") + 1.0) /
              sqrt(col("var18").cast("double") / 18.0))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Jensen–Shannon divergence (bits) between the `catCol` distributions
    * of arm 0 and arm 1 — the SYMMETRIC, always-finite drift distance
    * (KL blows up on cells one side lacks; JSD ≤ 1 bit and handles them
    * natively, no smoothing needed — cf. [[populationStabilityIndex]]).
    * One count aggregation into the bounded category frame; per-cell
    * p·log₂(p/mix) terms in a fixed IEEE op order (ln/ln2), zero-count
    * sides contribute exactly 0, exact decimal fold. Returns one row:
    * jsd_bits, n0, n1, n_cats. */
  def jensenShannon(df: DataFrame, catCol: String, armCol: String): DataFrame = {
    val counts = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("cat"))
      .agg(
        count(when(col(armCol) === 0, lit(1))).as("c0"),
        count(when(col(armCol) === 1, lit(1))).as("c1"))
    val wAll = Window.partitionBy()
    val withTot = counts
      .withColumn("n0", sum("c0").over(wAll))
      .withColumn("n1", sum("c1").over(wAll))
    val ln2 = log(lit(2.0))
    val p0 = col("c0").cast("double") / col("n0").cast("double")
    val p1 = col("c1").cast("double") / col("n1").cast("double")
    val mix = (p0 + p1) / lit(2.0)
    val term =
      when(col("c0") > 0L, lit(0.5) * p0 * (log(p0 / mix) / ln2))
        .otherwise(lit(0.0)) +
      when(col("c1") > 0L, lit(0.5) * p1 * (log(p1 / mix) / ln2))
        .otherwise(lit(0.0))
    withTot
      .withColumn("term", term.cast("decimal(38,18)"))
      .agg(
        sum("term").cast("double").as("jsd_bits"),
        max("n0").cast("long").as("n0"),
        max("n1").cast("long").as("n1"),
        count(lit(1)).as("n_cats"))
  }

  /** Kendall τ-b between two ORDINAL columns, EXACT in integers: one
    * count aggregation into the \|x\|×\|y\| cell grid, then concordant/
    * discordant pair sums by a self-join over that bounded grid (each
    * unordered pair counted once via the strictly-greater corner) — the
    * O(n²) pair space never materializes, only the grid². Tie terms come
    * from the grid's marginals; τ-b = (C−D)/√((n₀−t_x)(n₀−t_y)) is the
    * single IEEE step. For continuous columns, quantize to a grid first
    * (the [[populationStabilityIndex]] discipline) — the grid must stay
    * bounded. Returns one row: concordant, discordant, tau_b, n. */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val grid = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
    val a = grid.select(col("x").as("ax"), col("y").as("ay"), col("c").as("ca"))
    val b = grid.select(col("x").as("bx"), col("y").as("by"), col("c").as("cb"))
    val pairs = a.join(b, col("ax") < col("bx"))
      .agg(
        coalesce(sum(when(col("ay") < col("by"), col("ca") * col("cb"))
          .otherwise(0L)), lit(0L)).as("concordant"),
        coalesce(sum(when(col("ay") > col("by"), col("ca") * col("cb"))
          .otherwise(0L)), lit(0L)).as("discordant"))
    // Column./ on longs is DOUBLE division — `div` keeps the tie/pair
    // counts integer-exact end to end.
    val tx = grid.groupBy("x").agg(sum("c").as("nx"))
      .agg(sum(expr("nx * (nx - 1) div 2")).as("tx"))
    val ty = grid.groupBy("y").agg(sum("c").as("ny"))
      .agg(sum(expr("ny * (ny - 1) div 2")).as("ty"))
    val n = grid.agg(sum("c").as("n"))
    val j = pairs.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(n))
      .withColumn("n0", expr("n * (n - 1) div 2"))
    val denom = ((col("n0") - col("tx")).cast("decimal(38,0)") *
      (col("n0") - col("ty"))).cast("decimal(38,0)")
    j.select(
      col("concordant").cast("long").as("concordant"),
      col("discordant").cast("long").as("discordant"),
      when(denom > 0,
        (col("concordant") - col("discordant")).cast("double") /
          sqrt(denom.cast("double"))).as("tau_b"),
      col("n").cast("long").as("n"))
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

  /** Fleiss' kappa — chance-corrected agreement among a FIXED number of
    * raters per item (the multi-rater generalization of [[cohensKappa]];
    * Fleiss 1971), the statistic an annotation pipeline reads before
    * trusting a labeled training set. One (item, category) count
    * aggregation; every term is integer from there: with S2 = ΣΣ n_ij²,
    * A = S2 − N·n, D1 = N·n·(n−1), C = Σ_j c_j², D2 = (N·n)²,
    * κ = (A·D2 − C·D1) / (D1·(D2 − C)) — exact integers folded as
    * DECIMAL(38,0), one IEEE division at the end plus the exact
    * numerator/denominator for bit-level comparison. Refuses loudly when
    * items carry unequal rating counts (Fleiss is undefined there —
    * silently averaging would fabricate agreement); the check is one
    * 1-row aggregate over the already-bounded per-item frame. */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String): DataFrame = {
    val cnt = df.filter(col(itemCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(catCol).as("__c"))
      .agg(count(lit(1)).as("n_ij"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val per = cnt.groupBy("__i").agg(
      sum("n_ij").as("__n"),
      sum(col("n_ij") * col("n_ij")).as("__s2i"))
    val guard = per.agg(min("__n").as("lo"), max("__n").as("hi")).head()
    require(guard.getLong(0) == guard.getLong(1),
      s"fleissKappa requires a constant rater count per item; saw " +
        s"${guard.getLong(0)}..${guard.getLong(1)}")
    val items = per.agg(
      count(lit(1)).cast("decimal(38,0)").as("nn_items"),
      max("__n").cast("decimal(38,0)").as("n_raters"),
      sum("__s2i").cast("decimal(38,0)").as("s2"))
    val cats = cnt.groupBy("__c").agg(sum("n_ij").as("cj"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n_cats"),
        sum(col("cj").cast("decimal(38,0)") * col("cj")).as("csq"))
    val a = col("s2") - col("nn_items") * col("n_raters")
    val d1 = col("nn_items") * col("n_raters") * (col("n_raters") - 1)
    val d2 = col("nn_items") * col("n_raters") *
      (col("nn_items") * col("n_raters"))
    items.crossJoin(cats)
      .select(
        (a * d2 - col("csq") * d1).as("__num"),
        (d1 * (d2 - col("csq"))).as("__den"),
        col("nn_items"), col("n_raters"), col("n_cats"))
      .select(
        when(col("__den") =!= 0,
          col("__num").cast("double") / col("__den").cast("double"))
          .as("kappa"),
        col("__num").cast("long").as("kappa_num"),
        col("__den").cast("long").as("kappa_den"),
        col("nn_items").cast("long").as("n_items"),
        col("n_raters").cast("long").as("n_raters"),
        col("n_cats").cast("long").as("n_categories"))
  }

  /** Per-group two-sided PERMUTATION test of "does arm 1 have different
    * `valueCol` totals than chance?" — the exact-arithmetic alternative
    * to parametric p-values (no erf, no t-distribution: nothing an
    * independent engine could round differently). For each group and
    * each permutation p ∈ 1..m the arm labels are reshuffled by the
    * deterministic sha key `sha2(id '#' p)` (the [[Packing]] shuffle
    * discipline): the n1 rows ranked first form the permuted arm 1. The
    * two-sided exceedance compares |T·n − n1·S| ≥ |obs·n − n1·S| — the
    * mean-difference inequality cleared of divisions, so the whole test
    * is INTEGER end to end; the reported p uses the add-one convention
    * (count+1)/(m+1), in permille.
    *
    * Scale shape: the corpus is exploded m× (m is the caller's budget
    * knob) into one (group, perm) ranking shuffle and one partial-
    * aggregated exceedance count — never a driver loop over
    * permutations; group stats broadcast. */
  def permutationTestPerGroup(df: DataFrame, groupCol: String,
      idCol: String, valueCol: String, armCol: String,
      m: Int = 64): DataFrame = {
    require(m >= 1, s"permutationTestPerGroup: m must be >= 1, got $m")
    val base = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        col(armCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        col(valueCol).cast("long").as("__v"),
        col(armCol).cast("int").as("__arm"))
    // a two-sample test needs both arms non-empty; degenerate groups are
    // dropped (not given a fabricated p) — the filter also semi-joins
    // them out of the permutation explosion via the stats join below
    val stats = base.groupBy("__g").agg(
        count(lit(1)).as("n"),
        sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum("__v").as("s"),
        sum(when(col("__arm") === 1, col("__v")).otherwise(0L)).as("obs"))
      .filter(col("n1") > 0 && col("n1") < col("n"))
    val perms = base
      .withColumn("__p", explode(sequence(lit(1), lit(m))))
      .withColumn("__key",
        conv(substring(sha2(concat_ws("#", col("__id").cast("string"),
          col("__p").cast("string")), 256), 1, 15), 16, 10)
          .cast("long"))
    val w = Window.partitionBy("__g", "__p").orderBy(col("__key"),
      col("__id"))
    val permStats = perms
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(stats.select(col("__g"), col("n1"))), Seq("__g"))
      .filter(col("__rn") <= col("n1"))
      .groupBy("__g", "__p").agg(sum("__v").as("t"))
    permStats
      .join(broadcast(stats), Seq("__g"))
      .groupBy(col("__g").as("grp"))
      .agg(
        max("n").as("n"), max("n1").as("n1"), max("obs").as("obs_sum"),
        sum(when(
          abs(col("t") * col("n") - col("n1") * col("s")) >=
            abs(col("obs") * col("n") - col("n1") * col("s")),
          1L).otherwise(0L)).as("__exceed"))
      .select(col("grp"), col("n"), col("n1"), col("obs_sum"),
        col("__exceed").as("n_exceed"), lit(m.toLong).as("m"),
        expr(s"CAST((__exceed + 1) * 1000 div ${m + 1} AS BIGINT)")
          .as("p_permille"))
  }

  /** Benjamini–Hochberg step-up FDR correction over a frame of rational
    * p-values (num/den — chains losslessly from
    * [[permutationTestPerGroup]]'s add-one counts): rank tests by
    * ascending p, find the largest k with p_k ≤ (k/m)·α, reject ranks
    * 1..k. The decision inequality is cleared of divisions —
    * p_num·m·1000 ≤ k·α_permille·p_den — so rejection is INTEGER-exact;
    * the sort key p_num/p_den is one deterministic IEEE division,
    * tie-broken by id. The input is a per-TEST frame (bounded — one row
    * per hypothesis, never per data row), so the global window is over
    * |tests| rows by construction. */
  def benjaminiHochberg(df: DataFrame, idCol: String, pNumCol: String,
      pDenCol: String, alphaPermille: Int = 50): DataFrame = {
    val mTests = Window.partitionBy()
    val byP = Window.partitionBy().orderBy(
      (col("p_num").cast("double") / col("p_den").cast("double")).asc,
      col(idCol).asc)
    df.select(col(idCol), col(pNumCol).cast("long").as("p_num"),
        col(pDenCol).cast("long").as("p_den"))
      .withColumn("m_tests", count(lit(1)).over(mTests))
      .withColumn("p_rank", row_number().over(byP))
      .withColumn("__ok",
        col("p_num") * col("m_tests") * 1000L <=
          col("p_rank") * lit(alphaPermille.toLong) * col("p_den"))
      .withColumn("__kmax",
        coalesce(max(when(col("__ok"), col("p_rank"))).over(mTests),
          lit(0L)))
      .select(col(idCol), col("p_num"), col("p_den"),
        col("p_rank").cast("long").as("p_rank"),
        col("m_tests").cast("long").as("m_tests"),
        (col("p_rank") <= col("__kmax")).as("rejected"))
  }

  /** Winsorized mean per group: values clamped at the exact lo/hi
    * rank-percentiles (rank = ceil(n·p/1000), the [[Sketches]] rank
    * convention) before averaging — the robust mean that keeps its
    * units, where a trimmed mean changes n and a plain mean hands one
    * outlier the whole report. Percentile bounds come from a cumulative
    * window over the per-group count-per-distinct-value frame; the
    * clamped sum folds exactly (integer values × counts, DECIMAL(38,0));
    * ONE IEEE division ends it. Quantize continuous columns first so
    * the value frame stays bounded. */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
      loPermille: Int = 50, hiPermille: Int = 950): DataFrame = {
    require(loPermille >= 1 && hiPermille <= 1000 &&
      loPermille < hiPermille, "winsorizedMean needs 1 <= lo < hi <= 1000")
    val counts = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("grp")
    val ranked = counts
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
    val bounds = ranked
      .groupBy("grp")
      .agg(
        max("n").as("n"),
        min(when(col("cum") >=
          expr(s"(n * $loPermille + 999) div 1000"), col("v")))
          .as("lo_val"),
        min(when(col("cum") >=
          expr(s"(n * $hiPermille + 999) div 1000"), col("v")))
          .as("hi_val"))
    counts.join(bounds, Seq("grp"))
      .select(col("grp"), col("n"), col("lo_val"), col("hi_val"),
        (col("c") * least(greatest(col("v"), col("lo_val")),
          col("hi_val"))).cast("decimal(38,0)").as("__cs"),
        (col("c") * col("v")).cast("decimal(38,0)").as("__rs"))
      .groupBy("grp")
      .agg(max("n").as("n"), max("lo_val").as("lo_val"),
        max("hi_val").as("hi_val"),
        sum("__cs").as("__wsum"), sum("__rs").as("__rsum"))
      .select(col("grp"), col("n"), col("lo_val"), col("hi_val"),
        col("__wsum").cast("long").as("winsorized_sum"),
        (col("__wsum").cast("double") / col("n").cast("double"))
          .as("winsorized_mean"),
        (col("__rsum").cast("double") / col("n").cast("double"))
          .as("raw_mean"))
  }

  /** Scaled-long conversion with EXACT BigDecimal HALF_UP semantics at
    * 10^scale over the double's SHORTEST-DECIMAL rendering
    * (`BigDecimal.valueOf`, i.e. `Double.toString`) — the same value
    * Spark's double→DECIMAL cast and DuckDB's round() see, so 0.145 at
    * scale 2 is 15 in all three engines (the binary-exact expansion
    * 0.14499… would say 14). BigDecimal is spent only on ambiguity: the
    * double fast path (Math.round of d·10^scale) is provably equal to
    * the decimal cast whenever the scaled fraction is far from the .5
    * boundary, and within the 1e-6 guard window (FP error at the
    * contract magnitude |v| ≤ 2.3·10⁷ is < 1e-7) the exact slow path
    * decides — including true dyadic ties like 0.125, which HALF_UP
    * sends away from zero while Math.round would send toward +∞. */
  private[ext] def scaledLongExact(d: Double, pow10: Double,
      scale: Int): Long = {
    val x = d * pow10
    if (!java.lang.Double.isFinite(x))
      throw new ArithmeticException(
        s"correlationMatrix: non-finite value $d cannot scale to long")
    val frac = x - Math.floor(x)
    val v =
      if (Math.abs(frac - 0.5) < 1e-6)
        // valueOf (shortest-decimal-string) — the semantics Spark's
        // double→DECIMAL cast and DuckDB's round() apply, NOT the exact
        // binary expansion `new BigDecimal(d)` (0.145 at scale 2 is 15
        // via valueOf, 14 via the binary-exact value)
        java.math.BigDecimal.valueOf(d)
          .setScale(scale, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
      else Math.round(x)
    v
  }

  /** Pairwise Pearson correlation matrix over integer-scaled columns in
    * ONE scan — k columns fold k + k(k+1)/2 exact moments (never k²
    * passes), then each upper-triangle cell spends its one IEEE step.
    * The moments accumulate as primitive LONGS in a mapPartitions
    * kernel (one flat array per task, no hash-aggregate probing — the
    * q307 sorted-run precedent; measured 6× the HashAggregate
    * formulation at sf0.1), spilled to an output row every 8192 rows so
    * every partial is provably bounded: |x| ≤ 2.3·10⁷ → Σ ≤
    * 8192·(2.3·10⁷)² ≈ 4.3·10¹⁸ < 2⁶³−1; beyond that the kernel throws
    * loudly — re-scale first. Only the tiny one-row-per-8192 partial
    * frame merges as DECIMAL(38,0), so ~rows/8192 rows shuffle and the
    * fold is exact and partition-invariant.
    *
    * Callers either pass integer-valued Columns (scale = 0, the
    * original contract) or DOUBLE-valued Columns with scale ∈ [1, 6]:
    * the kernel then applies the exact DECIMAL(38,scale) HALF_UP
    * scaling itself ([[scaledLongExact]]), which skips the per-row
    * BigDecimal cast chain that dominated the plan-level formulation
    * (correlation is scale-invariant so the result is the raw
    * columns'). Null-complete rows only (listwise). */
  def correlationMatrix(df: DataFrame, cols: Seq[(String, Column)],
      scale: Int = 0): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs >= 2 columns")
    require(scale >= 0 && scale <= 6,
      "correlationMatrix: scale must be in [0, 6]")
    val names = cols.map(_._1)
    val k = names.size
    val nMom = k + k * (k + 1) / 2
    val castTo = if (scale == 0) "long" else "double"
    val base = df
      .select(cols.map { case (n, c) => c.cast(castTo).as(s"__$n") }: _*)
      .filter(names.map(n => col(s"__$n").isNotNull).reduce(_ && _))
    val sc = scale
    val pow10 = math.pow(10, scale)
    import df.sparkSession.implicits._
    val partials = base.mapPartitions { it =>
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Array[Long])]
      var acc = new Array[Long](nMom)
      var n = 0L
      val v = new Array[Long](k)
      it.foreach { row =>
        v.indices.foreach { i =>
          val x = if (sc == 0) row.getLong(i)
            else scaledLongExact(row.getDouble(i), pow10, sc)
          // JVM adds wrap silently (no ANSI inside the kernel): enforce
          // the documented contract loudly on BOTH input paths
          if (x > 23000000L || x < -23000000L)
            throw new ArithmeticException(
              s"correlationMatrix moment contract: |scaled value| must " +
                s"be <= 2.3e7 (got $x) — re-scale first")
          v(i) = x
        }
        n += 1
        var i = 0
        var m = k
        while (i < k) {
          acc(i) += v(i)
          var j = i
          while (j < k) { acc(m) += v(i) * v(j); m += 1; j += 1 }
          i += 1
        }
        if (n % 8192L == 0L) {
          out += ((8192L, acc)); acc = new Array[Long](nMom); n -= 8192L
        }
      }
      if (n > 0L) out += ((n, acc))
      out.iterator
    }.toDF("__n", "__m")
    val moments =
      Seq(sum(col("__n")).cast("decimal(38,0)").as("__n")) ++
      names.indices.map(i =>
        sum(element_at(col("__m"), i + 1).cast("decimal(38,0)"))
          .as(s"__s_${names(i)}")) ++ {
        var m = k - 1
        for (i <- names.indices; j <- i until k) yield {
          m += 1
          sum(element_at(col("__m"), m + 1).cast("decimal(38,0)"))
            .as(s"__p_${names(i)}_${names(j)}")
        }
      }
    val m = partials.agg(moments.head, moments.tail: _*)
    val cells = for (i <- names.indices; j <- (i + 1) until names.size)
      yield {
        val (a, b) = (names(i), names(j))
        val num = col("__n") * col(s"__p_${a}_$b") -
          col(s"__s_$a") * col(s"__s_$b")
        val d1 = col("__n") * col(s"__p_${a}_$a") -
          col(s"__s_$a") * col(s"__s_$a")
        val d2 = col("__n") * col(s"__p_${b}_$b") -
          col(s"__s_$b") * col(s"__s_$b")
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          when(d1 > 0 && d2 > 0, num.cast("double") /
            (sqrt(d1.cast("double")) * sqrt(d2.cast("double"))))
            .as("corr"))
      }
    m.select(col("__n").cast("long").as("n"),
        explode(array(cells: _*)).as("__c"))
      .select(col("__c.col_a").as("col_a"), col("__c.col_b").as("col_b"),
        col("__c.corr").as("corr"), col("n"))
  }

  /** Brown–Forsythe test (Levene's test with MEDIAN centers — Brown &
    * Forsythe, JASA 1974, the robust variance-homogeneity check): are the
    * spreads of an integer-quantized metric equal across the groups of
    * `groupCol`? The deviations z = |2·v − 2·med_g| stay in ℤ (2×-scaled
    * medians avoid the even-n half), so the per-group moments (n_j, Σz,
    * Σz²) fold exactly as DECIMAL(38,0); the between/within sums of
    * squares each spend one IEEE double per GROUP, accumulated order-free
    * as DECIMAL(38,18). Two shuffles on the group key (median ranks +
    * moments), then folds over the |groups|-row frame only — at 100 TB
    * the second shuffle carries one moment row per group, never rows.
    * Returns one row: f, df1 = k−1, df2 = N−k, k, n. */
  def brownForsythe(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("long").as("__v"))
    // exact per-group 2x-median: lo + hi middle order statistics
    val w = Window.partitionBy("__g").orderBy("__v")
    val wg = Window.partitionBy("__g")
    val med = base
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wg))
      .groupBy("__g")
      .agg((max(when(col("__rn") === expr("(__n + 1) div 2"), col("__v"))) +
        max(when(col("__rn") === expr("__n div 2 + 1"), col("__v"))))
        .as("__med2"))
    val moments = base.join(med, Seq("__g"))
      .select(col("__g"),
        abs(col("__v") * 2L - col("__med2")).as("__z"))
      .groupBy("__g")
      .agg(count(lit(1)).as("nj"),
        sum(col("__z").cast("decimal(38,0)")).as("sz"),
        sum((col("__z") * col("__z")).cast("decimal(38,0)")).as("szz"))
    val totals = moments.agg(sum("nj").as("n"), sum("sz").as("s"),
      count(lit(1)).as("k"))
    val terms = moments.crossJoin(broadcast(totals))
      .select(
        col("n"), col("k"),
        // between: ((S_j·N − S·n_j)/N)² / n_j — the ÷N² folds into each
        // term so the decimal(38,18) accumulator keeps its headroom
        ((((col("sz") * col("n") - col("s") * col("nj")).cast("double") /
            col("n").cast("double")) *
          ((col("sz") * col("n") - col("s") * col("nj")).cast("double") /
            col("n").cast("double"))) /
          col("nj").cast("double")).cast("decimal(38,18)").as("__tb"),
        // within: (n_j·Σz² − (Σz)²) / n_j
        (((col("nj") * col("szz") - col("sz") * col("sz")).cast("double")) /
          col("nj").cast("double")).cast("decimal(38,18)").as("__tw"))
      .groupBy("n", "k")
      .agg(sum("__tb").cast("double").as("__between"),
        sum("__tw").cast("double").as("__within"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    terms.select(
      (col("__between") * (nD - kD) /
        ((kD - 1.0) * col("__within"))).as("f"),
      (col("k") - 1).cast("long").as("df1"),
      (col("n") - col("k")).cast("long").as("df2"),
      col("k").cast("long").as("k"),
      col("n").cast("long").as("n"))
  }

  /** McNemar's test (McNemar 1947) for two paired binary classifiers on
    * the same items: only the DISCORDANT pairs carry signal — n01 (A
    * right, B wrong) vs n10 (A wrong, B right); the continuity-corrected
    * χ² = (|n01−n10|−1)²/(n01+n10) is one IEEE expression over exact
    * counts from ONE aggregation pass. Null when no discordant pairs.
    * Returns one row: the 2×2 quadrant, chi2_cc, n. */
  def mcnemar(df: DataFrame, aCorrectCol: Column,
      bCorrectCol: Column): DataFrame = {
    val a = aCorrectCol.cast("boolean")
    val b = bCorrectCol.cast("boolean")
    df.filter(a.isNotNull && b.isNotNull)
      .agg(
        count(when(a && b, lit(1))).as("n11"),
        count(when(a && !b, lit(1))).as("n10"),
        count(when(!a && b, lit(1))).as("n01"),
        count(when(!a && !b, lit(1))).as("n00"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        (col("n11") + col("n10") + col("n01") + col("n00")).as("n"),
        when(col("n01") + col("n10") > 0,
          ((abs(col("n01") - col("n10")) - 1).cast("double") *
            (abs(col("n01") - col("n10")) - 1).cast("double")) /
            (col("n01") + col("n10")).cast("double"))
          .as("chi2_cc"))
  }

  /** Newcombe score interval for a difference of two proportions
    * (Newcombe Stat.Med. 1998 method 10, the recommended A/B delta CI:
    * Wilson bounds per arm, combined by the square-root-of-squares
    * rule — never the Wald interval that collapses at p near 0/1).
    * Exact counts from ONE aggregation; the interval is a fixed IEEE
    * chain over them (the [[sliceAccuracyWilson]] arithmetic, twice).
    * Exactly two arms required — checked loudly. Returns one row:
    * per-arm counts/rates, diff, ci_lo, ci_hi. */
  def newcombeDiffCI(df: DataFrame, armCol: String, convCol: Column,
      z: Double = 1.96): DataFrame = {
    val byArm = df.filter(col(armCol).isNotNull && convCol.isNotNull)
      .groupBy(col(armCol).cast("string").as("__arm"))
      .agg(count(lit(1)).as("n"),
        count(when(convCol.cast("boolean"), lit(1))).as("k"))
    val two = byArm.agg(
      count(lit(1)).as("__k"),
      min(struct(col("__arm"), col("n"), col("k"))).as("A"),
      max(struct(col("__arm"), col("n"), col("k"))).as("B"))
      .select(
        when(col("__k") =!= 2, raise_error(lit(
          "newcombeDiffCI needs exactly two arms")))
          .otherwise(col("A")).as("A"), col("B"))
    val z2 = z * z
    def wilson(nC: Column, kC: Column): (Column, Column, Column) = {
      val n = nC.cast("double")
      val p = kC.cast("double") / n
      val denom = lit(1.0) + lit(z2) / n
      val center = (p + lit(z2) / (lit(2.0) * n)) / denom
      val half = (lit(z) * sqrt(p * (lit(1.0) - p) / n +
        lit(z2) / (lit(4.0) * n * n))) / denom
      (p, center - half, center + half)
    }
    val (p1, l1, u1) = wilson(col("A.n"), col("A.k"))
    val (p2, l2, u2) = wilson(col("B.n"), col("B.k"))
    two.select(
      col("A.__arm").as("arm_a"), col("A.n").as("n_a"),
      col("A.k").as("k_a"),
      col("B.__arm").as("arm_b"), col("B.n").as("n_b"),
      col("B.k").as("k_b"),
      (p1 - p2).as("diff"),
      (p1 - p2 - sqrt((p1 - l1) * (p1 - l1) +
        (u2 - p2) * (u2 - p2))).as("ci_lo"),
      (p1 - p2 + sqrt((u1 - p1) * (u1 - p1) +
        (p2 - l2) * (p2 - l2))).as("ci_hi"))
  }

  /** Index-of-dispersion (overdispersion) check per group: variance-to-
    * mean ratio of the daily event counts — ≈1 is Poisson, ≫1 means
    * bursts, and the χ² = (n−1)·s²/x̄ against df = n−1 is the classical
    * test (Fisher 1950). Moments fold exactly as decimals over the
    * bounded daily frame; the ratio spends the final pinned IEEE steps.
    * Input must already be a (group, value) frame of counts. */
  def overdispersionIndex(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val m = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,0)")).as("s"),
        sum((col(valueCol) * col(valueCol)).cast("decimal(38,0)"))
          .as("ss"))
      .filter(col("n") >= 2 && col("s") > 0)
    val nD = col("n").cast("double")
    // s² = (n·Σx² − (Σx)²)/(n(n−1)); D = s²/x̄; χ² = (n−1)·D
    val varNum = (col("n") * col("ss") - col("s") * col("s"))
      .cast("double")
    val dispersion = varNum / (nD * (nD - 1.0)) /
      (col("s").cast("double") / nD)
    m.select(col("grp"), col("n").cast("long").as("n"),
      col("s").cast("long").as("total"),
      dispersion.as("dispersion"),
      ((nD - 1.0) * dispersion).as("chi2"))
  }

  /** Cochran–Armitage trend test (Cochran '54 / Armitage '55): is a
    * binary outcome's rate monotonically moving across ORDERED integer
    * dose groups? T = Σ sᵢ(rᵢN − Rnᵢ) and the variance pieces are exact
    * decimals from ONE |groups|-row moment frame; z² spends the final
    * IEEE steps in a pinned order. The dose scores sᵢ are the group's
    * own integer value. Returns one row: t_num exact, z2, plus the
    * totals. */
  def cochranArmitageTrend(df: DataFrame, doseCol: String,
      labelCol: String): DataFrame = {
    val groups = df
      .filter(col(doseCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(doseCol).cast("long").as("s"))
      .agg(count(lit(1)).as("ni"),
        sum(col(labelCol).cast("long")).as("ri"))
    val m = groups.agg(
      sum("ni").as("n"), sum("ri").as("r"), count(lit(1)).as("k"),
      sum((col("s") * col("ni")).cast("decimal(38,0)")).as("sn"),
      sum((col("s") * col("s") * col("ni")).cast("decimal(38,0)"))
        .as("ssn"))
    val t = groups.crossJoin(broadcast(m))
      .agg(sum((col("s") * (col("ri") * col("n") - col("r") * col("ni")))
        .cast("decimal(38,0)")).as("t_num"))
    val nD = col("n").cast("double")
    val rD = col("r").cast("double")
    t.crossJoin(broadcast(m))
      .select(
        col("t_num").cast("long").as("t_num"),
        (col("n") * col("ssn") - col("sn") * col("sn"))
          .cast("long").as("d"),
        col("r").cast("long").as("r"), col("n").cast("long").as("n"),
        col("k").cast("long").as("k"))
      .withColumn("z2",
        when(col("d") > 0 && col("r") > 0 && col("r") < col("n"),
          (col("t_num").cast("double") * col("t_num").cast("double") *
            (col("n").cast("double") * col("n").cast("double"))) /
            ((col("r").cast("double") *
              (col("n").cast("double") - col("r").cast("double"))) *
              col("d").cast("double"))))
  }

  /** Split-conformal prediction-interval coverage (Vovk's conformal
    * framework, the split/inductive form — Papadopoulos '02, Lei '18):
    * a keyed-sha parity split (the q74 convention) carves a CALIBRATION
    * half whose per-group integer-mean prediction yields nonconformity
    * scores \|v − fit\|; q̂ is the EXACT rank quantile at position
    * ⌈(n+1)·(1−α)⌉ of those scores, and the report is the EVAL half's
    * empirical coverage of \|v − fit\| ≤ q̂ against the nominal
    * 1000−α‰ — the finite-sample-valid "are my intervals honest?"
    * number, all in integers (means are floor divisions, stated).
    * Groups absent from the calibration half have no fit and their
    * eval rows are excluded (reported via n_eval). When the quantile
    * position exceeds n_cal, q̂ is the conservative +∞ — reported as a
    * NULL q_hat with full coverage.
    *
    * 100 TB shape: one parity split, one per-group fit aggregation
    * broadcast back, one score-count aggregation; the rank walk runs
    * on the bounded distinct-score frame. */
  def splitConformalCoverage(df: DataFrame, idCol: String,
      valueCol: String, groupCol: String, alphaPermille: Int = 100,
      seed: Long = 21L): DataFrame = {
    require(alphaPermille >= 1 && alphaPermille <= 999,
      "splitConformalCoverage needs alphaPermille in [1, 999]")
    val base = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"),
        (expr(s"cast(conv(substring(sha2(concat_ws('#', " +
          s"cast($idCol as string), '$seed'), 256), 1, 8), 16, 10) " +
          s"as bigint)") % 2 === 0).as("__cal"))
    val fit = base.filter(col("__cal"))
      .groupBy("__g")
      .agg(expr("sum(__v) div count(1)").as("__fit"))
    val scored = base.join(broadcast(fit), Seq("__g"))
      .select(col("__cal"), abs(col("__v") - col("__fit")).as("__s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val calCounts = scored.filter(col("__cal"))
        .groupBy("__s").agg(count(lit(1)).as("__c"))
      val wCum = Window.partitionBy().orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val qhat = calCounts
        .withColumn("__cum", sum("__c").over(wCum))
        .withColumn("__n", sum("__c").over(Window.partitionBy()))
        .filter(col("__cum") >=
          expr(s"((__n + 1) * ${1000 - alphaPermille} + 999) div 1000"))
        .agg(min("__s").as("q_hat"))
      val calN = scored.filter(col("__cal")).agg(count(lit(1)).as("n_cal"))
      val cov = scored.filter(!col("__cal"))
        .crossJoin(broadcast(qhat.crossJoin(calN)))
        .agg(
          max(col("n_cal")).as("n_cal"),
          count(lit(1)).as("n_eval"),
          max(col("q_hat")).as("q_hat"),
          sum(when(col("q_hat").isNull || col("__s") <= col("q_hat"), 1L)
            .otherwise(0L)).as("__covered"))
      cov.select(
        coalesce(col("n_cal"), lit(0L)).as("n_cal"),
        col("n_eval"), col("q_hat"),
        when(col("n_eval") > 0,
          expr("(__covered * 1000) div n_eval")).as("coverage_permille"),
        lit((1000 - alphaPermille).toLong).as("target_permille"))
    } finally scored.unpersist(false)
  }

  /** G-test of independence (the likelihood-ratio sibling of
    * [[chiSquaredDrift]], Sokal & Rohlf): G = 2·Σ o·ln(o/e) over the
    * complete \|cats\|×\|arms\| grid with e = rt·ct/n; zero-observed
    * cells contribute 0 (the o·ln(o) limit), so the two tests share the
    * same frame and dof but G is additive across partitions of the
    * table — the property that makes it the drill-down test (cell
    * G-contributions sum exactly to the table's G). Each cell's term is
    * one pinned IEEE chain (ln is the one libm call, the BM25
    * precedent) accumulated as exact DECIMAL(38,18). Scale: one count
    * aggregation; everything else runs on the bounded grid. */
  def gTestIndependence(df: DataFrame, catCol: String,
      armCol: String): DataFrame = {
    val obs = categoryCounts(df, catCol, armCol)
    val grid = obs.select("cat").distinct()
      .crossJoin(obs.select("arm").distinct())
      .join(obs, Seq("cat", "arm"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val withTot = grid
      .withColumn("rt", sum("o").over(Window.partitionBy("cat")))
      .withColumn("ct", sum("o").over(Window.partitionBy("arm")))
      .withColumn("n", sum("o").over(Window.partitionBy()))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val term = when(col("o") > 0,
        (col("o").cast("double") * log(col("o").cast("double") / e))
          .cast("decimal(38,18)"))
      .otherwise(lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)"))
    withTot
      .withColumn("contrib", term)
      .agg(
        (lit(2.0) * sum("contrib").cast("double")).as("g"),
        ((countDistinct("cat") - 1) * (countDistinct("arm") - 1))
          .cast("long").as("dof"),
        max("n").cast("long").as("n"))
  }

  /** Cronbach's alpha — internal-consistency reliability of a k-item
    * integer score battery (quality sub-metrics, rubric columns):
    * α = k/(k−1)·(1 − Σᵢ var(itemᵢ)/var(total)). Every variance is the
    * EXACT integer n²-scaled population form n·Σx² − (Σx)², so the item
    * fraction is one integer ratio and α is one final IEEE chain —
    * nothing to drift across engines. Returns one row: n, k, the two
    * exact variance numerators (the n² scale cancels in the ratio), and
    * alpha (null when the total score is constant). Scale shape: ONE
    * aggregation over the corpus computing 2k+3 sums; no shuffle wider
    * than that. */
  def cronbachAlpha(df: DataFrame, itemCols: Seq[String]): DataFrame = {
    require(itemCols.size >= 2, "cronbachAlpha needs >= 2 items")
    val k = itemCols.size
    val items = itemCols.map(c => col(c).cast("long"))
    val total = items.reduce(_ + _)
    // squared sums and the n-scaled variance numerators accumulate as
    // DECIMAL(38,0), not long: with corpus-scale n and multi-thousand
    // item totals, Σ total² and n·Σtotal² − (Σtotal)² exceed int64 —
    // and the DuckDB twin sums into HUGEINT, so the two sides would
    // diverge exactly when it matters (round-10 advice). The final
    // long casts below stay ANSI-loud if a numerator truly outgrows
    // int64.
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    val aggs =
      itemCols.zipWithIndex.flatMap { case (c, i) =>
        Seq(sum(col(c).cast("long")).as(s"__s$i"),
          sum(dec(col(c).cast("long")) * dec(col(c).cast("long")))
            .as(s"__ss$i"))
      } ++ Seq(sum(total).as("__st"), sum(dec(total) * dec(total))
        .as("__sst"), count(lit(1)).as("n"))
    val base = df
      .filter(itemCols.map(col(_).isNotNull).reduce(_ && _))
      .agg(aggs.head, aggs.tail: _*)
    val nDec = col("n").cast("decimal(38,0)")
    val itemVarNum = (0 until k).map(i =>
      nDec * col(s"__ss$i") - dec(col(s"__s$i")) * dec(col(s"__s$i")))
      .reduce(_ + _)
    val totalVarNum = nDec * col("__sst") -
      dec(col("__st")) * dec(col("__st"))
    base.select(col("n").cast("long").as("n"),
        lit(k.toLong).as("k"),
        itemVarNum.cast("long").as("item_var_num"),
        totalVarNum.cast("long").as("total_var_num"))
      .withColumn("alpha",
        when(col("total_var_num") > 0,
          (lit(k.toDouble) / lit((k - 1).toDouble)) *
            (lit(1.0) - col("item_var_num").cast("double") /
              col("total_var_num").cast("double"))))
  }

  /** Friedman rank test — k treatments over b matched blocks (weekly
    * event-type activity, per-slice model variants): within each block
    * the treatments rank by their integer metric with AVERAGE ranks on
    * ties, and χ²_F = 12·Σⱼ Rⱼ²/(b·k·(k+1)) − 3·b·(k+1). Ranks are kept
    * as exact DOUBLED integers (a tie group at positions r..r+c−1 has
    * mean rank r+(c−1)/2, i.e. doubled 2r+c−1), so Σ Rⱼ² is exact
    * integer arithmetic and the statistic is one final IEEE chain. The
    * (block, treatment) grid is completed with zero cells — a treatment
    * silent in a block still occupies a rank. No tie-correction factor
    * is applied (stated, not hidden). Scale: one count aggregation into
    * the b·k grid; ranks window over k-row partitions. */
  def friedmanTest(df: DataFrame, blockCol: String, treatCol: String,
      metric: Column): DataFrame = {
    val cells = df
      .filter(col(blockCol).isNotNull && col(treatCol).isNotNull)
      .groupBy(col(blockCol).as("b"), col(treatCol).as("t"))
      .agg(metric.as("m"))
    val grid = cells.select("b").distinct()
      .crossJoin(cells.select("t").distinct())
      .join(cells, Seq("b", "t"), "left")
      .withColumn("m", coalesce(col("m").cast("long"), lit(0L)))
    val ranked = grid
      .withColumn("__r", rank().over(
        Window.partitionBy("b").orderBy("m")))
      .withColumn("__c", count(lit(1)).over(Window.partitionBy("b", "m")))
      .withColumn("__dr", lit(2L) * col("__r") + col("__c") - 1L)
    val perTreat = ranked.groupBy("t")
      .agg(sum("__dr").as("__drsum"), count(lit(1)).as("__b"))
    perTreat.agg(
        sum(col("__drsum") * col("__drsum")).as("__sum_dr2"),
        max("__b").as("b"), count(lit(1)).as("k"))
      .select(col("b").cast("long").as("b"), col("k").cast("long").as("k"),
        col("__sum_dr2").cast("long").as("sum_r2_x4"),
        (lit(12.0) * (col("__sum_dr2").cast("double") / lit(4.0)) /
          (col("b").cast("double") * col("k").cast("double") *
            (col("k") + 1L).cast("double")) -
          lit(3.0) * col("b").cast("double") *
            (col("k") + 1L).cast("double")).as("chi2_f"),
        (col("k") - 1L).cast("long").as("dof"))
  }

  /** Cochran's Q test — k matched treatments with BINARY outcomes
    * (Cochran '50; the k-treatment generalization of McNemar and the
    * binary sibling of [[friedmanTest]]): do the k detectors/variants
    * succeed on the same blocks at the same rate? With column totals
    * Cⱼ, row totals Rᵢ and N = ΣCⱼ, Q = (k−1)·(k·ΣCⱼ² − N²) /
    * (k·N − ΣRᵢ²) — EVERY term an exact integer, one final IEEE
    * division; the degenerate denominator (all blocks all-success or
    * all-failure) reports NULL. Each block's outcome per treatment is
    * `max(outcome)` over its rows (any success counts), and the
    * (block, treatment) grid completes with zeros. Scale: one cell
    * aggregation; everything else folds over the b·k grid. */
  def cochranQ(df: DataFrame, blockCol: String, treatCol: String,
      outcome: Column): DataFrame = {
    val cells = df
      .filter(col(blockCol).isNotNull && col(treatCol).isNotNull)
      .groupBy(col(blockCol).as("b"), col(treatCol).as("t"))
      .agg(max(outcome.cast("int")).as("x"))
    val grid = cells.select("b").distinct()
      .crossJoin(cells.select("t").distinct())
      .join(cells, Seq("b", "t"), "left")
      .withColumn("x", coalesce(col("x"), lit(0)))
    val rows = grid.groupBy("b").agg(sum("x").as("__r"))
      .agg(sum(col("__r") * col("__r")).as("__sr2"),
        count(lit(1)).as("__b"))
    val colsAgg = grid.groupBy("t").agg(sum("x").as("__c"))
      .agg(sum(col("__c") * col("__c")).as("__sc2"),
        sum("__c").as("__n"), count(lit(1)).as("__k"))
    colsAgg.crossJoin(broadcast(rows))
      .select(col("__b").cast("long").as("b"),
        col("__k").cast("long").as("k"),
        col("__n").cast("long").as("n_success"),
        when(col("__k") * col("__n") - col("__sr2") > 0,
          ((col("__k") - 1L) *
            (col("__k") * col("__sc2") - col("__n") * col("__n")))
            .cast("double") /
            (col("__k") * col("__n") - col("__sr2")).cast("double"))
          .as("q"),
        (col("__k") - 1L).cast("long").as("dof"))
  }

  /** Hosmer–Lemeshow calibration test: exact-rank decile bins over an
    * integer permille score (the [[sliceAccuracyWilson]] bucketing
    * convention: bin(v) = ceil(cum(v)·g/n), ties share a bin), then
    * HL = Σ_g (o_g − e_g)²/(e_g·(1 − e_g/n_g)) with e_g = Σ score/1000 —
    * the test statistic under the q302 reliability diagram and the q318
    * ECE number. Observed counts and permille sums are exact integers;
    * each bin's term is one pinned IEEE chain accumulated as exact
    * DECIMAL(38,18); bins with degenerate e (0 or n_g) are excluded from
    * the fold and reported in n_degenerate. Returns one row: n, n_bins,
    * n_degenerate, hl, dof = bins − 2. Scale: one value-count
    * aggregation, windows over the bounded distinct-score frame. */
  def hosmerLemeshow(df: DataFrame, scorePermilleCol: String,
      labelCol: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, "hosmerLemeshow needs bins >= 2")
    val counts = df
      .filter(col(scorePermilleCol).isNotNull && labelCol.isNotNull)
      .groupBy(col(scorePermilleCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"), sum(labelCol.cast("long")).as("__o"))
    val wCum = Window.partitionBy().orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = counts
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(Window.partitionBy()))
      .withColumn("__bin",
        expr(s"(__cum * $bins + __n - 1) div __n"))
      .groupBy("__bin")
      .agg(sum("__c").as("ng"), sum("__o").as("og"),
        sum(col("__v") * col("__c")).as("sp"))
    val e = col("sp").cast("double") / lit(1000.0)
    val degenerate = col("sp") <= 0L || col("sp") >= col("ng") * 1000L
    val term = when(!degenerate,
        ((col("og").cast("double") - e) * (col("og").cast("double") - e) /
          (e * (lit(1.0) - col("sp").cast("double") /
            (col("ng") * 1000L).cast("double"))))
          .cast("decimal(38,18)"))
    binned.agg(
        sum("ng").cast("long").as("n"),
        count(lit(1)).cast("long").as("n_bins"),
        sum(when(degenerate, 1L).otherwise(0L)).cast("long")
          .as("n_degenerate"),
        sum(term).cast("double").as("hl"))
      .withColumn("dof", col("n_bins") - col("n_degenerate") - 2L)
  }
}
