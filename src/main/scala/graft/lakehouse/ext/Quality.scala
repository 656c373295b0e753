package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality expectation checks and snapshot reconciliation — the
  * dbt-test / Great-Expectations surface of a pipeline: declare invariants,
  * get one violations row per check. Row-level checks fold into a SINGLE
  * aggregation pass over the table; only uniqueness (a groupBy) and
  * referential integrity (an anti-join) genuinely need their own shuffle.
  */
object Quality {

  sealed trait Expectation { def name: String }
  /** Violation when `colName` is null. */
  final case class NotNull(colName: String) extends Expectation {
    def name = s"not_null:$colName"
  }
  /** Violation when non-null `colName` falls outside [lo, hi]. */
  final case class InRange(colName: String, lo: Double, hi: Double) extends Expectation {
    def name = s"in_range:$colName"
  }
  /** Violation when non-null `colName` is not one of `values`. */
  final case class AcceptedValues(colName: String, values: Seq[String]) extends Expectation {
    def name = s"accepted_values:$colName"
  }
  /** Violation count = rows beyond the first per duplicated key tuple. */
  final case class Unique(colNames: Seq[String]) extends Expectation {
    def name = s"unique:${colNames.mkString(",")}"
  }
  /** Violation when non-null `colName` has no match in `parent.parentCol`
    * (SQL FK semantics: null children are not violations). */
  final case class ForeignKey(colName: String, parent: DataFrame,
      parentCol: String) extends Expectation {
    def name = s"foreign_key:$colName"
  }

  /** Evaluate all expectations against `df`: one output row per check,
    * `(check, violations)`. All row-local checks (NotNull / InRange /
    * AcceptedValues) share ONE scan-and-aggregate; each Unique adds one
    * groupBy, each ForeignKey one left-anti join against its parent —
    * nothing here is per-row driver work, so the report costs O(checks)
    * Spark jobs of bounded output, not O(rows) anything. */
  def expectations(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    val spark = df.sparkSession
    val rowLocal = checks.collect {
      case e @ NotNull(c) =>
        e.name -> sum(when(col(c).isNull, 1L).otherwise(0L))
      case e @ InRange(c, lo, hi) =>
        e.name -> sum(when(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi), 1L).otherwise(0L))
      case e @ AcceptedValues(c, vs) =>
        e.name -> sum(when(col(c).isNotNull &&
          !col(c).isin(vs: _*), 1L).otherwise(0L))
    }
    val rowLocalDf =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.map { case (n, a) => a.as(n) }
        val row = df.agg(aggs.head, aggs.tail: _*)
        // one row in, |checks| rows out: unpivot via stack
        Some(row.selectExpr(
          s"stack(${rowLocal.size}, " +
            rowLocal.map { case (n, _) => s"'$n', coalesce(`$n`, 0L)" }
              .mkString(", ") +
            ") as (check, violations)"))
      }
    val others = checks.flatMap {
      case Unique(cols) =>
        val dups = df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
          .withColumn("check", lit(s"unique:${cols.mkString(",")}"))
          .select("check", "violations")
        Some(dups)
      case fk @ ForeignKey(c, parent, pc) =>
        val orphans = df.filter(col(c).isNotNull)
          .join(parent.select(col(pc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .withColumn("check", lit(fk.name))
          .select("check", "violations")
        Some(orphans)
      case _ => None
    }
    (rowLocalDf.toSeq ++ others)
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.emptyDataFrame
        .withColumn("check", lit("")).withColumn("violations", lit(0L))
        .limit(0))
  }

  /** Row-local pass predicate for an expectation (NULL-tolerant SQL
    * semantics: range/membership checks pass on null — NotNull is the
    * check that polices nulls). None for checks that need cross-row
    * context (Unique, ForeignKey). */
  private def rowPredicate(e: Expectation): Option[Column] = e match {
    case NotNull(c) => Some(col(c).isNotNull)
    case InRange(c, lo, hi) =>
      Some(col(c).isNull || (col(c) >= lo && col(c) <= hi))
    case AcceptedValues(c, vs) =>
      Some(col(c).isNull || col(c).isin(vs: _*))
    case _ => None
  }

  /** DLT-style expectation gate: ONE codegen'd pass tags every row with
    * the names of the row-local checks it fails (`failedCol`, in check
    * declaration order; empty = passing). Callers split on
    * `size(failedCol) == 0` — the expect_or_drop / quarantine pattern:
    * bad rows are data to route, not errors to throw. Cross-row checks
    * (Unique / ForeignKey) are refused loudly: a per-row gate cannot
    * decide them. Zero shuffle. */
  def gateExpectations(df: DataFrame, checks: Seq[Expectation],
      failedCol: String = "failed_checks"): DataFrame = {
    require(checks.nonEmpty, "gate needs at least one expectation")
    val preds = checks.map(e => e.name -> rowPredicate(e))
    val unsupported = preds.collect { case (n, None) => n }
    require(unsupported.isEmpty,
      s"quarantine gate supports row-local checks only; got: " +
        unsupported.mkString(", "))
    val tags = preds.map { case (n, Some(p)) => when(!p, lit(n)) }
    df.withColumn(failedCol,
      filter(array(tags: _*), x => x.isNotNull))
  }

  /** Keyed snapshot diff: classify every key present in `before` or
    * `after` as added / removed / changed / unchanged (changed = any
    * non-key column differs, null-safe struct compare). ONE full outer
    * join on the key — the generic form of what the lakehouse change feed
    * answers incrementally; use this to reconcile snapshots that don't
    * share commit history. */
  def diffSnapshots(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val nonKey = before.columns.filterNot(keyCols.contains).toSeq
    require(nonKey == after.columns.filterNot(keyCols.contains).toSeq,
      "diffSnapshots: before/after non-key columns differ")
    def packed(df: DataFrame, tag: String) = df.select(
      keyCols.map(col) :+
        struct(nonKey.map(col): _*).as(s"__v_$tag") :+
        lit(1).as(s"__in_$tag"): _*)
    packed(before, "b")
      .join(packed(after, "a"), keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_b").isNull, lit("added"))
          .when(col("__in_a").isNull, lit("removed"))
          .when(col("__v_b") <=> col("__v_a"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }

  /** Content-addressed corpus diff between two snapshots, in ONE row:
    * [[diffSnapshots]] diffs by KEY and therefore calls a re-keyed
    * document (same bytes, new id — a re-crawl that renumbered, a
    * partition rewrite that reassigned ids) one removal plus one
    * addition; this classifies by key AND content md5, separating
    * `n_rekeyed` (content present on both sides under different ids —
    * usually a false alarm) from genuine `n_removed`/`n_added` churn,
    * next to `n_unchanged`/`n_edited` for matched ids. The release
    * question it answers: "did the corpus actually change, or did the
    * ids?".
    *
    * Scale shape: one full-outer join on the id, one semi-join between
    * the two orphan sets on the 32-hex content hash, two 1-row folds —
    * constant output at any corpus size. */
  def corpusDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def keyed(df: DataFrame, tag: String) = df.select(
      col(idCol).as("id"),
      md5(coalesce(col(textCol), lit(""))).as(s"h$tag"))
    val j = keyed(a, "a").join(keyed(b, "b"), Seq("id"), "full_outer")
    val aOnly = j.where(col("hb").isNull).select(col("id"), col("ha"))
    val bOnlyH = j.where(col("ha").isNull).select(col("hb").as("ha")).distinct()
    val base = j.agg(
      sum(when(col("ha") === col("hb"), 1L).otherwise(0L)).as("n_unchanged"),
      sum(when(col("ha").isNotNull && col("hb").isNotNull &&
        col("ha") =!= col("hb"), 1L).otherwise(0L)).as("n_edited"),
      sum(when(col("hb").isNull, 1L).otherwise(0L)).as("n_removed"),
      sum(when(col("ha").isNull, 1L).otherwise(0L)).as("n_added"))
    val rk = aOnly.join(bOnlyH, Seq("ha"), "left_semi")
      .agg(count(lit(1)).as("n_rekeyed"))
    base.crossJoin(rk)
  }

  /** Quality-filter threshold sweep — the curve a pipeline designer reads
    * before picking a cutoff: for each candidate threshold τ, how many
    * documents and tokens survive `score >= τ`, absolute and as integer
    * permille of the corpus. `scoreCol` must be integral (the engine's
    * permille-score convention) with a BOUNDED domain — the whole corpus
    * collapses to one per-score-value aggregation first (≤ domain-size
    * rows, e.g. 1001 for permille scores), and every downstream step
    * (threshold join, share math) runs on that aggregate: adding a
    * threshold costs nothing, re-running the corpus is never needed.
    * Null scores count in the corpus totals but survive no threshold
    * (they are unscored, not perfect). */
  def filterSweep(df: DataFrame, scoreCol: String, tokenCol: String,
      thresholds: Seq[Int]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.distinct == thresholds,
      "filterSweep: thresholds must be non-empty and distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val buckets = df.groupBy(col(scoreCol).as("__score"))
      .agg(count(lit(1)).as("__docs"),
        sum(coalesce(col(tokenCol), lit(0L))).cast("long").as("__toks"))
    val totals = buckets.agg(sum(col("__docs")).as("__all_docs"),
      sum(col("__toks")).as("__all_toks"))
    val th = thresholds.toDF("threshold")
    th.join(buckets,
        col("__score").isNotNull && col("__score") >= col("threshold"),
        "left")
      .groupBy(col("threshold"))
      .agg(coalesce(sum(col("__docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("__toks")), lit(0L)).as("n_tokens"))
      .crossJoin(totals)
      .select(col("threshold"), col("n_docs"), col("n_tokens"),
        expr("(n_docs * 1000) div __all_docs").as("docs_permille"),
        expr("(n_tokens * 1000) div __all_toks").as("tokens_permille"))
  }
  /** Calibration reliability table (the reliability-diagram data): bucket
    * a permille confidence score into `bins` equal-width bins; per bin
    * report support, mean predicted confidence, and observed positive
    * rate — all INTEGER (permille means via integer division), so the
    * curve is bit-portable. A well-calibrated scorer tracks the
    * diagonal; the gap column is the per-bin calibration error. ONE
    * hash aggregation into a ≤ bins-row frame. */
  def calibrationReliability(df: DataFrame, scorePermilleCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "calibrationReliability needs bins >= 2")
    val score = col(scorePermilleCol).cast("long")
    // integer div, not Column./ (double division on longs)
    val bin = expr(
      s"CAST(least((CAST($scorePermilleCol AS BIGINT) * $bins) div 1000, " +
        s"${bins - 1}) AS INT)")
    df.filter(score.isNotNull && score.between(0L, 1000L) &&
        col(labelCol).isNotNull)
      .withColumn("__bin", bin)
      .groupBy(col("__bin").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(score).as("__sum_score"),
        sum(col(labelCol).cast("long")).as("__pos"))
      .select(col("bin"), col("n"),
        expr("__sum_score div n").as("mean_score_permille"),
        expr("(__pos * 1000) div n").as("observed_permille"),
        expr("abs(__sum_score div n - (__pos * 1000) div n)")
          .as("gap_permille"))
  }
  /** Expected calibration error — [[calibrationReliability]] folded to
    * the one-row dashboard number: ECE = Σ_b (n_b/N)·|gap_b|, kept in
    * integer permille (Σ n_b·gap_b div N). */
  def expectedCalibrationError(df: DataFrame, scorePermilleCol: String,
      labelCol: String, bins: Int = 10): DataFrame =
    calibrationReliability(df, scorePermilleCol, labelCol, bins)
      .agg(
        expr("CAST(sum(n * gap_permille) div sum(n) AS BIGINT)")
          .as("ece_permille"),
        sum("n").cast("long").as("n"),
        count(lit(1)).as("n_occupied_bins"))

  /** Murphy decomposition of the Brier score (Murphy, J.Appl.Meteor.
    * 1973) over `bins` equal-width confidence bins: BRIER = mean squared
    * error of the permille forecast, RELIABILITY = how far bin-mean
    * confidence sits from bin-observed frequency (the penalty ECE
    * linearizes), RESOLUTION = how much the bins separate the base rate
    * (higher is better), UNCERTAINTY = ȳ(1−ȳ), the no-skill floor.
    * Brier's numerator Σ(p−y)² is EXACT in permille² integers;
    * REL/RES spend one IEEE double per BIN (never per row), accumulated
    * order-free as DECIMAL(38,18). ONE hash aggregation into a ≤ bins-row
    * frame, then folds over that frame only — the 100 TB shuffle carries
    * bins moment rows. Returns one row: brier, reliability, resolution,
    * uncertainty, n, n_occupied_bins. */
  def brierDecomposition(df: DataFrame, scorePermilleCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "brierDecomposition needs bins >= 2")
    val score = col(scorePermilleCol).cast("long")
    val bin = expr(
      s"CAST(least((CAST($scorePermilleCol AS BIGINT) * $bins) div 1000, " +
        s"${bins - 1}) AS INT)")
    val perBin = df
      .filter(score.isNotNull && score.between(0L, 1000L) &&
        col(labelCol).isNotNull)
      .select(score.as("__s"), col(labelCol).cast("long").as("__y"),
        bin.as("__b"))
      .groupBy("__b")
      .agg(count(lit(1)).as("nb"),
        sum("__s").as("sb"),
        sum("__y").as("pb"),
        sum(((col("__s") - col("__y") * 1000L) *
          (col("__s") - col("__y") * 1000L)).cast("decimal(38,0)"))
          .as("qb"))
    val totals = perBin.agg(sum("nb").as("n"), sum("pb").as("p"),
      sum("qb").as("q"), count(lit(1)).as("kbins"))
    val folded = perBin.crossJoin(broadcast(totals))
      .select(col("n"), col("p"), col("q"), col("kbins"),
        // REL term: (S_b − 1000·P_b)²/n_b  (÷(N·10⁶) deferred to the end)
        (((col("sb") - col("pb") * 1000L).cast("double") *
          (col("sb") - col("pb") * 1000L).cast("double")) /
          col("nb").cast("double")).cast("decimal(38,18)").as("__tr"),
        // RES term: (P_b·N − P·n_b)²/n_b  (÷N³ deferred; probability units)
        (((col("pb") * col("n") - col("p") * col("nb")).cast("double") *
          (col("pb") * col("n") - col("p") * col("nb")).cast("double")) /
          col("nb").cast("double")).cast("decimal(38,18)").as("__ts"))
      .groupBy("n", "p", "q", "kbins")
      .agg(sum("__tr").cast("double").as("__rel"),
        sum("__ts").cast("double").as("__res"))
    val nD = col("n").cast("double")
    folded.select(
      (col("q").cast("double") / (nD * 1.0e6)).as("brier"),
      (col("__rel") / (nD * 1.0e6)).as("reliability"),
      (col("__res") / (nD * nD * nD)).as("resolution"),
      ((col("p").cast("double") * (nD - col("p").cast("double"))) /
        (nD * nD)).as("uncertainty"),
      col("n").cast("long").as("n"),
      col("kbins").cast("long").as("n_occupied_bins"))
  }

  /** Optimal classification threshold by Youden's J (J = TPR − FPR,
    * Youden 1950): sweep every DISTINCT permille score as a
    * "predict positive when score ≥ t" cut and pick the maximizer, ties
    * to the smallest threshold. J scaled by P·N is the exact integer
    * tp·N_neg − fp·N_pos, so the argmax is bit-portable. ONE count
    * aggregation into the ≤1001-row score frame; the sweep windows over
    * that bounded frame only. Returns one row: threshold, the confusion
    * quadrant at it, exact j_num/j_den, readable youden_j. */
  def youdenThreshold(df: DataFrame, scorePermilleCol: String,
      labelCol: String): DataFrame = {
    val score = col(scorePermilleCol).cast("long")
    val counts = df
      .filter(score.isNotNull && score.between(0L, 1000L) &&
        col(labelCol).isNotNull)
      .groupBy(score.as("v"))
      .agg(count(when(col(labelCol).cast("boolean"), lit(1))).as("p"),
        count(when(!col(labelCol).cast("boolean"), lit(1))).as("q"))
    val wBelow = Window.partitionBy().orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    counts
      .withColumn("pos_below", coalesce(sum("p").over(wBelow), lit(0L)))
      .withColumn("neg_below", coalesce(sum("q").over(wBelow), lit(0L)))
      .withColumn("n_pos", sum("p").over(wAll))
      .withColumn("n_neg", sum("q").over(wAll))
      .select(col("v").as("threshold"),
        (col("n_pos") - col("pos_below")).as("tp"),
        (col("n_neg") - col("neg_below")).as("fp"),
        col("pos_below").as("fn"), col("neg_below").as("tn"),
        col("n_pos"), col("n_neg"),
        ((col("n_pos") - col("pos_below")) * col("n_neg") -
          (col("n_neg") - col("neg_below")) * col("n_pos")).as("j_num"),
        (col("n_pos") * col("n_neg")).as("j_den"))
      .orderBy(col("j_num").desc, col("threshold").asc)
      .limit(1)
      .withColumn("youden_j",
        // guarded: Spark's double 0/0 is NaN while other engines NULL
        when(col("j_den") > 0,
          col("j_num").cast("double") / col("j_den").cast("double")))
  }

  /** Decile-style lift table over equal-width permille score bins: per
    * bin the response rate vs the global base rate as an exact permille
    * lift, plus the cumulative capture curve walking from the TOP bin
    * down (the "how deep must the campaign go" table). ONE hash
    * aggregation into ≤ bins rows, cumulative window over that bounded
    * frame. All integer. */
  def liftTable(df: DataFrame, scorePermilleCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "liftTable needs bins >= 2")
    val score = col(scorePermilleCol).cast("long")
    val bin = expr(
      s"CAST(least((CAST($scorePermilleCol AS BIGINT) * $bins) div 1000, " +
        s"${bins - 1}) AS INT)")
    val perBin = df
      .filter(score.isNotNull && score.between(0L, 1000L) &&
        col(labelCol).isNotNull)
      .select(bin.as("bin"), col(labelCol).cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
    val wTop = Window.partitionBy().orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    perBin
      .withColumn("cum_n", sum("n").over(wTop))
      .withColumn("cum_pos", sum("n_pos").over(wTop))
      .withColumn("total_n", sum("n").over(wAll))
      .withColumn("total_pos", sum("n_pos").over(wAll))
      .filter(col("total_pos") > 0)
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(n_pos * total_n * 1000) div (n * total_pos)")
          .as("lift_permille"),
        col("cum_n"), col("cum_pos"),
        expr("(cum_pos * total_n * 1000) div (cum_n * total_pos)")
          .as("cum_lift_permille"),
        expr("(cum_pos * 1000) div total_pos").as("capture_permille"))
  }

  /** Isotonic (PAV) calibration of a binned scorer — the standard
    * monotone-recalibration fit (Zadrozny & Elkan KDD'02), computed by
    * the pool-adjacent-violators MINIMAX identity instead of the
    * sequential PAV sweep: cal(i) = max_{j≤i} min_{k≥j} ȳ(j..k). Every
    * interval mean is ONE pinned IEEE division of exact prefix-count
    * integers, and because the numerators/denominators stay < 2^26 the
    * double ordering of two interval means equals their rational
    * ordering (distinct rationals differ by ≥ 1/(d₁d₂) ≫ the 2⁻⁵³
    * rounding), so the min/max selections — and therefore the fit —
    * are bit-portable. The O(bins²) interval frame lives entirely on
    * the ≤ bins-row aggregate; the corpus contributes ONE hash
    * aggregation. Returns per occupied bin: support, raw rate,
    * calibrated rate (monotone non-decreasing by construction). */
  def isotonicCalibration(df: DataFrame, scorePermilleCol: String,
      labelCol: String, bins: Int = 100): DataFrame = {
    require(bins >= 2 && bins <= 1000, "bins in [2, 1000]")
    val score = col(scorePermilleCol).cast("long")
    val bin = expr(
      s"CAST(least((CAST($scorePermilleCol AS BIGINT) * $bins) div 1000, " +
        s"${bins - 1}) AS INT)")
    val perBin = df
      .filter(score.isNotNull && score.between(0L, 1000L) &&
        col(labelCol).isNotNull)
      .select(bin.as("bin"), col(labelCol).cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
    val wCum = Window.partitionBy().orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val f = perBin
      .withColumn("ncum", sum("n").over(wCum))
      .withColumn("pcum", sum("n_pos").over(wCum))
    val j = f.select(col("bin").as("jbin"),
      (col("ncum") - col("n")).as("npref"),
      (col("pcum") - col("n_pos")).as("ppref"))
    val k = f.select(col("bin").as("kbin"),
      col("ncum").as("nk"), col("pcum").as("pk"))
    val mins = j.join(k, col("kbin") >= col("jbin"))
      .select(col("jbin"),
        ((col("pk") - col("ppref")).cast("double") /
          (col("nk") - col("npref")).cast("double")).as("__avg"))
      .groupBy("jbin").agg(min("__avg").as("mj"))
    f.join(mins, col("jbin") <= col("bin"))
      .groupBy(col("bin"), col("n"), col("n_pos"))
      .agg(max("mj").as("calibrated"))
      .select(col("bin"), col("n").as("n"), col("n_pos"),
        expr("(n_pos * 1000) div n").as("raw_rate_permille"),
        col("calibrated"))
  }
}
