package graft.lakehouse.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic tabular feature engineering, engine-portable: the fit
  * statistics are tiny exact aggregates, the transforms are per-row
  * kernels over broadcast stats, and every encoded value is an integer
  * any engine reproduces — the reproducibility contract a feature store
  * needs before features feed a training run (a half-ulp disagreement
  * between the fit and serve paths is a real training/serving skew bug;
  * integers cannot drift).
  */
object Features {

  /** Min-max scale `cols` into integer micro-units ([0, 1e6]): adds
    * `<col>_scaled` = floor((x − min)·1e6 / (max − min)) per column.
    * Constant columns scale to 0; null inputs stay null. ONE 1-row
    * stats aggregation broadcast into a codegen'd per-row transform —
    * the fit never shuffles the data and the transform never exchanges
    * at all. */
  def minMaxScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "minMaxScale needs at least one column")
    val statCols = cols.flatMap(c => Seq(
      min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val out = cols.foldLeft(joined) { (acc, c) =>
      val lo = col(s"__min_$c").cast("double")
      val hi = col(s"__max_$c").cast("double")
      acc.withColumn(s"${c}_scaled",
        when(col(c).isNull, lit(null))
          .when(hi > lo, floor((col(c).cast("double") - lo) * 1000000.0 /
            (hi - lo)).cast("long"))
          .otherwise(lit(0L)))
    }
    out.drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Deterministic category dictionary (StringIndexer without the
    * randomness): `(value, n, idx)` with idx assigned by frequency
    * descending, value ascending — bit-stable across runs, engines, and
    * partitionings. The window runs over the AGGREGATED vocabulary
    * frame (bounded), never the corpus; apply the dictionary with a
    * broadcast join ([[withCategoryIndex]]). Null category values are
    * excluded (index them explicitly upstream if wanted). */
  def indexCategories(df: DataFrame, c: String): DataFrame = {
    val vocab = df.where(col(c).isNotNull)
      .groupBy(col(c).as("value")).agg(count(lit(1)).as("n"))
    vocab.withColumn("idx",
      (row_number().over(Window.orderBy(col("n").desc, col("value"))) - 1)
        .cast("long"))
  }

  /** Adds `<c>_idx` via a broadcast join against [[indexCategories]]'s
    * dictionary; unseen/null categories get null. */
  def withCategoryIndex(df: DataFrame, c: String): DataFrame = {
    val dict = indexCategories(df, c)
      .select(col("value").as(c), col("idx").as(s"${c}_idx"))
    df.join(broadcast(dict), Seq(c), "left")
  }

  /** Smoothed target encoding over an INTEGER target column (scale the
    * target to cents/micros upstream): each category's encoding is
    * `(sum + globalMean·m) div (n + m)` with prior weight `m` — the
    * standard empirical-Bayes shrinkage, all integer arithmetic, so a
    * rare category shrinks toward the global mean instead of memorizing
    * its few rows (the target-leakage guard). Returns
    * `(category, n, encoded)`. Two tiny aggregates; nothing beyond the
    * per-category rollup shuffles. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      m: Long): DataFrame = {
    require(m >= 0, "prior weight m must be >= 0")
    val g = df.where(col(catCol).isNotNull && col(targetCol).isNotNull)
    val global = g.agg(
      sum(col(targetCol)).cast("decimal(38,0)").as("__gs"),
      count(lit(1)).as("__gn"))
    g.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"),
        sum(col(targetCol)).cast("decimal(38,0)").as("__s"))
      .crossJoin(broadcast(global))
      .withColumn("encoded",
        expr(s"cast((__s + (__gs div __gn) * $m) div (n + $m) as bigint)"))
      .select(col("category"), col("n"), col("encoded"))
  }

  /** Rank (quantile) normalization within groups: value → permille rank
    * `(rank−1)·1000 div (n−1)` inside each group — the order-preserving
    * map that makes scores COMPARABLE ACROSS SOURCES whose raw scales
    * differ (a perplexity from one domain vs another), the standard
    * pre-step before mixing per-source quality thresholds. `rank()` (not
    * row_number) so tied values share a rank — deterministic without a
    * tie-break column; all integer. One window shuffle on the group key;
    * singleton groups map to 0. */
  def rankNormalize(df: DataFrame, groupCol: String, valueCol: String,
      outCol: String = "rank_permille"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol))
    val n = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol)))
    df.filter(col(valueCol).isNotNull)
      .withColumn("__rk", rank().over(w))
      .withColumn("__n", n)
      .withColumn(outCol,
        expr("((__rk - 1) * 1000) div greatest(__n - 1, 1)"))
      .drop("__rk", "__n")
  }

  /** The hashing trick (Weinberger et al., ICML 2009) for categorical
    * feature crosses: bucket = keyed portable hash of the '#'-joined
    * column values mod `buckets` — fixed feature dimensionality with no
    * vocabulary fit, no driver state, and no train/serve skew (the
    * bucket is a pure function of the values; any engine replays it).
    * Per-row, zero-shuffle, codegen'd. */
  def hashCross(df: DataFrame, cols: Seq[String], buckets: Int,
      outCol: String = "feature_bucket"): DataFrame = {
    require(cols.nonEmpty && buckets >= 2,
      "hashCross needs columns and buckets >= 2")
    val h = conv(substring(sha2(concat_ws("#",
      cols.map(c => col(c).cast("string")): _*), 256), 1, 8), 16, 10)
      .cast("long")
    df.withColumn(outCol, (h % buckets).cast("int"))
  }
}
