package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic OLAP analytics operators over the fixture star schema — the
  * query shapes an analytics engine serves daily (rollup reports, pivoted
  * dashboards, cohort retention, sliding time-window metrics, heavy
  * hitters). All are single-shuffle plans built from Catalyst built-ins;
  * the distributed parts (partial aggregation, range-frame windows,
  * per-partition candidate pruning) are what make them hold at 100 TB.
  */
object Analytics {

  /** ROLLUP aggregation: per-(dims prefix) subtotals + grand total, with
    * `grouping_id` distinguishing subtotal levels (NULL group values are
    * ambiguous on nullable dims; gid is not). Catalyst expands the rollup
    * into grouping sets evaluated in ONE pass over the data — partial
    * aggregation still applies, so at 100 TB this costs one shuffle of
    * (|dims|+1) × |groups| partial rows, not |dims|+1 scans. */
  def rollupAgg(df: DataFrame, dims: Seq[String], valueCol: String): DataFrame =
    df.rollup(dims.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        // exact DECIMAL sum then one cast back: order-independent across
        // engines (a raw double sum is not associative)
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_val"),
        grouping_id().cast("int").as("gid"))

  /** CUBE aggregation: subtotals for EVERY dims subset (2^|dims| grouping
    * sets) plus the grand total, in one pass. Same single-shuffle grouping-
    * sets expansion as [[rollupAgg]] — the alternative (a union of 2^d
    * groupBys) scans the table 2^d times. Keep |dims| small: the partial-
    * row multiplier is 2^d by construction. */
  def cubeAgg(df: DataFrame, dims: Seq[String], valueCol: String): DataFrame =
    df.cube(dims.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_val"),
        grouping_id().cast("int").as("gid"))

  /** UNPIVOT / melt (pivot's inverse): wide measure columns become
    * (variable, value) rows — Spark's native `Dataset.unpivot` (SQL
    * UNPIVOT), which expands each row locally with zero shuffle; measures
    * are cast to a common type up front because UNPIVOT requires it.
    * Output rows = input rows × |values|: a narrow map at any scale. */
  def unpivot(df: DataFrame, ids: Seq[String], values: Seq[String],
      varName: String = "metric", valueName: String = "value"): DataFrame =
    df.select((ids.map(col) ++
        values.map(c => col(c).cast("double").as(c))): _*)
      .unpivot(ids.map(col).toArray, values.map(col).toArray,
        varName, valueName)

  /** Pivot: one row per `keyCol` group, one count column per pivot value.
    * `values` must be explicit — at 100 TB a distinct-scan just to learn
    * the column list is a full extra pass, and implicit pivots make the
    * output schema data-dependent (a pipeline hazard). Single shuffle on
    * keyCol; the per-value counts are map-side partial like any agg. */
  def pivotCounts(df: DataFrame, keyCol: String, pivotCol: String,
      values: Seq[String]): DataFrame =
    df.groupBy(col(keyCol)).pivot(pivotCol, values).count()
      .na.fill(0L, values)

  /** Row-level sessionization: assign each event an explicit per-user
    * session sequence number — a new session starts when the gap from the
    * user's previous event exceeds `gapSeconds`. One shuffle on the user
    * key; the label is a running sum of break flags over (ts, id) order
    * (id breaks timestamp ties deterministically). Unlike session-WINDOW
    * aggregation ([[EventWindows]]), this keeps every row, which is what
    * downstream per-session feature pipelines join against. */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(order)
    val brk = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    events
      .withColumn("__brk", brk)
      .withColumn("session_seq",
        sum(col("__brk")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }

  /** Weekly cohort retention: users are assigned to the ISO week of their
    * first event (their cohort); the output counts distinct users active
    * per (cohort_week, weeks-since-cohort offset). Two shuffles total —
    * one for the per-user first-event agg, one for the final (cohort,
    * offset) distinct-count — both on compact keys; the raw event table is
    * scanned exactly once. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("activity_week"))
      .join(firstSeen, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("activity_week"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Per-key sliding time-window average of `valueCol`: for each row, the
    * mean over that key's rows in [ts - windowMicros, ts]. RANGE frame on
    * epoch MICROS (not a row frame — ties and irregular event spacing make
    * row frames wrong; not seconds — sub-second events would alias). One
    * shuffle on keyCol; within a partition the frame is a two-pointer pass,
    * O(n) amortized. Sum in exact DECIMAL so the result doesn't depend on
    * intra-frame order. */
  def movingAverage(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__micros"))
      .rangeBetween(-windowMicros, Window.currentRow)
    events
      .withColumn("__micros", unix_micros(col(tsCol)))
      // exact decimal frame-sum cast to double, THEN one double/double
      // division: decimal-by-long division rounds by engine-specific
      // precision rules, but IEEE double division is correctly rounded
      // everywhere, so this form is bit-identical cross-engine
      // count NON-NULL values: sum skips nulls, so count(*) would
      // understate the mean for every frame containing a null measurement
      .withColumn("avg_val",
        sum(col(valueCol).cast("decimal(18,6)")).over(w).cast("double") /
          count(col(valueCol)).over(w).cast("double"))
      .drop("__micros")
  }

  /** Exact heavy hitters: the k most frequent values of `keyCol`, ties
    * broken by value asc (deterministic). groupBy-count is map-side
    * partial, so the shuffle carries one row per DISTINCT key per task —
    * then TakeOrdered(k) merges on the driver without a global sort. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)

  /** Top-N rows per group by `orderCol` descending, ties broken by
    * `tieCol` ascending (a total order — nondeterministic top-N is a
    * silent-flake factory). One shuffle on the group key; row_number is
    * rank-limited inside each partition, never a global sort. */
  def topNPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol).asc)
    df.withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= n)
  }

  /** Fixed-width histogram of `valueCol`: bin i covers
    * [i*binWidth, (i+1)*binWidth). Integer bin ids from floor division —
    * exact cross-engine (no float bin-edge comparisons). One partial-agg
    * shuffle of (bins) rows. */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bin_lo", col("bin") * binWidth)

  /** Time-series resampling with forward fill: per key, a `step`-spaced
    * grid from the key's first to last observation, each grid point
    * carrying the latest `valueCol` at or before it. `originTrunc` aligns
    * the grid origin (date_trunc unit) and must match the step granularity
    * — e.g. step "1 DAY" with originTrunc "day" — or grid points land
    * mid-period and the final period can be skipped. Events at the same
    * (key, ts) are pre-reduced with max() so the as-of pick is
    * deterministic. Grid generation is per-key `sequence` (no cross join
    * against a global calendar); the fill itself is [[TemporalJoins
    * .asofJoin]] — one union + one windowed carry, one shuffle. */
  def resampleFFill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, step: String, originTrunc: String = "hour"): DataFrame = {
    val dedup = events.groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as(valueCol))
    val grid = events.groupBy(col(keyCol))
      .agg(date_trunc(originTrunc, min(col(tsCol))).as("__lo"), max(col(tsCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), expr(s"INTERVAL $step")))
          .as(tsCol))
    TemporalJoins.asofJoin(grid, dedup, Seq(keyCol), tsCol, Seq(valueCol))
  }

  /** Period-over-period change: bucket `tsCol` by `period` (date_trunc
    * unit), sum `valueCol` exactly per bucket, and attach the previous
    * bucket's total and the relative change. The lag window is over ONE
    * row per period — after the aggregation, so the window input is tiny
    * regardless of raw data size. */
  def periodOverPeriod(df: DataFrame, tsCol: String, valueCol: String,
      period: String): DataFrame = {
    val agg = df.groupBy(date_trunc(period, col(tsCol)).as("period"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total"))
    val w = Window.orderBy(col("period"))
    agg.withColumn("prev_total", lag(col("total"), 1).over(w))
      // NULL (not Infinity/NaN) when the previous period netted to zero —
      // Infinity poisons downstream aggregates and isn't valid JSON
      .withColumn("pct_change",
        when(col("prev_total") =!= 0.0,
          (col("total") - col("prev_total")) / col("prev_total")))
  }

  /** Running distinct-user counts without running-distinct state: a user
    * contributes to the cumulative count from their FIRST-seen period
    * onward, so cumulative-distinct = prefix sum of per-period first-seen
    * counts. Two compact-key shuffles (per-user min, per-period count);
    * the prefix-sum window runs over one row per period. Output rows are
    * the periods in which at least one user first appeared. */
  def runningDistinct(events: DataFrame, userCol: String, tsCol: String,
      period: String): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(date_trunc(period, min(col(tsCol))).as("period"))
      .groupBy(col("period")).agg(count(lit(1)).as("new_users"))
    firstSeen.withColumn("cum_users",
      sum(col("new_users")).over(
        Window.orderBy(col("period"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Trailing-window z-score anomaly detection: for each row, z = (x − μ)
    * / σ over that key's values in [ts − windowMicros, ts]. The moments
    * are EXACT decimal sums (Σx as DECIMAL(18,6), Σx² as the exact
    * decimal×decimal product — never a double product cast to decimal),
    * converted to double once; every remaining step is a correctly-rounded
    * IEEE op, so the scores are bit-identical cross-engine — a z-score you
    * can hash-verify. z is null when the frame has fewer than `minN`
    * values or zero variance. One shuffle on the key; the RANGE frame is
    * a two-pointer pass per partition. */
  def anomalyZScore(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowMicros: Long, minN: Int = 5): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__micros"))
      .rangeBetween(-windowMicros, Window.currentRow)
    val dec = col(valueCol).cast("decimal(18,6)")
    events
      .withColumn("__micros", unix_micros(col(tsCol)))
      .withColumn("__n", count(col(valueCol)).over(w))
      .withColumn("__s1", sum(dec).over(w).cast("double"))
      .withColumn("__s2", sum(dec * dec).over(w).cast("double"))
      .withColumn("z", {
        val n = col("__n").cast("double")
        val mu = col("__s1") / n
        val varPop = (col("__s2") - col("__s1") * col("__s1") / n) / n
        when(col("__n") >= minN && varPop > 0.0,
          (col(valueCol) - mu) / sqrt(varPop))
      })
      .drop("__micros", "__n", "__s1", "__s2")
  }

  /** Next-event Markov transition matrix: per key, order events by
    * (tsCol, tieCol) — the tie column makes `lead` deterministic under
    * same-instant events — and count (from, to) adjacent pairs, with the
    * row-conditional probability as ONE division of exact counts. One
    * shuffle for the per-key ordering, one for the pair counts; the
    * per-from normalization window runs over |types|² rows. */
  def markovTransitions(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
    pairs.withColumn("p",
      col("cnt").cast("double") /
        sum(col("cnt")).over(Window.partitionBy(col("from_type"))).cast("double"))
  }

  /** Sequence-model training examples from an event log: for every event
    * with a FULL k-length history, (context = the k preceding event
    * types, label = this event's type), aggregated to the (context,
    * label, n) transition table — [[markovTransitions]] generalized from
    * bigrams to order-k, and the supervised shape a next-event model
    * trains on. One per-key window shuffle (k-bounded frames), one
    * count aggregation; the output is vocabulary^k-bounded, not
    * corpus-bounded. */
  def nextEventExamples(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, k: Int): DataFrame = {
    require(k >= 1, "nextEventExamples needs k >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-k, -1)
    events
      .withColumn("__ctx", collect_list(col(typeCol)).over(w))
      .filter(size(col("__ctx")) === k)
      .select(concat_ws(">", col("__ctx")).as("context"),
        col(typeCol).as("label"))
      .groupBy("context", "label")
      .agg(count(lit(1)).as("n"))
  }

  /** Welch's t-test per group between two arms: per (group, arm) exact
    * decimal moments (n, Σx, Σx² — the [[anomalyZScore]] portability
    * pattern), folded into ONE conditional aggregation pass, then the t
    * statistic in a fixed IEEE op order — cross-engine hash-verifiable
    * experiment readouts. t is null when either arm has < 2 values or
    * both variances are zero. `armCol` must be 0/1. */
  def welchTTest(df: DataFrame, groupCols: Seq[String], armCol: String,
      valueCol: String): DataFrame = {
    val dec = col(valueCol).cast("decimal(18,6)")
    def m(arm: Int, e: Column) = sum(when(col(armCol) === arm, e))
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(when(col(armCol) === 0 && col(valueCol).isNotNull, lit(1))).as("n_a"),
      count(when(col(armCol) === 1 && col(valueCol).isNotNull, lit(1))).as("n_b"),
      m(0, dec).cast("double").as("__s1a"), m(0, dec * dec).cast("double").as("__s2a"),
      m(1, dec).cast("double").as("__s1b"), m(1, dec * dec).cast("double").as("__s2b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val meanA = col("__s1a") / na
    val meanB = col("__s1b") / nb
    val varA = (col("__s2a") - col("__s1a") * col("__s1a") / na) / (na - 1.0)
    val varB = (col("__s2b") - col("__s1b") * col("__s1b") / nb) / (nb - 1.0)
    val se2 = varA / na + varB / nb
    agg
      .withColumn("mean_a", meanA)
      .withColumn("mean_b", meanB)
      .withColumn("t_stat",
        when(col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0.0,
          (meanA - meanB) / sqrt(se2)))
      .drop("__s1a", "__s2a", "__s1b", "__s2b")
  }

  /** Pearson correlation and OLS slope/intercept of y on x, per group,
    * from EXACT decimal cross-moments (Σx, Σy, Σxy, Σx², Σy² — decimal×
    * decimal products, one conditional-agg pass) and a fixed IEEE op
    * order — the hash-verifiable form of corr()/regr_slope(), whose
    * native float implementations are partition-order-dependent. Null
    * when n < 2 or a variance is zero. Rows where either value is null
    * are excluded pairwise (SQL corr semantics). */
  def corrRegression(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val bothPresent = col(xCol).isNotNull && col(yCol).isNotNull
    val x = when(bothPresent, col(xCol).cast("decimal(18,6)"))
    val y = when(bothPresent, col(yCol).cast("decimal(18,6)"))
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(when(bothPresent, lit(1))).as("n"),
      sum(x).cast("double").as("__sx"), sum(y).cast("double").as("__sy"),
      sum(x * y).cast("double").as("__sxy"),
      sum(x * x).cast("double").as("__sxx"),
      sum(y * y).cast("double").as("__syy"))
    val n = col("n").cast("double")
    val covN = col("__sxy") - col("__sx") * col("__sy") / n
    val varX = col("__sxx") - col("__sx") * col("__sx") / n
    val varY = col("__syy") - col("__sy") * col("__sy") / n
    val slope = covN / varX
    agg
      .withColumn("r",
        when(col("n") >= 2 && varX > 0.0 && varY > 0.0,
          covN / sqrt(varX * varY)))
      .withColumn("slope", when(col("n") >= 2 && varX > 0.0, slope))
      .withColumn("intercept",
        when(col("n") >= 2 && varX > 0.0,
          col("__sy") / n - slope * (col("__sx") / n)))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /** Quantile-bucket stats: ntile(`n`) over (`valueCol`, `tieCol`) total
    * order, then per-bucket count/min/max. The global sort for ntile is the
    * honest cost (equal-COUNT buckets need a total order); for rank-free
    * quantiles at 100 TB use approx_percentile instead. */
  def ntileStats(df: DataFrame, valueCol: String, tieCol: String, n: Int): DataFrame = {
    val w = Window.orderBy(col(valueCol).asc, col(tieCol).asc)
    df.withColumn("bucket", ntile(n).over(w).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Approximate-then-exact heavy hitters for when the distinct-key count
    * itself is too large to shuffle (URLs, n-grams at 100 TB): a
    * per-partition Misra–Gries pass keeps `capacity` counters and emits
    * surviving candidate keys; only candidates are then counted exactly
    * and top-k'd. Misra–Gries guarantees every key with global frequency
    * > N/capacity survives SOME partition's summary, so with capacity ≥
    * the inverse frequency of the true k-th hitter the result equals
    * [[heavyHitters]] exactly — verified in AnalyticsSpec. The shuffle
    * carries at most numPartitions × capacity candidate keys plus the
    * (pre-filtered) exact recount. */
  def heavyHittersMG(df: DataFrame, keyCol: String, k: Int, capacity: Int): DataFrame = {
    val keys = df.select(col(keyCol).cast("string"))
    val candidates = keys
      .mapPartitions { it =>
        val counters = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { row =>
          val key = if (row.isNullAt(0)) null else row.getString(0)
          if (counters.contains(key)) counters(key) += 1L
          else if (counters.size < capacity) counters(key) = 1L
          else {
            // decrement-all step; drop zeroed counters
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            counters.keysIterator.foreach { c =>
              val n = counters(c) - 1L
              if (n == 0L) dead += c else counters(c) = n
            }
            dead.foreach(counters.remove)
          }
        }
        counters.keysIterator.map(org.apache.spark.sql.Row(_))
      }(org.apache.spark.sql.Encoders.row(
        new org.apache.spark.sql.types.StructType()
          .add("cand", org.apache.spark.sql.types.StringType)))
      .distinct()
    df.join(broadcast(candidates),
        col(keyCol).cast("string") <=> col("cand"), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Robust outlier detection via median absolute deviation: flag rows
    * whose |value − median| exceeds `kPermille/1000 · MAD`. The z-score
    * route (q111) breaks down exactly when it matters — outliers inflate
    * the mean and stddev they're measured against, masking themselves —
    * while the median and MAD have a 50% breakdown point. Both medians
    * are EXACT interpolated percentiles (integer inputs ⇒ .0/.5 values,
    * bit-identical across engines, the q66 equivalence); the threshold
    * multiply is plain IEEE arithmetic both engines share.
    *
    * Scale shape: two single-row exact-percentile aggregations broadcast
    * back into a per-row flag — no window, no sort of the data side. At
    * 100 TB swap the exact percentile for the q211 rank sketch; the
    * operator shape is unchanged. */
  def madOutliers(df: DataFrame, idCol: String, valueCol: String,
      kPermille: Long): DataFrame = {
    require(kPermille > 0, "kPermille must be positive")
    val v = df.where(col(valueCol).isNotNull)
    val med = v.agg(expr(s"percentile(`$valueCol`, 0.5)").as("__med"))
    val dev = v.crossJoin(broadcast(med))
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("__med")))
    val mad = dev.agg(expr("percentile(__dev, 0.5)").as("__mad"))
    dev.crossJoin(broadcast(mad))
      .where(col("__dev") > lit(kPermille.toDouble) / 1000.0 * col("__mad"))
      .select(col(idCol), col(valueCol),
        col("__med").as("median"), col("__mad").as("mad"),
        col("__dev").as("deviation"))
  }

  /** Distribution drift between two snapshots of a corpus — the data
    * monitoring report that catches a silently changed upstream (a
    * crawler that started favoring one source, a length distribution
    * that shifted after a parser update) BEFORE the shift poisons a
    * training mix. For each key (a category, or a pre-bucketed numeric):
    * both snapshots' counts, each side's share of its own total in
    * exact permille, and the signed share delta — integer arithmetic
    * end to end, so the drift report itself is reproducible evidence
    * (the classic PSI reports the same shift, fuzzily; threshold on
    * max |delta_permille| instead). Keys absent from one side appear
    * with a zero count — disappearance IS drift.
    *
    * Scale shape: one count aggregation per side, a full-outer join on
    * the (bounded) key space, totals broadcast back from 1-row aggs —
    * the corpora themselves shuffle only for their group rollups. */
  def shareDrift(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val ca = a.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n_b"))
    val ta = a.agg(count(lit(1)).as("__ta"))
    val tb = b.agg(count(lit(1)).as("__tb"))
    ca.join(cb, Seq("key"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .withColumn("share_a_permille", expr("(n_a * 1000) div __ta"))
      .withColumn("share_b_permille", expr("(n_b * 1000) div __tb"))
      .withColumn("delta_permille",
        col("share_b_permille") - col("share_a_permille"))
      .drop("__ta", "__tb")
  }
  /** Join-key skew profile — the pre-flight check before any large join:
    * per-key load aggregation (partial-agg shuffles only the distinct
    * keys), then the top-`topK` heaviest keys with their permille share
    * via TakeOrdered (never a global sort). A key with share_permille in
    * the hundreds is the one you salt ([[graft.Queries]] q149) or let
    * AQE skew-split. */
  def joinKeySkewProfile(df: DataFrame, keyCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, "joinKeySkewProfile needs topK >= 1")
    val loads = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("load"))
    loads
      .crossJoin(broadcast(loads.agg(
        sum("load").as("__total"), count(lit(1)).as("n_keys"))))
      .orderBy(col("load").desc, col("key").asc)
      .limit(topK)
      .select(col("key"), col("load"),
        expr("(load * 1000) div __total").as("share_permille"),
        expr("(load * n_keys * 1000) div __total").as("skew_x_permille"))
  }
  /** Frequent 2-itemsets (the A-priori pair census). One shuffle
    * co-locates each basket (repartition on the basket key +
    * sortWithinPartitions), then a streaming per-partition kernel walks
    * the sorted runs and emits each (a, b) pair PACKED into one
    * primitive long (a·2³¹ + b; the run is sorted so a < b by
    * construction) — never a basket self-join, never a collect_set
    * array agg (ObjectHashAggregate's sort-fallback made the array
    * build the bottleneck: profiled 1.1 s vs 0.74 s for this shape at
    * sf0.1), and never nested transform(slice(...)) lambdas (HOFs
    * evaluate interpreted — the q279 gram-set lesson; 10.8× DuckDB in
    * the round-9 verdict). The packed stream partial-aggregates
    * map-side on the single long key, so only distinct pairs shuffle.
    * Baskets above `maxBasket` distinct items are skipped (documented
    * hub cap: a degenerate mega-basket is size² pair work and zero
    * signal); rows with a null basket or item are skipped (a null
    * basket is not a basket). Loud refusal beyond 31-bit item ids —
    * re-key first.
    * Output: (item_a, item_b, support), canonical item_a < item_b. */
  def frequentItemPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasket: Int = 1024): DataFrame = {
    require(minSupport >= 1 && maxBasket >= 2,
      "frequentItemPairs needs minSupport >= 1, maxBasket >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val cap = maxBasket
    df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).cast("long").as("b"),
        col(itemCol).cast("long").as("i"))
      .repartition(col("b"))
      .sortWithinPartitions("b", "i")
      .as[(Long, Long)]
      .mapPartitions { it =>
        // runs of one basket arrive sorted and adjacent; dedup in-run,
        // flush a packed-pair array per basket, explode downstream
        new Iterator[Array[Long]] {
          private var curB = Long.MinValue
          private var items = new Array[Long](64)
          private var n = 0
          private var pending: Array[Long] = null
          private var done = false
          private def flush(): Array[Long] = {
            val k = n; n = 0
            if (k < 2 || k > cap) return null
            require(items(0) >= 0L && items(k - 1) < 2147483648L,
              "frequentItemPairs packs pairs into int64: item ids must " +
                "be in [0, 2^31) — re-key the items first")
            val out = new Array[Long](k * (k - 1) / 2)
            var w = 0; var i = 0
            while (i < k - 1) {
              val hi = items(i) * 2147483648L
              var j = i + 1
              while (j < k) { out(w) = hi + items(j); w += 1; j += 1 }
              i += 1
            }
            out
          }
          private def advance(): Unit = {
            while (pending == null && !done) {
              if (!it.hasNext) { done = true; pending = flush() }
              else {
                val (b, v) = it.next()
                if (b != curB) { pending = flush(); curB = b }
                if (n == 0 || items(n - 1) != v) {
                  if (n == items.length)
                    items = java.util.Arrays.copyOf(items, n * 2)
                  items(n) = v; n += 1
                }
              }
            }
          }
          def hasNext: Boolean = { advance(); pending != null }
          def next(): Array[Long] = {
            advance(); val r = pending; pending = null; r
          }
        }
      }
      .toDF("ps").select(explode(col("ps")).as("p"))
      .groupBy("p")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(shiftright(col("p"), 31).as("item_a"),
        col("p").bitwiseAND(lit(2147483647L)).as("item_b"),
        col("support"))
  }

  /** CUSUM change-point over a daily count series: the day where the
    * cumulative deviation from the global mean peaks — EXACT in integers
    * by scaling deviations by the day count (S_d = Σ (c·D − total)).
    * One daily aggregation (the series frame is bounded by the calendar,
    * not the corpus), cumulative window over it, one argmax fold with
    * deterministic earliest-day tie-break. */
  def cusumChangepoint(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val wAll = Window.partitionBy()
    val wCum = Window.partitionBy().orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("total", sum("c").over(wAll))
      .withColumn("days", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("c") * col("days") - col("total")).over(wCum))
      .select(col("day"), col("s"), col("total"), col("days"))
      .orderBy(abs(col("s")).desc, col("day").asc)
      .limit(1)
      .select(col("day").as("change_day"), col("s").as("cusum_scaled"),
        col("total").cast("long").as("n_events"),
        col("days").cast("long").as("n_days"))
  }
  /** Kaplan–Meier survival over user lifetimes from an event log: a
    * user's duration runs first-activity → last-activity; users whose
    * last activity is within `churnGapDays` of the observation end are
    * CENSORED (still alive), the rest are churn events. The risk table
    * lives on the duration-bounded frame (≤ observation-window days);
    * survival is reported as ln S(d) = Σ_{t≤d} ln(1 − d_t/n_t) — the
    * per-term ln is one fixed IEEE op and the cumulative fold is exact
    * decimal, so the curve is bit-portable (exp is NOT applied: libm
    * exp varies across engines; ln S is the portable form). ln_surv is
    * null from the point S hits exactly 0 (every at-risk user churned).
    * Output per duration: n_risk, n_events, n_censored, ln_surv. */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      churnGapDays: Int): DataFrame = {
    require(churnGapDays >= 0, "kaplanMeier needs churnGapDays >= 0")
    val wCum = Window.partitionBy().orderBy("duration")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = riskTable(events, userCol, tsCol, churnGapDays)
      .withColumn("__term",
        when(col("n_events") === 0L, lit(java.math.BigDecimal.ZERO)
          .cast("decimal(38,18)"))
          .when(col("n_events") < col("n_risk"),
            log((col("n_risk") - col("n_events")).cast("double") /
              col("n_risk").cast("double")).cast("decimal(38,18)"))
          .otherwise(lit(null).cast("decimal(38,18)")))
      .withColumn("ln_surv", sum("__term").over(wCum).cast("double"))
    risk.select(col("duration"), col("n_risk").cast("long").as("n_risk"),
      col("n_events").cast("long").as("n_events"),
      col("n_censored").cast("long").as("n_censored"), col("ln_surv"))
  }

  /** Shared survival plumbing for [[kaplanMeier]] / [[nelsonAalen]]:
    * user lifetimes (first→last activity, censored when last activity is
    * within `churnGapDays` of observation end) aggregated into the
    * duration-bounded risk table — per duration: n_events, n_censored,
    * n_risk. One user aggregation + one duration aggregation; the
    * windows run over ≤ observation-window-days rows. */
  private def riskTable(events: DataFrame, userCol: String, tsCol: String,
      churnGapDays: Int): DataFrame = {
    val lifetimes = events
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("f"), max(to_date(col(tsCol))).as("l"))
    // observation end via a 1-row agg broadcast back — NOT a
    // partition-less window over the per-user frame, which would drag
    // every user through one partition (round-10 advice; the
    // splitConformalCoverage pattern)
    val users = lifetimes
      .crossJoin(broadcast(lifetimes.agg(max("l").as("obs_end"))))
      .withColumn("duration", datediff(col("l"), col("f")))
      .withColumn("churned",
        datediff(col("obs_end"), col("l")) > churnGapDays)
    val tbl = users.groupBy("duration")
      .agg(
        count(when(col("churned"), lit(1))).as("n_events"),
        count(when(!col("churned"), lit(1))).as("n_censored"),
        count(lit(1)).as("__total"))
    val wAll = Window.partitionBy()
    val wBefore = Window.partitionBy().orderBy("duration")
      .rowsBetween(Window.unboundedPreceding, -1)
    tbl.withColumn("n_risk",
      sum("__total").over(wAll) -
        coalesce(sum("__total").over(wBefore), lit(0L)))
  }

  /** Nelson–Aalen cumulative hazard over the same lifetimes as
    * [[kaplanMeier]] — the estimator survival analysis prefers when the
    * hazard (not the survival curve) is the decision quantity, and the
    * numerically gentler one near S→0 (a sum, not a product that hits
    * zero): H(d) = Σ_{t≤d} d_t/n_t, with Aalen's variance Σ d_t/n_t².
    * Each term is ONE IEEE division of exact integers captured as
    * DECIMAL(38,18); the cumulative fold is exact decimal — bit-portable
    * like ln_surv. Output per duration: n_risk, n_events, n_censored,
    * cum_hazard, cum_hazard_var. */
  def nelsonAalen(events: DataFrame, userCol: String, tsCol: String,
      churnGapDays: Int): DataFrame = {
    require(churnGapDays >= 0, "nelsonAalen needs churnGapDays >= 0")
    val wCum = Window.partitionBy().orderBy("duration")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    riskTable(events, userCol, tsCol, churnGapDays)
      .withColumn("__h",
        (col("n_events").cast("double") / col("n_risk").cast("double"))
          .cast("decimal(38,18)"))
      .withColumn("__v",
        (col("n_events").cast("double") /
          (col("n_risk") * col("n_risk")).cast("double"))
          .cast("decimal(38,18)"))
      .withColumn("cum_hazard", sum("__h").over(wCum).cast("double"))
      .withColumn("cum_hazard_var", sum("__v").over(wCum).cast("double"))
      .select(col("duration"), col("n_risk").cast("long").as("n_risk"),
        col("n_events").cast("long").as("n_events"),
        col("n_censored").cast("long").as("n_censored"),
        col("cum_hazard"), col("cum_hazard_var"))
  }

  /** Theil–Sen robust trend per group: the MEDIAN of all pairwise slopes
    * (y₂−y₁)/(x₂−x₁) over x-distinct point pairs — the slope estimator
    * that shrugs off ~29% outliers where least squares (q117) bends.
    * Pairs are quadratic per group BY DESIGN, so the operator is gated:
    * it REFUSES groups beyond `maxPoints` (at corpus scale, aggregate to
    * a bounded grid first — daily counts, not raw events). The median is
    * exact: slopes rank by their deterministic IEEE quotient (ties
    * broken by the integer num/den pair), and the reported slope is the
    * RATIONAL median — for even counts the two middle slopes average as
    * (a·d₂ + c·d₁) / (2·d₁·d₂), exact integers; the double is one final
    * division. Groups with no x-distinct pair (all x equal) are dropped.
    * Output per group: n_points, n_slopes, slope_num, slope_den, slope.
    */
  def theilSenSlope(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, maxPoints: Int = 2000): DataFrame = {
    require(maxPoints >= 2, "theilSenSlope needs maxPoints >= 2")
    val pts = df
      .filter(col(groupCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    val counts = pts.groupBy("__g").agg(count(lit(1)).as("n_points"))
      .withColumn("__guard",
        when(col("n_points") > maxPoints, raise_error(concat(
          lit(s"theilSenSlope: group "), col("__g").cast("string"),
          lit(s" has "), col("n_points").cast("string"),
          lit(s" points > maxPoints=$maxPoints — aggregate to a bounded" +
            " grid first"))))
          .otherwise(lit(null).cast("string")))
      .select("__g", "n_points", "__guard")
    val a = pts.select(col("__g"), col("__x").as("x1"), col("__y").as("y1"))
    val b = pts.select(col("__g"), col("__x").as("x2"), col("__y").as("y2"))
    val slopes = a.join(b, Seq("__g")).filter(col("x1") < col("x2"))
      .select(col("__g"),
        (col("y2") - col("y1")).as("num"),
        (col("x2") - col("x1")).as("den"),
        ((col("y2") - col("y1")).cast("double") /
          (col("x2") - col("x1")).cast("double")).as("__s"))
    val wRank = Window.partitionBy("__g")
      .orderBy(col("__s").asc, col("num").asc, col("den").asc)
    val ranked = slopes
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("__g")))
    val med = ranked
      .groupBy("__g")
      .agg(
        max("__n").as("n_slopes"),
        max(when(col("__rn") === expr("(__n + 1) div 2"),
          col("num"))).as("__n1"),
        max(when(col("__rn") === expr("(__n + 1) div 2"),
          col("den"))).as("__d1"),
        max(when(col("__rn") === expr("__n div 2 + 1"),
          col("num"))).as("__n2"),
        max(when(col("__rn") === expr("__n div 2 + 1"),
          col("den"))).as("__d2"))
    med.join(counts, Seq("__g"))
      .select(col("__g").as("grp"), col("n_points"), col("n_slopes"),
        (col("__n1") * col("__d2") + col("__n2") * col("__d1"))
          .as("slope_num"),
        (lit(2L) * col("__d1") * col("__d2")).as("slope_den"),
        ((col("__n1") * col("__d2") + col("__n2") * col("__d1"))
          .cast("double") /
          (lit(2L) * col("__d1") * col("__d2")).cast("double"))
          .as("slope"),
        col("__guard"))
      .filter(col("__guard").isNull)
      .drop("__guard")
  }

  /** Lag-k autocorrelation of the daily event-count series per group,
    * lags 1..`maxLag`, over the DENSE day grid (missing days count 0 —
    * ACF over a gappy series silently shifts phases). Exact integers end
    * to end: with S = Σy and N days, r_k's numerator Σ(N·y_t − S)(N·y_{t+k}
    * − S) and denominator Σ(N·y_t − S)² clear the mean's division, fold
    * as DECIMAL(38,0), and meet in ONE IEEE division. The day grid is
    * observation-window-bounded; the lag join is an equi-join on
    * (group, day+k). */
  def lagAutocorrelation(events: DataFrame, groupCol: String,
      tsCol: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "lagAutocorrelation needs maxLag >= 1")
    val daily = events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(groupCol).as("g"),
        datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .agg(count(lit(1)).as("y"))
    val grid = daily.groupBy("g")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("g"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val dense = grid.join(daily, Seq("g", "d"), "left")
      .select(col("g"), col("d"), coalesce(col("y"), lit(0L)).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = dense.groupBy("g").agg(
      count(lit(1)).as("n_days"), sum("y").as("s"))
    val base = dense.join(broadcast(stats), Seq("g"))
    val den = base.groupBy("g").agg(
      sum(((col("n_days") * col("y") - col("s")) *
        (col("n_days") * col("y") - col("s"))).cast("decimal(38,0)"))
        .as("den"))
    val num = base
      .withColumn("lag", explode(sequence(lit(1L), lit(maxLag.toLong))))
      .withColumn("__d2", col("d") + col("lag"))
      .join(dense.select(col("g"), col("d").as("__d2"),
        col("y").as("__y2")), Seq("g", "__d2"))
      .groupBy("g", "lag")
      .agg(
        max("n_days").as("n_days"),
        sum(((col("n_days") * col("y") - col("s")) *
          (col("n_days") * col("__y2") - col("s")))
          .cast("decimal(38,0)")).as("acf_num"))
    val out = num.join(den, Seq("g"))
      .select(col("g").as("grp"), col("lag"),
        col("n_days").cast("long").as("n_days"),
        col("acf_num").cast("long").as("acf_num"),
        col("den").cast("long").as("acf_den"),
        when(col("den") > 0,
          col("acf_num").cast("double") / col("den").cast("double"))
          .as("acf"))
      // eager O(groups·maxLag) materialization so the grid cache can be
      // released on exit (the triangleCounts pattern)
      .localCheckpoint(true)
    dense.unpersist(false)
    out
  }

  /** EWMA anomaly score over daily event counts, EXACT in integers: the
    * α=½ exponentially-weighted moving sum of the previous `window` days
    * is held 2^window-scaled — s(d) = Σ_{k=1..W} y(d−k)·2^{W−k}, every
    * weight a power of two — so "today vs smoothed history" is pure
    * integer arithmetic any engine replays (libm-free, unlike a float
    * EWMA recurrence whose fold order is engine-private). The score
    * normalizes by the full-history weight mass (2^W − 1): ≈1000 means
    * today looks like the decayed past, ≫1000 is a spike. Days with no
    * history emit a null score, not a fabricated one. Scale shape: the
    * corpus aggregates to daily counts FIRST; the window-explode (W
    * rows per day-count) and the target-day re-aggregation all happen
    * on the bounded daily frame. */
  def ewmaAnomalyScore(events: DataFrame, groupCol: String,
      tsCol: String, window: Int = 20): DataFrame = {
    require(window >= 1 && window <= 40,
      "ewmaAnomalyScore needs 1 <= window <= 40 (weights are 2^window-scaled)")
    val daily = events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(groupCol).as("g"),
        datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .agg(count(lit(1)).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val contrib = daily
      .withColumn("k", explode(sequence(lit(1L), lit(window.toLong))))
      .select(col("g"), (col("d") + col("k")).as("d"),
        expr(s"y * shiftleft(1L, cast($window - k as int))").as("w"))
      .groupBy("g", "d").agg(sum("w").as("ewms_scaled"))
    val out = daily.join(contrib, Seq("g", "d"), "left")
      .select(col("g").as("grp"), col("d").as("day"), col("y"),
        coalesce(col("ewms_scaled"), lit(0L)).as("ewms_scaled"))
      .withColumn("score_permille",
        expr(s"CASE WHEN ewms_scaled > 0 THEN " +
          s"(y * (${(1L << window) - 1}L) * 1000) div ewms_scaled END"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Daily OHLC bars per group from an event stream — open/close by
    * event time (ties to the smaller event id, so the bar is
    * deterministic under same-timestamp bursts), high/low as order-free
    * extrema, and the day's volume summed as DECIMAL(38,6) (exact and
    * fold-order-free where a raw double sum would drift by partition
    * order). One shuffle on (group, day); the two windows run inside
    * each bar's partition. */
  def ohlcBars(events: DataFrame, groupCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val base = events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), to_date(col(tsCol)).as("day"),
        col(tsCol).as("__ts"), col(idCol).as("__id"),
        col(valueCol).cast("double").as("__v"))
    val asc = Window.partitionBy("grp", "day")
      .orderBy(col("__ts").asc, col("__id").asc)
    val desc = Window.partitionBy("grp", "day")
      .orderBy(col("__ts").desc, col("__id").desc)
    base
      .withColumn("__ra", row_number().over(asc))
      .withColumn("__rd", row_number().over(desc))
      .groupBy("grp", "day")
      .agg(
        max(when(col("__ra") === 1, col("__v"))).as("open"),
        max("__v").as("high"), min("__v").as("low"),
        max(when(col("__rd") === 1, col("__v"))).as("close"),
        count(lit(1)).as("n_events"),
        // DECIMAL(18,2): the fixture values are 2-dp money-like, so the
        // cast is exact (the q36 recipe) and the fold is order-free —
        // a raw double sum would drift by partition order
        sum(col("__v").cast("decimal(18,2)")).cast("double").as("volume"))
  }

  /** Top event-type TRIGRAMS across user journeys — the order-3 upgrade
    * of the Markov transition matrix (q114): which three-step paths
    * dominate, the view that finds funnel shapes no pairwise matrix can
    * (A→B→A ping-pongs vs A→B→C progressions). Sequence order is
    * (ts, id)-deterministic; trigram assembly is two leads inside the
    * per-user window partition (each user's stream sorts locally —
    * no global order); counts partial-aggregate into a
    * |types|³-bounded frame before the top-k. */
  def eventTrigrams(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, topK: Int = 25): DataFrame = {
    require(topK >= 1, "eventTrigrams needs topK >= 1")
    val w = Window.partitionBy("__u").orderBy(col("__ts").asc,
      col("__id").asc)
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(typeCol).as("t1"))
      .withColumn("t2", lead("t1", 1).over(w))
      .withColumn("t3", lead("t1", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(topK)
  }

  /** 2-D histogram over a FIXED grid (the [[Sketches.quantileSketch]]
    * clamp-then-bucket discipline in two dimensions): integer bucket
    * coordinates from declared [lo, hi) ranges, out-of-range values
    * clamped into the edge cells so the grid total always equals the row
    * count. ONE aggregation; the output is ≤ xBins·yBins cells (sparse —
    * empty cells don't materialize). The heatmap primitive under every
    * bivariate dashboard panel; exact integers, any engine replays it. */
  def histogram2d(df: DataFrame, xCol: String, yCol: String,
      xLo: Long, xHi: Long, xBins: Int, yLo: Long, yHi: Long,
      yBins: Int): DataFrame = {
    require(xHi > xLo && yHi > yLo && xBins >= 1 && yBins >= 1,
      "histogram2d needs hi > lo and >= 1 bin per axis")
    // floor() before the integer cast: double→int CAST truncates in
    // Spark but rounds half-even in DuckDB (the q301 lesson)
    def bucket(c: String, lo: Long, hi: Long, bins: Int) =
      expr(s"CAST(((least(greatest(CAST(floor(`$c`) AS BIGINT), ${lo}L)" +
        s", ${hi - 1}L) - ${lo}L) * ${bins}L) div ${hi - lo}L AS INT)")
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(bucket(xCol, xLo, xHi, xBins).as("x_bucket"),
        bucket(yCol, yLo, yHi, yBins).as("y_bucket"))
      .groupBy("x_bucket", "y_bucket")
      .agg(count(lit(1)).as("n"))
  }

  /** Inter-arrival-time percentiles per group: the exact rank statistics
    * of the gaps between consecutive events — the distribution that
    * justifies a sessionization gap (q125 picks a threshold; this is the
    * evidence) and sizes streaming watermarks. Epoch-second gaps from
    * one per-group lag window ((ts, id)-deterministic order), then the
    * count-frame rank selection (the winsorizedMean convention) —
    * integer end to end. */
  def interArrivalPercentiles(events: DataFrame, groupCol: String,
      tsCol: String, idCol: String,
      permilles: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      "interArrivalPercentiles: permilles must be in [1, 1000]")
    val w = Window.partitionBy("grp").orderBy(col("__ts").asc,
      col("__id").asc)
    val gaps = events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol).as("grp"),
        unix_timestamp(col(tsCol)).as("__ts"), col(idCol).as("__id"))
      .withColumn("gap", col("__ts") - lag("__ts", 1).over(w))
      .filter(col("gap").isNotNull)
    val counts = gaps.groupBy("grp", "gap").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("grp").orderBy("gap")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n_gaps", sum("c").over(Window.partitionBy("grp")))
      .select(col("grp"), col("gap"), col("cum"), col("n_gaps"),
        explode(typedlit(permilles)).as("p"))
      .filter(col("cum") >= expr("(n_gaps * p + 999) div 1000"))
      .groupBy("grp", "p")
      .agg(min("gap").as("gap_s"), max("n_gaps").as("n_gaps"))
  }

  /** Per-group dense daily count grid: every day in the group's
    * [min, max] span, zero-filled — the deterministic spine the
    * time-series operators below share (a sparse frame would make
    * "yesterday" engine-dependent). The explode is bounded by the span,
    * which is bounded by the calendar, not the corpus. */
  private def denseDaily(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(groupCol).as("grp"),
        datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .agg(count(lit(1)).as("y"))
    val spans = daily.groupBy("grp")
      .agg(min("d").as("d0"), max("d").as("d1"))
      .select(col("grp"), explode(sequence(col("d0"), col("d1"))).as("d"))
    spans.join(daily, Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("y"), lit(0L)).as("y"))
  }

  /** Brown's double exponential smoothing (Brown 1956; Holt-equivalent
    * level+trend for a single α) over daily event counts, EXACT in
    * integers: α = ½ with a W-day truncated window makes every EWMA
    * weight a power of two — S1(d) = Σ_{k=1..W} y(d−k)·2^(W−k) (scale
    * M = 2^W−1) and S2(d) = Σ_{k=1..W} S1(d−k)·2^(W−k) (scale M²), so
    * level = 2·S1·M − S2 and trend = S1·M − S2 (α/(1−α) = 1) are BIGINTs
    * any engine replays (the [[ewmaAnomalyScore]] contract, one EWMA
    * deeper). Evaluated on the [[denseDaily]] zero-filled grid — the
    * recurrence is meaningless on a sparse frame. Returns the LAST day's
    * state per group: level/trend/h-step forecasts as exact scaled
    * units plus readable doubles. Scale shape: aggregate to daily counts
    * first; both window-explodes live on the bounded daily frame. */
  def brownDoubleSmoothing(events: DataFrame, groupCol: String,
      tsCol: String, window: Int = 10, horizon: Int = 7): DataFrame = {
    require(window >= 2 && window <= 15,
      "brownDoubleSmoothing needs 2 <= window <= 15 (BIGINT headroom)")
    require(horizon >= 1 && horizon <= 30, "horizon in [1, 30]")
    val mass = (1L << window) - 1L
    val dense = denseDaily(events, groupCol, tsCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def ewmaScaled(df: DataFrame, vCol: String, out: String): DataFrame =
      df.withColumn("k", explode(sequence(lit(1L), lit(window.toLong))))
        .select(col("grp"), (col("d") + col("k")).as("d"),
          expr(s"$vCol * shiftleft(1L, cast($window - k as int))")
            .as("w"))
        .groupBy("grp", "d").agg(sum("w").as(out))
    val s1 = ewmaScaled(dense, "y", "s1")
    val s2 = ewmaScaled(s1, "s1", "s2")
    val state = dense.select("grp", "d")
      .join(s1, Seq("grp", "d"), "left")
      .join(s2, Seq("grp", "d"), "left")
      .select(col("grp"), col("d"),
        coalesce(col("s1"), lit(0L)).as("s1"),
        coalesce(col("s2"), lit(0L)).as("s2"))
    val wLast = Window.partitionBy("grp").orderBy(col("d").desc)
    val out = state
      .withColumn("__rn", row_number().over(wLast))
      .filter(col("__rn") === 1)
      .select(col("grp"), col("d").as("last_day"),
        (col("s1") * 2L * mass - col("s2")).as("level_scaled"),
        (col("s1") * mass - col("s2")).as("trend_scaled"))
      .withColumn("forecast_scaled",
        col("level_scaled") + lit(horizon.toLong) * col("trend_scaled"))
      .select(col("grp"), col("last_day"),
        col("level_scaled"), col("trend_scaled"), col("forecast_scaled"),
        (col("level_scaled").cast("double") / (mass * mass))
          .as("level"),
        (col("trend_scaled").cast("double") / (mass * mass))
          .as("trend"),
        (col("forecast_scaled").cast("double") / (mass * mass))
          .as(s"forecast_${horizon}d"))
      .localCheckpoint(true)
    dense.unpersist(false)
    out
  }

  /** Day-of-week seasonal indices per group — the multiplicative weekly
    * profile (index 1000 = an average day): per dow, 1000·(mean daily
    * count on that dow)/(overall mean daily count), EXACT as
    * `(total_dow · n_days · 1000) div (n_days_dow · total)` over the
    * [[denseDaily]] grid (zero days count — a dow with no traffic is a
    * real seasonal signal, not a gap). ONE aggregation over the bounded
    * daily frame. ISO dow: 1 = Monday. */
  def seasonalDowIndices(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val dense = denseDaily(events, groupCol, tsCol)
      // epoch day 0 = Thursday 1970-01-01 -> ISO dow = (d+3) mod 7 + 1
      .withColumn("dow", expr("CAST((d + 3) % 7 + 1 AS INT)"))
    val perDow = dense.groupBy("grp", "dow")
      .agg(count(lit(1)).as("n_days_dow"), sum("y").as("total_dow"))
    val totals = dense.groupBy("grp")
      .agg(count(lit(1)).as("n_days"), sum("y").as("total"))
    perDow.join(totals, Seq("grp"))
      .filter(col("total") > 0)
      .select(col("grp"), col("dow"), col("n_days_dow"), col("total_dow"),
        expr("(total_dow * n_days * 1000) div (n_days_dow * total)")
          .as("index_permille"))
  }

  /** Naive-forecast evaluation per group over the [[denseDaily]] grid:
    * the exact absolute-error masses of the two baseline forecasters —
    * persistence ŷ(d) = y(d−1) and seasonal-naive ŷ(d) = y(d−7) — on the
    * days where both are defined, plus their permille ratio (the
    * MASE-style "is weekly seasonality real?" number: < 1000 means the
    * weekly lag beats persistence). Integer end to end; one bounded
    * window. */
  def naiveForecastEval(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy("grp").orderBy("d")
    denseDaily(events, groupCol, tsCol)
      .withColumn("y1", lag("y", 1).over(w))
      .withColumn("y7", lag("y", 7).over(w))
      .filter(col("y1").isNotNull && col("y7").isNotNull)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("y") - col("y1"))).as("abs_err_naive1"),
        sum(abs(col("y") - col("y7"))).as("abs_err_naive7"))
      .withColumn("seasonal_vs_persistence_permille",
        expr("CASE WHEN abs_err_naive1 > 0 THEN " +
          "(abs_err_naive7 * 1000) div abs_err_naive1 END"))
  }

  /** Weekly activity heatmap per group: event counts on the (ISO
    * day-of-week × hour-of-day) grid with each cell's permille share of
    * the group's total — the load-profile matrix under capacity planning
    * and anomaly baselining. ONE hash aggregation into ≤ 168 cells per
    * group; dow derives from epoch-day arithmetic (engine-neutral),
    * never locale-dependent calendar calls. */
  def activityHeatmap(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val wg = Window.partitionBy("grp")
    activityCells(events, groupCol, tsCol)
      .withColumn("total", sum("n").over(wg))
      .select(col("grp"), col("dow"), col("hour"), col("n"),
        expr("(n * 1000) div total").as("share_permille"))
  }

  /** Uplift by score bin — the heterogeneous-treatment-effect table: per
    * equal-width score bin, the treated and control response rates and
    * their difference, all in exact permille integers (Radcliffe's
    * uplift-by-decile validation report). ONE hash aggregation into
    * ≤ bins·2 cells. `armCol` must be 0/1 (control/treated). */
  def upliftByBin(units: DataFrame, scorePermilleCol: String,
      armCol: String, convCol: Column, bins: Int = 5): DataFrame = {
    require(bins >= 2, "upliftByBin needs bins >= 2")
    val score = col(scorePermilleCol).cast("long")
    val bin = expr(
      s"CAST(least((CAST($scorePermilleCol AS BIGINT) * $bins) div 1000, " +
        s"${bins - 1}) AS INT)")
    units
      .filter(score.isNotNull && score.between(0L, 1000L) &&
        col(armCol).isNotNull && convCol.isNotNull)
      .select(bin.as("bin"), col(armCol).cast("int").as("__t"),
        convCol.cast("long").as("__c"))
      .groupBy("bin")
      .agg(
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("__t") === 1, col("__c")).otherwise(0L))
          .as("c_treat"),
        sum(when(col("__t") === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("__t") === 0, col("__c")).otherwise(0L))
          .as("c_control"))
      .filter(col("n_treat") > 0 && col("n_control") > 0)
      .select(col("bin"), col("n_treat"), col("c_treat"),
        col("n_control"), col("c_control"),
        expr("(c_treat * 1000) div n_treat").as("rate_treat_permille"),
        expr("(c_control * 1000) div n_control")
          .as("rate_control_permille"),
        expr("(c_treat * 1000) div n_treat - (c_control * 1000) div " +
          "n_control").as("uplift_permille"))
  }

  /** Covariate balance table (the causal-inference pre-flight): per
    * covariate, the standardized mean difference between arms
    * SMD = (x̄₁−x̄₀)/√((s₁²+s₀²)/2) — |SMD| < 0.1 is the conventional
    * "balanced" bar. ONE aggregation computes every covariate's per-arm
    * exact decimal moments (the correlationMatrix single-pass shape);
    * each SMD spends its pinned IEEE steps on exact integers. Covariates
    * must be integer-valued columns (pre-scale fixed decimals). */
  def covariateBalance(units: DataFrame, armCol: String,
      covariates: Seq[String]): DataFrame = {
    require(covariates.nonEmpty, "covariateBalance needs >= 1 covariate")
    val arm = col(armCol).cast("int")
    val base = units.filter(arm.isNotNull &&
        covariates.map(c => col(c).isNotNull).reduce(_ && _))
      .select((arm.as("__t") +:
        covariates.map(c => col(c).cast("long").as(s"__$c"))): _*)
    def m(t: Int, agg: Column): Column =
      sum(when(col("__t") === t, agg).otherwise(lit(0L))
        .cast("decimal(38,0)"))
    val moments =
      Seq(sum(when(col("__t") === 1, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__t") === 0, 1L).otherwise(0L)).as("__n0")) ++
      covariates.flatMap { c =>
        Seq(m(1, col(s"__$c")).as(s"__s1_$c"),
          m(0, col(s"__$c")).as(s"__s0_$c"),
          m(1, col(s"__$c") * col(s"__$c")).as(s"__q1_$c"),
          m(0, col(s"__$c") * col(s"__$c")).as(s"__q0_$c"))
      }
    val agg = base.agg(moments.head, moments.tail: _*)
    val n1 = col("__n1").cast("double")
    val n0 = col("__n0").cast("double")
    val cells = covariates.map { c =>
      val mean1 = col(s"__s1_$c").cast("double") / n1
      val mean0 = col(s"__s0_$c").cast("double") / n0
      // sample variance from exact n·Σx² − (Σx)² integers
      val v1 = (col("__n1") * col(s"__q1_$c") -
        col(s"__s1_$c") * col(s"__s1_$c")).cast("double") /
        (n1 * (n1 - 1.0))
      val v0 = (col("__n0") * col(s"__q0_$c") -
        col(s"__s0_$c") * col(s"__s0_$c")).cast("double") /
        (n0 * (n0 - 1.0))
      struct(lit(c).as("covariate"),
        mean1.as("mean_treat"), mean0.as("mean_control"),
        when(v1 + v0 > 0.0,
          (mean1 - mean0) / sqrt((v1 + v0) / lit(2.0))).as("smd"))
    }
    agg.select(col("__n1").cast("long").as("n_treat"),
        col("__n0").cast("long").as("n_control"),
        explode(array(cells: _*)).as("__c"))
      .select(col("__c.covariate").as("covariate"),
        col("n_treat"), col("n_control"),
        col("__c.mean_treat").as("mean_treat"),
        col("__c.mean_control").as("mean_control"),
        col("__c.smd").as("smd"))
  }

  /** Inverse-propensity off-policy evaluation (Horvitz–Thompson / the
    * Li et al. WWW'11 replay family): estimate a DETERMINISTIC target
    * policy's value from logs of another policy, with the logging
    * propensities fitted empirically as p̂(a) = n_a/N. Everything stays
    * exact-integer until one division per arm: the per-arm contribution
    * is (Σ_matched reward·1000) · N div n_a, and the estimate is the
    * summed contribution div (N·1000) surfaced in permille of reward
    * units. `targetCol` is the target policy's action per row (derive it
    * deterministically — e.g. sha of the unit id). Returns per-arm rows
    * plus the reward column scale is the caller's. */
  def ipsPolicyValue(logs: DataFrame, actionCol: String,
      targetCol: String, rewardScaledCol: String): DataFrame = {
    val base = logs.filter(col(actionCol).isNotNull &&
        col(targetCol).isNotNull && col(rewardScaledCol).isNotNull)
      .select(col(actionCol).as("action"), col(targetCol).as("__tgt"),
        col(rewardScaledCol).cast("long").as("__r"))
    val perArm = base.groupBy("action")
      .agg(count(lit(1)).as("n_logged"),
        sum(when(col("__tgt") === col("action"), 1L).otherwise(0L))
          .as("n_matched"),
        sum(when(col("__tgt") === col("action"), col("__r"))
          .otherwise(0L)).as("r_matched"))
    val tot = perArm.agg(sum("n_logged").as("__n"))
    perArm.crossJoin(broadcast(tot))
      .select(col("action"), col("n_logged"), col("n_matched"),
        col("r_matched"),
        // IPS term: matched reward reweighted by N/n_a, exact div
        expr("(r_matched * __n) div n_logged").as("ips_contribution"))
  }

  /** Difference-in-differences estimator over a user-period activity
    * panel: DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post −
    * ȳ_ctrl,pre), the parallel-trends workhorse. The panel is dense by
    * construction (a user absent from a period contributes 0, not a
    * dropped row — the classic silent bias), the four cell sums are
    * exact integers from ONE per-user aggregation, and the estimate is
    * a pinned IEEE chain over them. The period split is the corpus
    * midpoint day, derived from the data (engine-replayable). `armCol`
    * must be 0/1 on the per-user frame the caller provides via
    * `userArm`. Returns one row: the four cell sums, per-cell means,
    * did. */
  def diffInDiff(events: DataFrame, userCol: String, tsCol: String,
      userArm: Column): DataFrame = {
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"),
        datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
    val span = base.agg(min("d").as("d0"), max("d").as("d1"))
      .select(expr("(d0 + d1) div 2").as("mid"))
    val perUser = base.crossJoin(broadcast(span))
      .groupBy("u")
      .agg(sum(when(col("d") <= col("mid"), 1L).otherwise(0L))
        .as("pre"),
        sum(when(col("d") > col("mid"), 1L).otherwise(0L)).as("post"))
      .withColumn("__t", userArm.cast("int"))
      .filter(col("__t").isNotNull)
    val cells = perUser.agg(
      sum(when(col("__t") === 1, 1L).otherwise(0L)).as("n_treat"),
      sum(when(col("__t") === 0, 1L).otherwise(0L)).as("n_control"),
      sum(when(col("__t") === 1, col("pre")).otherwise(0L))
        .as("s_treat_pre"),
      sum(when(col("__t") === 1, col("post")).otherwise(0L))
        .as("s_treat_post"),
      sum(when(col("__t") === 0, col("pre")).otherwise(0L))
        .as("s_control_pre"),
      sum(when(col("__t") === 0, col("post")).otherwise(0L))
        .as("s_control_post"))
    val nt = col("n_treat").cast("double")
    val nc = col("n_control").cast("double")
    cells.filter(col("n_treat") > 0 && col("n_control") > 0)
      .select(col("n_treat"), col("n_control"),
        col("s_treat_pre"), col("s_treat_post"),
        col("s_control_pre"), col("s_control_post"),
        ((col("s_treat_post").cast("double") / nt -
          col("s_treat_pre").cast("double") / nt) -
          (col("s_control_post").cast("double") / nc -
            col("s_control_pre").cast("double") / nc)).as("did"))
  }

  /** Minimum detectable effect (two-proportion, 80% power, α = 5%
    * two-sided): MDE ≈ (z_{α/2} + z_{power})·√(2p̂(1−p̂)/n) with the
    * conventional 1.96 + 0.84 multiplier — the "was this experiment even
    * capable of seeing X?" pre-registration number, computed from the
    * ACTUAL arm sizes and pooled rate (n = the smaller arm, the binding
    * constraint). Exact counts, one pinned IEEE chain. */
  def mdePowerCheck(units: DataFrame, armCol: String,
      convCol: Column): DataFrame = {
    val counts = units
      .filter(col(armCol).isNotNull && convCol.isNotNull)
      .agg(
        sum(when(col(armCol).cast("int") === 1, 1L).otherwise(0L))
          .as("n_treat"),
        sum(when(col(armCol).cast("int") === 0, 1L).otherwise(0L))
          .as("n_control"),
        sum(convCol.cast("long")).as("k_total"),
        count(lit(1)).as("n_total"))
    val p = col("k_total").cast("double") / col("n_total").cast("double")
    val nMin = least(col("n_treat"), col("n_control")).cast("double")
    counts.filter(col("n_treat") > 0 && col("n_control") > 0)
      .select(col("n_treat"), col("n_control"), col("k_total"),
        expr("(k_total * 1000) div n_total").as("pooled_rate_permille"),
        ((lit(1.96) + lit(0.84)) *
          sqrt(lit(2.0) * p * (lit(1.0) - p) / nMin)).as("mde"))
  }

  /** Group-sequential monitoring table with the O'Brien–Fleming-SHAPED
    * boundary: per weekly look k of K, the cumulative two-proportion
    * z-statistic next to the boundary 1.96·√(K/k) (anchored so the
    * final look spends the conventional two-sided 5%; the exact OBF
    * constant for K looks differs by a few percent — this is the
    * practitioner's shape, stated as such). Crossing early is the
    * "could we have stopped?" answer; the z and the boundary are pinned
    * IEEE chains over exact cumulative counts on the bounded weekly
    * frame. */
  def obfSequentialMonitor(events: DataFrame, userCol: String,
      tsCol: String, convCol: Column): DataFrame = {
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        convCol.isNotNull)
      .select((col(userCol) % 2 === 1).cast("int").as("__t"),
        expr(s"datediff(to_date($tsCol), DATE '1970-01-01') div 7")
          .as("wk"),
        convCol.cast("long").as("__c"))
    val weekly = base.groupBy("wk")
      .agg(sum(when(col("__t") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("__t") === 1, col("__c")).otherwise(0L)).as("c1"),
        sum(when(col("__t") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("__t") === 0, col("__c")).otherwise(0L)).as("c0"))
    val wCum = Window.partitionBy().orderBy("wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = weekly
      .withColumn("look", row_number().over(
        Window.partitionBy().orderBy("wk")))
      .withColumn("looks", count(lit(1)).over(Window.partitionBy()))
      .withColumn("cn1", sum("n1").over(wCum))
      .withColumn("cc1", sum("c1").over(wCum))
      .withColumn("cn0", sum("n0").over(wCum))
      .withColumn("cc0", sum("c0").over(wCum))
      .filter(col("cn1") > 0 && col("cn0") > 0)
    val p1 = col("cc1").cast("double") / col("cn1").cast("double")
    val p0 = col("cc0").cast("double") / col("cn0").cast("double")
    val pp = (col("cc1") + col("cc0")).cast("double") /
      (col("cn1") + col("cn0")).cast("double")
    val z = (p1 - p0) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("cn1").cast("double") +
        lit(1.0) / col("cn0").cast("double")))
    val bound = lit(1.96) * sqrt(col("looks").cast("double") /
      col("look").cast("double"))
    cum.select(col("look").cast("int").as("look"),
      col("wk").cast("long").as("wk"),
      col("cn1"), col("cc1"), col("cn0"), col("cc0"),
      z.as("z"), bound.as("obf_boundary"),
      (abs(z) >= bound).as("crossed"))
  }

  /** Quantile treatment effects: per requested permille, the exact
    * rank-statistic quantile of the integer metric in each arm and
    * their difference — where the MEAN effect hides tail movement, the
    * QTE table shows which part of the distribution moved (Doksum '74).
    * Count-frame rank walk per arm (the winsorizedMean convention),
    * integers end to end. */
  def quantileTreatmentEffect(units: DataFrame, armCol: String,
      valueCol: String, permilles: Seq[Int] = Seq(500, 900)): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      "permilles in [1, 1000]")
    val counts = units
      .filter(col(armCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(armCol).cast("int").as("__t"),
        col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy("__t").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val q = counts
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(Window.partitionBy("__t")))
      .select(col("__t"), col("__v"), col("__cum"), col("__n"),
        explode(typedlit(permilles)).as("p"))
      .filter(col("__cum") >= expr("(__n * p + 999) div 1000"))
      .groupBy("__t", "p")
      .agg(min("__v").as("q"), max("__n").as("n"))
    q.filter(col("__t") === 1)
      .select(col("p"), col("q").as("q_treat"), col("n").as("n_treat"))
      .join(q.filter(col("__t") === 0)
        .select(col("p"), col("q").as("q_control"),
          col("n").as("n_control")), Seq("p"))
      .withColumn("qte", col("q_treat") - col("q_control"))
  }

  /** RFM segmentation (the direct-marketing classic): per user, recency
    * R = days since last event (against the corpus max day), frequency
    * F = event count, monetary M = Σ value in exact thousandths; each
    * metric quintiled by the EXACT rank rule q(v) = ceil(cum(v)·5/n)
    * over its bounded distinct-value count frame (ties share a bucket —
    * engine-portable, unlike ntile's row-split ties), then the 125-cell
    * (r,f,m) census. Quintile 1 = smallest values (most recent / least
    * frequent / lowest spend). Scale shape: one per-user aggregation,
    * three bounded count-frame walks broadcast back as value→quintile
    * maps, one ≤125-row census. */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val perUser = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("u"))
      .agg(max(datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
        .cast("long")).as("last_d"),
        count(lit(1)).as("f"),
        sum(coalesce(round(col(valueCol) * 1000).cast("long"), lit(0L)))
          .as("m"))
    val anchor = perUser.agg(max("last_d").as("__mx"))
    val users = perUser.crossJoin(broadcast(anchor))
      .select(col("u"), (col("__mx") - col("last_d")).as("r"),
        col("f"), col("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def quintileMap(metric: String): DataFrame = {
      val counts = users.groupBy(col(metric).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val wCum = Window.partitionBy().orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counts
        .withColumn("__cum", sum("__c").over(wCum))
        .withColumn("__n", sum("__c").over(Window.partitionBy()))
        .select(col("__v").as(metric),
          expr(s"least(5, CAST((__cum * 5 + __n - 1) div __n AS INT))")
            .as(s"${metric}_q"))
    }
    val out = users
      .join(broadcast(quintileMap("r")), Seq("r"))
      .join(broadcast(quintileMap("f")), Seq("f"))
      .join(broadcast(quintileMap("m")), Seq("m"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_users"))
      .localCheckpoint(true)
    users.unpersist(false)
    out
  }

  /** CUPED variance reduction (Deng et al. WSDM'13 — "controlled
    * experiments using pre-experiment data"): with a pre-period
    * covariate x per unit, the adjusted metric y − θ(x − x̄) at
    * θ = cov(x,y)/var(x) keeps the mean unbiased and cuts variance by
    * exactly cov²/var(x) — so the WHOLE report derives from one pass of
    * exact decimal moments (n, Σx, Σy, Σxy, Σx², Σy²); no second pass
    * over units, no per-unit adjustment materialized. The output is the
    * experiment-readout header: θ, raw and adjusted metric variance,
    * and the variance-reduction permille (= 1000·ρ²). */
  def cupedAdjustment(units: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val m = units
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,0)")).as("sx"),
        sum(col("__y").cast("decimal(38,0)")).as("sy"),
        sum((col("__x") * col("__y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("__x") * col("__x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("__y") * col("__y")).cast("decimal(38,0)")).as("syy"))
      .filter(col("n") >= 2)
    // n²-scaled exact integer moments, each spending ONE double cast
    val staged = m.select(col("n"),
      (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        .as("__cov"),
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        .as("__vx"),
      (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
        .as("__vy"))
    val nD = col("n").cast("double")
    staged.select(col("n").cast("long").as("n"),
      when(col("__vx") > 0, col("__cov") / col("__vx")).as("theta"),
      (col("__vy") / (nD * nD)).as("var_y"),
      when(col("__vx") > 0,
        (col("__vy") - (col("__cov") / col("__vx")) * col("__cov")) /
          (nD * nD)).as("var_adjusted"),
      when(col("__vx") > 0 && col("__vy") > 0,
        floor(lit(1000.0) * (col("__cov") * col("__cov")) /
          (col("__vx") * col("__vy"))).cast("long"))
        .as("reduction_permille"))
  }

  /** The heatmap's cell aggregation alone — a plain streamable count
    * state (≤ 168 cells per group), the q192 "the agg IS the
    * incremental operator" shape: run it under Structured Streaming in
    * complete mode and the cells equal the batch heatmap's; the share
    * column is a bounded post-pass over the cell frame. */
  def activityCells(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame =
    events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol).as("grp"),
        expr(s"CAST((datediff(to_date($tsCol), DATE '1970-01-01') + 3) " +
          "% 7 + 1 AS INT)").as("dow"),
        hour(col(tsCol)).as("hour"))
      .groupBy("grp", "dow", "hour")
      .agg(count(lit(1)).as("n"))

  /** Two-group log-rank test over the same user lifetimes as
    * [[kaplanMeier]] (Mantel '66): at each event duration t, group 1
    * contributes observed deaths d1_t against the hypergeometric
    * expectation d_t·n1_t/n_t with variance
    * d_t·(n1_t/n_t)·(1−n1_t/n_t)·(n_t−d_t)/(n_t−1); the statistic is
    * (O1−E1)²/V — the standard "are these two survival curves the same?"
    * gate the KM/Nelson–Aalen curves themselves can't answer. Group
    * membership is any integer 0/1 expression over the event row (e.g.
    * user parity for an A/B assignment), fixed per user by `min`.
    * Per-duration E and V terms are pinned IEEE chains over exact
    * at-risk/death counts, accumulated as exact DECIMAL(38,18); O1 is an
    * exact integer. Scale shape: one user aggregation + one
    * duration-bounded risk table; the windows run over ≤
    * observation-window-days rows. */
  def logRankTest(events: DataFrame, userCol: String, tsCol: String,
      churnGapDays: Int, groupCol: Column): DataFrame = {
    require(churnGapDays >= 0, "logRankTest needs churnGapDays >= 0")
    val lifetimes = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("f"), max(to_date(col(tsCol))).as("l"),
        min(groupCol.cast("int")).as("__g"))
    // observation end via a 1-row agg broadcast (the riskTable shape) —
    // a partition-less max window here was a single-partition pass over
    // ALL users, contradicting the documented scale shape
    val users = lifetimes
      .crossJoin(broadcast(lifetimes.agg(max("l").as("obs_end"))))
      .withColumn("duration", datediff(col("l"), col("f")))
      .withColumn("churned",
        datediff(col("obs_end"), col("l")) > churnGapDays)
    val tbl = users.groupBy("duration")
      .agg(
        count(when(col("churned") && col("__g") === 1, lit(1))).as("d1"),
        count(when(col("churned"), lit(1))).as("d"),
        count(when(col("__g") === 1, lit(1))).as("t1"),
        count(lit(1)).as("t"))
    val wAll = Window.partitionBy()
    val wBefore = Window.partitionBy().orderBy("duration")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = tbl
      .withColumn("n",
        sum("t").over(wAll) - coalesce(sum("t").over(wBefore), lit(0L)))
      .withColumn("n1",
        sum("t1").over(wAll) - coalesce(sum("t1").over(wBefore), lit(0L)))
      .filter(col("d") > 0)
    val e1 = (col("d") * col("n1")).cast("double") / col("n").cast("double")
    val v = when(col("n") > 1,
        col("d").cast("double") *
          (col("n1").cast("double") / col("n").cast("double")) *
          (lit(1.0) - col("n1").cast("double") / col("n").cast("double")) *
          ((col("n") - col("d")).cast("double") /
            (col("n") - 1).cast("double")))
      .otherwise(lit(0.0))
    risk.agg(
        sum(col("d1")).as("o1"),
        sum(e1.cast("decimal(38,18)")).cast("double").as("e1"),
        sum(v.cast("decimal(38,18)")).cast("double").as("v"))
      .select(col("o1").cast("long").as("o1"), col("e1"), col("v"),
        when(col("v") > 0,
          (col("o1").cast("double") - col("e1")) *
            (col("o1").cast("double") - col("e1")) / col("v"))
          .as("chi2"))
  }

  /** Ljung–Box portmanteau test on the daily-count series of each group:
    * Q = n·(n+2)·Σ_{k=1..h} ρ̂_k²/(n−k) over the EXACT integer
    * autocorrelations of [[lagAutocorrelation]] (ρ̂_k = num_k/den, both
    * exact n²-scaled integer sums on the zero-filled day grid) — the
    * "is there ANY serial structure left?" gate under the per-lag ACF
    * report. Each ρ̂_k is one IEEE division; the per-lag term
    * ρ̂_k·ρ̂_k/(n−k) is a pinned chain accumulated as exact
    * DECIMAL(38,18); Q is one final double chain. Groups whose series
    * is constant (den = 0) report a NULL Q rather than a fabricated
    * statistic. Scale shape: everything downstream of the one daily
    * count aggregation runs on the bounded |days|·h frame. */
  def ljungBox(events: DataFrame, groupCol: String, tsCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "ljungBox needs maxLag >= 1")
    val acf = lagAutocorrelation(events, groupCol, tsCol, maxLag)
    val rho = col("acf_num").cast("double") / col("acf_den").cast("double")
    val term = when(col("acf_den") > 0 && col("n_days") > col("lag"),
        (rho * rho / (col("n_days") - col("lag")).cast("double"))
          .cast("decimal(38,18)"))
      .otherwise(lit(null).cast("decimal(38,18)"))
    acf.groupBy(col("grp"))
      .agg(max("n_days").as("n_days"), count(lit(1)).as("h"),
        sum(term).as("__s"),
        max(when(col("acf_den") <= 0, lit(1)).otherwise(lit(0)))
          .as("__const"))
      .select(col("grp"), col("n_days").cast("long").as("n_days"),
        col("h").cast("long").as("h"),
        when(col("__const") === 0,
          col("n_days").cast("double") *
            (col("n_days") + 2L).cast("double") *
            col("__s").cast("double"))
          .as("q_lb"))
  }
}
