package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM pretraining: assign documents to fixed
  * token-budget bins ("packs") so downstream batch assembly wastes minimal
  * padding. Greedy first-fit per partition:
  *
  *  - each input partition packs independently — NO shuffle; a 100 TB corpus
  *    packs in a single narrow pass, and the per-partition approximation
  *    costs only O(#partitions) part-filled bins versus a (non-distributable)
  *    global optimum;
  *  - within a partition, each doc goes to the first open bin with room
  *    (first-fit, bounded open-bin list); docs longer than the budget get a
  *    singleton bin (callers chunk oversize docs upstream if needed);
  *  - pack ids are (partitionId << 32 | localBin) — globally unique without
  *    any coordination, deterministic for a fixed input layout.
  */
object Packing {

  val PartitionShift = 32

  /** Adds `packCol` (long). `tokenCol` must be an integral column (token
    * count per document); `maxOpenBins` bounds the first-fit scan so a
    * pathological partition stays O(n · maxOpenBins). */
  def packSequences(df: DataFrame, tokenCol: String, budget: Long,
      packCol: String = "pack_id", maxOpenBins: Int = 64): DataFrame = {
    require(budget > 0, "budget must be positive")
    val tokIdx = df.schema.fieldIndex(tokenCol)
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(packCol, LongType, nullable = false))
    val packed = df.toDF().mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var nextBin = 0L
      // open bins: (binId, remaining); first-fit over a bounded window
      val open = scala.collection.mutable.ArrayDeque.empty[(Long, Long)]
      it.map { r =>
        val tok = r.get(tokIdx) match {
          case null => 0L
          case n: Number => n.longValue()
        }
        val slot = open.indexWhere(_._2 >= tok)
        val bin =
          if (tok >= budget) { // oversize (or exactly full): singleton bin
            val b = nextBin; nextBin += 1; b
          } else if (slot >= 0) {
            val (b, rem) = open(slot)
            if (rem - tok <= 0) open.remove(slot)
            else open(slot) = (b, rem - tok)
            b
          } else {
            val b = nextBin; nextBin += 1
            open.append((b, budget - tok))
            if (open.size > maxOpenBins) open.removeHead()
            b
          }
        Row.fromSeq(r.toSeq :+ ((pid << PartitionShift) | bin))
      }
    }(Encoders.row(outSchema))
    packed
  }

  /** Per-pack rollup: document count and token total (the QA view: every
    * non-singleton pack must respect the budget). */
  def packSummary(packed: DataFrame, tokenCol: String,
      packCol: String = "pack_id"): DataFrame =
    packed.groupBy(packCol).agg(
      count(lit(1)).as("n_docs"),
      sum(col(tokenCol).cast("long")).as("sum_tokens"))

  /** Weighted mixture sampling: keep each stratum at its configured
    * fraction (dataset-mixing / temperature reweighting). Seeded Bernoulli
    * sampling per stratum — a narrow map-side filter, no shuffle, exactly
    * Spark's stratified `sampleBy`; strata absent from `fractions` are
    * dropped (explicit is better than silently kept at 1.0). */
  def sampleMixture(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic, engine-PORTABLE stratified sampling: keep a row iff
    * the leading 60 bits of sha-256(id || '#' || seed) fall below
    * fraction(stratum)·2^60. Unlike [[sampleMixture]] (engine RNG streams,
    * reproducible only within one Spark version), membership is a pure
    * function of (id, seed): identical across engines (the q90 DuckDB
    * oracle recomputes it), stable under corpus growth and repartitioning
    * (a row's fate never depends on other rows), and rerunnable — the
    * properties a training pipeline needs for frozen eval membership.
    * Strata absent from `fractions` are dropped (sampleBy semantics).
    * Per-row work only — no shuffle, no state. Fractions that are
    * multiples of 1/16 make the threshold arithmetic bit-exact across
    * engines (small-integer × 2^56 is exactly representable). */
  def portableSampleMixture(df: DataFrame, idCol: String,
      stratumCol: String, fractions: Map[String, Double],
      seed: Long): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(lit(-1L)) {
      case (acc, (s, f)) => when(col(stratumCol) === s,
        lit(math.round(f * (1L << 60)))).otherwise(acc)
    }
    val h = Dedup.shaPrefixLongUdf(15)(
      concat_ws("#", col(idCol).cast("string"), lit(seed.toString)))
    df.filter(h < thr)
  }

  /** Quality-weighted deterministic sampling (the CCNet/GPT-3-style
    * "sample good documents preferentially" step): a row survives iff
    * `hash60(id, seed) < floor((k+1) · frac · clamp(score,0,1)^k · 2^60)`
    * — acceptance probability proportional to `score^k`, expected overall
    * rate ≈ `frac` when scores are uniform ((k+1)·E[x^k] = 1). `k = 0` is
    * plain Bernoulli sampling; higher k concentrates the budget on the
    * quality head.
    *
    * Engine-portable BY CONSTRUCTION: the weight chain uses only IEEE-754
    * multiply/divide/floor (each exactly-rounded, so bit-identical in any
    * engine — no exp/ln/pow whose libm rounding varies), and the final
    * compare is integer vs integer. Membership is a pure per-row function
    * of (id, seed, score): no shuffle, no state, stable under corpus
    * growth and repartitioning — rerunnable at 100 TB as a pure map. */
  def qualityWeightedSample(df: DataFrame, idCol: String, scoreCol: String,
      exponent: Int, frac: Double, seed: Long): DataFrame = {
    require(exponent >= 0 && exponent <= 8, "exponent must be in [0, 8]")
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    val s = least(greatest(col(scoreCol).cast("double"), lit(0.0)), lit(1.0))
    val powK = (1 to exponent).foldLeft(lit(1.0).cast("double"): Column)(
      (acc, _) => acc * s)
    val thr = floor(powK * lit(frac) * lit((exponent + 1).toDouble) *
      lit(math.pow(2.0, 60))).cast("long")
    val h = Dedup.shaPrefixLongUdf(15)(
      concat_ws("#", col(idCol).cast("string"), lit(seed.toString)))
    df.filter(h < thr)
  }

  /** Rebalance a corpus to TARGET mixture shares (the dataset-mixing step:
    * "make the output 30% web / 50% code / 20% books, as large as the
    * data allows"): the largest feasible total is `T = min_s n_s/share_s`,
    * each stratum keeps `share_s · T` rows in expectation via the same
    * deterministic 60-bit hash threshold as [[portableSampleMixture]].
    * Strata absent from `targetShares` (or with share 0) are dropped.
    * Shares need not sum to 1 — only their ratios matter (they are
    * normalized by construction of T).
    *
    * Scale shape: ONE count aggregation over the stratum column builds a
    * #strata-row frame; the global min and the per-stratum rates stay in
    * that tiny frame (no driver round trip) and broadcast-join back onto
    * the corpus; acceptance is then per-row. The 100 TB side never
    * shuffles. Rate arithmetic is IEEE multiply/divide/floor only —
    * engine-portable like [[qualityWeightedSample]]. */
  def rebalanceMixture(df: DataFrame, idCol: String, stratumCol: String,
      targetShares: Map[String, Double], seed: Long): DataFrame = {
    require(targetShares.values.forall(_ >= 0.0), "shares must be >= 0")
    val shares = targetShares.filter(_._2 > 0.0).toSeq.sortBy(_._1)
    require(shares.nonEmpty, "at least one positive target share required")
    val shareCol = shares.foldLeft(lit(null).cast("double"): Column) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    rebalanceMixtureByShareCol(df, idCol, stratumCol, shareCol, seed)
  }

  /** [[rebalanceMixture]] with the target share supplied as a COLUMN
    * over the stratum value instead of a driver-side Map — lets a
    * caller derive data-dependent shares (e.g. rank-cycled over the
    * distinct strata) entirely in-plan, with no collect round trip
    * (one fewer sequential Spark job on the query's critical path).
    * Rows whose share expression is null or <= 0 are dropped, matching
    * the Map overload's absent/zero-share semantics. */
  def rebalanceMixtureByShareCol(df: DataFrame, idCol: String,
      stratumCol: String, shareCol: Column, seed: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__share", shareCol)
      .filter(col("__share").isNotNull && col("__share") > 0.0)
    val t = counts.agg(
      min(col("__n").cast("double") / col("__share")).as("__t"))
    val rates = counts.crossJoin(broadcast(t))
      .withColumn("__thr", floor(
        ((col("__share") * col("__t")) / col("__n").cast("double")) *
          lit(math.pow(2.0, 60))).cast("long"))
      .select(col(stratumCol), col("__thr"))
    val h = Dedup.shaPrefixLongUdf(15)(
      concat_ws("#", col(idCol).cast("string"), lit(seed.toString)))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(h < col("__thr"))
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Temperature-based mixture rebalance (the multilingual-pretraining
    * standard: target share ∝ n^α flattens the head and lifts the tail
    * without the cliff of uniform shares): derive per-stratum target
    * shares from the stratum counts and hand them to
    * [[rebalanceMixture]]'s portable-hash keep machinery. α is
    * restricted to permille values whose power is a composition of IEEE
    * square roots (1000 = identity, 500 = √, 250 = √√) — sqrt is
    * CORRECTLY ROUNDED in IEEE 754, so every engine derives the exact
    * same shares and thresholds, where a general `pow` (not correctly
    * rounded) could disagree in the last ulp and flip sampling
    * decisions. Stratum counts collect to the driver — the same
    * bounded-strata contract as [[sampleMixture]]. */
  def temperatureRebalance(df: DataFrame, idCol: String, stratumCol: String,
      alphaPermille: Int, seed: Long): DataFrame = {
    require(Set(250, 500, 1000).contains(alphaPermille),
      "alphaPermille must be 250, 500, or 1000 (exact IEEE-sqrt powers)")
    val powFn: Double => Double = alphaPermille match {
      case 1000 => identity
      case 500 => math.sqrt
      case 250 => (x: Double) => math.sqrt(math.sqrt(x))
    }
    val shares = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("s"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> powFn(r.getLong(1).toDouble))
      .toMap
    rebalanceMixture(df, idCol, stratumCol, shares, seed)
  }

  /** Deterministic per-group bottom-k sample: keep each group's k rows
    * whose `sha-256(id '#' seed)` ranks smallest. Membership is a pure
    * function of (id, seed) — identical across engines and epochs, stable
    * under corpus growth (one new row displaces at most one sampled row),
    * and oracle-verifiable, none of which holds for reservoir sampling's
    * engine-order dependence. Since the ranking key is uniform over ids,
    * the result is a uniform random k-subset of each group for any fixed
    * seed — the balanced-per-source subset a mixture rebalance wants.
    * One shuffle (the group window); for pathologically hot groups the
    * graft_topk bounded-heap aggregate is the map-side-combining
    * alternative when only the ids are needed. */
  def samplePerGroup(df: DataFrame, idCol: String, groupCol: String,
      k: Int, seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val key = sha2(concat_ws("#", col(idCol).cast("string"),
      lit(seed.toString)), 256)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(key.asc, col(idCol).asc)
    df.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= k)
      .drop("__graft_rk")
  }

  /** GPT-style concat-and-chunk packing plan: documents are (logically)
    * concatenated in `idCol` order and sliced into fixed `budget`-token
    * packs — a document MAY span packs (the standard pretraining packing;
    * [[packSequences]] is the no-split bin-packing alternative). Emits the
    * placement plan per document: `(id, n_tokens, start_pack, end_pack,
    * offset_in_start)`.
    *
    * Scale shape: ONE range shuffle for the global order, then a two-phase
    * distributed prefix sum — per-partition token totals (one tiny row per
    * partition collected to the driver) broadcast back as partition
    * offsets — never a global single-partition window. The plan is
    * eagerly localCheckpointed so both phases are guaranteed to have seen
    * the same partitioning. */
  def concatChunkPlan(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val sorted = df
      // null token counts pack as 0 (Row.getLong on a null would throw
      // from executor tasks otherwise); the q81 oracle coalesces the same
      .select(col(idCol),
        coalesce(col(tokenCol).cast("long"), lit(0L)).as("__n"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rdd = sorted.rdd
      // phase 1: per-partition totals — bounded driver collect
      val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(1))
        Iterator((pid, s))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
      // phase 2: running sum within each partition, shifted by its offset
      val outSchema = StructType(Seq(sorted.schema.head,
        StructField("n_tokens", LongType, nullable = false),
        StructField("start_pack", LongType, nullable = false),
        StructField("end_pack", LongType, nullable = false),
        StructField("offset_in_start", LongType, nullable = false)))
      val out = rdd.mapPartitionsWithIndex { (pid, it) =>
        var cum = offsets.value(pid)
        it.map { r =>
          val n = r.getLong(1)
          val before = cum
          cum += n
          // zero-token docs occupy no space but still get a position
          val lastTok = before + math.max(n, 1L) - 1L
          Row(r.get(0), n, before / budget, lastTok / budget, before % budget)
        }
      }
      spark.createDataFrame(out, outSchema).localCheckpoint(true)
    } finally sorted.unpersist()
  }

  /** Deterministic corpus shuffle: global order by the sha-256 of
    * (id, seed). Training-data ordering must be REPRODUCIBLE — a re-run of
    * the pipeline (or any other engine following the same contract) must
    * emit the identical permutation, which engine-seeded `rand()` cannot
    * promise across versions/parallelism. A content-independent keyed hash
    * gives exactly that, and changing the seed is a fresh independent
    * permutation (new training epoch orders without rewriting data).
    * Cost shape: one range shuffle on the hash — the same price as any
    * global sort; at 100 TB the range exchange is the unavoidable floor
    * for a total order, and writers that only need per-file shuffling can
    * instead sort-within-partitions on the same key. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long): DataFrame =
    df.orderBy(sha2(concat_ws("#", col(idCol).cast("string"),
      lit(seed.toString)), 256))

  /** Deterministic train/val/test (or any weighted) split assignment:
    * bucket = first 8 hex digits of sha-256(id, seed) scaled into [0, 1),
    * mapped through the cumulative weights. Per-row, zero-shuffle, stable
    * across engines and re-runs — membership is a pure function of
    * (id, seed), so a doc can never silently migrate between splits when
    * the corpus grows (the property modulo-on-row-number splits lack). */
  def hashSplit(df: DataFrame, idCol: String, seed: Long,
      weights: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "hashSplit needs positive split weights")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    // u in [0,1): 8 hex chars = 32 bits of the keyed hash
    val u = conv(substring(sha2(concat_ws("#", col(idCol).cast("string"),
      lit(seed.toString)), 256), 1, 8), 16, 10).cast("double") / 4294967296.0
    val expr0 = weights.zip(cuts).reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, ((name, _), cut)) =>
        when(u < cut, name).otherwise(acc)
      }
    df.withColumn(splitCol, expr0)
  }

  /** Stratified deterministic split with EXACT per-stratum proportions.
    * [[hashSplit]]'s per-row Bernoulli assignment only hits the target
    * fractions in expectation — a small or skewed stratum (one language,
    * one source) can land entirely in train. Here each (strataCols)
    * group is ranked by a keyed portable hash (sha-256 of id+seed,
    * tie-broken by id) and cut at integer-exact permille boundaries
    * (`floor(n·cum/1000)` in integer arithmetic), so every stratum
    * honors the requested ratios to within one row and any engine
    * replays the assignment bit-for-bit.
    *
    * Cost: ONE shuffle (the per-stratum window). Each stratum sorts as
    * one partition — correct for the intended use (strata are
    * language/source/domain classes, thousands at most, each fitting a
    * task's spill budget); for an unbounded-cardinality key use
    * [[hashSplit]] instead. `permille` must sum to 1000; the last bucket
    * absorbs the rounding remainder. */
  def stratifiedSplit(df: DataFrame, idCol: String, strataCols: Seq[String],
      seed: Long, permille: Seq[(String, Int)],
      splitCol: String = "split"): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedSplit needs stratum columns")
    require(permille.nonEmpty && permille.forall(_._2 > 0) &&
      permille.map(_._2).sum == 1000,
      "stratifiedSplit permille weights must be positive and sum to 1000")
    val key = sha2(concat_ws("#", col(idCol).cast("string"),
      lit(seed.toString)), 256)
    val part = Window.partitionBy(strataCols.map(col): _*)
    val cums = permille.scanLeft(0)(_ + _._2).tail
    val first = permille.head._1
    // cut points in INTEGER arithmetic — (n · cum) div 1000, the exact
    // contract the oracle replays as (n * cum) // 1000; double floor()
    // can disagree with integer division once n · cum outgrows a
    // double's 53-bit mantissa
    val tagged = df
      .withColumn("__ss_r", row_number().over(part.orderBy(key, col(idCol))))
      .withColumn("__ss_n", count(lit(1)).over(part))
    def cut(cum: Int): Column = expr(s"(__ss_n * $cum) div 1000")
    val r = col("__ss_r")
    val assign = permille.zip(cums).tail.foldLeft(
      when(r <= cut(cums.head), first)) {
        case (acc, ((name, _), cum)) => acc.when(r <= cut(cum), name)
      }.otherwise(permille.last._1)
    tagged.withColumn(splitCol, assign).drop("__ss_r", "__ss_n")
  }

  /** Cumulative-fill bin planning — the O(1)-state packing a distributed
    * compactor actually runs: within each group (a table partition —
    * files in different partitions can never merge), items sort by
    * (weight desc, key) and bin = (running-total − weight) div target —
    * i.e. the weight axis splits into target-width windows and an item
    * joins the window its start offset falls in. For the intended
    * workload (many files far below the target — the small-file problem)
    * bin weights track the target; an item bigger than the target spans
    * windows and can leave its successor bin light — acceptable for a
    * merge plan, where over-target bins are simply left alone. One
    * window per GROUP over the item frame — for file manifests that
    * frame is metadata-scale, orders of magnitude below the data it
    * describes. Unlike [[packSequences]] (partition-local first-fit for
    * token payloads), this plan is a pure function of the sorted
    * weights, so any engine replays it bit-for-bit. */
  def cumulativeFillBins(df: DataFrame, groupCols: Seq[String],
      weightCol: String, keyCol: String, target: Long,
      binCol: String = "bin"): DataFrame = {
    require(target > 0, "cumulativeFillBins needs a positive target")
    require(groupCols.nonEmpty,
      "cumulativeFillBins plans within groups (a global plan would " +
        "single-partition the window); pass a constant group to force one")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(weightCol).desc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol).cast("long")).over(w))
      .withColumn(binCol,
        expr(s"(__cum - CAST($weightCol AS BIGINT)) div $target"))
      .drop("__cum")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006
    * A-Res): each row draws a keyed-hash uniform u and scores
    * ln(u)/w — the top-k scores are exactly a weighted
    * without-replacement draw (the one-pass distributed form; a naive
    * weighted Bernoulli can't hit a fixed k, and sequential draws can't
    * distribute). DETERMINISTIC and engine-portable: u = (h + 0.5)/1000
    * from the sha-permille hash (never 0), the score is one fixed IEEE
    * ln + divide, top-k is TakeOrdered (score desc, id). Zero/negative
    * weights are excluded (they cannot be drawn). */
  def weightedSampleWithoutReplacement(df: DataFrame, idCol: String,
      weightCol: String, k: Int, seed: Long): DataFrame = {
    require(k >= 1, "weightedSampleWithoutReplacement needs k >= 1")
    val h = conv(substring(sha2(concat_ws("#",
      col(idCol).cast("string"), lit(seed.toString)), 256), 1, 8), 16, 10)
      .cast("long") % 1000
    val score = log((h.cast("double") + lit(0.5)) / lit(1000.0)) /
      col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("sample_score", score)
      .orderBy(col("sample_score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Group-aware K-fold assignment (GroupKFold semantics): fold = keyed
    * portable hash of the GROUP key mod k, so every row of a group lands
    * in the same fold — the assignment that prevents the subtlest
    * evaluation leak, a group (user, document cluster, patient) split
    * across train and validation. Per-row, zero-shuffle, stable under
    * corpus growth (membership is a pure function of (group, seed) — the
    * [[hashSplit]] contract at group granularity). */
  def groupKFold(df: DataFrame, groupCol: String, seed: Long, k: Int,
      foldCol: String = "fold"): DataFrame = {
    require(k >= 2, "groupKFold needs k >= 2")
    val h = conv(substring(sha2(concat_ws("#",
      col(groupCol).cast("string"), lit(seed.toString)), 256), 1, 8),
      16, 10).cast("long")
    df.withColumn(foldCol, (h % k).cast("int"))
  }

  /** Split-leakage audit: does any GROUP span more than one fold? ONE
    * aggregation to the (group → folds, rows) frame, one fold to a
    * single report row — n_groups, n_leaking_groups, the worst group's
    * fold spread, and how many rows sit in leaking groups (the
    * contaminated mass a reviewer actually cares about). Zero means the
    * split respects the group boundary ([[groupKFold]] by construction;
    * a row-hash split essentially never). */
  def splitLeakageAudit(df: DataFrame, groupCol: String,
      foldCol: String): DataFrame =
    df.groupBy(col(groupCol).as("__g"))
      .agg(countDistinct(col(foldCol)).as("n_folds"),
        count(lit(1)).as("n_rows"))
      .agg(
        count(lit(1)).as("n_groups"),
        count(when(col("n_folds") > 1, lit(1))).as("n_leaking_groups"),
        max("n_folds").cast("int").as("max_folds_per_group"),
        coalesce(sum(when(col("n_folds") > 1, col("n_rows"))), lit(0L))
          .as("rows_in_leaking_groups"))

  /** Temporal train/test split with an embargo gap (the time-series CV
    * discipline): train strictly before `cutTs − embargo`, test at/after
    * `cutTs`, and the embargo window in between EXCLUDED from both — the
    * buffer that keeps label horizons and autocorrelation from leaking
    * across the boundary (Lopez de Prado 2018's purged split, single
    * cut). Pure per-row expression, zero shuffle. */
  def temporalEmbargoSplit(df: DataFrame, tsCol: String, cutTs: String,
      embargoSeconds: Long, roleCol: String = "role"): DataFrame = {
    require(embargoSeconds >= 0, "temporalEmbargoSplit needs embargo >= 0")
    val cut = to_timestamp(lit(cutTs))
    val trainEnd = cut - expr(s"INTERVAL $embargoSeconds SECOND")
    df.withColumn(roleCol,
      when(col(tsCol) < trainEnd, "train")
        .when(col(tsCol) >= cut, "test")
        .otherwise("embargo"))
  }

  /** Token-budget allocation across strata by integer water-filling:
    * give every stratum an equal share of `budget`, capped at its own
    * supply, with freed capacity redistributed — the "how many tokens
    * do I take from each source" planning step of assembling a training
    * mix under a fixed budget. Exact integer semantics: allocations sum
    * to min(budget, total supply); the division remainder goes to the
    * smallest-supply unsaturated strata first (deterministic
    * tie-break by stratum name), so any engine reproduces the plan
    * bit-for-bit.
    *
    * Closed form, no iteration: sort strata by supply ascending;
    * stratum i is SATURATED (takes its whole supply) iff
    * supply_i·(n−i+1) + prefix_{i−1} ≤ budget — saturation is a prefix
    * of the sort — and the rest split the remaining budget evenly.
    * Scale shape: one supply aggregation; every window runs over the
    * AGGREGATED |strata|-row frame (bounded below, never the corpus).
    * Returns (stratum, supply, allocation). */
  def budgetAllocation(df: DataFrame, stratumCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val sup = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(sum(col(tokenCol)).cast("long").as("supply"))
    val totals = sup.agg(count(lit(1)).as("__n"),
      coalesce(sum("supply"), lit(0L)).as("__total"))
    val w = Window.orderBy(col("supply"), col("stratum"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ranked = sup.crossJoin(broadcast(totals))
      .withColumn("__i", row_number().over(w))
      .withColumn("__prefix",
        sum("supply").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__sat",
        col("supply") * (col("__n") - col("__i") + 1) +
          (col("__prefix") - col("supply")) <= budget)
      .withColumn("__satCount",
        sum(when(col("__sat"), 1L).otherwise(0L)).over(full))
      .withColumn("__satSum",
        coalesce(sum(when(col("__sat"), col("supply"))).over(full), lit(0L)))
    ranked.withColumn("allocation",
        when(lit(budget) >= col("__total") || col("__sat"), col("supply"))
          .otherwise {
            val m = col("__n") - col("__satCount")
            val rem = lit(budget) - col("__satSum")
            val base = expr(s"($budget - __satSum) div (__n - __satCount)")
            base + when(col("__i") - col("__satCount") <= rem % m, 1L)
              .otherwise(0L)
          })
      .select(col("stratum"), col("supply"), col("allocation"))
  }

  /** Reproducibility receipt for a split: per split bucket, the row
    * count, an ORDER-INDEPENDENT id-set fingerprint (bit_xor of each
    * id's 60-bit sha-256 prefix — any engine, any partitioning, any
    * row order lands on the same value; a single added, dropped, or
    * swapped id changes it), and the id range. Stapled to a training
    * run next to the table version and seed, it makes "were these
    * EXACTLY the rows?" a constant-size comparison instead of a
    * re-diff. Cost: the [[stratifiedSplit]] window + one aggregation to
    * |splits| rows. */
  def splitManifest(df: DataFrame, idCol: String, strataCols: Seq[String],
      seed: Long, permille: Seq[(String, Int)]): DataFrame =
    stratifiedSplit(df, idCol, strataCols, seed, permille)
      .groupBy("split").agg(
        count(lit(1)).as("n_rows"),
        expr(s"bit_xor(cast(conv(substring(sha2(cast(`$idCol` as string), " +
          "256), 1, 15), 16, 10) as bigint))").as("id_xor"),
        min(col(idCol)).cast("long").as("min_id"),
        max(col(idCol)).cast("long").as("max_id"))

  /** One chunk of [[contentDefinedChunks]]: 0-based index, token count,
    * space-joined text. */
  private[ext] case class CdcChunk(chunk_idx: Long, n_tokens: Long,
      chunk_text: String)

  /** Content-defined chunking (Rabin-style, here keyed on md5 for
    * cross-engine portability): a chunk boundary falls AFTER token p
    * (p >= windowTokens) when the first 32 bits of
    * md5(space-joined tokens p-w+1..p), read as an unsigned int, are
    * divisible by `divisor` — so boundaries depend only on local content,
    * never on absolute position. Inserting or deleting a token
    * re-chunks at most the chunks overlapping the edit's w-token
    * neighborhood, where fixed-size chunking (q50) shifts EVERY
    * subsequent boundary — the property that makes storage-level dedup
    * and incremental re-embedding of edited documents cheap.
    *
    * Expected chunk length ≈ `divisor` tokens. Documents shorter than one
    * window come back as a single chunk; a trailing empty chunk (boundary
    * on the last token) is not emitted.
    *
    * Scale shape: ONE per-document compiled kernel (digest reused across
    * windows), zero shuffle, zero explode before the final per-chunk
    * unnest; at 100 TB this runs at scan speed like the q139 span
    * detector's hashing pass, but never even shuffles — chunk identity is
    * wholly in-row. */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, divisor: Int): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    require(divisor >= 2, "divisor must be >= 2")
    val kernel = udf { (toks: Seq[String], w: Int, d: Int) =>
      if (toks == null || toks.isEmpty) Seq.empty[CdcChunk]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val arr = toks.toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[CdcChunk]
        val cur = new java.lang.StringBuilder()
        var curN = 0L
        var idx = 0L
        var p = 0
        while (p < arr.length) {
          if (curN > 0) cur.append(' ')
          cur.append(arr(p)); curN += 1
          if (p >= w - 1) {
            val sb = new java.lang.StringBuilder()
            var j = p - w + 1
            while (j <= p) {
              if (j > p - w + 1) sb.append(' ')
              sb.append(arr(j)); j += 1
            }
            md.reset()
            val dig = md.digest(
              sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            // first 4 md5 bytes big-endian == first 8 hex chars — the
            // exact value ('0x' || substr(md5_hex, 1, 8))::UBIGINT yields
            val h32 = java.lang.Integer.toUnsignedLong(
              ((dig(0) & 0xff) << 24) | ((dig(1) & 0xff) << 16) |
                ((dig(2) & 0xff) << 8) | (dig(3) & 0xff))
            if (h32 % d == 0 && p < arr.length - 1) {
              out += CdcChunk(idx, curN, cur.toString)
              idx += 1; cur.setLength(0); curN = 0L
            }
          }
          p += 1
        }
        if (curN > 0) out += CdcChunk(idx, curN, cur.toString)
        out.toSeq
      }
    }
    val toksCol = expr(
      s"filter(split(coalesce(`$textCol`, ''), '\\\\s+'), t -> t <> '')")
    df.select(col(idCol), toksCol.as("toks"))
      .select(col(idCol),
        explode(kernel(col("toks"), lit(windowTokens), lit(divisor))).as("c"))
      .select(col(idCol), col("c.chunk_idx").as("chunk_idx"),
        col("c.n_tokens").as("n_tokens"),
        md5(col("c.chunk_text")).as("chunk_md5"))
  }

  /** Padding-waste report — what sequence packing actually buys at a
    * given training sequence length L, in ONE corpus aggregation:
    * one-document-per-sequence training consumes `ceil(t/L)` sequences
    * per t-token doc and pads `ceil(t/L)·L − t` positions, while
    * contiguous concat packing ([[concatChunkPlan]]) consumes
    * `ceil(Σt/L)` total. Returns a single row: doc/token totals, padded
    * sequence count and wasted positions (+ integer permille of the
    * padded grid), concat sequence count, and the permille of sequences
    * packing saves — the number that decides whether the packing stage
    * is worth running at all. Zero-token/null docs consume nothing. */
  def paddingWasteReport(df: DataFrame, tokenCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, "paddingWasteReport: seqLen must be positive")
    val t = coalesce(col(tokenCol).cast("long"), lit(0L))
    // integer ceil via `div` (Column./ on longs is DOUBLE division)
    val nSeq = expr(s"(coalesce(cast(`$tokenCol` as bigint), 0) + " +
      s"${seqLen - 1}) div $seqLen")
    df.agg(
        count(lit(1)).as("n_docs"),
        sum(t).as("total_tokens"),
        sum(nSeq).as("n_seq_padded"),
        sum(nSeq * seqLen - t).as("waste_padded"))
      .select(col("n_docs"), col("total_tokens"), col("n_seq_padded"),
        col("waste_padded"),
        expr(s"case when n_seq_padded > 0 then (waste_padded * 1000) " +
          s"div (n_seq_padded * $seqLen) else 0 end")
          .as("waste_permille"),
        expr(s"(total_tokens + ${seqLen - 1}) div $seqLen")
          .as("n_seq_concat"),
        expr(s"case when n_seq_padded > 0 then ((n_seq_padded - " +
          s"(total_tokens + ${seqLen - 1}) div $seqLen) * 1000) div " +
          "n_seq_padded else 0 end").as("seq_saved_permille"))
  }

  /** Token-balanced shard assignment for training-data export: documents
    * sort by (`tokenCol` desc, `idCol` asc — a total order, so the
    * assignment is deterministic and engine-portable) and deal out to
    * `numShards` shards SERPENTINE (boustrophedon): pass 0 deals shards
    * 0..S-1, pass 1 deals S-1..0, and so on — the classic greedy-LPT
    * approximation made rank-expressible, no (inherently sequential)
    * least-loaded heap. Balance bound: within one down-up pass pair the
    * folded sums a_j + a_(2S-1-j) differ by at most that pair's band
    * width, and the bands are consecutive in sorted order, so the
    * differences TELESCOPE — totals land within (max doc − min doc) of
    * each other, plus at most one smallest-band doc for an incomplete
    * final pass; doc counts differ by at most 1. Adds `shardCol` (int).
    *
    * 100 TB shape: one distributed RANGE-partitioned sort + the
    * zipWithIndex contiguous global rank ([[graft.lakehouse.Transform
    * .addIndexColContiguous]]) — never a row_number over an unpartitioned
    * window, which would collapse the corpus onto one task. The serpentine
    * map from rank to shard is a pure per-row expression. */
  def balancedShards(df: DataFrame, idCol: String, tokenCol: String,
      numShards: Int, shardCol: String = "shard"): DataFrame = {
    require(numShards >= 1, "balancedShards: numShards must be >= 1")
    val sorted = df.orderBy(col(tokenCol).desc, col(idCol).asc)
    val ranked = graft.lakehouse.Transform.addIndexColContiguous(
      sorted, "__bs_rank", indexStart = -1) // 0-based rank
    ranked
      .withColumn("__bs_pass", expr(s"__bs_rank div $numShards"))
      .withColumn("__bs_pos", expr(s"__bs_rank % $numShards"))
      .withColumn(shardCol,
        when(col("__bs_pass") % 2 === 0, col("__bs_pos"))
          .otherwise(lit(numShards - 1) - col("__bs_pos")).cast("int"))
      .drop("__bs_rank", "__bs_pass", "__bs_pos")
  }

  /** Deterministic proportional mixture interleave — the data-mixing
    * scheduler: a single global training ORDER over a multi-source corpus
    * in which source `s` with weight `w_s` (positive integers, relative)
    * occupies a `w_s`-proportional share of every prefix. Classic
    * weighted low-water-mark merge (the WFQ virtual-finish-time rule,
    * exact-integer form): a doc with per-source rank `r` (1-based, by
    * `sha2(id '#' seed)` then id — the deterministic-shuffle key every
    * sampler here uses) gets `interleave_key = (r * 1000000) div w_s`,
    * and the global order is (key asc, source asc, rank asc) — total,
    * tie-broken, reproducible on any engine. After any prefix of K docs,
    * source s has contributed K·w_s/Σw ± O(1) docs — spec-asserted.
    *
    * Returns (id, source, src_rank, interleave_key); consumers sort by
    * (interleave_key, source, src_rank) — Spark range-partitions that
    * global sort, so materializing the order is one distributed sort, and
    * a "first N" is a TakeOrdered, never a single-partition window. The
    * per-source rank window partitions by `sourceCol` (the
    * [[stratifiedSplit]] shape: fine while per-source rows fit a task's
    * spill budget; at extreme skew, rank per source via the contiguous
    * index path instead). */
  def mixtureInterleave(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Int], seed: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixtureInterleave: weights must be positive")
    require(weights.values.max <= 1000000,
      "mixtureInterleave: weights above 1e6 would zero the key quantum")
    val wExpr = weights.foldLeft(lit(null).cast("int")) {
      case (acc, (s, w)) =>
        when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    val key = sha2(concat_ws("#", col(idCol).cast("string"),
      lit(seed.toString)), 256)
    val ranked = df
      .withColumn("__mi_w", wExpr)
      .filter(col("__mi_w").isNotNull) // unweighted sources drop (doc'd)
      .withColumn("src_rank", row_number().over(
        Window.partitionBy(col(sourceCol)).orderBy(key, col(idCol))))
    ranked
      .withColumn("interleave_key",
        expr("(cast(src_rank as bigint) * 1000000) div __mi_w"))
      .select(col(idCol), col(sourceCol), col("src_rank"),
        col("interleave_key"))
  }

  /** Sequence-length sweep: for each candidate max length, BOTH sides of
    * the trade the single-length reports measure one at a time
    * ([[paddingWasteReport]] / `TextStats.truncationLossReport`) — how
    * many documents truncate, what token share is lost, and the padding
    * share a one-doc-per-sequence batcher would waste — the one table a
    * pipeline reads to pick max_seq_len. One size frame (corpus
    * aggregates first), exploded |lengths| ways, one aggregation;
    * integer permille throughout. */
  def seqLenSweep(df: DataFrame, sizeCol: String,
      lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ >= 1),
      "seqLenSweep needs at least one positive candidate length")
    df.filter(col(sizeCol).isNotNull)
      .select(col(sizeCol).cast("long").as("__n"))
      .select(col("__n"), explode(typedlit(lengths.map(_.toLong)))
        .as("max_len"))
      .groupBy("max_len")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__n") > col("max_len"), 1L).otherwise(0L))
          .as("n_truncated"),
        sum("__n").as("__total"),
        sum(greatest(col("__n") - col("max_len"), lit(0L))).as("__lost"),
        sum(least(col("__n"), col("max_len"))).as("__kept"))
      .select(col("max_len"), col("n_docs"), col("n_truncated"),
        expr("(__lost * 1000) div __total").as("tokens_lost_permille"),
        expr("((n_docs * max_len - __kept) * 1000) " +
          "div (n_docs * max_len)").as("padding_waste_permille"))
  }

  /** Rendezvous (highest-random-weight) shard assignment report
    * (Thaler & Ravishankar '96): each key lands on the shard with the
    * largest sha256(key#shard) weight — and when the fleet grows
    * N → N+1, ONLY the keys whose new shard wins move (expected 1/(N+1)
    * of them), versus mod-hashing where virtually everything moves.
    * This report is the migration plan: the (shard@N → shard@N+1)
    * transition matrix plus, per cell, whether keys moved, with the
    * mod-hash movement count alongside as the indictment. Everything
    * derives from sha integers — any engine replays the exact
    * assignment. ONE explode bounded by N+1 per DISTINCT key, two
    * argmax folds, one ≤(N+1)²-cell aggregation. */
  def rendezvousShardReport(df: DataFrame, keyCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 1024, "nShards in [1, 1024]")
    val keys = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k")).distinct()
    val weighted = keys
      .select(col("__k"),
        explode(typedlit((0 to nShards).toList)).as("s"))
      .select(col("__k"), col("s"),
        expr("cast(conv(substring(sha2(concat(__k, '#', " +
          "cast(s as string)), 256), 1, 15), 16, 10) as bigint)")
          .as("w"))
    val assigned = weighted.groupBy("__k")
      .agg(
        max(when(col("s") < nShards,
          struct(col("w"), col("s")))).as("__a"),
        max(struct(col("w"), col("s"))).as("__b"),
        // mod-hash assignment from the shard-0 weight (a key-stable hash)
        max(when(col("s") === 0, col("w"))).as("__h"))
      .select(col("__a.s").as("shard_n"), col("__b.s").as("shard_n1"),
        (col("__h") % nShards).as("__mod_n"),
        (col("__h") % (nShards + 1)).as("__mod_n1"))
    assigned
      .groupBy("shard_n", "shard_n1")
      .agg(count(lit(1)).as("n_keys"),
        sum((col("__mod_n") =!= col("__mod_n1")).cast("long"))
          .as("n_mod_moved"))
      .withColumn("moved", col("shard_n") =!= col("shard_n1"))
  }

  /** Fill-in-the-middle training examples (Bavarian et al. 2022, PSM
    * order): two DETERMINISTIC keyed-hash cut points split each document
    * into prefix/middle/suffix and the example is reassembled as
    * `<PRE>prefix<SUF>suffix<MID>middle` — the transformation FIM
    * pretraining applies to a fraction of the corpus. Cuts derive from
    * sha-256 of (id, seed, salt) exactly like the q73/q74 split
    * machinery, so the SAME document always yields the SAME example on
    * any engine — re-runs and backfills can't silently produce a
    * different corpus. Cut arithmetic: a,b = hash mod (len−1) ∈
    * [0, len−2]; lo = min(a,b), hi = max(a,b)+1 — so the middle is never
    * empty and the suffix keeps ≥ 1 char (a FIM example with nothing to
    * infill teaches nothing). Documents shorter than `minChars` pass
    * through untouched as fim_sha = null rows (reported, not dropped —
    * the caller sees exactly what was skipped). Pure per-row kernel,
    * zero shuffle; output carries the span lengths and the sha-256 of
    * the assembled example rather than the (corpus-sized) example text.
    */
  def fimExamples(df: DataFrame, idCol: String, textCol: String,
      seed: Long, minChars: Int = 8): DataFrame = {
    require(minChars >= 3, "fimExamples needs minChars >= 3 (three spans)")
    def cut(salt: String): Column =
      expr(s"cast(conv(substring(sha2(concat_ws('#', " +
        s"cast($idCol as string), '$seed', '$salt'), 256), 1, 8), 16, 10) " +
        s"as bigint)") % (length(col(textCol)).cast("long") - 1L)
    val L = length(col(textCol)).cast("long")
    val eligible = col(textCol).isNotNull && L >= minChars.toLong
    val lo = least(cut("a"), cut("b"))
    val hi = greatest(cut("a"), cut("b")) + 1L
    val prefix = col(textCol).substr(lit(1), lo.cast("int"))
    val middle = col(textCol).substr((lo + 1L).cast("int"),
      (hi - lo).cast("int"))
    val suffix = col(textCol).substr((hi + 1L).cast("int"),
      (L - hi).cast("int"))
    df.select(col(idCol),
      when(eligible, lo).as("lo"),
      when(eligible, hi).as("hi"),
      when(eligible, lo).as("prefix_len"),
      when(eligible, hi - lo).as("middle_len"),
      when(eligible, L - hi).as("suffix_len"),
      when(eligible, sha2(concat(lit("<PRE>"), prefix, lit("<SUF>"),
        suffix, lit("<MID>"), middle), 256)).as("fim_sha"))
  }

  /** Per-domain cap sampling — the crawl-curation guard against a
    * handful of giant hosts dominating the training mix: the registered
    * domain (host minus a leading `www.`, last two dot-labels — the
    * no-PSL simplification, stated) buckets each URL, and within a
    * domain rows survive by keyed-sha rank ≤ cap. The rank hash is the
    * q73 deterministic-shuffle convention, so which rows a domain keeps
    * is reproducible on any engine and STABLE as other domains grow.
    * Output: the kept rows with their domain, the domain's total count,
    * and the row's rank. Scale shape: one (domain) shuffle for the
    * window; the per-row domain extraction is a compiled regex chain —
    * at 100 TB this is the exact shape of the dedup keep-best pass. */
  def domainCapSample(df: DataFrame, idCol: String, urlCol: String,
      cap: Int, seed: Long): DataFrame = {
    require(cap >= 1, "domainCapSample needs cap >= 1")
    val host = lower(regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    val noWww = regexp_replace(host, "^www\\.", "")
    val registered = regexp_extract(noWww, "([^.]+\\.[^.]+)$", 1)
    val keyed = df
      .filter(col(urlCol).isNotNull)
      .withColumn("domain", registered)
      .filter(col("domain") =!= "")
      .withColumn("__k", sha2(concat_ws("#",
        col(idCol).cast("string"), lit(seed.toString)), 256))
    val w = Window.partitionBy("domain").orderBy(col("__k"), col(idCol))
    keyed
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_domain",
        count(lit(1)).over(Window.partitionBy("domain")))
      .filter(col("rnk") <= cap.toLong)
      .select(col(idCol), col("domain"), col("n_domain"), col("rnk"))
  }

  /** Overlapping document chunks — the retrieval/embedding prep step:
    * each doc splits into `chunkLen`-char windows every `stride` chars
    * (stride < chunkLen ⇒ overlap), the final partial window kept iff
    * ≥ `minLen`. Emits (id, chunk_id, chunk_start 0-based, chunk_len,
    * chunk_sha) — the sha identifies the chunk downstream (embedding
    * cache keys, dedup) without ever shipping chunk text past this
    * operator's own projection. Pure per-row fan-out: one in-row
    * sequence explode, zero shuffle, trivially linear at any corpus
    * size. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int, minLen: Int = 1): DataFrame = {
    require(chunkLen >= 1 && stride >= 1 && minLen >= 1 &&
      minLen <= chunkLen,
      "chunkDocuments needs chunkLen, stride >= 1, 1 <= minLen <= chunkLen")
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) >= minLen)
      .select(col(idCol).as("id"), col(textCol).as("__t"),
        posexplode(expr(
          s"sequence(0, greatest(length($textCol) - $minLen, 0), $stride)"))
          .as(Seq("chunk_id", "chunk_start")))
      .select(col("id"), col("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        expr(s"substr(__t, chunk_start + 1, $chunkLen)").as("__c"))
      .select(col("id"), col("chunk_id"),
        col("chunk_start"),
        length(col("__c")).cast("long").as("chunk_len"),
        substring(sha2(col("__c"), 256), 1, 16).as("chunk_sha"))
  }
}
