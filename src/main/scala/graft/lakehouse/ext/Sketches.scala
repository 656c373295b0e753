package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portable sketches: approximate aggregates whose STATE is integer-exact
  * and engine-reproducible. Spark's `approx_count_distinct` (q40) is the
  * production path; its HLL++ registers are engine-private, so its output
  * can only ever be rows-only-checked. The operators here trade a little
  * constant-factor speed for a sketch any engine can recompute
  * bit-for-bit — the same waiver-upgrade pattern as the portable
  * MinHash/SimHash/winnowing twins (q75–q77).
  *
  * 100 TB design: registers are the WHOLE shuffle — one partial-aggregate
  * pass emits at most `m` (bucket, max-rho) pairs per group per
  * partition, merged with MAX; the raw value stream never shuffles and
  * nothing collects. Flajolet's estimate is a closed formula over the
  * m-row register table (driver- or spec-side), deliberately NOT part of
  * the distributed output: the harmonic mean's float sum is
  * order-sensitive, the registers are not.
  */
object Sketches {

  /** HyperLogLog registers with a PORTABLE hash: h = 60-bit sha-256
    * prefix of the value's decimal string; bucket = top log2(m) bits;
    * rho = 1-based position of the first set bit in the remaining bits
    * (all-zero ⇒ restBits + 1, the standard HLL convention). Pure
    * built-in expressions end to end (sha2/conv/bin) — codegen'd, no
    * UDF, one aggregation. Only observed buckets are emitted; absent
    * buckets are zero registers ([[hllEstimate]] accounts for them). */
  def portableHllRegisters(df: DataFrame, valueCol: String, m: Int = 64,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(m >= 4 && (m & (m - 1)) == 0, "m must be a power of two >= 4")
    val p = java.lang.Integer.numberOfTrailingZeros(m)
    require(p < 60, "m too large for the 60-bit hash")
    val restBits = 60 - p
    val div = 1L << restBits
    val h: Column = expr(s"cast(conv(substring(sha2(cast(`$valueCol` as " +
      s"string), 256), 1, 15), 16, 10) as bigint)")
    val keyed = df.filter(col(valueCol).isNotNull)
      .withColumn("__h", h)
      .withColumn("bucket", expr(s"__h div ${div}L").cast("int"))
      .withColumn("__rest", col("__h") % div)
      .withColumn("__rho",
        when(col("__rest") === 0L, lit(restBits + 1))
          .otherwise(lit(restBits + 1) - length(bin(col("__rest"))))
          .cast("int"))
    keyed.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("__rho")).as("r"))
  }

  /** Rolling-window distinct sketch — "unique users over the trailing N
    * days, every day": per window-end day d, the [[portableHllRegisters]]
    * table of the UNION of days (d−N+1..d]. Register MAX is exactly HLL
    * union, so the merged register table IS the rolling-distinct state —
    * no re-scan of raw events per window, ever: the corpus aggregates to
    * daily registers ONCE, each daily register fans out in-row to the ≤ N
    * window-end days it belongs to, and one bounded aggregation
    * (≤ days·m cells) folds the maxes. Days beyond the data's last day
    * are cut (no phantom trailing windows); a window whose days carry no
    * events simply has no rows. The estimate stays spec-side, exactly as
    * [[portableHllRegisters]] documents (the registers are portable, the
    * harmonic-mean float fold is not). */
  def rollingHllRegisters(df: DataFrame, valueCol: String, tsCol: String,
      windowDays: Int, m: Int = 64): DataFrame = {
    require(windowDays >= 1 && windowDays <= 3660,
      "rollingHllRegisters needs windowDays in [1, 3660]")
    val daily = portableHllRegisters(
      df.filter(col(tsCol).isNotNull)
        .withColumn("__day",
          datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
            .cast("long")),
      valueCol, m, Seq("__day"))
    val bounds = daily.agg(max("__day").as("__mx"))
    daily
      .withColumn("day", explode(sequence(col("__day"),
        col("__day") + (windowDays - 1).toLong)))
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("__mx"))
      .groupBy("day", "bucket").agg(max("r").as("r"))
  }

  /** Count-Min sketch counters with a PORTABLE hash (Cormode & Muthukrishnan
    * 2005): one 60-bit sha-256 prefix per value supplies every hash row —
    * row i's bucket is an independent `60/depth`-bit slice of the same
    * hash, reduced mod `width`. Pure built-in expressions (sha2/conv,
    * shift, mod) — codegen'd, no UDF, ONE aggregation.
    *
    * 100 TB shape: the counter table is the WHOLE shuffle — partial
    * aggregation emits at most `depth × width` (row, bucket) cells per
    * group per partition and merges with SUM; the value stream never
    * shuffles and nothing collects. The sketch is LINEAR (counters of a
    * union = cell-wise sum of the parts' counters), so per-partition /
    * per-day sketches roll up by addition alone — the property that makes
    * CMS the standard distributed frequency summary. Only observed cells
    * are emitted; absent cells are zero ([[cmsPointEstimates]] accounts
    * for them). */
  def portableCmsCounters(df: DataFrame, valueCol: String, depth: Int = 4,
      width: Int = 256, groupCols: Seq[String] = Nil): DataFrame = {
    val slice = cmsSliceBits(depth, width)
    val rows = df.filter(col(valueCol).isNotNull)
      .withColumn("__h", cmsHash(valueCol))
      .select((groupCols.map(col) :+ explode(expr(
        s"transform(sequence(0, ${depth - 1}), i -> named_struct(" +
        s"'hrow', cast(i as int), " +
        s"'bucket', cast((__h div shiftleft(1L, i * $slice)) % $width as int)))"
      )).as("__c")): _*)
    rows.groupBy((groupCols.map(col) ++ Seq(col("__c.hrow").as("hrow"),
        col("__c.bucket").as("bucket"))): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a CMS counter table: each probe value
    * re-derives its `depth` (row, bucket) cells and takes the MIN counter
    * across rows (absent cells read 0). Estimates never undercount
    * (every cell the value hashed into counted every one of its
    * occurrences) and overcount by at most εN with high probability —
    * both directions spec-asserted. The counter table is bounded
    * (depth × width per group) and broadcasts; the probe side never
    * shuffles. */
  def cmsPointEstimates(counters: DataFrame, probes: DataFrame,
      valueCol: String, depth: Int = 4, width: Int = 256): DataFrame = {
    val slice = cmsSliceBits(depth, width)
    val cells = probes.filter(col(valueCol).isNotNull).distinct()
      .withColumn("__h", cmsHash(valueCol))
      .select(col(valueCol), explode(expr(
        s"transform(sequence(0, ${depth - 1}), i -> named_struct(" +
        s"'hrow', cast(i as int), " +
        s"'bucket', cast((__h div shiftleft(1L, i * $slice)) % $width as int)))"
      )).as("__c"))
      .select(col(valueCol), col("__c.hrow").as("hrow"),
        col("__c.bucket").as("bucket"))
    cells.join(broadcast(counters), Seq("hrow", "bucket"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---- KMV (bottom-k / k-minimum-values) distinct sketch -----------------

  /** KMV distinct-value sketch (Bar-Yossef et al. RANDOM'02 / Beyer et al.
    * SIGMOD'07's "distinct sampling" form): per group, the k SMALLEST
    * distinct 60-bit portable hashes of the value stream, ascending. What
    * KMV buys over HLL registers (q192): the sketch is a uniform sample
    * of the distinct-value hash space, so sketches support SET ALGEBRA —
    * union by re-merging, intersection by counting sample members both
    * sides contain ([[kmvMergedCol]]/[[kmvIntersectionCol]]) — which no
    * register sketch can do without inclusion–exclusion error stacking.
    *
    * 100 TB shape: the sketch is the WHOLE shuffle — [[graft.lakehouse
    * .functions.LongBottomK]] carries a bounded distinct set through
    * partial aggregation, ≤ k longs per group per partition cross the
    * exchange, merged in O(k log k); the value stream never shuffles and
    * nothing collects. Every downstream estimate is integer division over
    * sketch entries: bit-identical on any engine, so the DuckDB oracle
    * replays the sketch AND its set algebra end to end. */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(k >= 2, "kmv needs k >= 2 (the estimator divides by h_k)")
    val hashed = df.filter(col(valueCol).isNotNull)
      .withColumn("__h", cmsHash(valueCol))
    hashed.groupBy(groupCols.map(col): _*)
      .agg(graft.lakehouse.functions.VectorFunctions
        .graft_bottomk(col("__h"), k).as("kmv"))
  }

  /** PERSISTED incremental KMV sketch table — the index-once /
    * fold-batches-in contract (the q233/q243 pattern) applied to
    * sketch state: per-group bottom-k sketches live as a versioned
    * lakehouse table, and each batch folds in with ONE O(batch) sketch
    * pass plus a full-outer merge on the O(groups·k) state — the raw
    * history is never rescanned. Bottom-k merge is exact and
    * associative (the bottom-k of a union is the bottom-k of the two
    * sketches' union), so any fold order lands on the state a
    * from-scratch [[kmvSketch]] over the whole history produces,
    * bit-for-bit — which is exactly what the oracle checks. The
    * overwrite is an ordinary versioned commit: time travel shows the
    * sketch after every batch. Returns the number of groups in the new
    * state. */
  def kmvSketchTableUpdate(spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      batch: DataFrame, valueCol: String, k: Int,
      groupCols: Seq[String],
      extraMeta: Map[String, String] = Map.empty): Long = {
    require(groupCols.nonEmpty,
      "kmvSketchTableUpdate needs group columns (the state's key)")
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    val fresh = kmvSketch(batch, valueCol, k, groupCols)
    val dir = Catalog.tablePath(lh, tableName)
    val merged = Versioned.latestVersion(dir) match {
      case None => fresh
      case Some(_) =>
        val cur = TableIO.selectTable(spark, lh, tableName)
          .select(groupCols.map(col) :+ col("kmv").as("__cur"): _*)
        cur.join(fresh.select(groupCols.map(col) :+
            col("kmv").as("__new"): _*), groupCols, "full_outer")
          .select(groupCols.map(col) :+
            when(col("__cur").isNull, col("__new"))
              .when(col("__new").isNull, col("__cur"))
              .otherwise(expr(
                s"slice(array_sort(array_union(__cur, __new)), 1, $k)"))
              .as("kmv"): _*)
    }
    TableIO.writeTable(spark, lh, tableName, merged,
      extraMeta = extraMeta).rowCount
  }

  /** One exactly-once micro-batch fold into the sketch table: skipped
    * when the table's latest manifest already carries `txnKey ->
    * batchId-or-later` (the overwrite commits the marker ATOMICALLY with
    * the folded state, so a crash between commit and checkpoint advance
    * is detected on replay). Returns whether the fold ran. Bottom-k
    * merge is idempotent anyway — refolding the same rows cannot change
    * the sketch — so the marker buys versioned-history hygiene (no
    * spurious state versions on replay), not just correctness. */
  private[ext] def foldKmvBatchExactlyOnce(
      spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      batch: DataFrame, valueCol: String, k: Int, groupCols: Seq[String],
      txnKey: Option[String], batchId: Long): Boolean = {
    import graft.lakehouse.Catalog
    val (_, committed) = EventWindows.txnWatermark(
      Catalog.tablePath(lh, tableName), None, txnKey.map(_.stripPrefix("txn:")))
    if (committed().exists(_ >= batchId)) false
    else {
      kmvSketchTableUpdate(spark, lh, tableName, batch, valueCol, k,
        groupCols, extraMeta = txnKey.map(_ -> batchId.toString).toMap)
      true
    }
  }

  /** Streaming KMV sketch maintenance — the persisted sketch table
    * ([[kmvSketchTableUpdate]]) driven by a live stream: each
    * micro-batch folds in exactly once (same txn-watermark contract as
    * `streamIngest`: the batch id commits atomically with the folded
    * state; a batch replayed after a crash is skipped). State per fold
    * is O(batch) sketching + the O(groups·k) merge — the stream's
    * history lives in the sketch, never in operator memory. */
  def streamKmvSketch(events: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      valueCol: String, k: Int, groupCols: Seq[String],
      checkpoint: Option[String] = None,
      appId: Option[String] = None) = {
    val txnKey = appId.orElse(checkpoint).map("txn:" + _)
    val w = events.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          foldKmvBatchExactlyOnce(spark, lh, tableName, batch.toDF(),
            valueCol, k, groupCols, txnKey, batchId)
          ()
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Integer-exact distinct estimate from a kmv array: exact size while
    * the sketch is unsaturated (fewer than k distinct values ⇒ every one
    * is present), else the classic unbiased (k-1)·2^60 / h_k — computed
    * with DECIMAL(38,0) integral division so any engine lands on the same
    * integer (the float path would be last-ulp engine-dependent). */
  def kmvEstimateCol(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("long"))
      .otherwise(intDiv(
        lit(k - 1).cast("decimal(38,0)") *
          lit(1L << 60).cast("decimal(38,0)"),
        element_at(kmv, k).cast("decimal(38,0)")).cast("long"))

  /** Bottom-k of the union of two sketches — itself a valid KMV sketch of
    * the unioned value streams (the defining mergeability of KMV: the k
    * smallest of A ∪ B are among the k smallest of A plus the k smallest
    * of B). Pure built-ins over the two arrays. */
  def kmvMergedCol(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Integer intersection estimate from two sketches: ρ = how many of the
    * merged sketch's members appear in BOTH inputs (each a uniform sample
    * of its own distinct space), then |A∩B| ≈ ρ/|sketch| · |A∪B| — Beyer
    * et al.'s estimator, kept integral as (ρ · unionEst) div |merged|.
    * The divisor is the merged sketch's ACTUAL size, not k: below
    * saturation the sketch IS the distinct union, so the estimate
    * collapses to the exact ρ (a ÷k divisor would bias every unsaturated
    * intersection low — A∩A ≠ A); at saturation |merged| = k and the two
    * agree. */
  def kmvIntersectionCol(a: Column, b: Column, k: Int): Column = {
    val merged = kmvMergedCol(a, b, k)
    val rho = size(array_intersect(array_intersect(merged, a), b))
      .cast("decimal(38,0)")
    when(size(merged) > 0,
      intDiv(rho * kmvEstimateCol(merged, k).cast("decimal(38,0)"),
        size(merged).cast("decimal(38,0)")).cast("long"))
      .otherwise(lit(0L))
  }

  /** Integer A-not-B estimate from two sketches — the theta-sketch set
    * difference by inclusion–exclusion over the verified pieces:
    * |A\B| = |A| − |A∩B|, clamped at 0 (sampling noise can push the
    * subtraction negative; a set difference cannot be). Composes
    * [[kmvEstimateCol]] and [[kmvIntersectionCol]], so it inherits
    * their exact-integer portability. */
  def kmvANotBCol(a: Column, b: Column, k: Int): Column =
    greatest(kmvEstimateCol(a, k) - kmvIntersectionCol(a, b, k), lit(0L))

  /** Truncating integral division (the SQL `div` operator) as a Column —
    * decimal `/` would round HALF_UP at its result scale and drift off
    * the oracle's floor semantics. */
  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expression(a), expression(b)))
  }

  /** [[intDiv]] for the other portable-integer operators (PMI ranking,
    * future ratio scores) — same truncation contract. */
  private[ext] def intDivPub(a: Column, b: Column): Column = intDiv(a, b)

  private def cmsHash(valueCol: String): Column =
    expr(s"cast(conv(substring(sha2(cast(`$valueCol` as string), 256), " +
      "1, 15), 16, 10) as bigint)")

  private def cmsSliceBits(depth: Int, width: Int): Int = {
    require(depth >= 1 && depth <= 6, "depth must be in [1, 6]")
    require(width >= 2 && (width & (width - 1)) == 0,
      "width must be a power of two >= 2")
    val slice = 60 / depth
    require((1L << slice) >= width,
      s"width $width exceeds the $slice-bit hash slice at depth $depth")
    slice
  }

  /** Flajolet–Fuss–Gandouet–Meunier estimate over (bucket, rho)
    * registers (absent buckets count as zero), with the standard
    * small-range linear-counting correction. Driver/spec-side: the
    * float harmonic mean is order-sensitive, so it stays out of the
    * hash-verified distributed output. */
  def hllEstimate(registers: Seq[(Int, Int)], m: Int): Double = {
    val reg = new Array[Int](m)
    registers.foreach { case (b, r) => reg(b) = math.max(reg(b), r) }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val z = 1.0 / reg.map(r => math.pow(2.0, -r)).sum
    val e = alpha * m * m * z
    val zeros = reg.count(_ == 0)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  // ---- fixed-grid rank sketch (portable quantiles) ---------------------

  /** Fixed-grid rank sketch — distributed quantiles with INTEGER-EXACT,
    * engine-reproducible state, completing the portable family (HLL
    * registers count distincts, CMS counters count frequencies, KMV
    * bottom-k intersects sets; this one RANKS). Values quantize to fixed
    * point (floor(v·scale), the [[Clustering.quantizeKernel]]
    * arithmetic), clamp into the declared [lo, hi) scaled domain, and
    * land in one of `buckets` equal-width cells via pure integer
    * arithmetic; the state is the per-cell count vector. The sketch is
    * LINEAR — cell-wise addition merges sub-sketches (per-partition,
    * per-day, per-table), the same roll-up algebra as the CMS counters —
    * and any engine recomputes it bit-for-bit from the same integers.
    *
    * Rank answers carry error bounded by ONE cell width
    * ((hi−lo)/buckets/scale value units) — a resolution contract
    * declared up front, unlike KLL/t-digest whose adaptive state is
    * engine-private (that is exactly why Spark's approx_percentile can
    * only ever be rows-only-checked, and this can be hash-verified).
    *
    * 100 TB shape: the counts are the WHOLE shuffle — partial
    * aggregation emits at most `buckets` cells per group per partition;
    * the value stream never shuffles; nothing collects. */
  def quantileSketch(df: DataFrame, valueCol: String, lo: Long, hi: Long,
      buckets: Int, scale: Long = 1000000L,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(hi > lo && buckets >= 1 && scale >= 1)
    require(hi - lo <= Long.MaxValue / buckets,
      "(hi - lo) * buckets must fit int64")
    val keyed = df.filter(col(valueCol).isNotNull)
      .withColumn("__vs",
        floor(col(valueCol).cast("double") * lit(scale.toDouble)).cast("long"))
      // clamp BEFORE the bucket product so no input value can overflow it
      .withColumn("__vc", least(greatest(col("__vs"), lit(lo)), lit(hi - 1)))
      .withColumn("bucket",
        expr(s"((__vc - ${lo}L) * ${buckets}L) div ${hi - lo}L").cast("int"))
    keyed.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile answers from a [[quantileSketch]] counts table: for each
    * requested permille p, rank = ceil(n·p/1000) (integer-exact) and the
    * answer is the LOWER EDGE (scaled units) of the first cell whose
    * cumulative count reaches that rank — the conservative grid answer
    * any engine reproduces. The input is bounded (≤ buckets cells per
    * group), so the cumulative window and the per-p reduction are
    * metadata-scale work — never a data shuffle. */
  def quantilesFromSketch(sketch: DataFrame, permilles: Seq[Int],
      lo: Long, hi: Long, buckets: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      "permilles must be in [1, 1000]")
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    sketch
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .select((groupCols.map(col) ++ Seq(col("bucket"), col("cum"), col("n"),
        explode(typedlit(permilles)).as("p"))): _*)
      .withColumn("rank", expr("(n * p + 999) div 1000"))
      .filter(col("cum") >= col("rank"))
      .groupBy((groupCols.map(col) :+ col("p")): _*)
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("value_scaled",
        expr(s"${lo}L + (bucket * ${hi - lo}L) div ${buckets}L"))
  }

  /** Accuracy report for the fixed-grid quantile sketch: per requested
    * permille, the sketch's grid answer ([[quantilesFromSketch]]) next
    * to the EXACT rank statistic on the same clamped-scaled domain, the
    * absolute error, and the sketch's a-priori bound (one grid cell =
    * (hi−lo)/buckets) — the table that justifies a bucket count before
    * trusting the sketch at 100 TB. All integer. The exact side ranks
    * over a count-per-distinct-value frame — a DIAGNOSTIC to run at
    * evaluation scale (the sketch exists precisely so production never
    * builds that frame). */
  def sketchQuantileError(df: DataFrame, valueCol: String, lo: Long,
      hi: Long, buckets: Int, scale: Long,
      permilles: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sk = quantilesFromSketch(
      quantileSketch(df, valueCol, lo, hi, buckets, scale),
      permilles, lo, hi, buckets)
      .select(col("p"), col("value_scaled").as("sketch_scaled"))
    val vals = df.filter(col(valueCol).isNotNull)
      .withColumn("__vc", least(greatest(
        floor(col(valueCol).cast("double") * lit(scale.toDouble))
          .cast("long"), lit(lo)), lit(hi - 1)))
      .groupBy("__vc").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy().orderBy("__vc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = vals
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(Window.partitionBy()))
      .select(col("__vc"), col("cum"), col("n"),
        explode(typedlit(permilles)).as("p"))
      .withColumn("rank", expr("(n * p + 999) div 1000"))
      .filter(col("cum") >= col("rank"))
      .groupBy("p").agg(min("__vc").as("exact_scaled"))
    sk.join(exact, Seq("p"))
      .select(col("p"), col("exact_scaled"), col("sketch_scaled"),
        abs(col("sketch_scaled") - col("exact_scaled"))
          .as("abs_err_scaled"),
        lit((hi - lo) / buckets).as("cell_bound_scaled"))
  }

  /** PORTABLE HyperLogLog estimate — the cross-engine-checkable upgrade
    * of [[hllEstimate]] (which is deliberately spec-side: a float
    * Σ2^−r is fold-order-sensitive). The trick: every register term is
    * DYADIC, so the harmonic denominator scaled by 2^55 is an EXACT
    * integer — Σ 2^(55−r_b) over all m buckets (empty buckets
    * contribute 2^55), at m = 64 bounded by 2^61 — and the Flajolet
    * raw estimate α·m²·2^55/S plus the linear-counting branch are a
    * fixed IEEE op chain any engine replays literal-for-literal. ONE
    * register aggregation (≤ m cells/partition), a 1-row fold. m is
    * pinned to 64 (α = 0.709, the scale constants are baked into the
    * arithmetic contract). */
  def hllEstimatePortable(df: DataFrame, valueCol: String): DataFrame = {
    val m = 64
    val regs = portableHllRegisters(df, valueCol, m)
    regs
      .agg(count(lit(1)).as("n_buckets_used"),
        sum(expr("shiftleft(1L, 55 - r)")).as("__s_used"))
      .select(lit(m).as("m"),
        coalesce(col("n_buckets_used"), lit(0L)).cast("long")
          .as("n_buckets_used"),
        (lit(m.toLong) - coalesce(col("n_buckets_used"), lit(0L)))
          .as("n_zero_buckets"),
        (coalesce(col("__s_used"), lit(0L)) +
          (lit(m.toLong) - coalesce(col("n_buckets_used"), lit(0L))) *
            lit(1L << 55)).as("s_scaled"))
      .withColumn("__raw",
        lit(0.709) * lit(4096.0) *
          (lit((1L << 55).toDouble) / col("s_scaled").cast("double")))
      .withColumn("estimate",
        when(col("__raw") <= lit(160.0) && col("n_zero_buckets") > 0,
          lit(64.0) * log(lit(64.0) /
            col("n_zero_buckets").cast("double")))
          .otherwise(col("__raw")))
      .select(col("m"), col("n_buckets_used"), col("n_zero_buckets"),
        col("s_scaled"), col("estimate"))
  }

  /** Accuracy report for the count-min sketch: per probe key, the exact
    * count next to the CMS estimate and the overcount (CMS never
    * undercounts — a negative delta is a bug, and the spec asserts it).
    * The exact side is one semi-joined count over the probe keys only;
    * the estimate is [[cmsPointEstimates]] over the depth×width counter
    * table. The report is what calibrates width against the observed
    * heavy-hitter skew before shipping the sketch. */
  def cmsAccuracyReport(df: DataFrame, keyCol: String, depth: Int,
      width: Int, probes: DataFrame): DataFrame = {
    val counters = portableCmsCounters(df, keyCol, depth, width)
    val est = cmsPointEstimates(counters, probes, keyCol, depth, width)
      .select(col(keyCol), col("est").as("cms_estimate"))
    val exact = df.join(probes.select(keyCol).distinct(), Seq(keyCol),
        "left_semi")
      .groupBy(keyCol).agg(count(lit(1)).as("exact_count"))
    est.join(exact, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"),
        col("cms_estimate"),
        (col("cms_estimate") - coalesce(col("exact_count"), lit(0L)))
          .as("overcount"))
  }

  /** Portable AMS "tug-of-war" F₂ sketch (Alon–Matias–Szegedy, STOC'96):
    * `m` independent ±1 estimators of the second frequency moment
    * Σ c_k², each the SQUARE of a signed count sum. Signs come from the
    * parity of sha256 hex nibbles (nibble r of the key's digest →
    * estimator r), so every dot product and estimate is an EXACT BIGINT
    * any engine reproduces; the report pairs the 2×-scaled exact median
    * of the m estimates against the exact F₂ for the relative error.
    * ONE count aggregation over keys (the only data-scale shuffle), one
    * m×|keys| widening bounded by m = 16, folds over 16 rows. Returns
    * one row: m, med2_estimate (2× the median), exact_f2,
    * rel_err_permille. */
  def amsF2Sketch(df: DataFrame, keyCol: String, m: Int = 16): DataFrame = {
    require(m >= 2 && m % 2 == 0 && m <= 32,
      "amsF2Sketch needs an even m in [2, 32] (one sha nibble per row)")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__h", sha2(col("__k"), 256))
    val estimates = counts
      .select(col("__c"), col("__h"),
        explode(typedlit((0 until m).toList)).as("r"))
      .select(col("r"),
        // sign_r(k) = ±1 from the parity of hex nibble r of sha256(k)
        (col("__c") * (lit(1L) - lit(2L) *
          (expr("cast(conv(substring(__h, r + 1, 1), 16, 10) as bigint)")
            % 2L))).as("__sc"))
      .groupBy("r")
      .agg(sum("__sc").as("dot"))
      .select(col("r"), (col("dot") * col("dot")).as("est"))
    val f2 = counts
      .agg(sum((col("__c") * col("__c")).cast("decimal(38,0)"))
        .cast("long").as("exact_f2"))
    val wr = Window.orderBy("est") // m-row frame: bounded by construction
    estimates
      .withColumn("__rn", row_number().over(wr))
      .agg((max(when(col("__rn") === m / 2, col("est"))) +
        max(when(col("__rn") === m / 2 + 1, col("est"))))
        .as("med2_estimate"))
      .crossJoin(broadcast(f2))
      .select(lit(m).as("m"), col("med2_estimate"), col("exact_f2"),
        expr("abs(med2_estimate - 2 * exact_f2) * 1000 div " +
          "(2 * exact_f2)").as("rel_err_permille"))
  }

  /** Bloom-filter false-positive audit: build an mBits-wide, k-hash
    * Bloom set over the MEMBER keys (bit positions from salted sha256,
    * fully portable), probe it with a disjoint key set, and report the
    * MEASURED false-positive rate next to the standard (1−e^(−kn/m))^k
    * theory — the report that calibrates m/k against real key counts
    * before shipping a filter into a join. Set-bit construction is one
    * distinct over |members|·k positions; each probe is a bounded
    * k-row position lookup (semi-joinable at any scale — positions, not
    * keys, travel). Everything is exact integers except the theory
    * column's fixed IEEE chain. Returns one row: n_members, n_bits_set,
    * n_probes, n_false_positives, fpr_permille, fpr_theory. */
  def bloomFprAudit(members: DataFrame, keyCol: String,
      probes: DataFrame, probeCol: String,
      mBits: Int = 4096, k: Int = 3): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      "mBits must be a power of two >= 64")
    require(k >= 1 && k <= 8, "k must be in [1, 8]")
    def positions(df: DataFrame, c: String): DataFrame = df
      .filter(col(c).isNotNull)
      .select(col(c).cast("string").as("__k")).distinct()
      .select(col("__k"), explode(typedlit((0 until k).toList)).as("__i"))
      .select(col("__k"),
        expr("cast(conv(substring(sha2(concat(__k, '#', " +
          s"cast(__i as string)), 256), 1, 15), 16, 10) as bigint) " +
          s"% $mBits").as("__pos"))
    val bits = positions(members, keyCol)
      .select("__pos").distinct().withColumnRenamed("__pos", "__bit")
    val nMembers = members.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string")).distinct().count()
    val probePos = positions(probes, probeCol)
      .dropDuplicates("__k", "__pos")
    val perProbe = probePos
      .join(bits, probePos("__pos") === bits("__bit"), "left")
      .groupBy("__k")
      .agg(count(lit(1)).as("__npos"),
        count(col("__bit")).as("__nhit"))
    val audit = perProbe.agg(
      count(lit(1)).as("n_probes"),
      sum((col("__nhit") === col("__npos")).cast("long"))
        .as("n_false_positives"))
    val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
    // theory: t = 1 − e^(−k·n/m); fpr = t^k by literal repeated product
    val t = lit(1.0) - exp((lit(-1.0) * k * lit(nMembers.toDouble)) /
      lit(mBits.toDouble))
    val theory = (1 until k).foldLeft(t)((acc, _) => acc * t)
    audit.crossJoin(broadcast(nBits))
      .select(lit(nMembers).as("n_members"), col("n_bits_set"),
        col("n_probes"), col("n_false_positives"),
        expr("n_false_positives * 1000 div n_probes").as("fpr_permille"),
        theory.as("fpr_theory"))
  }
}
