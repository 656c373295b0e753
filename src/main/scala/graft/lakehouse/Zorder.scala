package graft.lakehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{array, col, udf}
import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampType}

/** Multi-dimensional (Z-order) clustering for data-skipping writes — the
  * OPTIMIZE ZORDER BY half of the Delta story (the reference's storage layer
  * is Delta; see common.py:531). A 1-D `sortBy` clustering gives perfect
  * file pruning on ONE column and none on the others; mapping each row onto
  * the Z-curve (bit-interleaved per-dimension range-bucket ids) and
  * range-partitioning by that value gives every clustered dimension
  * locality, so per-file min/max stats prune scans on ANY of them.
  *
  * Scale design: per-dimension bucket boundaries come from ONE
  * `approxQuantile` pass (Greenwald–Khanna sketch, distributed, bounded
  * driver result: (2^bits − 1) doubles per column); rows then map to
  * z-values with a compiled kernel (a Scala UDF is justified here — the
  * equivalent HOF expression would be interpreted per row, memory rule on
  * hot-path kernels) and ONE range shuffle orders the write. Nothing is
  * all-pairs, nothing collects data rows.
  *
  * Quantile (not uniform) bucketing makes the curve skew-proof: each bucket
  * holds ~1/2^bits of the DATA, not of the value range, so a hot key range
  * cannot concentrate the curve.
  */
object Zorder {

  /** Range-bucket bits per clustered column: 8 → 256 data-quantile buckets
    * per dimension. Up to 8 columns fit a 64-bit z-value. */
  val BitsPerCol = 8

  private val Buckets = 1 << BitsPerCol

  /** Numeric-line projection: numerics directly, dates/timestamps via
    * their epoch value; strings take the sampled-boundary path instead. */
  private[lakehouse] def asLine(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case _: NumericType => col(c).cast("double")
      case TimestampType => col(c).cast("long").cast("double")
      case DateType => col(c).cast("int").cast("double")
      case StringType => col(c) // handled by string cuts, not the GK sketch
      case other => throw new IllegalArgumentException(
        s"zorderBy($c): unsupported type $other " +
          "(numeric/date/timestamp/string only)")
    }
  }

  /** Max sampled values collected per STRING column to learn its cut
    * points (hash-sampled server-side, bounded driver result). */
  val MaxStringSample = 100 * 1000

  /** Data-derived cut points for a string column: a deterministic
    * xxhash-thinned sample, sorted in UTF-8 byte order (Spark's string
    * min/max ordering — cuts must agree with the stats they later prune
    * against), thinned to Buckets-1 boundaries. The usefulness guard is
    * on DISTINCT values, not sampled rows: hash-thinning admits whole
    * value classes, so a low-cardinality column (statuses, country codes)
    * can flood the sample with duplicates of 1-2 values — cuts from that
    * would silently collapse the dimension's clustering. Low-cardinality
    * columns instead cut on their full (bounded) distinct set, which
    * spreads every value class across the curve. */
  private def stringCuts(df: DataFrame, c: String): Array[String] = {
    import org.apache.spark.sql.functions.xxhash64
    val nonNull = df.select(col(c)).filter(col(c).isNotNull)
    // deterministic selection: order by the same hash used to thin (a
    // bare limit() would take a scheduler-dependent subset and make two
    // identical cluster runs produce different layouts)
    val sampled = nonNull
      .filter(xxhash64(col(c)) % 64 === 0)
      .orderBy(xxhash64(col(c)).asc, col(c).asc)
      .limit(MaxStringSample).collect().map(_.getString(0))
    val values =
      if (sampled.distinct.length >= Buckets)
        sampled
      // deterministic: TakeOrdered of the SMALLEST distinct values — a
      // bare limit() would pick an arbitrary run-dependent subset and make
      // "reproducible clustering" false
      else nonNull.distinct().orderBy(col(c)).limit(MaxStringSample)
        .collect().map(_.getString(0))
    val sorted = values.sortWith(TableIO.compareUtf8(_, _) < 0)
    if (sorted.isEmpty) Array.empty
    else (1 until Buckets).map(i =>
      sorted(((i.toLong * sorted.length) / Buckets).toInt
        .min(sorted.length - 1))).toArray.distinct
  }

  private def bucketOfString(cuts: Array[String], v: String): Int = {
    if (v == null) return 0
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (TableIO.compareUtf8(cuts(mid), v) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Bucket id of `v` given sorted quantile cut points: the count of cuts
    * ≤ v (binary search, 0..Buckets-1). Nulls sort first (bucket 0) —
    * matching Spark's NULLS FIRST so z-clustering keeps them together. */
  private def bucketOf(cuts: Array[Double], v: Any): Int = {
    if (v == null) return 0
    val d = v.asInstanceOf[Double]
    var lo = 0
    var hi = cuts.length // cuts has Buckets-1 entries
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= d) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Interleave the `BitsPerCol`-bit bucket ids, most-significant bit first,
    * round-robin across columns — the Morton/Z-curve index. */
  private[lakehouse] def interleave(buckets: Array[Int]): Long = {
    var z = 0L
    var bit = BitsPerCol - 1
    while (bit >= 0) {
      var c = 0
      while (c < buckets.length) {
        z = (z << 1) | ((buckets(c) >> bit) & 1)
        c += 1
      }
      bit -= 1
    }
    z
  }

  /** Hilbert index of the bucket vector — same `BitsPerCol` bits per axis
    * as [[interleave]], but along the Hilbert curve instead of the
    * Z/Morton curve. Successive Hilbert indices are always GRID NEIGHBORS
    * (one axis, one step — the property the adjacency spec pins), so a
    * contiguous curve segment covers a tighter axis-aligned region than
    * Morton's jump-prone segments: better min/max stat locality per file,
    * which is why Delta's liquid clustering walks a Hilbert curve.
    * Algorithm: Skilling's transpose form (J. Skilling, "Programming the
    * Hilbert curve", AIP Conf. Proc. 707, 2004) — axes → transposed
    * Hilbert coordinates in place, then the same MSB-first interleave. */
  private[lakehouse] def hilbertIndex(axes: Array[Int]): Long = {
    val n = axes.length
    if (n == 1) return axes(0).toLong
    val x = axes.clone()
    // inverse-undo excess work (AxesToTranspose)
    var q = 1 << (BitsPerCol - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray-code the transpose
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0
    q = 1 << (BitsPerCol - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    interleave(x)
  }

  /** Append a z-value column over `cols` (numeric/date/timestamp columns
    * bucket on data quantiles from ONE distributed GK-sketch pass; string
    * columns on a sorted bounded sample in UTF-8 order), then a per-row
    * compiled kernel interleaves the bucket ids. `hilbert` swaps the
    * Morton interleave for the Hilbert index — identical bucketing, the
    * curve alone changes. */
  def withZValue(df: DataFrame, cols: Seq[String], zCol: String = "__z",
      hilbert: Boolean = false): DataFrame = {
    // 63, not 64: an 8th column would put a bucket bit into the sign bit,
    // making half the curve negative and sort-before-everything — which
    // silently destroys the clustering (results stay right, skipping dies)
    require(cols.nonEmpty && cols.size <= 63 / BitsPerCol,
      s"zorder needs 1..${63 / BitsPerCol} columns")
    val isStr = cols.map(c => df.schema(c).dataType == StringType)
    val numIdx = cols.indices.filterNot(isStr(_))
    val lined = numIdx.foldLeft(df)((d, i) =>
      d.withColumn(s"__zl_$i", asLine(df, cols(i))))
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    // distributed GK sketch; empty/all-null columns yield no cuts -> bucket 0
    val numCuts: Map[Int, Array[Double]] =
      if (numIdx.isEmpty) Map.empty
      else numIdx.zip(lined.stat.approxQuantile(
        numIdx.map(i => s"__zl_$i").toArray, probs, 0.001).map(_.sorted)).toMap
    val strCuts: Map[Int, Array[String]] =
      cols.indices.filter(isStr(_)).map(i => i -> stringCuts(df, cols(i))).toMap
    val bucketCols = cols.indices.map { i =>
      if (isStr(i)) {
        val cuts = strCuts(i)
        udf((s: String) => bucketOfString(cuts, s)).apply(col(cols(i)))
      } else {
        val cuts = numCuts(i)
        udf((d: java.lang.Double) => bucketOf(cuts,
          if (d == null) null else d.doubleValue())).apply(col(s"__zl_$i"))
      }
    }
    val inter =
      if (hilbert) udf((bs: Seq[Int]) => hilbertIndex(bs.toArray))
      else udf((bs: Seq[Int]) => interleave(bs.toArray))
    lined.withColumn(zCol, inter(array(bucketCols: _*)))
      .drop(numIdx.map(i => s"__zl_$i"): _*)
  }

  /** Cluster `df` for writing: z-value, range-partition on it (one shuffle,
    * contiguous curve segments per output file), sort within partitions so
    * row groups are curve-contiguous too, then drop the helper column.
    * The partition count is pinned explicitly (defaulting to the session's
    * shuffle parallelism) — an unpinned range exchange is fair game for
    * AQE re-planning, which would silently change the output file count the
    * caller sized for. */
  def cluster(df: DataFrame, cols: Seq[String],
      numPartitions: Option[Int] = None,
      hilbert: Boolean = false): DataFrame = {
    val n = numPartitions.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val z = withZValue(df, cols, hilbert = hilbert)
    z.repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
