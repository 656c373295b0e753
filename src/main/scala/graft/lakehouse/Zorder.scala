package graft.lakehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.{array, col, udf}
import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}

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

  /** Columns must be bucketable on a numeric line: numerics directly,
    * dates/timestamps via their epoch value. (Strings would need
    * sample-sorted boundaries; unsupported until needed.) */
  private[lakehouse] def asLine(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case _: NumericType => col(c).cast("double")
      case TimestampType => col(c).cast("long").cast("double")
      case DateType => col(c).cast("int").cast("double")
      case other => throw new IllegalArgumentException(
        s"zorderBy($c): unsupported type $other (numeric/date/timestamp only)")
    }
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

  private def zUdf(cuts: Seq[Array[Double]]): UserDefinedFunction =
    udf { vals: Seq[java.lang.Double] =>
      val buckets = new Array[Int](cuts.length)
      var i = 0
      while (i < cuts.length) {
        buckets(i) = bucketOf(cuts(i),
          if (vals(i) == null) null else vals(i).doubleValue())
        i += 1
      }
      interleave(buckets)
    }

  /** Append a z-value column over `cols`. One distributed quantile pass to
    * learn the per-dimension cut points, then a per-row compiled kernel. */
  def withZValue(df: DataFrame, cols: Seq[String], zCol: String = "__z"): DataFrame = {
    // 63, not 64: an 8th column would put a bucket bit into the sign bit,
    // making half the curve negative and sort-before-everything — which
    // silently destroys the clustering (results stay right, skipping dies)
    require(cols.nonEmpty && cols.size <= 63 / BitsPerCol,
      s"zorder needs 1..${63 / BitsPerCol} columns")
    val lined = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__zl_$i", asLine(df, c))
    }
    val lineCols = cols.indices.map(i => s"__zl_$i")
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    // distributed GK sketch; empty/all-null columns yield no cuts -> bucket 0
    val cuts = lined.stat
      .approxQuantile(lineCols.toArray, probs, 0.001)
      .map(_.sorted)
    lined
      .withColumn(zCol, zUdf(cuts.toSeq)(array(lineCols.map(col): _*)))
      .drop(lineCols: _*)
  }

  /** Cluster `df` for writing: z-value, range-partition on it (one shuffle,
    * contiguous curve segments per output file), sort within partitions so
    * row groups are curve-contiguous too, then drop the helper column.
    * The partition count is pinned explicitly (defaulting to the session's
    * shuffle parallelism) — an unpinned range exchange is fair game for
    * AQE re-planning, which would silently change the output file count the
    * caller sized for. */
  def cluster(df: DataFrame, cols: Seq[String],
      numPartitions: Option[Int] = None): DataFrame = {
    val n = numPartitions.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val z = withZValue(df, cols)
    z.repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
