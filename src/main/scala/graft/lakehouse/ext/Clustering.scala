package graft.lakehouse.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed clustering with ENGINE-PORTABLE arithmetic. Float Lloyd
  * k-means is partition-order-dependent twice over (the centroid mean is
  * an unordered IEEE sum; distance ties flip on rounding), so two runs of
  * the same algorithm can legitimately disagree — fine for ANN routing
  * (IVF trains that way, `Similarity.ivfTopK`), fatal for anything that
  * must be reproduced: lineage-audited training-data curation, cross-
  * engine verification, incremental re-clustering diffs. The fixed-point
  * variant here quantizes vectors to integers once and keeps EVERY
  * quantity integral — distances are exact integer sums of squares,
  * centroid updates are floor divisions of integer sums — so any engine
  * (or any partitioning of the same engine) lands on bit-identical
  * centroids and assignments, the same trick as
  * [[Graph.pageRankFixedPoint]]'s 1e-12 rank units.
  */
object Clustering {

  /** Lloyd k-means over an `Array[Float]`/`Array[Double]` column with
    * fully integral state. Vectors quantize to
    * `floor(x · scale) + offset` per dimension (`offset` keeps every
    * value — and thus every centroid sum — nonnegative, so the floor
    * divisions below agree across engines' integer-division
    * conventions; it cancels in distances). Initial centroids are the
    * vectors of the `k` smallest ids — deterministic by construction,
    * the caller pre-shuffles ([[Packing.deterministicShuffle]]) when it
    * wants seeded-random init. Each round: assign every vector to the
    * centroid minimizing the exact integer squared distance (ties to
    * the smallest centroid index), then recompute each centroid
    * dimension as `sum div count`; a cluster that loses every member
    * keeps its previous centroid.
    *
    * 100 TB shape — the MLlib plan with portable arithmetic: centroids
    * are k·dim integers held on the driver between rounds (bounded by
    * construction, the same capped-driver-state pattern as the BPE merge
    * dict) and shipped to executors inside the assign kernel's closure,
    * so assignment is a zero-shuffle map — no join, window, or
    * aggregation. The update step explodes (cluster, dim, value) triples
    * IN-PARTITION and partial-aggregates, so only k·dim cells per
    * partition cross the exchange — the vectors themselves never
    * shuffle, in any round. The quantized corpus is persisted once.
    * Returns (id, cluster, dist) from the FINAL assignment; `dist` is
    * the exact integer squared distance, so the whole trajectory is
    * verifiable from the output. */
  /** Quantize + argmin as COMPILED kernels: Spark's higher-order
    * functions (transform/zip_with/aggregate) interpret their lambda per
    * element, which over vectors × centroids × dims × rounds is the
    * dominant cost; a JVM while-loop does the identical IEEE/integer
    * arithmetic at memory speed (the [[Dedup.portableSimHashKernel]]
    * pattern). Ties go to the first (smallest-index) centroid. */
  private[ext] def quantizeKernel(v: Seq[Double], scale: Long,
      offset: Long): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) {
      out(i) = math.floor(v(i) * scale).toLong + offset
      i += 1
    }
    out
  }

  private[ext] def argminKernel(qv: Seq[Long],
      cents: Array[Array[Long]]): (Long, Int) = {
    var best = Long.MaxValue
    var bi = -1
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var d = 0L
      var i = 0
      while (i < cv.length) {
        val x = qv(i) - cv(i)
        d += x * x
        i += 1
      }
      if (d < best) { best = d; bi = c }
      c += 1
    }
    (best, bi)
  }

  def kmeansFixedPoint(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iterations: Int = 2, scale: Long = 1024L,
      offset: Long = 1L << 20): DataFrame = {
    require(k >= 1 && iterations >= 1 && scale >= 1 && offset >= 0)
    val quantUdf = udf((v: Seq[Double]) => quantizeKernel(v, scale, offset))
    val q = df.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        quantUdf(col(vecCol).cast("array<double>")).as("qv"))
      .persist()
    try {
      // ragged embedding columns would IndexOutOfBounds deep inside the
      // argmin kernel — fail loudly up front instead (one 1-row agg; the
      // scan is amortized into the persist's first materialization)
      val dims = q.agg(min(size(col("qv"))).as("lo"), max(size(col("qv"))).as("hi"))
        .collect()(0)
      require(dims.isNullAt(0) || dims.getInt(0) == dims.getInt(1),
        s"kmeansFixedPoint needs a uniform vector dimension; found lengths " +
          s"${dims.getInt(0)}..${dims.getInt(1)} in '$vecCol'")
      // init: the k smallest ids' vectors — one bounded driver collect
      var cents: Seq[Seq[Long]] = q.orderBy(col(idCol)).limit(k)
        .collect().map(_.getSeq[Long](1).toSeq).toSeq

      def assigned(): DataFrame = {
        val centsLocal: Array[Array[Long]] = cents.map(_.toArray).toArray
        val assignUdf = udf((qv: Seq[Long]) => argminKernel(qv, centsLocal))
        q.withColumn("m", assignUdf(col("qv")))
          .select(col(idCol), col("m._2").as("cluster"),
            col("m._1").as("dist"), col("qv"))
      }

      for (_ <- 1 to iterations) {
        val sums = assigned()
          .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
          .groupBy("cluster", "pos")
          .agg(sum("v").as("s"), count(lit(1)).as("n"))
          .withColumn("cvi", expr("s div n"))
          .groupBy("cluster")
          .agg(expr("transform(sort_array(collect_list(struct(pos, cvi)))," +
            " x -> x.cvi)").as("cv"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq).toMap
        // empty clusters keep their previous centroid
        cents = cents.indices.map(i => sums.getOrElse(i, cents(i)))
      }
      assigned().select(col(idCol), col("cluster"), col("dist"))
        .localCheckpoint()
    } finally { q.unpersist(false) }
  }
}
