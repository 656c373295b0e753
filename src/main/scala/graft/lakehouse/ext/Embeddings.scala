package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column preparation operators for training-data pipelines:
  * L2 normalization (cosine-ready vectors) and symmetric int8 quantization
  * (4× smaller embedding tables; the standard serving/index format).
  *
  * Per-row kernels are compiled Scala UDFs, not higher-order-function
  * lambdas — Spark evaluates HOF lambdas interpreted per element, which on a
  * 64-dim × billions-of-rows corpus is the difference between a JIT'd loop
  * and an expression-tree walk per float (same rationale as the MinHash
  * kernel, Dedup.scala). Nothing here shuffles: both operators are
  * narrow per-row transforms that ride whatever partitioning the input has.
  */
object Embeddings {

  /** x / ||x||₂, sequential left-to-right sum of squares (matches DuckDB's
    * list_sum evaluation order — the oracle compares values, so summation
    * order must be identical). Zero vectors pass through unchanged. */
  private[ext] def l2Kernel(v: Seq[Double]): Array[Double] = {
    val n = v.length
    val a = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v(i); a(i) = x; ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm == 0.0) return a
    var j = 0
    while (j < n) { a(j) /= nrm; j += 1 }
    a
  }

  /** Symmetric per-vector int8 quantization: scale = max|x| / 127,
    * q_i = round_half_away_from_zero(x_i / scale) ∈ [-127, 127].
    * Rounding is spelled out explicitly because JVM Math.round is
    * half-toward-positive-infinity while SQL engines round half away from
    * zero — the one detail that would silently desync the oracle. */
  private[ext] def quantizeKernel(v: Seq[Double]): (Double, Array[Int]) = {
    val n = v.length
    var mx = 0.0
    var i = 0
    while (i < n) { val ax = math.abs(v(i)); if (ax > mx) mx = ax; i += 1 }
    val q = new Array[Int](n)
    if (mx == 0.0) return (0.0, q)
    var j = 0
    while (j < n) {
      val y = v(j) * 127.0 / mx
      q(j) = (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toInt
      j += 1
    }
    (mx / 127.0, q)
  }

  private val l2Udf = udf((v: Seq[Double]) => l2Kernel(v))
  private val quantUdf = udf((v: Seq[Double]) => quantizeKernel(v))

  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  /** `outCol` = L2-normalized copy of `vecCol` (array<double>). */
  def withL2Normalized(df: DataFrame, vecCol: String,
      outCol: String = "embedding_norm"): DataFrame =
    df.withColumn(outCol, l2Udf(asDouble(col(vecCol))))

  /** Adds `scaleCol` (double) and `qCol` (array<int>, values in [-127,127])
    * — dequantize with x ≈ q * scale. */
  def withInt8Quantized(df: DataFrame, vecCol: String,
      qCol: String = "embedding_q8", scaleCol: String = "q8_scale"): DataFrame = {
    val packed = quantUdf(asDouble(col(vecCol)))
    df.withColumn("__q", packed)
      .withColumn(scaleCol, col("__q._1"))
      .withColumn(qCol, col("__q._2"))
      .drop("__q")
  }
}
