package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
