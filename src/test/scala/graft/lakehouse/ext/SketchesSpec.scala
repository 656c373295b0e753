package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

/** Portable HLL: integer-exact registers, accurate estimates, null
  * hygiene. Cross-engine register equality is the q192 oracle's job. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private def estimateOf(df: org.apache.spark.sql.DataFrame,
      valueCol: String, m: Int): Double = {
    val regs = Sketches.portableHllRegisters(df, valueCol, m)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    Sketches.hllEstimate(regs, m)
  }

  test("estimate lands within 15% of a 5000-distinct truth (m=64)") {
    val df = spark.range(20000).select((col("id") % 5000).as("v"))
    val est = estimateOf(df, "v", 64)
    assert(math.abs(est - 5000) / 5000.0 < 0.15, s"estimate $est")
  }

  test("small-range linear counting: 10 distinct estimates ~10") {
    val df = spark.range(100).select((col("id") % 10).as("v"))
    val est = estimateOf(df, "v", 64)
    assert(est > 8 && est < 12, s"estimate $est")
  }

  test("registers ignore nulls and duplicates cannot move them") {
    val base = Seq[java.lang.Long](1L, 2L, 3L, null).toDF("v")
    val dup = Seq[java.lang.Long](1L, 1L, 2L, 2L, 3L, null, null).toDF("v")
    val r1 = Sketches.portableHllRegisters(base, "v", 64)
      .orderBy("bucket").collect().toSeq
    val r2 = Sketches.portableHllRegisters(dup, "v", 64)
      .orderBy("bucket").collect().toSeq
    assert(r1 == r2, "registers are a set property, not a multiset one")
    assert(r1.nonEmpty && r1.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 64
      && r.getInt(1) >= 1 && r.getInt(1) <= 55))
  }

  test("grouped registers: per-group sketches are independent") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 1L)).toDF("g", "v")
    val regs = Sketches.portableHllRegisters(df, "v", 64, Seq("g"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val aRegs = regs.filter(_._1 == "a").map(t => (t._2, t._3)).toSet
    val bRegs = regs.filter(_._1 == "b").map(t => (t._2, t._3)).toSet
    assert(bRegs.subsetOf(aRegs), "b saw a subset of a's values")
    assert(aRegs.size == 2 && bRegs.size == 1)
  }
}
