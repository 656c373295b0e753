package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

/** Anti-entropy fingerprints: agreement ⇔ empty diff, divergence lands in
  * the right buckets, repair restores equality, and the count term
  * catches what XOR alone cannot. Cross-engine checksum equality is the
  * q201 oracle's job. */
class IntegritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val src = spark.read.parquet(s"$sf0001/orders.parquet")
    .select("o_orderkey", "o_custkey", "o_orderstatus")
  private val keyCanon = col("o_orderkey").cast("string")
  private val rowCanon =
    concat_ws("#", col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))

  test("identical tables produce an empty diff; checksums are " +
      "partition-invariant") {
    assert(Integrity.checksumDiff(src, src.repartition(11), keyCanon,
      rowCanon, buckets = 64).isEmpty)
    val a = Integrity.bucketChecksums(src, keyCanon, rowCanon, 64)
      .orderBy("bucket").collect().toSeq
    val b = Integrity.bucketChecksums(src.repartition(7), keyCanon,
      rowCanon, 64).orderBy("bucket").collect().toSeq
    assert(a == b, "fingerprints are a set property of the rows")
  }

  test("divergence is detected and repair restores exact equality") {
    val rep = src
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 531 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
      .filter(col("o_orderkey") % 1201 =!= 0)
    val bad = Integrity.checksumDiff(src, rep, keyCanon, rowCanon, 64)
    assert(!bad.isEmpty, "perturbed replica must diverge")
    // every perturbed/dropped key's bucket is flagged
    val flagged = bad.select("bucket").collect().map(_.getInt(0)).toSet
    val touchedBuckets = src
      .filter(col("o_orderkey") % 531 === 0 || col("o_orderkey") % 1201 === 0)
      .select(pmod(Integrity.sha60Of(keyCanon), lit(64L)).cast("int"))
      .collect().map(_.getInt(0)).toSet
    assert(touchedBuckets.subsetOf(flagged), s"$touchedBuckets vs $flagged")
    // repair: replace the flagged buckets' contents with source rows
    val repair = Integrity.repairRows(src, rep, keyCanon, rowCanon, 64)
    val repBucketed = rep.withColumn("bucket",
      pmod(Integrity.sha60Of(keyCanon), lit(64L)).cast("int"))
    val rebuilt = repBucketed
      .join(broadcast(bad.select("bucket")), Seq("bucket"), "left_anti")
      .unionByName(repair)
      .drop("bucket")
    assert(Integrity.checksumDiff(src, rebuilt, keyCanon, rowCanon, 64)
      .isEmpty, "post-repair tables must fingerprint-match")
    assert(rebuilt.count() == src.count())
  }

  test("canon is null-unambiguous: null vs empty vs shifted nulls all " +
      "differ, and values containing the separator cannot forge a " +
      "boundary") {
    val df = Seq(
      (Some("a"), Some("b")),
      (Some("a"), None),
      (None, Some("a")),
      (Some(""), Some("a")),
      (Some("a#3:b"), None),
      (Some("a"), Some("3:b"))
    ).toDF("x", "y")
    val canons = df.select(Integrity.canon(col("x"), col("y"))).collect()
      .map(_.getString(0))
    assert(canons.distinct.length == canons.length,
      s"canonical collision: ${canons.mkString(" | ")}")
  }

  test("a row duplicated to even multiplicity hides from XOR but not " +
      "from the count") {
    val one = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dup = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"))
      .toDF("k", "v")
    val kc = col("k").cast("string")
    val rc = concat_ws("#", col("k"), col("v"))
    val d = Integrity.checksumDiff(one, dup, kc, rc, 8).collect()
    assert(d.nonEmpty, "multiplicity change must be detected")
    // the XOR term alone is identical (h ^ h ^ h = h): the count caught it
    assert(d.forall(r => r.getLong(3) == r.getLong(4)),
      "this case is exactly the XOR blind spot")
    assert(d.exists(r => r.getLong(1) != r.getLong(2)))
  }
}
