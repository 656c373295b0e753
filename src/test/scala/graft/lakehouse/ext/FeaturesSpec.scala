package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSuite {
  import spark.implicits._

  test("minMaxScale: endpoints map to 0 and 1e6, constants to 0, " +
      "nulls stay null, multiple columns independent") {
    val df = Seq(
      (1L, Some(10.0), 5.0),
      (2L, Some(20.0), 5.0),
      (3L, Some(15.0), 5.0),
      (4L, None, 5.0)
    ).toDF("k", "x", "c")
    val out = Features.minMaxScale(df, Seq("x", "c")).orderBy("k").collect()
    assert(out(0).getAs[Long]("x_scaled") == 0L)
    assert(out(1).getAs[Long]("x_scaled") == 1000000L)
    assert(out(2).getAs[Long]("x_scaled") == 500000L)
    assert(out(3).isNullAt(out(3).fieldIndex("x_scaled")))
    assert(out.forall(r => r.getAs[Long]("c_scaled") == 0L)) // constant col
    assert(out(0).schema.fieldNames.count(_.startsWith("__")) == 0)
  }

  test("indexCategories: frequency desc then value asc, nulls excluded; " +
      "withCategoryIndex joins it back, unseen -> null") {
    val df = Seq("b", "a", "b", "c", "a", "b", null).toDF("v")
    val dict = Features.indexCategories(df, "v").orderBy("idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(dict.toSeq == Seq(("b", 3L, 0L), ("a", 2L, 1L), ("c", 1L, 2L)))
    val applied = Features.withCategoryIndex(df, "v")
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(applied(Some("b")) == Some(0L) && applied(Some("a")) == Some(1L))
    assert(applied(None).isEmpty)
  }

  test("targetEncode: singleton category shrinks toward the global mean, " +
      "big category stays near its own; nulls excluded") {
    // global: 10 rows of 100 + 1 row of 1000 -> gsum 2000, gn 11, gmean 181
    val df = ((1 to 10).map(_ => ("big", 100L)) :+ (("rare", 1000L)))
      .toDF("cat", "t")
    val out = Features.targetEncode(df, "cat", "t", m = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // big: (1000 + 181*10) div 20 = 2810 div 20 = 140
    assert(out("big") == 140L)
    // rare: (1000 + 1810) div 11 = 255 -- far from 1000, near the prior
    assert(out("rare") == 255L)
    // null category rows are simply excluded
    val withNulls = df.union(Seq((null.asInstanceOf[String], 5L)).toDF("cat", "t"))
    assert(Features.targetEncode(withNulls, "cat", "t", 0L).count() == 2)
    intercept[IllegalArgumentException] {
      Features.targetEncode(df, "cat", "t", -1L)
    }
  }
  test("hashCross: stable buckets in range, same cross -> same bucket, " +
    "independent of row order") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "z"))
      .toDF("c1", "c2")
    val out = Features.hashCross(df, Seq("c1", "c2"), 16)
    val buckets = out.select("c1", "c2", "feature_bucket").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
      .toMap
    assert(buckets.size == 3, "three distinct crosses")
    assert(buckets.values.forall(b => b >= 0 && b < 16))
    val again = Features.hashCross(df.repartition(3), Seq("c1", "c2"), 16)
      .select("c1", "c2", "feature_bucket").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
      .toMap
    assert(buckets == again)
  }
}
