package graft.lakehouse.functions

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

/** The native mergeable top-k aggregate: correctness across the partial-
  * aggregation protocol (many partitions ⇒ serialize/deserialize/merge all
  * exercised), null handling, small groups, SQL registration, and
  * equivalence with the window-rank formulation. */
class TopKAggregateSpec extends SparkSuite {
  import spark.implicits._

  test("top-3 per group, descending, across 8 partitions (merge path)") {
    val df = (1 to 1000).map(i => (if (i % 2 == 0) "even" else "odd", i * 1.0))
      .toDF("g", "v").repartition(8)
    val got = df.groupBy("g").agg(VectorFunctions.graft_topk($"v", 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("even") == Seq(1000.0, 998.0, 996.0))
    assert(got("odd") == Seq(999.0, 997.0, 995.0))
  }

  test("nulls ignored; groups smaller than k return what exists") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(5.0)), ("b", Some(2.0)))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(VectorFunctions.graft_topk($"v", 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(5.0, 1.0))
    assert(got("b") == Seq(2.0))
  }

  test("SQL registration: graft_topk(col, k) in a SQL aggregate") {
    VectorFunctions.register(spark)
    val df = (1 to 100).map(i => ("g", i * 1.0)).toDF("g", "v")
    df.createOrReplaceTempView("topk_in")
    val got = spark.sql(
      "SELECT g, graft_topk(v, 2) AS top FROM topk_in GROUP BY g")
      .head().getSeq[Double](1)
    assert(got == Seq(100.0, 99.0))
  }

  test("agrees with the window-rank formulation on skewed random-ish data") {
    val df = (1 to 5000).map(i => (s"g${i % 7}", (i * 2654435761L % 10007) * 1.0))
      .toDF("g", "v").repartition(16)
    val viaAgg = df.groupBy("g")
      .agg(VectorFunctions.graft_topk($"v", 5).as("top"))
      .select($"g", posexplode($"top").as(Seq("i", "v")))
      .select("g", "v").collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val viaWindow = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy($"v".desc)))
      .filter($"rn" <= 5).select("g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(viaAgg == viaWindow)
  }

  test("non-double input is a type-check failure, k must be a literal") {
    val df = Seq(("a", 1)).toDF("g", "v")
    intercept[Exception] {
      df.groupBy("g").agg(VectorFunctions.graft_topk($"v", 2)).collect()
    }
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("topk_bad")
    intercept[Exception] {
      spark.sql("SELECT graft_topk(CAST(v AS DOUBLE), v) FROM topk_bad").collect()
    }
  }
}
