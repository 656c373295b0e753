package graft.lakehouse

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The lint rules flag exactly the three scale foot-guns and nothing
  * legitimate: bounded sorts, top-k limits, and partitioned windows all
  * pass; cartesian products, corpus-wide unpartitioned windows, and
  * unbounded global sorts are caught. */
class PlanLintSpec extends SparkSuite {

  test("cartesian products are flagged; broadcast cross joins are not") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val cart = spark.range(100).crossJoin(spark.range(100).toDF("j"))
      assert(PlanLint.violations(cart).exists(_._1 == "cartesian-product"),
        PlanLint.violations(cart).toString)
    } finally spark.conf.set(key, prev)
    // with broadcasting on, the tiny cross join is a BNLJ — legitimate
    // (the 1-row-aggregate crossJoin pattern) and not flagged
    val ok = spark.range(100).crossJoin(
      spark.range(5).agg(count(lit(1)).as("n")))
    assert(!PlanLint.violations(ok).exists(_._1 == "cartesian-product"),
      PlanLint.violations(ok).toString)
  }

  test("unpartitioned windows over unbounded input are flagged; " +
      "partitioned or aggregate-bounded ones are not") {
    val raw = spark.range(1000).toDF("id")
    val bad = raw.withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(PlanLint.violations(bad)
      .exists(_._1 == "unpartitioned-window-unbounded"))
    val partitioned = raw.withColumn("rn",
      row_number().over(Window.partitionBy(col("id") % 7).orderBy("id")))
    assert(PlanLint.violations(partitioned).isEmpty,
      PlanLint.violations(partitioned).toString)
    // bounded-DOMAIN grouping (bucket key): the aggregate genuinely
    // tames the window
    val bounded = raw.groupBy((col("id") % 7).as("b")).count()
      .withColumn("rn", row_number().over(Window.orderBy("b")))
    assert(PlanLint.violations(bounded).isEmpty,
      PlanLint.violations(bounded).toString)
  }

  test("partition-less window over a PER-KEY aggregate flags: grouped " +
      "output is input-proportional (calendar/bucket keys pass)") {
    val raw = spark.range(1000).toDF("id")
    // per-id grouping: |groups| ~ |input| -> still a corpus-scale sort
    val perKey = raw.groupBy("id").count()
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(PlanLint.violations(perKey)
      .exists(_._1 == "unpartitioned-window-grouped-agg"),
      PlanLint.violations(perKey).toString)
    // calendar-domain grouping passes
    val ts = spark.range(1000).selectExpr(
      "timestamp_seconds(id * 86400) AS ts")
    val daily = ts.groupBy(to_date(col("ts")).as("day")).count()
      .withColumn("c", sum("count").over(Window.orderBy("day")))
    assert(PlanLint.violations(daily).isEmpty,
      PlanLint.violations(daily).toString)
    // a global aggregate (no keys) still bounds absolutely
    val global = raw.agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(Window.orderBy("n")))
    assert(PlanLint.violations(global).isEmpty,
      PlanLint.violations(global).toString)
  }

  test("global sorts flag only when unbounded AND unlimited") {
    val raw = spark.range(1000).toDF("id")
    assert(PlanLint.violations(raw.orderBy("id"))
      .exists(_._1 == "global-sort-unbounded"))
    assert(PlanLint.violations(raw.orderBy("id").limit(5)).isEmpty,
      "top-k must not flag")
    assert(PlanLint.violations(
      raw.groupBy("id").count().orderBy("id")).isEmpty,
      "a sort over an aggregate is bounded")
  }

  test("report shape: names, counts, and deduplicated rule tags") {
    val raw = spark.range(100).toDF("id")
    val bad = raw
      .withColumn("rn", row_number().over(Window.orderBy("id")))
      .orderBy("id")
    val got = PlanLint.report(spark,
        Seq("clean" -> raw.groupBy("id").count(), "dirty" -> bad))
      .orderBy("query").collect()
    assert(got(0).getString(0) == "clean" && got(0).getLong(1) == 0L)
    assert(got(1).getString(0) == "dirty" && got(1).getLong(1) >= 1L)
    assert(got(1).getString(2).contains("unpartitioned-window-unbounded"),
      got(1).toString)
  }
}
