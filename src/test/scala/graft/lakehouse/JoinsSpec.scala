package graft.lakehouse

import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSuite {
  import spark.implicits._

  test("insertValueIntoList: the three reference branches, no input mutation") {
    val l = Seq("a", "b", "c")
    assert(Joins.insertValueIntoList(l, "zz", "new") == Seq("a", "b", "c", "new"))
    assert(Joins.insertValueIntoList(l, "b", "c") == l)
    assert(Joins.insertValueIntoList(l, "b", "idx") == Seq("a", "idx", "c", "b"))
    assert(l == Seq("a", "b", "c"))
  }

  test("replaceValueInList") {
    assert(Joins.replaceValueInList(Seq("a", "b", "a"), "a", "z") == Seq("z", "b", "z"))
  }

  test("insertColumnAndAlias builds the reference select list") {
    val out = Joins.insertColumnAndAlias(
      Seq("k", "joincol", "v"), "joincol", "idx", Seq("idx", "joincol"))
    assert(out == Seq("k", "map.idx", "v", "fact.joincol"))
  }

  test("simpleMap: substitutes key, keeps original at end, preserves rows") {
    val fact = Seq((1, "x", 10.0), (2, "y", 20.0), (3, "x", 30.0))
      .toDF("id", "seg", "val")
    val map = Seq((100L, "x"), (200L, "y")).toDF("segidx", "seg")
    val out = Joins.simpleMap(fact, map, "seg")
    assert(out.columns.toSeq == Seq("id", "segidx", "val", "seg"))
    assert(out.orderBy("id").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      == Seq((1, 100L), (2, 200L), (3, 100L)))
  }

  test("simpleMap: null-safe key matching") {
    val fact = Seq((1, Option("x")), (2, None)).toDF("id", "k")
    val map = Seq((10L, Option("x")), (20L, None)).toDF("kidx", "k")
    val out = Joins.simpleMap(fact, map, "k").orderBy("id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 20L))
  }

  test("simpleMap: non-unique map key raises") {
    val fact = Seq((1, "x")).toDF("id", "k")
    val dupMap = Seq((10L, "x"), (11L, "x")).toDF("kidx", "k")
    intercept[IllegalStateException](Joins.simpleMap(fact, dupMap, "k"))
  }

  test("simpleMap: joinCol missing but index present -> passthrough; both missing -> error") {
    val fact = Seq((1, 10L)).toDF("id", "kidx")
    val map = Seq((10L, "x")).toDF("kidx", "k")
    assert(Joins.simpleMap(fact, map, "k").collect().toSeq
      == fact.collect().toSeq)
    val bad = Seq((1, "v")).toDF("id", "other")
    intercept[IllegalArgumentException](Joins.simpleMap(bad, map, "k"))
  }

  test("simpleMap plans a broadcast hash join on the map side") {
    val fact = Seq((1, "x"), (2, "y")).toDF("id", "seg")
    val map = Seq((1L, "x"), (2L, "y")).toDF("segidx", "seg")
    val plan = Joins.simpleMap(fact, map, "seg").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("saltedSkewJoin equals the plain inner join on skewed data") {
    // 1000 rows of one hot key + a tail
    val fact = spark.range(0, 1000).toDF("n")
      .withColumn("k", when(col("n") < 900, lit(1)).otherwise(col("n").cast("int")))
    val dim = Seq((1, "hot"), (950, "cold")).toDF("k", "v")
    val plain = fact.join(dim, Seq("k"), "inner")
    val salted = Joins.saltedSkewJoin(fact, dim, "k", salts = 4)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.agg(sum("n")).head().getLong(0)
      == plain.agg(sum("n")).head().getLong(0))
  }

  test("getJoinCondition is null-safe equality") {
    val fact = Seq(Option("a"), None).toDF("k").alias("fact")
    val map = Seq(Option("a"), None).toDF("k").alias("map")
    val n = fact.join(map, Joins.getJoinCondition("k"), "inner").count()
    assert(n == 2)
  }
}
