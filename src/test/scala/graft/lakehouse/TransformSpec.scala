package graft.lakehouse

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TransformSpec extends SparkSuite {
  import spark.implicits._

  test("setDFTextWhenNull / setNullToZero (skips absent columns)") {
    val df = Seq((1, Option("a"), Option(2.0)), (2, None, None))
      .toDF("id", "s", "v")
    val t = Transform.setDFTextWhenNull(df, "s", "missing")
    assert(t.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "missing"))
    val z = Transform.setNullToZero(df, Seq("v", "nope"))
    assert(z.orderBy("id").collect().map(_.getDouble(2)).toSeq == Seq(2.0, 0.0))
  }

  test("castColumns: clean cast drops _orig, failures keep it") {
    val df = Seq(("1", "x"), ("2", "3")).toDF("a", "b")
    val clean = Transform.castColumns(df, Seq("a"), "int")
    assert(clean.columns.toSeq == Seq("a", "b"))
    assert(clean.schema("a").dataType == IntegerType)
    val dirty = Transform.castColumns(df, Seq("b"), "int")
    assert(dirty.columns.toSeq == Seq("a", "b", "b_orig"))
    assert(dirty.orderBy("a").collect().map(r => Option(r.get(1))).toSeq
      == Seq(None, Some(3)))
    // null input -> null output, not a failure
    val withNull = Seq(Tuple1(Option("7")), Tuple1(None: Option[String])).toDF("a")
    val ok = Transform.castColumns(withNull, Seq("a"), "int")
    assert(ok.columns.toSeq == Seq("a"))
  }

  test("castColumns preserves column position") {
    val df = Seq(("x", "1", "y")).toDF("c1", "c2", "c3")
    val out = Transform.castColumns(df, Seq("c2"), "int")
    assert(out.columns.toSeq == Seq("c1", "c2", "c3"))
  }

  test("createExtraRow: padding, isActualMetadata zero-fill, sort") {
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("name", StringType),
      StructField("isActualMetadata", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2, "b", 1), Row(1, "a", 1))), schema)
    val out = Transform.createExtraRow(df, -1, "none").collect()
    assert(out.length == 3)
    assert(out.head == Row(-1, "none", 0)) // sorted first; isActualMetadata 0-filled
  }

  test("renameColumnsWithPrefix / StripPrefix round-trip") {
    val df = Seq((1, "x")).toDF("k", "v")
    val pre = Transform.renameColumnsWithPrefix(df, "dim")
    assert(pre.columns.toSeq == Seq("dim_k", "dim_v"))
    val back = Transform.renameColumnsStripPrefix(pre, Seq("dim"))
    assert(back.columns.toSeq == Seq("k", "v"))
    // stripping that would empty a name is skipped
    val keep = Transform.renameColumnsStripPrefix(Seq((1, 2)).toDF("p", "p_x"), Seq("p"))
    assert(keep.columns.toSeq == Seq("p", "x"))
  }

  test("addIndexCol: parity variant, position, case-insensitive replace") {
    val df = Seq(("a", 1), ("b", 2)).toDF("name", "IDX")
    val out = Transform.addIndexCol(df, "idx", indexStart = 10, newColPos = 0)
    assert(out.columns.toSeq == Seq("idx", "name"))
    val single = out.coalesce(1).orderBy("name").collect()
    // single-partition: contiguous from indexStart+1
    assert(Transform.addIndexCol(df.coalesce(1), "i").select("i")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("addIndexColContiguous: contiguous and order-aligned across partitions") {
    val df = spark.range(0, 1000).toDF("n").repartition(7)
      .withColumn("k", col("n") * 3 % 1000).orderBy("k")
    val out = Transform.addIndexColContiguous(df, "idx")
    val rows = out.orderBy("idx").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 1000L))
    // idx order == k order
    assert(rows.map(_.getLong(2)).toSeq == rows.map(_.getLong(2)).sorted.toSeq)
  }

  test("getDistinctValsFromDataRowsInt: counts variant + index naming") {
    val df = Seq(("x", 1), ("y", 2), ("x", 3)).toDF("cat_a", "v")
    val out = Transform.getDistinctValsFromDataRowsInt(df, Seq("cat_a"),
      rowCountCol = Some("v"))
    assert(out.columns.toSeq == Seq("indexcata", "cat_a", "v"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      == Seq((1L, "x", 2L), (2L, "y", 1L)))
    // suppressNullRawScore filters on RawScore
    val rs = Seq((Option(1.0), "a"), (None, "a"), (Option(2.0), "b"))
      .toDF("RawScore", "g")
    val filtered = Transform.getDistinctValsFromDataRowsInt(rs, Seq("g"),
      rowCountCol = Some("RawScore"), suppressNullRawScore = true)
    assert(filtered.collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      == Seq(("a", 1L), ("b", 1L)))
  }

  test("dfShape") {
    val (r, c, cols) = Transform.dfShape(Seq((1, "a")).toDF("x", "y"))
    assert((r, c, cols) == (1L, 2, Seq("x", "y")))
  }
}
