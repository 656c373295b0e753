package graft.lakehouse

import org.apache.spark.sql.functions.col

/** Column DEFAULT values (Delta's ALTER TABLE ... SET DEFAULT): declared
  * as a metadata-only commit; ingest paths fill batches that OMIT the
  * column; supplied values — explicit null included — are never touched;
  * the declaration survives overwrites and is droppable. */
class DefaultColumnsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val lh = {
    val dir = java.nio.file.Files.createTempDirectory("defcol").toString
    Catalog.registerLocalWorkspace(dir, "ws_def", "lh_def").lakehouses.head
  }

  test("append/overwrite fill omitted DEFAULT columns; supplied values " +
      "and explicit nulls are kept; declaration survives overwrite; drop " +
      "returns to null-filling") {
    TableIO.writeTable(spark, lh, "d1",
      Seq((1L, "seed")).toDF("k", "src"))
    TableIO.setColumnDefault(spark, lh, "d1", "src", "'backfill'")
    // omitted -> filled with the constant
    TableIO.appendTable(spark, lh, "d1", Seq(2L).toDF("k"))
    // supplied -> kept, explicit null INCLUDED (DEFAULT is not a
    // null-coalesce; it only applies to omitted columns)
    TableIO.appendTable(spark, lh, "d1",
      Seq((3L, Some("explicit")), (4L, None)).toDF("k", "src"))
    val got = TableIO.selectTable(spark, lh, "d1").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("seed"), 2L -> Some("backfill"),
      3L -> Some("explicit"), 4L -> None), got)
    // overwrite omitting the column: filled, and the declaration survives
    TableIO.writeTable(spark, lh, "d1", Seq(10L).toDF("k"))
    val after = TableIO.selectTable(spark, lh, "d1").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == Map(10L -> "backfill"), after)
    TableIO.appendTable(spark, lh, "d1", Seq(11L).toDF("k"))
    assert(TableIO.selectTable(spark, lh, "d1")
      .filter(col("k") === 11L).head().getString(1) == "backfill")
    // drop: later omitting batches go back to null
    TableIO.dropColumnDefault(spark, lh, "d1", "src")
    TableIO.appendTable(spark, lh, "d1", Seq(12L).toDF("k"))
    assert(TableIO.selectTable(spark, lh, "d1")
      .filter(col("k") === 12L).head().isNullAt(1))
    TableIO.dropTable(spark, lh, "d1")
  }

  test("the stored default is cast to the column type; non-constant or " +
      "unevaluable expressions are rejected at declaration") {
    TableIO.writeTable(spark, lh, "d2",
      Seq((1L, 5L)).toDF("k", "v"))
    // declared as an int-ish literal, stored pre-cast to the LONG column
    TableIO.setColumnDefault(spark, lh, "d2", "v", "7")
    TableIO.appendTable(spark, lh, "d2", Seq(2L).toDF("k"))
    assert(TableIO.selectTable(spark, lh, "d2")
      .filter(col("k") === 2L).head().getLong(1) == 7L)
    // column references are generated columns' business
    intercept[IllegalArgumentException] {
      TableIO.setColumnDefault(spark, lh, "d2", "k", "v + 1")
    }
    // a typo fails at declaration, not at the next append
    intercept[Exception] {
      TableIO.setColumnDefault(spark, lh, "d2", "k", "no_such_fn(1)")
    }
    TableIO.dropTable(spark, lh, "d2")
    // generated/identity columns cannot also carry a DEFAULT
    TableIO.writeTable(spark, lh, "d2b", Seq((10L, 1L)).toDF("v", "bucket"))
    TableIO.setGeneratedColumn(spark, lh, "d2b", "bucket", "v % 3")
    intercept[IllegalArgumentException] {
      TableIO.setColumnDefault(spark, lh, "d2b", "bucket", "1")
    }
    TableIO.dropTable(spark, lh, "d2b")
  }

  test("COPY INTO fills a DEFAULT column the source omits") {
    val src = java.nio.file.Files.createTempDirectory("defcopy")
    Seq(100L, 101L).toDF("k").write.parquet(src.resolve("batch").toString)
    TableIO.writeTable(spark, lh, "d3",
      Seq((1L, "seed")).toDF("k", "src"))
    TableIO.setColumnDefault(spark, lh, "d3", "src", "'copied'")
    Ingest.copyInto(spark, lh, "d3", src.resolve("batch").toString,
      format = "parquet")
    val got = TableIO.selectTable(spark, lh, "d3").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "seed", 100L -> "copied", 101L -> "copied"), got)
    TableIO.dropTable(spark, lh, "d3")
  }

  test("MERGE insert clauses fill omitted DEFAULT columns; naming the " +
      "column keeps the clause's value") {
    import TableIO.MergeClause._
    TableIO.writeTable(spark, lh, "d4",
      Seq((1L, 10L, "seed")).toDF("k", "v", "tag"))
    TableIO.setColumnDefault(spark, lh, "d4", "tag", "'merged'")
    val source = Seq((1L, 11L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    TableIO.mergeInto(spark, lh, "d4", source, Seq("k"), Seq(
      MatchedUpdate(Map("v" -> "s.v")),
      NotMatchedInsert(values = Some(Map("k" -> "s.k", "v" -> "s.v")))))
    val got = TableIO.selectTable(spark, lh, "d4").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 11L, "seed"), (2L, 20L, "merged"),
      (3L, 30L, "merged")), got)
    // a clause NAMING the column wins over the default
    TableIO.mergeInto(spark, lh, "d4",
      Seq((9L, 90L)).toDF("k", "v"), Seq("k"), Seq(
      NotMatchedInsert(values = Some(Map(
        "k" -> "s.k", "v" -> "s.v", "tag" -> "'named'")))))
    assert(TableIO.selectTable(spark, lh, "d4")
      .filter(col("k") === 9L).head().getAs[String]("tag") == "named")
    TableIO.dropTable(spark, lh, "d4")
  }

  test("transactional append fills omitted DEFAULT columns") {
    TableIO.writeTable(spark, lh, "d5",
      Seq((1L, "seed")).toDF("k", "src"))
    TableIO.setColumnDefault(spark, lh, "d5", "src", "'txn'")
    val h = Txn.begin(lh)
    Txn.write(h, spark, lh, "d5", Seq(2L).toDF("k"))
    Txn.commit(h)
    val got = TableIO.selectTable(spark, lh, "d5").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "seed", 2L -> "txn"), got)
    TableIO.dropTable(spark, lh, "d5")
  }
}
