package graft.lakehouse

import org.apache.spark.sql.functions.col

/** UNIQUE constraints: declared as a validated metadata commit; enforced
  * batch-internally on overwrite and batch-internally plus against the
  * table on append (stats-pruned probe); SQL NULL semantics (null keys
  * never conflict); droppable; MERGE/keyed-replace deliberately exempt
  * (they replace BY key). */
class UniqueConstraintSpec extends SparkSuite {
  import spark.implicits._

  private lazy val lh = {
    val dir = java.nio.file.Files.createTempDirectory("uniq").toString
    Catalog.registerLocalWorkspace(dir, "ws_uniq", "lh_uniq").lakehouses.head
  }

  test("append rejects keys already in the table and batch-internal " +
      "dups; disjoint appends pass; drop lifts enforcement") {
    TableIO.writeTable(spark, lh, "u1",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    TableIO.addUniqueConstraint(spark, lh, "u1", "pk", Seq("k"))
    // disjoint keys: fine
    TableIO.appendTable(spark, lh, "u1", Seq((3L, "c")).toDF("k", "v"))
    // existing key: rejected, constraint named
    val e1 = intercept[IllegalArgumentException] {
      TableIO.appendTable(spark, lh, "u1", Seq((2L, "dup")).toDF("k", "v"))
    }
    assert(e1.getMessage.contains("pk"), e1.getMessage)
    // batch-internal duplicate: rejected even though 9 is new
    val e2 = intercept[IllegalArgumentException] {
      TableIO.appendTable(spark, lh, "u1",
        Seq((9L, "x"), (9L, "y")).toDF("k", "v"))
    }
    assert(e2.getMessage.contains("pk"), e2.getMessage)
    // nothing from the failed batches landed
    assert(TableIO.selectTable(spark, lh, "u1").count() == 3)
    TableIO.dropUniqueConstraint(spark, lh, "u1", "pk")
    TableIO.appendTable(spark, lh, "u1", Seq((2L, "dup")).toDF("k", "v"))
    assert(TableIO.selectTable(spark, lh, "u1")
      .filter(col("k") === 2L).count() == 2)
  }

  test("SQL NULL semantics: null keys never conflict, with the table or " +
      "each other") {
    TableIO.writeTable(spark, lh, "u2",
      Seq((Some(1L), "a"), (None, "n1")).toDF("k", "v"))
    TableIO.addUniqueConstraint(spark, lh, "u2", "pk", Seq("k"))
    TableIO.appendTable(spark, lh, "u2",
      Seq((Option.empty[Long], "n2"), (Option.empty[Long], "n3"))
        .toDF("k", "v"))
    assert(TableIO.selectTable(spark, lh, "u2").count() == 4)
  }

  test("declaring UNIQUE over already-duplicated data refuses; multi-" +
      "column keys conflict only on the full tuple") {
    TableIO.writeTable(spark, lh, "u3",
      Seq((1L, "a"), (1L, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      TableIO.addUniqueConstraint(spark, lh, "u3", "pk", Seq("k", "v"))
    }
    TableIO.writeTable(spark, lh, "u4",
      Seq((1L, "a"), (1L, "b")).toDF("k", "v"))
    TableIO.addUniqueConstraint(spark, lh, "u4", "kv", Seq("k", "v"))
    // same k, different v: not a (k, v) conflict
    TableIO.appendTable(spark, lh, "u4", Seq((1L, "c")).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      TableIO.appendTable(spark, lh, "u4", Seq((1L, "b")).toDF("k", "v"))
    }
    assert(TableIO.selectTable(spark, lh, "u4").count() == 3)
  }

  test("overwrite enforces batch-internal uniqueness only (replacing " +
      "existing keys is the point of an overwrite); declaration is " +
      "sticky across overwrites") {
    TableIO.writeTable(spark, lh, "u5", Seq((1L, "a")).toDF("k", "v"))
    TableIO.addUniqueConstraint(spark, lh, "u5", "pk", Seq("k"))
    TableIO.writeTable(spark, lh, "u5",
      Seq((1L, "new"), (2L, "b")).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      TableIO.writeTable(spark, lh, "u5",
        Seq((7L, "x"), (7L, "y")).toDF("k", "v"))
    }
    // still enforced after the successful overwrite (sticky declaration)
    intercept[IllegalArgumentException] {
      TableIO.appendTable(spark, lh, "u5", Seq((2L, "dup")).toDF("k", "v"))
    }
  }

  test("MERGE INTO stays exempt: updating an existing key through merge " +
      "is not a violation") {
    TableIO.writeTable(spark, lh, "u6",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    TableIO.addUniqueConstraint(spark, lh, "u6", "pk", Seq("k"))
    TableIO.mergeTable(spark, lh, "u6",
      Seq((2L, "updated"), (3L, "new")).toDF("k", "v"), Seq("k"))
    val got = TableIO.selectTable(spark, lh, "u6").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "updated", 3L -> "new"), got)
  }
}
