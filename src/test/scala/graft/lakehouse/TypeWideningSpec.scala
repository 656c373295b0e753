package graft.lakehouse

import java.nio.file.Files

import org.apache.spark.sql.types._

/** Type widening (Delta): int→long / float→double as a METADATA-ONLY
  * commit — old files upcast natively at scan time, new writes land wide,
  * zero rewrite. */
class TypeWideningSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("widen_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_w", "lh_w").lakehouses.head
  }

  test("int → long widens without rewriting; old and new files coexist") {
    TableIO.writeTable(spark, lh, "w1", Seq((1, 10), (2, 20)).toDF("k", "v"))
    val filesBefore = TableIO.currentFiles(lh, "w1").map(_.toString).toSet
    TableIO.widenColumnType(spark, lh, "w1", "v", LongType)
    // metadata-only: same data files
    assert(TableIO.currentFiles(lh, "w1").map(_.toString).toSet == filesBefore)
    val df = TableIO.selectTable(spark, lh, "w1")
    assert(df.schema("v").dataType == LongType)
    assert(df.orderBy("k").as[(Int, Long)].collect().toSeq ==
      Seq((1, 10L), (2, 20L)))
    // appends land in the wide type; the overflow-needing value that
    // MOTIVATED the widening now fits
    TableIO.appendTable(spark, lh, "w1",
      Seq((3, 5_000_000_000L)).toDF("k", "v"))
    assert(TableIO.selectTable(spark, lh, "w1").orderBy("k")
      .as[(Int, Long)].collect().toSeq ==
      Seq((1, 10L), (2, 20L), (3, 5_000_000_000L)))
    TableIO.dropTable(spark, lh, "w1")
  }

  test("float → double widens; min/max skipping keeps working on mixed files") {
    TableIO.writeTable(spark, lh, "w2",
      Seq((1, 1.5f), (2, 2.5f)).toDF("k", "f"))
    TableIO.widenColumnType(spark, lh, "w2", "f", DoubleType)
    TableIO.appendTable(spark, lh, "w2", Seq((3, 3.5)).toDF("k", "f"))
    val got = TableIO.selectTable(spark, lh, "w2").orderBy("k")
      .as[(Int, Double)].collect().toSeq
    assert(got == Seq((1, 1.5), (2, 2.5), (3, 3.5)))
    // readTable's stat mining on the widened column stays exact
    val narrow = TableIO.readTable(spark, lh, "w2", condition = "f > 2.0")
    assert(narrow.orderBy("k").as[(Int, Double)].collect().toSeq ==
      Seq((2, 2.5), (3, 3.5)))
    TableIO.dropTable(spark, lh, "w2")
  }

  test("bloom filters on the widened column are stripped, not mis-probed") {
    TableIO.writeTable(spark, lh, "w3",
      (1 to 100).map(i => (i, i)).toDF("k", "v"),
      bloomFilterFor = Seq("v"))
    val tdir = Catalog.tablePath(lh, "w3")
    def bloomCols: Seq[String] = TableIO.bloomColsOf(
      Versioned.readManifest(tdir, Versioned.latestVersion(tdir).get).get)
    assert(bloomCols.contains("v"))
    TableIO.widenColumnType(spark, lh, "w3", "v", LongType)
    assert(!bloomCols.contains("v"),
      "narrow-hashed bloom bits would wrongly skip wide-typed probes")
    // equality reads stay correct (min/max pruning only)
    assert(TableIO.readTable(spark, lh, "w3", condition = "v = 42")
      .count() == 1)
    TableIO.dropTable(spark, lh, "w3")
  }

  test("illegal widenings and partition columns are refused loudly") {
    TableIO.writeTable(spark, lh, "w4",
      Seq((1, "a", 2000)).toDF("k", "s", "y"), partitionBy = Seq("y"))
    val e1 = intercept[IllegalArgumentException] {
      TableIO.widenColumnType(spark, lh, "w4", "s", LongType)
    }
    assert(e1.getMessage.contains("not a supported widening"))
    val e2 = intercept[IllegalArgumentException] {
      TableIO.widenColumnType(spark, lh, "w4", "y", LongType)
    }
    assert(e2.getMessage.contains("partition column"))
    // narrowing is not widening
    TableIO.writeTable(spark, lh, "w5", Seq((1, 5L)).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      TableIO.widenColumnType(spark, lh, "w5", "v", IntegerType)
    }
    Seq("w4", "w5").foreach(TableIO.dropTable(spark, lh, _))
  }
}
