package graft.lakehouse.streaming

import java.nio.file.Files
import graft.lakehouse.{Catalog, LakehouseProps, SparkSuite, TableIO}
import org.apache.spark.sql.streaming.StreamingQueryException

/** The versioned-table streaming source: offsets are commit versions, each
  * micro-batch delivers exactly the appended files, restarts resume from
  * the checkpointed version, and non-append history fails the stream. */
class VersionedStreamSourceSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("vss_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_vss", "lh_vss").lakehouses.head
  }

  test("readStream follows appends across micro-batches, exactly once") {
    TableIO.writeTable(spark, lh, "feed",
      Seq((1, "a"), (2, "b")).toDF("k", "s"))
    val q = TableIO.streamTable(spark, lh, "feed")
      .writeStream.outputMode("append")
      .format("memory").queryName("vss_sink").start()
    try {
      q.processAllAvailable()
      def sunk(): Seq[Int] = spark.table("vss_sink")
        .select("k").collect().map(_.getInt(0)).toSeq.sorted
      assert(sunk() == Seq(1, 2), "initial batch = current table content")

      TableIO.appendTable(spark, lh, "feed", Seq((3, "c")).toDF("k", "s"))
      q.processAllAvailable()
      assert(sunk() == Seq(1, 2, 3), "append delivered incrementally")

      TableIO.appendTable(spark, lh, "feed",
        Seq((4, "d"), (5, "e")).toDF("k", "s"))
      q.processAllAvailable()
      // exactly-once: no batch re-delivered any earlier file
      assert(sunk() == Seq(1, 2, 3, 4, 5))
    } finally q.stop()
    TableIO.dropTable(spark, lh, "feed")
  }

  test("restart resumes from the checkpointed version (no re-delivery)") {
    TableIO.writeTable(spark, lh, "feed2", Seq((1, "a")).toDF("k", "s"))
    val ckpt = Files.createTempDirectory("vss_ckpt").toString
    // a fault-tolerant (file) sink: the memory sink refuses checkpoint
    // recovery; with the parquet sink a re-delivered batch would land as
    // duplicate rows
    val out = Files.createTempDirectory("vss_out").toString
    def run(): Unit = {
      val q = TableIO.streamTable(spark, lh, "feed2")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt).option("path", out)
        .format("parquet").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 1)

    // append while the stream is DOWN, then restart from the checkpoint:
    // only the gap is delivered, nothing re-delivered
    TableIO.appendTable(spark, lh, "feed2", Seq((2, "b")).toDF("k", "s"))
    run()
    val got = spark.read.parquet(out)
      .select("k").collect().map(_.getInt(0)).toSeq.sorted
    assert(got == Seq(1, 2), s"expected exactly-once delivery, got $got")
    TableIO.dropTable(spark, lh, "feed2")
  }

  test("a merge mid-stream fails it; ignoreRewrites re-delivers instead") {
    TableIO.writeTable(spark, lh, "feed3",
      (1 to 10).map(i => (i, s"v$i")).toDF("k", "s"))
    val q = TableIO.streamTable(spark, lh, "feed3")
      .writeStream.outputMode("append")
      .format("memory").queryName("vss_sink3").start()
    try {
      q.processAllAvailable()
      TableIO.mergeTable(spark, lh, "feed3", Seq((1, "V1")).toDF("k", "s"), Seq("k"))
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(TableIO.rootCause(e).getMessage.contains("ignoreRewrites"))
    } finally q.stop()

    // opt-in: the rewritten file's surviving rows re-deliver (documented
    // Delta ignoreChanges caveat), nothing is lost
    val q2 = TableIO.streamTable(spark, lh, "feed3", ignoreRewrites = true)
      .writeStream.outputMode("append")
      .format("memory").queryName("vss_sink3b").start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.table("vss_sink3b").as[(Int, String)].collect().toMap
    assert(got(1) == "V1" && got.size == 10)
    TableIO.dropTable(spark, lh, "feed3")
  }

  test("the short name registers via META-INF services") {
    TableIO.writeTable(spark, lh, "feed4", Seq((1, "a")).toDF("k", "s"))
    val df = spark.readStream.format("graft-table")
      .option("path", Catalog.tablePath(lh, "feed4")).load()
    assert(df.isStreaming && df.schema.fieldNames.sameElements(Array("k", "s")))
    TableIO.dropTable(spark, lh, "feed4")
  }
}
