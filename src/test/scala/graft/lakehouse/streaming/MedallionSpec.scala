package graft.lakehouse.streaming

import java.nio.file.Files

import graft.lakehouse.{Catalog, LakehouseProps, MatView, SparkSuite, TableIO}
import org.apache.spark.sql.functions._

/** The full medallion pipeline composed end to end from this engine's
  * streaming pieces: a MemoryStream lands in BRONZE through the
  * exactly-once versioned sink; SILVER follows bronze's change feed as a
  * keyed replica (updates overwrite, O(changes) per batch); GOLD is a
  * materialized aggregate view continuously maintained from silver's
  * commit log. Each stage's exactly-once contract is spec'd in
  * isolation elsewhere — THIS spec pins the composition: a crash of
  * every stream mid-pipeline (plus DML landing while they are down)
  * must converge after restart with nothing double-applied, because
  * each tier's watermark commits atomically with its data. */
class MedallionSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("med_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_med", "lh_med").lakehouses.head
  }

  test("bronze ingest -> silver CDF replica -> gold continuous MV: " +
      "converges, survives a full-pipeline restart, never double-counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Int, String, Double)]
    val bronzeDir = Catalog.tablePath(lh, "med_bronze")
    val ingestCkpt = Files.createTempDirectory("med_ing").toString
    val replicaCkpt = Files.createTempDirectory("med_rep").toString
    val mvCkpt = Files.createTempDirectory("med_mv").toString

    def runIngest(): Unit = {
      val q = mem.toDF().toDF("k", "g", "v").writeStream
        .format("graft-table").option("path", bronzeDir)
        .option("checkpointLocation", ingestCkpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    def runReplica(): Unit = {
      val q = TableIO.streamReplica(spark, lh, "med_bronze", "med_silver",
        Seq("k"), checkpoint = Some(replicaCkpt))
      try q.processAllAvailable() finally q.stop()
    }
    def runMv(): Unit = {
      val q = MatView.maintainAggView(spark, lh, "med_gold",
        checkpoint = Some(mvCkpt))
      try q.processAllAvailable() finally q.stop()
    }
    def goldRows(): Map[String, (Long, Double)] =
      TableIO.selectTable(spark, lh, "med_gold")
        .select(col("g"), col("mv_count"), col("sum_v"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
    def truth(): Map[String, (Long, Double)] =
      TableIO.selectTable(spark, lh, "med_silver")
        .groupBy("g").agg(count(lit(1)).as("c"),
          sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap

    // tier 1: first micro-batch lands bronze; CDF on from the start
    mem.addData((1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0))
    runIngest()
    TableIO.enableChangeFeed(spark, lh, "med_bronze")
    // tier 2: replica bootstraps from the snapshot; its OWN change feed
    // goes on so the next tier can chain off it (keyed replaces stage
    // CDF events)
    runReplica()
    TableIO.enableChangeFeed(spark, lh, "med_silver")
    // tier 3: the gold view snapshots silver, then follows its commits
    MatView.createAggView(spark, lh, "med_gold", "med_silver",
      Seq("g"), Seq("v"))
    assert(goldRows() == Map("a" -> (2L, 30.0), "b" -> (1L, 30.0)))

    // steady state: new bronze data flows tier to tier
    mem.addData((4, "b", 40.0), (5, "c", 50.0))
    runIngest(); runReplica(); runMv()
    assert(goldRows() == truth() &&
      goldRows() == Map("a" -> (2L, 30.0), "b" -> (2L, 70.0),
        "c" -> (1L, 50.0)))

    // outage: every stream is DOWN while an append AND row-level DML
    // land on bronze (the replica must fold the merge's update, not
    // re-insert it; the MV must fold silver's keyed replace)
    mem.addData((6, "c", 60.0))
    runIngest()
    TableIO.mergeTable(spark, lh, "med_bronze",
      Seq((1, "a", 11.0), (7, "d", 70.0)).toDF("k", "g", "v"), Seq("k"))
    TableIO.deleteFromTable(spark, lh, "med_bronze", "k = 2")
    // restart the downstream tiers from their checkpoints
    runReplica(); runMv()
    val expect = Map("a" -> (1L, 11.0), "b" -> (2L, 70.0),
      "c" -> (2L, 110.0), "d" -> (1L, 70.0))
    assert(truth() == expect, s"silver diverged: ${truth()}")
    assert(goldRows() == expect, s"gold diverged: ${goldRows()}")

    // idle restarts of the whole pipeline change nothing (watermarks
    // recognize the frontier at every tier)
    runIngest(); runReplica(); runMv()
    assert(goldRows() == expect, "idle restart double-applied somewhere")
    Seq("med_bronze", "med_silver", "med_gold")
      .foreach(TableIO.dropTable(spark, lh, _))
  }
}
