package graft.lakehouse.streaming

import java.nio.file.Files

import graft.lakehouse.{Catalog, LakehouseProps, SparkSuite, TableIO, Versioned}

/** Continuous CDF replication: the replica converges to the source
  * through appends, merges, and deletes; restarts resume from the
  * checkpoint; replayed batches are recognized by the txn watermark and
  * never double-applied. */
class StreamReplicaSpec extends SparkSuite {
  import spark.implicits._

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("srep_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_srep", "lh_srep").lakehouses.head
  }

  private def rowsOf(table: String): Set[(Int, Double)] =
    TableIO.selectTable(spark, lh, table)
      .as[(Int, Double)].collect().toSet

  test("the replica converges through bootstrap, merge, and delete — " +
      "and a restart applies only the gap, exactly once") {
    TableIO.writeTable(spark, lh, "src1",
      Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v"))
    TableIO.enableChangeFeed(spark, lh, "src1")
    val ckpt = Files.createTempDirectory("srep_ckpt").toString

    def run(): Unit = {
      val q = TableIO.streamReplica(spark, lh, "src1", "rep1",
        Seq("k"), checkpoint = Some(ckpt))
      try q.processAllAvailable() finally q.stop()
    }
    // bootstrap: first batch is the snapshot
    run()
    assert(rowsOf("rep1") == Set(1 -> 10.0, 2 -> 20.0, 3 -> 30.0))

    // changes while the stream is DOWN: a merge (update + insert) and a
    // delete; restart applies exactly the gap
    TableIO.mergeTable(spark, lh, "src1",
      Seq((2, 21.0), (4, 40.0)).toDF("k", "v"), Seq("k"))
    TableIO.deleteFromTable(spark, lh, "src1", "k = 1")
    run()
    assert(rowsOf("rep1") ==
      Set(2 -> 21.0, 3 -> 30.0, 4 -> 40.0))
    assert(rowsOf("rep1") == rowsOf("src1"))

    // no new source commits: a restart must apply NOTHING (watermark
    // recognizes the replayed frontier; replica version stays put)
    val repDir = Catalog.tablePath(lh, "rep1")
    val vBefore = Versioned.latestVersion(repDir)
    run()
    assert(Versioned.latestVersion(repDir) == vBefore,
      "an idle restart re-applied a batch")
    Seq("src1", "rep1").foreach(TableIO.dropTable(spark, lh, _))
  }

  test("a replayed batch under the same replication identity is " +
      "skipped by the txn watermark, never double-applied") {
    TableIO.writeTable(spark, lh, "src2",
      Seq((1, 1.0), (2, 2.0)).toDF("k", "v"))
    TableIO.enableChangeFeed(spark, lh, "src2")
    val q1 = TableIO.streamReplica(spark, lh, "src2", "rep2", Seq("k"),
      checkpoint = Some(Files.createTempDirectory("srep_c1").toString),
      appId = Some("rep2app"))
    try q1.processAllAvailable() finally q1.stop()
    assert(rowsOf("rep2") == Set(1 -> 1.0, 2 -> 2.0))

    // a FRESH checkpoint under the SAME appId replays batch 0 (the full
    // snapshot) against a replica that already holds its effects — the
    // manifest watermark recognizes it and applies nothing
    val repDir = Catalog.tablePath(lh, "rep2")
    val vBefore = Versioned.latestVersion(repDir)
    val q2 = TableIO.streamReplica(spark, lh, "src2", "rep2", Seq("k"),
      checkpoint = Some(Files.createTempDirectory("srep_c2").toString),
      appId = Some("rep2app"))
    try q2.processAllAvailable() finally q2.stop()
    assert(rowsOf("rep2") == Set(1 -> 1.0, 2 -> 2.0))
    assert(Versioned.latestVersion(repDir) == vBefore,
      "a replayed batch was re-applied")
    Seq("src2", "rep2").foreach(TableIO.dropTable(spark, lh, _))
  }
}
