package graft

import graft.lakehouse.SparkSuite

/** Every registered query must at least EXECUTE at sf0.001. The driver's
  * Verify swallows per-query exceptions (a crashed query simply vanishes
  * from the correctness scoreboard — round 4 shipped a 17-query regression
  * that way, invisible until the judge diffed registry vs scoreboard).
  * This spec turns any such crash into a red test the same day it happens,
  * with the query name and root exception in the failure message.
  *
  * Correctness (values vs the DuckDB oracle) is the driver's job; this is
  * purely a does-it-run tripwire, so one action per query suffices.
  */
class QueriesSmokeSpec extends SparkSuite {
  test("every SparkEntry.queries entry executes at sf0.001 without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf0001).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} quer${if (failures.size == 1) "y" else "ies"} crashed:\n" +
        failures.mkString("\n"))
  }

  test("every queries entry has an oracleSql entry or a documented rows-only waiver") {
    // rows-only queries (no SQL-expressible oracle) — each must carry a
    // justification in SURVEY.md / the registry; keep this list in sync.
    val waived = Set(
      "q28_fingerprints", "q30_dedup_minhash_lsh", "q31_dedup_simhash",
      "q35_ann_lsh_topk", "q40_events_approx_distinct", "q44_ann_ivf_topk",
      "q49_pack_sequences", "q55_sample_mixture", "q64_dedup_incremental",
      "q168_ann_pq_topk")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- waived
    assert(missing.isEmpty, s"queries without oracle SQL nor waiver: ${missing.toSeq.sorted}")
    val stale = waived -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"waiver list names unregistered queries: ${stale.toSeq.sorted}")
  }
}
