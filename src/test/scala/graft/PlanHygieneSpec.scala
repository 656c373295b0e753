package graft

import graft.lakehouse.SparkSuite

/** Plan-shape assertions: the optimizations we rely on at 100 TB must be
  * visible in the physical plan, not assumed. Guards against regressions
  * that silently turn a broadcast join into a shuffle or lose parquet
  * pushdown. */
class PlanHygieneSpec extends SparkSuite {

  def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q4_read_table pushes filter and projection into the parquet scan") {
    val p = plan("q4_read_table")
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,150000.0)]")
      || p.contains("GreaterThan(o_totalprice"), p)
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"), p)
  }

  test("q1 scans only the five lineitem columns it needs") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("l_quantity") && !p.contains("l_partkey"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q17_simple_map broadcasts the dimension side") {
    val p = plan("q17_simple_map")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q2 multi-view join keeps aggregates partial (no extra shuffle)") {
    val p = plan("q2_sql_multi_view_join")
    // partial + final hash aggregate around a single shuffle for the group-by
    assert(p.contains("HashAggregate"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p)
  }

  test("q36 tumbling window is a single-shuffle hash aggregate") {
    val p = plan("q36_events_tumbling")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  /** Executed plan text, truncated to AQE's final plan (the full string
    * repeats every operator again under "== Initial Plan =="). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  test("q34 cosineTopK shuffles only the phase-2 survivor merge") {
    val df = SparkEntry.queries("q34_ann_cosine_topk")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // the query side rides a broadcast; the corpus-side scoring and the
    // map-side top-k heap must not introduce a data shuffle — the only
    // hash exchange is the per-query merge of partition-local survivors
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q29 exact dedup is one shuffle on the dedup key") {
    val df = SparkEntry.queries("q29_dedup_exact")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q53 contamination broadcasts the eval side") {
    val df = SparkEntry.queries("q53_contamination")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // the eval gram index and its sizes must ride broadcasts; the train
    // corpus joins map-side (no SortMergeJoin anywhere in the plan)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q57 as-of join shuffles once on the key (plus the output sort)") {
    val df = SparkEntry.queries("q57_asof_join")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // exactly two hash exchanges: the query's own purchases
    // groupBy(user_id, ts) pre-aggregation, and the as-of window's single
    // shuffle on user_id — the join itself adds NO sort-merge or
    // nested-loop machinery
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q69 pruned scan pushes the residual range filter into parquet") {
    val df = SparkEntry.queries("q69_pruned_scan")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // manifest-level pruning picks the files; the residual predicate must
    // STILL reach the scan so parquet row-group stats skip within files
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(o_totalprice,100000.0)"), p)
  }

  test("q72 bloom point lookup pushes the equality probe into parquet") {
    val df = SparkEntry.queries("q72_bloom_point_lookup")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // file skipping happened before the plan; the equality residual rides
    // the scan, where the parquet-native bloom prunes row groups
    assert(p.contains("PushedFilters") && p.contains("EqualTo(o_orderkey"), p)
  }

  test("q90 portable sampling is a pure per-row filter: zero exchanges") {
    val df = graft.lakehouse.ext.Packing.portableSampleMixture(
      spark.read.parquet(s"$sf0001/documents.parquet")
        .select("doc_id", "source"),
      "doc_id", "source", Map("web" -> 0.5, "books" -> 0.25), seed = 7L)
    df.collect()
    val p = finalPlan(df)
    // membership is a pure function of (id, seed): any shuffle here would
    // mean the operator stopped being embarrassingly parallel
    assert(!p.contains("Exchange"), p)
  }

  test("q75 portable fingerprints never shuffle before the explode " +
      "(per-document kernel; fingerprints are doc-local)") {
    val df = graft.lakehouse.ext.TextStats.portableFingerprints(
      spark.read.parquet(s"$sf0001/documents.parquet")
        .select("doc_id", "text"), "doc_id", "text")
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), // the old formulation's exchange source
      p)
  }

  test("q89 semantic dedup (exact mode) plans one join pair and the " +
      "anti-join survivor filter — no window, no extra aggregation") {
    val df = SparkEntry.queries("q89_semantic_dedup")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // nClusters = 1: the cluster-keyed self-join plus the left_anti
    // survivor join; a Window or SortAggregate here would signal a
    // regressed formulation
    assert(!p.contains("Window"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("the change feed behind MV refresh scans _cdf_ sidecars, never " +
      "source data files; a sum-only refresh reads no source bytes") {
    val lhDir = java.nio.file.Files.createTempDirectory("ph_mv").toString
    val lh = graft.lakehouse.Catalog
      .registerLocalWorkspace(lhDir, "ws_ph", "lh_ph").lakehouses.head
    import spark.implicits._
    val base = (1 to 100).map(i => (i.toLong, s"g${i % 5}", i.toLong))
      .toDF("k", "g", "v")
    graft.lakehouse.TableIO.writeTable(spark, lh, "ph_src", base)
    graft.lakehouse.TableIO.enableChangeFeed(spark, lh, "ph_src")
    graft.lakehouse.MatView.createAggView(spark, lh, "ph_mv", "ph_src",
      Seq("g"), Seq("v"))
    graft.lakehouse.TableIO.mergeTable(spark, lh, "ph_src",
      Seq((1L, "g1", 100L)).toDF("k", "g", "v"), Seq("k"))
    // the feed itself: MUST read the sidecar, MUST NOT read data files
    val feed = graft.lakehouse.TableIO.readChangeFeed(spark, lh, "ph_src", 2L)
    val p = finalPlan(feed)
    assert(p.contains("_cdf_"),
      s"rewrite versions must come from the change-data sidecar: $p")
    assert(!p.contains("/Tables/ph_src/v"), // source data files live under v<N>/
      s"the feed must not scan source data files: $p")
    // (the write side of the O(changes) contract — only view files with
    // changed groups rewrite, and sum-only refreshes never build the
    // min/max rescan's source scan — is pinned behaviorally in
    // MatViewSpec; the feed plan above is the read-side half that could
    // silently regress)
    graft.lakehouse.TableIO.dropTable(spark, lh, "ph_src")
    graft.lakehouse.TableIO.dropTable(spark, lh, "ph_mv")
  }

  test("whole-stage codegen covers the q1 hot path") {
    // AQE only shows the final (codegen-annotated) plan after execution
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators render with the "*(stageId)" prefix
    assert(p.contains("*(1) HashAggregate") || p.contains("*(1) Filter"), p)
  }

  test("q120 attribution is one window over one user-key shuffle — no " +
      "conversions×touches self-join") {
    val df = SparkEntry.queries("q120_attribution")(spark, sf0001)
    val p = finalPlan(df)
    assert(!p.contains("Join"), p)
    val body = { val c = p.indexOf("== Initial Plan ==")
      if (c >= 0) p.take(c) else p }
    assert("Exchange hashpartitioning".r.findAllIn(body).size <= 1, p)
  }

  test("q121 OOV rate broadcasts the vocab — the token stream is never " +
      "hash-shuffled on the token") {
    val df = SparkEntry.queries("q121_oov_rate")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q127 fuzzy decontamination broadcasts the eval band index and " +
      "anti-joins without a sort-merge") {
    val df = SparkEntry.queries("q127_fuzzy_decontaminate")(spark, sf0001)
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q125 sessionize is one window over one user-key shuffle") {
    val df = SparkEntry.queries("q125_sessionize")(spark, sf0001)
    val p = finalPlan(df)
    val body = { val c = p.indexOf("== Initial Plan ==")
      if (c >= 0) p.take(c) else p }
    assert(body.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(body).size <= 1, p)
  }

  test("q164 TPC-H Q3: every filter reaches its scan; TakeOrdered caps the top-10") {
    val p = plan("q164_tpch_q3")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("LessThan(o_orderdate") && p.contains("GreaterThan(l_shipdate"), p)
    // top-k never materializes a full sort of the aggregate output
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q165 TPC-H Q5: region/nation ride broadcasts, no cartesian anywhere") {
    val p = plan("q165_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
  }

  test("q166 TPC-H Q10: returnflag filter pushes to the lineitem scan, nation broadcasts") {
    val p = plan("q166_tpch_q10")
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q173 TPC-H Q16: the excluded-supplier NOT IN is a broadcast anti " +
      "join; part filters push to the scan") {
    val p = plan("q173_tpch_q16")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Not(EqualTo(p_brand,Brand#3))") || p.contains("p_size"), p)
  }

  test("q174 TPC-H Q21: EXISTS/NOT EXISTS are semi/anti joins with the " +
      "non-equi residual riding the equi-join — never a nested loop") {
    val df = SparkEntry.queries("q174_tpch_q21")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // supplier is dim-sized: its join must ride a broadcast
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q175 TPC-H Q20: the nested semi chain broadcasts the part filter " +
      "and keeps the HAVING aggregate below the supplier semi join") {
    val df = SparkEntry.queries("q175_tpch_q20")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q177 TPC-H Q2: the correlated-min decorrelates to an aggregate + " +
      "equality join-back — hash joins only, no nested loop") {
    val df = SparkEntry.queries("q177_tpch_q2")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q179 TPC-H Q6: all three filters push into the parquet scan and " +
      "only the needed columns are read") {
    val p = plan("q179_tpch_q6")
    // the PushedFilters list renders elided — assert its prefix reaches the
    // date filter and that all three predicates made it into the scan's
    // data filters (the Filter node shows the full conjunction)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), " +
      "IsNotNull(l_quantity), GreaterThanOrEqual(l_shipda"), p)
    assert(p.contains("(l_discount#") && p.contains("(l_quantity#"), p)
    // 4-column ReadSchema on an 11-column table: projection reached the scan
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp"), p)
  }

  test("q186 TPC-H Q15: the revenue argmax is a 1-row broadcast equality " +
      "join, not a global re-sort") {
    val df = SparkEntry.queries("q186_tpch_q15")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q188 TPC-H Q19: the OR-of-conjuncts rides the partkey hash join " +
      "as a residual — never a nested loop over lineitem×part") {
    val df = SparkEntry.queries("q188_tpch_q19")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("the whole TPC-H suite plans hash joins only: no nested loop, " +
      "no cartesian product, in any of the 22 queries") {
    // Q1 is the flagship entry (q1_pricing_summary); the other 21 carry
    // the _tpch_ tag
    val tpch = "q1_pricing_summary" +:
      SparkEntry.queries.keys.filter(_.contains("_tpch_")).toSeq.sorted
    assert(tpch.size == 22, s"expected all 22 TPC-H shapes, found $tpch")
    val offenders = tpch.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val p = finalPlan(df)
      // Q11's and Q22's 1-row scalar broadcasts legitimately plan as a
      // broadcast nested loop (a global aggregate has no join key);
      // anything else must hash-join
      val bnljOk = name.endsWith("q22") || name.endsWith("q11")
      if ((p.contains("BroadcastNestedLoopJoin") && !bnljOk) ||
        p.contains("CartesianProduct")) Some(name)
      else None
    }
    assert(offenders.isEmpty, s"nested-loop/cartesian plans in: $offenders")
  }

  test("q189 TPC-H Q22: NOT EXISTS is an anti join and the balance " +
      "threshold is a 1-row broadcast, no shuffled scalar") {
    val df = SparkEntry.queries("q189_tpch_q22")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q198 KMV sketch: the bottom-k aggregate partial-aggregates — " +
      "one group exchange, the hashed value stream never shuffles raw") {
    val df = SparkEntry.queries("q198_kmv_sketch")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // ObjectHashAggregate (the TypedImperativeAggregate host) must appear
    // in partial + final form around a single group-key exchange; a plan
    // that shuffled the raw hashes to sort/rank them would show a window
    // or a sort before aggregation
    assert(p.contains("ObjectHashAggregate"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Window"), p)
  }

  test("q200 JL projection is a pure per-row kernel: zero exchanges " +
      "before the final ordering") {
    val df = SparkEntry.queries("q200_jl_projection")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p)
    assert(!p.contains("Window") && !p.contains("HashAggregate"), p)
  }

  test("q201 anti-entropy: fingerprints partial-aggregate (one bucket " +
      "exchange per side), the row streams never shuffle raw") {
    val df = SparkEntry.queries("q201_anti_entropy")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // two bucket-keyed aggregation exchanges (one per table) feed the
    // full-outer diff; anything more would mean a row-level shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("FullOuter"), p)
  }

  test("q206 co-occurrence: pairs generate in-row — one (w1,w2) count " +
      "exchange, no Window, no join") {
    val df = SparkEntry.queries("q206_cooccurrence")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // slice/transform pair generation never shuffles tokens; the only
    // hash exchange is the partial-aggregated pair count (the TakeOrdered
    // top-200 merges without a global sort exchange)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q207 phrase search answers from broadcast joins over the index") {
    val df = SparkEntry.queries("q207_phrase_search")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // the phrase-token and phrase-length tables ride BroadcastExchanges
    // into hash joins; the index aggregations are the only hash exchanges
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q208 PMI: vocabulary joins broadcast, pair stream shuffles once") {
    // the registered query checkpoints eagerly (cache release), which
    // hides the plan — inspect the lazy variant of the same operator
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
    val df = graft.lakehouse.ext.LangModel.pmiRank(docs, "doc_id", "text",
      window = 3, minCount = 5L, eager = false)
    df.collect()
    val p = finalPlan(df)
    // unigram counts join the pair counts via broadcast (vocab-sized);
    // the persisted co/uni frames make the pair-count and unigram-count
    // aggregations the ONLY hash exchanges (each materialized once)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan(df)).size <= 2, p)
  }

  test("q217/q219 normalization + script profiling are pure per-row " +
      "kernels: zero hash exchanges, no Window, no joins") {
    for (name <- Seq("q217_nfc_normalize", "q219_script_mix")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val p = finalPlan(df)
      assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, s"$name: $p")
      assert(!p.contains("Window") && !p.contains("Join"), s"$name: $p")
    }
  }

  test("q218 stratified split: ONE hash exchange (the per-stratum " +
      "window), no joins") {
    val df = SparkEntry.queries("q218_stratified_split")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("q220 CDC chunking: chunk identity is wholly in-row — zero hash " +
      "exchanges before the final sort, no Window, no joins") {
    val df = SparkEntry.queries("q220_cdc_chunks")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p)
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("q223 PII inventory: regexp kernels feed ONE aggregation — a " +
      "single hash exchange, no Generate, no joins") {
    val df = SparkEntry.queries("q223_pii_inventory")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Generate") && !p.contains("Join"), p)
  }

  test("q222 fuzzy join and q224 novelty plan hash/broadcast joins only " +
      "(no nested loop, no cartesian)") {
    for (name <- Seq("q222_fuzzy_token_pairs", "q224_ngram_novelty")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val p = finalPlan(df)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name: $p")
    }
    // the novelty membership test is an anti join on the gram hash
    val nov = SparkEntry.queries("q224_ngram_novelty")(spark, sf0001)
    nov.collect()
    assert(finalPlan(nov).contains("LeftAnti"), finalPlan(nov))
  }

  test("q225/q229 summarize through aggregations and partitioned " +
      "windows — never a partition-less window over raw rows") {
    for (name <- Seq("q225_lang_segments", "q229_event_time_audit")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val p = finalPlan(df)
      assert(!p.contains("SortMergeJoin") &&
        !p.contains("CartesianProduct"), s"$name: $p")
      // q229's one window is keyed; q225 has none at all
      if (name.startsWith("q225")) assert(!p.contains("Window"), s"$name: $p")
    }
  }

  test("q226/q230/q232 fit-and-transform shapes: stats broadcast back, " +
      "the data side never hash-shuffles more than the group rollup") {
    for (name <- Seq("q226_token_fertility", "q230_minmax_scale",
        "q232_target_encode")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val p = finalPlan(df)
      assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
        s"$name: $p")
      assert(!p.contains("SortMergeJoin"), s"$name: $p")
      assert(!p.contains("Generate"), s"$name: $p")
    }
  }

  test("q231 category dictionary: the ranking window sits ABOVE the " +
      "vocabulary aggregation (bounded input), one hash exchange") {
    val df = SparkEntry.queries("q231_string_index")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q233 incremental index update retires postings via anti join, " +
      "no cartesian anywhere") {
    val df = SparkEntry.queries("q233_index_update")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q44/q35 portable ANN: candidate joins broadcast the probe side " +
      "— never sort-merge, never cartesian") {
    for (name <- Seq("q44_ann_ivf_topk", "q35_ann_lsh_topk")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val p = finalPlan(df)
      assert(p.contains("BroadcastHashJoin"), s"$name: $p")
      assert(!p.contains("SortMergeJoin") &&
        !p.contains("CartesianProduct"), s"$name: $p")
    }
  }

  test("q243/q244 persisted-index queries score off the stored tables " +
      "with broadcast probes only (no corpus re-encode shuffle)") {
    for (name <- Seq("q243_ann_index_persisted",
        "q244_ann_ivf_index_persisted")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val p = finalPlan(df)
      assert(!p.contains("SortMergeJoin") &&
        !p.contains("CartesianProduct"), s"$name: $p")
    }
  }

  test("q246/q247 per-row text kernels: one (or zero) exchange, no " +
      "joins, no explode of the corpus") {
    // q247 is a pure per-row regexp chain: NO exchange at all
    val h = SparkEntry.queries("q247_html_extract")(spark, sf0001)
    h.collect()
    val hp = finalPlan(h)
    assert(!hp.contains("Exchange hashpartitioning"), hp)
    assert(!hp.contains("Generate") && !hp.contains("Join"), hp)
    // q246 folds the corpus into one fixed-width aggregate: a single
    // 1-row exchange, the explode runs over the 1-row aggregate only
    val l = SparkEntry.queries("q246_license_inventory")(spark, sf0001)
    l.collect()
    val lp = finalPlan(l)
    assert(!lp.contains("Join"), lp)
    assert(lp.contains("HashAggregate") || lp.contains("SortAggregate"), lp)
  }

  test("q248 mean pooling partial-aggregates the exploded dims (the " +
      "k-means-update shape): one hash exchange, map-side combine") {
    val df = SparkEntry.queries("q248_embedding_mean_pool")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("q255 hashed-BoW top-k broadcasts the query side and aggregates " +
      "the corpus embed exactly once") {
    val df = SparkEntry.queries("q255_hashed_bow_topk")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    // four hash exchanges exactly: the corpus embed agg, the (tiny)
    // query-docs embed agg, the (query, doc) dot agg, and the per-query
    // rank window — a fifth would mean the corpus aggregated twice
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 4, p)
  }

  test("q263 filter sweep never windows or sorts the corpus: thresholds " +
      "join a domain-bounded aggregate") {
    val df = SparkEntry.queries("q263_filter_sweep")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("Window"), p)
    // corpus touched once: the per-score aggregation
    assert(p.contains("HashAggregate"), p)
  }

  test("q258/q265/q275 metadata aggregates plan as local scans — zero " +
      "parquet reads of the profiled table") {
    Seq("q258_manifest_stats", "q265_manifest_partition_counts",
      "q275_manifest_sums").foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf0001)
      // building the result frame scans no files: the plan is a local
      // (driver-side) relation over the parsed manifest
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("LocalRelation"), s"$n: $p")
      assert(!p.contains("FileScan") && !p.contains("parquet"), s"$n: $p")
    }
  }

  test("q273 distinctive terms reuses the persisted (group, token) " +
      "aggregate instead of re-tokenizing per consumer") {
    val df = SparkEntry.queries("q273_distinctive_terms")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("InMemoryTableScan"), p)
    // exactly one corpus tokenize+aggregate materializes the cache; the
    // document scan appears in the cached subtree only
    assert(p.contains("TableCacheQueryStage") || p.contains("InMemoryRelation"), p)
  }

  test("q260 balanced shards: the serpentine map is a pure projection " +
      "over the ranked rows (no window, no extra exchange after the sort)") {
    val df = SparkEntry.queries("q260_balanced_shards")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("Window"), p)
  }

  // ---- round-9 operators -------------------------------------------------

  test("q283/q285/q298 drift statistics: every window runs over the " +
      "bounded category frame, never the corpus rows") {
    for (n <- Seq("q283_chi_squared_drift", "q285_mutual_information",
        "q298_drift_monitor_incremental")) {
      val df = SparkEntry.queries(n)(spark, sf0001)
      df.collect()
      val p = finalPlan(df)
      // the corpus-sized side ends at a HashAggregate; windows sit above it
      assert(p.contains("HashAggregate"), s"$n: $p")
      val winIdx = p.indexOf("Window")
      val aggIdx = p.lastIndexOf("HashAggregate")
      assert(winIdx < 0 || aggIdx > 0, s"$n: $p")
    }
  }

  test("q289 mmrRerank: the query side broadcasts; candidate generation " +
      "is the only corpus-sized stage") {
    val df = SparkEntry.queries("q289_mmr_rerank")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q288 adamic-adar: wedges come from in-row pair generation " +
      "(Generate over adjacency arrays), not an edge-list self-join") {
    import org.apache.spark.sql.functions._
    // the registered query localCheckpoints its top-N (the plan the
    // caller sees is a scan of 50 rows) — assert on the internal frame
    val und = QFixtures.t(spark, sf0001, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
      .select(least(col("l_partkey") * 2, col("l_suppkey") * 2 + 1).as("a"),
        greatest(col("l_partkey") * 2, col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val df = graft.lakehouse.ext.Graph.adamicAdarPairs(und, maxDeg = 1024)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
    // in-row generation: sym fan-out + wedge kernel + known-edge index
    // (and a plan-level repeat where the adjacency subtree is not
    // reused) — but never an edge-list self-join
    assert("Generate explode".r.findAllIn(p).size <= 4, p)
  }

  test("q295/q293 portable-hash assignment is a pure projection: " +
      "zero exchanges below the report aggregation's shuffle") {
    val df = SparkEntry.queries("q295_feature_hash_cross")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q297 compaction plan windows over the file manifest " +
      "(LocalRelation), never a data scan of the staged table") {
    val df = SparkEntry.queries("q297_compaction_plan")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("LocalTableScan") || p.contains("LocalRelation"), p)
    assert(!p.contains("FileScan"), p)
  }

  test("q296 markdown strip is a single-pass projection chain " +
      "(no shuffle before the final sort)") {
    val df = SparkEntry.queries("q296_markdown_strip")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!"Exchange hashpartitioning".r.findAllIn(p).hasNext, p)
    assert(!p.contains("Window"), p)
  }

  test("q300 next-event examples: one per-user window shuffle, " +
      "aggregation above it") {
    val df = SparkEntry.queries("q300_next_event_examples")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }

  test("q329 permutation test: explode stays in-row (no shuffle before " +
      "the per-(group,perm) rank window)") {
    val df = SparkEntry.queries("q329_permutation_test")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    // one rank window over (group, perm); the m-fold explode itself
    // must be a projection, not an exchange producer of its own
    assert(p.contains("Window"), p)
    assert("Generate explode".r.findAllIn(p).size <= 1, p)
  }

  test("q331 degree assortativity: moments fold in hash aggregates, " +
      "no window over the edge list, O(V) degree frame broadcast " +
      "(never an edge-list shuffle join)") {
    val df = SparkEntry.queries("q331_degree_assortativity")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q341 token burstiness: two hash aggregations + top-k, " +
      "no global sort of the token stream") {
    val df = SparkEntry.queries("q341_token_burstiness")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
  }

  test("q339 conditional entropy: bigrams generate in-row (no Window " +
      "over the token stream), moments fold in hash aggregates") {
    val df = SparkEntry.queries("q339_conditional_entropy")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q345 OHLC bars: single (grp,day) shuffle feeds both windows " +
      "and the aggregation") {
    val df = SparkEntry.queries("q345_ohlc_bars")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q350 correlation matrix: ONE pass — a single pair of " +
      "partial/final aggregates, no join between moment stages") {
    val df = SparkEntry.queries("q350_correlation_matrix")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }

  test("q351 histogram2d: bucket projection into one hash aggregate, " +
      "filters pushed to the scan") {
    val df = SparkEntry.queries("q351_histogram2d")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_extendedprice)]"), p)
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("q411 FIM examples are a pure per-row kernel: no data shuffle, " +
      "no join, no window — only the output sort exchanges") {
    val df = SparkEntry.queries("q411_fim_examples")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q412 domain-cap sampling shuffles ONCE on the domain key; the " +
      "per-row URL parse is a projection, never a join") {
    val df = SparkEntry.queries("q412_domain_cap_sample")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q413 parquet-footer walk is a partition-batched kernel: no " +
      "data shuffle, no join; the fixture filter pushes to the scan") {
    val df = SparkEntry.queries("q413_parquet_footer_meta")(spark, sf0001)
    df.collect()
    val p = finalPlan(df)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("q417 Bradley-Terry: the game log collapses in ONE hash " +
      "aggregation before any MM work (the pair matrix is the only " +
      "thing the rounds ever touch)") {
    import org.apache.spark.sql.functions._
    // the registered query's MM rounds run over localCheckpointed
    // bounded frames — assert on the log-collapse stage itself
    val d = QFixtures.t(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val g = d.alias("x").join(d.alias("y"),
        col("y.doc_id") === col("x.doc_id") + 1)
      .filter(col("x.source") =!= col("y.source"))
      .select(col("x.source").as("winner"), col("y.source").as("loser"))
    val pairs = g.groupBy(least(col("winner"), col("loser")),
      greatest(col("winner"), col("loser"))).agg(count(lit(1)))
    val p = finalPlan(pairs)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }
}
