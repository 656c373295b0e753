package graft.lakehouse.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT duplicate-substring census via distributed suffix-rank
  * doubling — the primitive behind Lee et al. '22 ("Deduplicating
  * Training Data Makes Language Models Better") exact substring dedup,
  * re-expressed as log(L) join+aggregate rounds instead of a monolithic
  * suffix-array build (Manber & Myers '93 prefix doubling is the
  * distributed-friendly construction; DC3 saves a log factor a shuffle
  * plan cannot exploit).
  *
  * Why not the obvious plan: grouping positions by their materialized
  * L-char substring shuffles corpus × L bytes (every position carries
  * its window). Rank doubling shuffles O(corpus) longs per round for
  * log₂(L) rounds — at L in the hundreds (Lee et al. use 50 BPE tokens
  * ≈ 200+ chars) that is the difference between infeasible and one
  * weekend job at 100 TB.
  */
object SuffixDedup {

  private val PosBits = 21 // pid = doc · 2²¹ + pos; maxDocLen < 2²⁰

  /** The rank-doubling core shared by census and removal: every
    * eligible position (pos + spanLen ≤ len) keyed so that two
    * positions carry the same (rank_a, rank_b) IFF their spanLen-char
    * substrings are identical. Columns: doc, pos, pid, rank_a, rank_b.
    * `base` must already be the (doc, t)-normalized frame. */
  private def spanKeys(base: DataFrame, spanLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Integer.highestOneBit(spanLen)
    // SEED ranks from direct substring grouping at s0 = min(16, p)
    // chars: one corpus×s0-byte shuffle replaces log2(s0) doubling
    // rounds. Seeds shorter than s0 (suffix tails) have a different
    // string LENGTH than any full seed, so they can never join a
    // full-window group — the same isolation the −1 sentinels give
    // later rounds.
    //
    // Everything is WINDOWS, not joins: rank-at-pos+k is lead(rank, k)
    // over the per-DOC frame (positions are dense, so lead(k) IS the
    // k-shifted rank; per-doc partitions are bounded by maxDocLen —
    // PlanLint-clean), and the group label min(pid) is a partition-wide
    // window over the pair key. Two shuffles per round; the
    // join-back formulation measured 3 shuffles + join machinery
    // (~1.8 s/round at sf0.1 vs DuckDB's 0.4 s whole query).
    val s0 = math.min(16, p)
    val wDoc = Window.partitionBy("doc").orderBy("pos")
    // positions come from an int sequence, not posexplode(split(t, ""))
    // — the split built a length(t)-element array of one-char STRINGS per
    // document purely to number the positions; the generated ints carry
    // the same 0-based positions with none of the allocation
    // precondition: every doc here is non-empty (callers filter
    // length(t) >= spanLen >= 2) — guard it anyway, because sequence()
    // steps DOWN for start > stop and an empty doc would emit pos = -1,
    // bleeding its pid into the previous doc's id space
    val seeded = base
      .filter(length(col("t")) > 0)
      .select(col("doc"), length(col("t")).as("len"),
        explode(sequence(lit(0), length(col("t")) - 1)).as("pos"),
        col("t"))
      .select((col("doc") * (1L << PosBits) + col("pos")).as("pid"),
        col("doc"), col("pos"), col("len"),
        expr(s"substr(t, pos + 1, $s0)").as("seed"))
    var r = seeded
      .withColumn("rank", min("pid").over(Window.partitionBy("seed")))
      .drop("seed")
    var k = s0
    while (k < p) {
      r = r
        .withColumn("rank2",
          coalesce(lead("rank", k).over(wDoc), lit(-1L)))
        .withColumn("rank",
          min("pid").over(Window.partitionBy("rank", "rank2")))
        .drop("rank2")
      k *= 2
    }
    val withB =
      if (p == spanLen) r.withColumn("rank_b", col("rank"))
      else r.withColumn("rank_b",
        coalesce(lead("rank", spanLen - p).over(wDoc), lit(-1L)))
    withB
      .filter(col("pos") + spanLen <= col("len"))
      .select(col("doc"), col("pos"), col("pid"),
        col("rank").as("rank_a"), col("rank_b"))
  }

  /** All groups of ≥ 2 positions whose `spanLen`-char substrings are
    * IDENTICAL, across the whole corpus. Per group: occurrence count,
    * distinct-document count, the representative (minimum (doc, pos))
    * occurrence, and the sha-256 prefix of the span text — resolved by
    * substring-ing ONLY the representative (O(groups), never
    * O(positions), strings on the output path).
    *
    * Mechanics: positions get integer ranks that identify their k-char
    * prefix, k doubling per round — rank₂ₖ(i) relabels the pair
    * (rankₖ(i), rankₖ(i+k)) with the group's minimum pid (deterministic
    * dense-enough labels without a global sort); a suffix shorter than
    * k carries a −1 sentinel partner, and a FULL window's rank chain
    * never meets a sentinel, so truncated suffixes can't contaminate
    * full-window groups. Exact length-L equality then needs only the
    * classic sparse-table composite key (rank_p(i), rank_p(i+L−p)) with
    * p = 2^⌊log₂L⌋. Each round is one self-join on pid+k plus one
    * pair-relabel aggregation, lineage kept flat per round.
    *
    * Documents are capped at `maxDocLen` chars (loud pid-packing
    * contract: doc ids must fit 42 bits) — a cap hit truncates the
    * census to each document's head, stated not hidden. */
  def duplicateSpanCensus(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int, maxDocLen: Int = 1 << 19): DataFrame = {
    require(spanLen >= 2 && spanLen <= maxDocLen && maxDocLen <= (1 << 20),
      "duplicateSpanCensus needs 2 <= spanLen <= maxDocLen <= 2^20")
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc"),
        substring(col(textCol), 1, maxDocLen).as("t"))
      .filter(length(col("t")) >= spanLen)
      .persist()
    try {
      require(base.filter(col("doc") < 0L ||
          col("doc") >= (1L << (63 - PosBits))).limit(1).count() == 0L,
        s"duplicateSpanCensus packs (doc, pos) into int64: doc ids must " +
          s"be in [0, 2^${63 - PosBits}) — re-key first")
      val groups = spanKeys(base, spanLen).groupBy("rank_a", "rank_b")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct("doc").as("n_docs"),
          min("pid").as("rep_pid"))
        .filter(col("n_occurrences") >= 2L)
        .select(col("n_occurrences"), col("n_docs"),
          expr(s"rep_pid div ${1L << PosBits}").as("rep_doc"),
          (col("rep_pid") % (1L << PosBits)).as("rep_pos"))
      // span text resolves from the REPRESENTATIVE document only
      groups.join(base.withColumnRenamed("doc", "rep_doc"), Seq("rep_doc"))
        .select(
          substring(sha2(expr(s"substr(t, rep_pos + 1, $spanLen)"), 256),
            1, 16).as("span_sha"),
          col("n_occurrences"), col("n_docs"), col("rep_doc"),
          col("rep_pos"))
        .localCheckpoint()
    } finally base.unpersist(false)
  }

  /** Lee et al. '22 ExactSubstr REMOVAL on top of the census machinery:
    * every char covered by any corpus-duplicated `spanLen`-window is
    * cut from its document. Duplicated positions come from the same
    * rank-doubling keys as [[duplicateSpanCensus]] (a left-semi join
    * against the ≥ 2-occurrence groups); per document the covered
    * windows merge into maximal intervals with the classic
    * running-max-end window (partitioned BY DOC — bounded rows, never
    * corpus-wide), and one per-doc kernel splices the survivors.
    * Documents with no duplicated window pass through untouched with
    * zero counts — INCLUDING documents shorter than `spanLen`, which
    * trivially have no duplicated window (they skip the rank-doubling
    * rounds entirely but are splice-joined back into the output, so
    * corpus cleaning never silently drops the short tail). Output per
    * doc: n_spans (merged intervals), n_chars_removed, cleaned_len,
    * cleaned_sha (sha-256 prefix of the cleaned text — '' hashes when
    * a doc is fully covered). `keepText = true` additionally carries
    * the spliced `cleaned_text` column for downstream pipeline stages
    * (quality gates, near-dup, splits) — off by default so the census
    * shape never ships corpus text it doesn't need. */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int, maxDocLen: Int = 1 << 19,
      keepText: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(spanLen >= 2 && spanLen <= maxDocLen && maxDocLen <= (1 << 20),
      "removeDuplicateSpans needs 2 <= spanLen <= maxDocLen <= 2^20")
    // `all` is the output spine (every non-null doc, truncated);
    // `base` is the >= spanLen subset that can carry duplicated windows
    val all = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc"),
        substring(col(textCol), 1, maxDocLen).as("t"))
      .persist()
    val base = all.filter(length(col("t")) >= spanLen)
    try {
      require(base.filter(col("doc") < 0L ||
          col("doc") >= (1L << (63 - PosBits))).limit(1).count() == 0L,
        s"removeDuplicateSpans packs (doc, pos) into int64: doc ids " +
          s"must be in [0, 2^${63 - PosBits}) — re-key first")
      val keyed = spanKeys(base, spanLen).persist()
      try {
        val dup = keyed.join(
          keyed.groupBy("rank_a", "rank_b")
            .agg(count(lit(1)).as("__n")).filter(col("__n") >= 2L)
            .select("rank_a", "rank_b"),
          Seq("rank_a", "rank_b"), "left_semi")
          .select(col("doc"), col("pos"))
        val wDoc = Window.partitionBy("doc").orderBy("pos")
        val islands = dup
          .withColumn("__pmax", max(col("pos") + spanLen)
            .over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("__brk",
            when(col("pos") > coalesce(col("__pmax"), lit(-1L)), 1L)
              .otherwise(0L))
          .withColumn("__isl", sum("__brk")
            .over(wDoc.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy("doc", "__isl")
          .agg(min(col("pos").cast("long")).as("s"),
            (max(col("pos").cast("long")) + spanLen).as("e"))
        val cov = islands.groupBy("doc")
          .agg(count(lit(1)).as("n_spans"),
            sum(col("e") - col("s")).as("n_chars_removed"),
            sort_array(collect_list(struct(col("s"), col("e"))))
              .as("__ivs"))
        val spliceUdf = udf((t: String,
            ivs: Seq[org.apache.spark.sql.Row]) => {
          val sb = new java.lang.StringBuilder(t.length)
          var cur = 0
          if (ivs != null) ivs.foreach { iv =>
            val s = iv.getLong(0).toInt
            val e = iv.getLong(1).toInt
            if (s > cur) sb.append(t, cur, s)
            cur = math.max(cur, e)
          }
          if (cur < t.length) sb.append(t, cur, t.length)
          sb.toString
        })
        val full = all.join(cov, Seq("doc"), "left")
          .select(col("doc").as(idCol),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("n_chars_removed"), lit(0L))
              .as("n_chars_removed"),
            spliceUdf(col("t"), col("__ivs")).as("__cleaned"))
          .select(col(idCol), col("n_spans"), col("n_chars_removed"),
            length(col("__cleaned")).cast("long").as("cleaned_len"),
            substring(sha2(col("__cleaned"), 256), 1, 16)
              .as("cleaned_sha"),
            col("__cleaned").as("cleaned_text"))
        (if (keepText) full else full.drop("cleaned_text"))
          .localCheckpoint()
      } finally keyed.unpersist(false)
    } finally all.unpersist(false)
  }
}
