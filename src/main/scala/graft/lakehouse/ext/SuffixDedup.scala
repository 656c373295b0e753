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
      var r = base
        .select(col("doc"), length(col("t")).as("len"),
          posexplode(split(col("t"), "")).as(Seq("pos", "ch")))
        .select((col("doc") * (1L << PosBits) + col("pos")).as("pid"),
          col("doc"), col("pos"), col("len"),
          ascii(col("ch")).cast("long").as("rank"))
      val p = Integer.highestOneBit(spanLen)
      var k = 1
      while (k < p) {
        // a partner row offers "rank of position pid" to position pid−k,
        // so the join hands every position the rank at pos+k
        val partner = r.select((col("pid") - k).as("pid2"),
          col("rank").as("rank2"))
        val paired = r.join(partner, col("pid") === col("pid2"), "left")
          .select(col("pid"), col("doc"), col("pos"), col("len"),
            col("rank"), coalesce(col("rank2"), lit(-1L)).as("rank2"))
        // group label = the group's min pid: disjoint groups have
        // disjoint pid sets, so labels stay unique without a global sort
        val labels = paired.groupBy("rank", "rank2")
          .agg(min("pid").as("nr"))
        r = paired.join(labels, Seq("rank", "rank2"))
          .select(col("pid"), col("doc"), col("pos"), col("len"),
            col("nr").as("rank"))
          .localCheckpoint()
        k *= 2
      }
      val eligible = r.filter(col("pos") + spanLen <= col("len"))
      val keyed =
        if (p == spanLen) eligible
          .select(col("doc"), col("pid"), col("rank").as("rank_a"),
            col("rank").as("rank_b"))
        else eligible.join(
            r.select((col("pid") - (spanLen - p)).as("pid0"),
              col("rank").as("rank_b")),
            col("pid") === col("pid0"))
          .select(col("doc"), col("pid"), col("rank").as("rank_a"),
            col("rank_b"))
      val groups = keyed.groupBy("rank_a", "rank_b")
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
}
