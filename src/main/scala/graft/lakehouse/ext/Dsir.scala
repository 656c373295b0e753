package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling — DSIR (Xie et al. 2023,
  * arXiv:2302.03169), integer-quantized. Given a large raw corpus and a
  * small in-domain TARGET sample, score every corpus document by how
  * target-like its hashed-n-gram distribution is, and keep the top k.
  * This is the standard way to cut a general crawl down to "looks like
  * my domain" pretraining data without training a classifier first.
  *
  * Quantization: the paper's importance weight is a sum of log-ratio
  * terms log p_t(g)/p_s(g) over the document's n-grams. Logarithms are
  * libm territory — their last-bit rounding differs across engines, so a
  * cross-engine verification oracle could never hash-match. We replace
  * the per-gram log-ratio with an integer ratio weight
  *
  *   w(g) = floor(scale * (ct(g) + 1) / (cs(g) + 1))
  *
  * (add-one smoothed target count over corpus count — a monotone proxy
  * for the same ratio) and score a document by its length-normalized
  * weighted gram sum, floor((sum cnt*w) * scale / sum cnt). Every step
  * is 64-bit integer multiply/divide: deterministic on any engine, and
  * the DuckDB oracle replays it term for term. Length normalization
  * keeps long documents from outranking in-domain short ones (the raw
  * DSIR sum grows with length).
  *
  * Features are word unigrams + bigrams over lowercase whitespace-
  * normalized text (the same normalization as the n-gram dedup family in
  * [[Dedup.ngramJaccardPairs]]); documents with fewer than two words
  * contribute unigrams only.
  *
  * Scale: three gram-keyed hash aggregations (corpus doc-grams, corpus
  * totals, target totals) — all partial-aggregate before their single
  * shuffle. The weight join is gram-keyed against the corpus totals
  * (co-partitioned with the doc-gram aggregation); the target side is a
  * broadcast by construction (the target sample is small — that is the
  * premise of DSIR). Top-k is Spark's TakeOrderedAndProject: one pass,
  * no global sort materialization. Nothing is ever collected per-doc. */
object Dsir {

  /** (id, gram) — one row per unigram/bigram OCCURRENCE, map-side only
    * (no shuffle: adjacency is computed inside the row and exploded). */
  private[lakehouse] def gramOccurrences(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = split(regexp_replace(lower(trim(col(textCol))),
      "\\s+", " "), " ")
    // sequence(1, n) descends when n < 1 — guard short docs to an empty
    // bigram list instead of a [1,0] phantom
    val bigrams = when(size(col("__w")) >= 2,
      expr("transform(sequence(1, size(__w) - 1), " +
        "i -> concat(__w[i-1], ' ', __w[i]))"))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), words.as("__w"))
      .select(col(idCol),
        explode(concat(col("__w"), bigrams)).as("gram"))
  }

  /** (id, gram, cnt) — unigram+bigram bag with multiplicities. */
  private[lakehouse] def gramCounts(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    gramOccurrences(df, idCol, textCol)
      .groupBy(idCol, "gram").agg(count(lit(1)).as("cnt"))

  /** Weights from pre-computed doc-gram counts — shared with the scoring
    * pass so the corpus tokenize/explode/aggregate subtree is ONE plan
    * node: Spark's exchange reuse materializes its shuffle once and both
    * consumers (corpus totals, the scoring join) read the same output. */
  private def weightsFromCounts(corpusGrams: DataFrame, target: DataFrame,
      idCol: String, textCol: String, scale: Long): DataFrame = {
    val cs = corpusGrams.groupBy("gram").agg(sum("cnt").as("cs"))
    val ct = gramCounts(target, idCol, textCol)
      .groupBy("gram").agg(sum("cnt").as("ct"))
    cs.join(broadcast(ct), Seq("gram"), "left")
      // `div`, not `/`: Spark's fractional division would round through
      // a double and floor() can land one off a true integer quotient —
      // the oracle's integer division would then hash-mismatch
      .select(col("gram"),
        expr(s"($scale * (coalesce(ct, 0L) + 1L)) div (cs + 1L)").as("w"))
  }

  /** Integer importance weight per corpus gram:
    * `floor(scale * (target_cnt + 1) / (corpus_cnt + 1))`. Grams absent
    * from the target get the add-one floor — never zero, so off-domain
    * text scores low rather than being erased. */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, scale: Long = 1000L): DataFrame =
    weightsFromCounts(gramCounts(corpus, idCol, textCol), target,
      idCol, textCol, scale)

  /** The k most target-like corpus documents as (id, score), score
    * descending then id ascending — fully deterministic.
    *
    * Scale shape: the corpus occurrence stream is never pre-aggregated
    * per document — `Σ_grams cnt·w ≡ Σ_occurrences w`, so the
    * (id, gram)-keyed compression shuffle the naive plan pays first
    * buys nothing the gram-keyed join doesn't already get from partial
    * aggregation. And the shuffles carry 8-byte xxhash64 gram keys, not
    * the gram strings (bigrams average ~15 bytes): the text leaves the
    * scan only as hashes. A 64-bit collision would merge two grams'
    * weights (~1e-7 at 10M distinct grams — the [[Dedup]] family's
    * accepted trade; the oracle replays string grams and has matched). */
  def selectTopK(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, scale: Long = 1000L): DataFrame = {
    val occ = gramOccurrences(corpus, idCol, textCol)
      .select(col(idCol), xxhash64(col("gram")).as("g"))
    val cs = occ.groupBy("g").agg(count(lit(1)).as("cs"))
    val ct = gramOccurrences(target, idCol, textCol)
      .groupBy(xxhash64(col("gram")).as("g")).agg(count(lit(1)).as("ct"))
    val weights = cs.join(broadcast(ct), Seq("g"), "left")
      .select(col("g"),
        expr(s"($scale * (coalesce(ct, 0L) + 1L)) div (cs + 1L)").as("w"))
    occ
      .join(weights, Seq("g"))
      .groupBy(idCol)
      .agg(expr(s"(sum(w) * $scale) div count(1)").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
