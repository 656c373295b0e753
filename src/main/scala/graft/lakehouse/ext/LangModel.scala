package graft.lakehouse.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed n-gram language-model training and scoring — the classic
  * corpus-quality signal in training-data pipelines (score held-out text
  * against a model of the reference corpus; low likelihood = junk or
  * off-domain). Counts are exact and distributed; only the model HEAD (the
  * smoothing constants) touches the driver.
  */
object LangModel {

  /** (doc_id, token) over lowercased whitespace tokenization — a map-side
    * explode of the filtered split array, no shuffle. */
  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(
        filter(split(lower(col(textCol)), "\\s+"), w => w =!= "")).as("w"))

  /** (doc_id, w1, w2) — one row per adjacent token pair per document.
    * Adjacency is computed INSIDE the row: the filtered token array is
    * zipped with its own tail (`zip_with` over two `slice`s), then the
    * pair array explodes map-side. Zero shuffle — the windowed
    * row_number+lead formulation this replaces paid a full shuffle+sort
    * of the token stream before a single bigram existed, which at 100 TB
    * is the difference between a scan and an extra corpus-wide exchange. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol),
        filter(split(lower(col(textCol)), "\\s+"), w => w =!= "").as("toks"))
      .select(col(idCol), explode(zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Exact global bigram counts (the trained model): (w1, w2, c12) plus
    * per-predecessor totals joinable on w1. Map-side partial aggregation
    * means the shuffle carries one row per distinct bigram per task — the
    * standard count-based LM training plan (Brants et al., "Large Language
    * Models in Machine Translation", EMNLP 2007 builds exactly this with
    * MapReduce). */
  def trainBigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigrams(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))

  /** Score `scoreDocs` against a trained bigram set: per document, the
    * total bigram count, how many are UNSEEN in training, and the unseen
    * rate. Integer counts (exactly verifiable cross-engine); the rate is a
    * single IEEE division of the two counts. The model side joins as a
    * distinct (w1,w2) key set — at 100 TB both sides shuffle on the bigram
    * key (AQE broadcasts it when the model is small). */
  def bigramSurprise(trainDocs: DataFrame, scoreDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val model = trainBigramCounts(trainDocs, idCol, textCol)
      .select(col("w1"), col("w2"), lit(1).as("__seen"))
    bigrams(scoreDocs, idCol, textCol)
      .join(model, Seq("w1", "w2"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_unseen"))
      .withColumn("unseen_rate",
        col("n_unseen").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Per-document cross-entropy (bits per bigram) under an add-one-smoothed
    * bigram model: H(d) = -(1/n) Σ log2 (c12+1)/(c1+V). Spec-verified
    * against a hand-computed reference (floating log sums are not
    * bit-portable across engines, so this op is deliberately NOT in the
    * DuckDB oracle set — [[bigramSurprise]] is its integer-exact twin,
    * [[crossEntropyPortable]] the decimal-exact-sum one that IS oracled).
    * Plan: bigram join against (w1,w2,c12) and (w1,c1) count frames, V
    * broadcast as a literal via one driver count. */
  def crossEntropy(trainDocs: DataFrame, scoreDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val big = trainBigramCounts(trainDocs, idCol, textCol)
    val uni = big.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = tokens(trainDocs, idCol, textCol)
      .select(col("w")).distinct().count()
    bigrams(scoreDocs, idCol, textCol)
      .join(big, Seq("w1", "w2"), "left_outer")
      .join(uni, Seq("w1"), "left_outer")
      .select(col(idCol),
        (-log(2.0, (coalesce(col("c12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + vocab).cast("double"))).as("bits"))
      .groupBy(col(idCol))
      .agg(avg(col("bits")).as("bits_per_bigram"), count(lit(1)).as("n_bigrams"))
  }

  /** [[crossEntropy]] made ORACLE-PORTABLE — the CCNet quality filter
    * (Wenzek '19: score text against an LM of a clean reference corpus;
    * high bits-per-token = junk or off-domain) with a hash-checkable
    * result. Same add-one-smoothed bigram model and the SAME per-bigram
    * IEEE expression `-log2((c12+1)/(c1+V))` (one exact int→double cast
    * each side, one correctly-rounded division, one log2 — replicated
    * op-for-op by any engine, the q61 BM25 precedent); what
    * [[crossEntropy]] leaves non-portable is only the SUM, whose
    * floating addition order varies by partitioning — so here each
    * bigram's bits cast to DECIMAL(38,18) (a double's value carries ≤ 17
    * significant digits, so the cast is rounding-mode-safe) and
    * accumulate EXACTLY, order-free. Surfaced as
    * `(n_bigrams, bits_per_bigram = cast(sum AS DOUBLE)/n)` — the
    * README's exact-DECIMAL-accumulation recipe. Docs with fewer than 2
    * tokens have no bigrams and emit no row.
    *
    * 100 TB shape, unchanged from [[crossEntropy]]: model counts are two
    * corpus-bounded aggregations, scoring joins on the bigram/context
    * keys (AQE broadcasts small models), one per-doc aggregation out. */
  def crossEntropyPortable(trainDocs: DataFrame, scoreDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // the model counts feed two stages (context totals + the score
    // join); persisting the vocab-bounded aggregate stops AQE from
    // re-tokenizing the training corpus per consumer — at scale, train
    // the model ONCE into tables instead ([[lmTableUpdate]])
    val big = trainBigramCounts(trainDocs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = big.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = tokens(trainDocs, idCol, textCol)
      .select(col("w")).distinct().count()
    bigrams(scoreDocs, idCol, textCol)
      .join(big, Seq("w1", "w2"), "left_outer")
      .join(uni, Seq("w1"), "left_outer")
      .select(col(idCol),
        (-log(2.0, (coalesce(col("c12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + vocab).cast("double")))
          .cast("decimal(38,18)").as("__bits"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__bits")).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        (col("__s").cast("double") / col("n_bigrams").cast("double"))
          .as("bits_per_bigram"))
  }

  /** CCNet's perplexity bucketing (Wenzek '19 §4.3): rank every document
    * by [[crossEntropyPortable]] bits-per-bigram against the reference
    * LM and cut the corpus into `buckets` equal-count tiers — bucket 0
    * (head) reads most like the reference, the last (tail) least; CCNet
    * keeps head+middle for pretraining. Deterministic: the order is
    * (bits asc, id asc) — a total order because the portable bits are
    * engine-stable — and the cuts are integer `(buckets·rank) div n`,
    * the stratifiedSplit arithmetic.
    *
    * 100 TB shape: scoring is [[crossEntropyPortable]]'s plan; the rank
    * is one distributed range-partitioned sort + the zipWithIndex
    * contiguous index (never a partition-less row_number); the bucket
    * map is a pure per-row expression over one broadcast scalar. */
  def perplexityBuckets(trainDocs: DataFrame, scoreDocs: DataFrame,
      idCol: String, textCol: String, buckets: Int = 3): DataFrame = {
    require(buckets >= 2, "perplexityBuckets: need at least 2 buckets")
    val scored = crossEntropyPortable(trainDocs, scoreDocs, idCol, textCol)
    val sorted = scored.orderBy(col("bits_per_bigram").asc,
      col(idCol).asc)
    val ranked = graft.lakehouse.Transform.addIndexColContiguous(
      sorted, "__pb_rank", indexStart = -1)
    val n = ranked.agg(count(lit(1)).as("__pb_n"))
    ranked.crossJoin(n)
      .select(col(idCol), col("n_bigrams"), col("bits_per_bigram"),
        expr(s"cast(($buckets * __pb_rank) div __pb_n as int)")
          .as("bucket"))
  }

  /** PERSISTED incremental bigram LM — the index-once-query-many
    * contract applied to the CCNet reference model: bigram counts and
    * token counts are ADDITIVE, so the model folds into two versioned
    * tables one batch at a time (`<prefix>_bigrams` (w1, w2, c12) and
    * `<prefix>_tokens` (w, c)), each fold one O(batch) aggregation plus
    * an O(model) full-outer merge — the reference corpus is never
    * re-tokenized, and any fold order equals the one-shot model
    * bit-for-bit. Returns (bigram rows, token rows). */
  def lmTableUpdate(spark: SparkSession,
      lh: graft.lakehouse.LakehouseProps, prefix: String,
      batch: DataFrame, idCol: String, textCol: String): (Long, Long) = {
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    def fold(tableName: String, fresh: DataFrame, keys: Seq[String],
        cnt: String): Long = {
      val dir = Catalog.tablePath(lh, tableName)
      val merged = Versioned.latestVersion(dir) match {
        case None => fresh
        case Some(_) =>
          TableIO.selectTable(spark, lh, tableName)
            .withColumnRenamed(cnt, "__old")
            .join(fresh.withColumnRenamed(cnt, "__new"), keys,
              "full_outer")
            .select(keys.map(col) :+
              (coalesce(col("__old"), lit(0L)) +
                coalesce(col("__new"), lit(0L))).as(cnt): _*)
      }
      TableIO.writeTable(spark, lh, tableName, merged).rowCount
    }
    val big = fold(s"${prefix}_bigrams",
      trainBigramCounts(batch, idCol, textCol), Seq("w1", "w2"), "c12")
    val tok = fold(s"${prefix}_tokens",
      tokens(batch, idCol, textCol).groupBy(col("w"))
        .agg(count(lit(1)).as("c")), Seq("w"), "c")
    (big, tok)
  }

  /** Score documents against a PERSISTED LM ([[lmTableUpdate]]) — the
    * same add-one-smoothed bits-per-bigram as [[crossEntropyPortable]],
    * with c12/c1/V read from the frozen model tables instead of
    * retraining per query: c1 derives from the bigram table (one
    * O(model) aggregation), V is the token table's row count (a
    * manifest-answered count, zero scan). Scoring a new batch costs
    * O(batch + model), never O(reference corpus). */
  def scoreAgainstLmTable(spark: SparkSession,
      lh: graft.lakehouse.LakehouseProps, prefix: String,
      scoreDocs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.lakehouse.TableIO
    val big = TableIO.selectTable(spark, lh, s"${prefix}_bigrams")
    val uni = big.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = TableIO.selectTable(spark, lh, s"${prefix}_tokens").count()
    bigrams(scoreDocs, idCol, textCol)
      .join(big, Seq("w1", "w2"), "left_outer")
      .join(uni, Seq("w1"), "left_outer")
      .select(col(idCol),
        (-log(2.0, (coalesce(col("c12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + vocab).cast("double")))
          .cast("decimal(38,18)").as("__bits"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__bits")).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        (col("__s").cast("double") / col("n_bigrams").cast("double"))
          .as("bits_per_bigram"))
  }

  /** Exact windowed co-occurrence counts (the PMI/word2vec-style
    * numerator): every unordered token pair at distance 1..`window`
    * inside a document counts once per occurrence pair, canonicalized
    * (w1 <= w2) so "a b" and "b a" accumulate together. Pair generation
    * happens INSIDE the row — each position zips against its next
    * `window` neighbors via slice, the same zero-shuffle shape as
    * [[bigrams]] (window = 1 degenerates to unordered bigram counts) —
    * so the only exchange is the final (w1, w2) count aggregation,
    * partial-aggregated, O(distinct pairs) wide. `minCount` prunes the
    * hapax tail before anything returns. */
  def cooccurrenceCounts(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minCount: Long = 1L): DataFrame = {
    require(window >= 1, "window must be at least 1")
    val pairs = docs
      .select(filter(split(lower(col(textCol)), "\\s+"), w => w =!= "")
        .as("toks"))
      .select(explode(expr(
        s"""flatten(transform(toks, (x, i) ->
           |  transform(slice(toks, i + 2, $window),
           |    y -> struct(least(x, y) AS w1, greatest(x, y) AS w2))))"""
          .stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Integer-exact PMI-style association ranking over
    * [[cooccurrenceCounts]]: the classic pmi = log(P(a,b)/(P(a)P(b)))
    * ranks pairs identically to the LOG-FREE integer score
    * `score = scale · n_pair · N_tokens² div (n_a · n_b · N_pairs)`
    * (log is monotone; only the ratio matters for ordering), and unlike
    * the float form the integer score is bit-identical on every engine.
    * Unigram counts ride a second aggregation over the same map-side
    * token kernel; the join against pair counts is vocabulary-sized and
    * AQE-broadcast. DECIMAL(38,0) integral division — n·N² overflows
    * int64 on any real corpus. */
  def pmiRank(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minCount: Long, scale: Long = 1000000L,
      eager: Boolean = true): DataFrame = {
    // co feeds the result AND the pair total; uni feeds two broadcast
    // join sides AND the token total — persist both (vocab-bounded), or
    // each consumer re-tokenizes the corpus (AQE plans consumers as
    // separate query stages, so exchange reuse does NOT cover this)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val co = cooccurrenceCounts(docs, idCol, textCol, window, minCount)
      .persist(lvl)
    val uni = docs
      .select(explode(filter(split(lower(col(textCol)), "\\s+"),
        w => w =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(lvl)
    val totals = broadcast(uni.agg(sum("c").as("n_tokens")))
    val pairTotal = broadcast(co.agg(sum("n").as("n_pairs")))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val out = co
      .join(broadcast(uni).withColumnRenamed("w", "w1")
        .withColumnRenamed("c", "ca"), "w1")
      .join(broadcast(uni).withColumnRenamed("w", "w2")
        .withColumnRenamed("c", "cb"), "w2")
      .crossJoin(totals).crossJoin(pairTotal)
      .withColumn("score",
        graft.lakehouse.ext.Sketches.intDivPub(
          dec(lit(scale)) * dec(col("n")) * dec(col("n_tokens")) *
            dec(col("n_tokens")),
          dec(col("ca")) * dec(col("cb")) * dec(col("n_pairs")))
          .cast("long"))
      .select(col("w1"), col("w2"), col("n"), col("score"))
    if (!eager) out // lazy variant (plan inspection/composition): caller
                    // owns the co/uni cache lifetime
    else {
      // eager: the association list is vocab-bounded; release the caches
      val ck = out.localCheckpoint(true)
      co.unpersist(); uni.unpersist()
      ck
    }
  }

  /** Conditional bigram entropy H(W₂|W₁) in bits — the corpus's
    * next-token uncertainty, the scalar that sits under the perplexity
    * reports (q266/q276: H is the ln-domain view of the same model) and
    * moves when boilerplate floods a corpus (duplicated spans crush H).
    * From the exact bigram table: H = (1/N)·Σ c₁₂·(ln c₁ − ln c₁₂)/ln2
    * with c₁ = Σ_w c₁w. Each per-bigram term is the SAME fixed IEEE op
    * sequence in Spark and the oracle (ln 2 as a shared double literal,
    * not a library call), accumulated exactly as DECIMAL(38,18); one
    * final division. Frames are vocab²-bounded after ONE bigram count
    * aggregation. */
  def conditionalBigramEntropy(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val Ln2 = 0.6931471805599453
    val bg = bigrams(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(sum("c12").as("c1"))
    val terms = bg.join(c1, Seq("w1"))
      .select(col("c12"),
        ((col("c12") * (log(col("c1").cast("double")) -
          log(col("c12").cast("double")))) / lit(Ln2))
          .cast("decimal(38,18)").as("__term"))
    terms.agg(sum("__term").as("__s"), sum("c12").as("n_bigrams"))
      .crossJoin(c1.agg(count(lit(1)).as("vocab_w1")))
      .select(col("n_bigrams"), col("vocab_w1"),
        when(col("n_bigrams") > 0,
          col("__s").cast("double") / col("n_bigrams").cast("double"))
          .as("entropy_bits"))
  }
}
