package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding (Sennrich, Haddow & Birch 2016, arXiv:1508.07909) —
  * the real merges-table tokenizer behind modern LM vocabularies, as a
  * corpus-scale operator pair: LEARN merges from a distributed
  * word-frequency dictionary, then ENCODE per row with the learned ranks.
  *
  * Scale shape: learning makes ONE distributed pass (word count — a
  * single shuffle on the word), caps the dictionary at `maxVocabWords` by
  * frequency (bounded driver collect, the same pattern as IVF's fit
  * sample), and runs the merge loop on the dictionary driver-side —
  * O(numMerges × dictSize), independent of corpus size, exactly how the
  * reference BPE implementations train. Encoding is a per-row compiled
  * kernel over broadcast ranks: no shuffle, no state.
  *
  * Normalization contract: lowercase + whitespace-split; tokens never
  * cross word boundaries (word-internal BPE, no end-of-word marker).
  * Concatenating a document's tokens restores its normalized text — the
  * roundtrip invariant q92 verifies corpus-wide.
  */
object Tokenizer {

  /** One learned merge: the adjacent symbol pair to be joined. Earlier
    * position in the sequence = higher priority at encode time. */
  type Merge = (String, String)

  /** Learn `numMerges` BPE merges from the corpus. Deterministic: pair
    * counts tie-break lexicographically, the dictionary cap tie-breaks
    * by word. */
  def learnBpeMerges(df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 50000): Seq[Merge] = {
    val dict = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    learnFromDict(dict, numMerges)
  }

  /** A word as base symbols: one per CODE POINT, not per UTF-16 unit —
    * splitting chars would strand surrogate halves as lone tokens, which
    * Spark's String→UTF8String boundary mangles to '?', silently breaking
    * the roundtrip invariant for any non-BMP text (emoji, CJK
    * extensions). */
  private def baseSymbols(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** The driver-side merge loop over a (word, frequency) dictionary.
    *
    * Pair counts are maintained INCREMENTALLY (the standard BPE-trainer
    * trick): each round touches only the words that actually contain the
    * merged pair (found via a pair → word-ids index) instead of
    * recounting every adjacent pair of every dictionary word. The counts
    * after each round are exactly what a full recount would produce
    * (add/subtract of the same integer contributions), and the selection
    * rule — most frequent pair, ties to the lexicographically smallest,
    * a total order with a unique minimum — is unchanged, so the merge
    * sequence is bit-identical to the recount formulation (pinned by
    * TokenizerSpec's golden vectors and the q92/q435 oracle hashes). At
    * 50k words × 200 merges this is the difference between O(rounds ×
    * dictionary) and O(rounds × touched words). */
  private[ext] def learnFromDict(dict: Array[(String, Long)],
      numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = dict.map { case (w, _) => baseSymbols(w) }
    val freqs: Array[Long] = dict.map(_._2)
    val counts = mutable.HashMap.empty[Merge, Long]
    // pair → ids of words that contained the pair when last touched; may
    // hold stale ids (a later merge removed the pair from the word) —
    // membership is re-checked against the live word before use
    val index = mutable.HashMap.empty[Merge, mutable.HashSet[Int]]
    def addPairs(wi: Int): Unit = {
      val syms = words(wi); val c = freqs(wi)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        counts.update(p, counts.getOrElse(p, 0L) + c)
        index.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        j += 1
      }
    }
    def subtractPairs(wi: Int): Unit = {
      val syms = words(wi); val c = freqs(wi)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val n = counts(p) - c
        if (n == 0L) counts.remove(p) else counts.update(p, n)
        j += 1
      }
    }
    var i = 0
    while (i < words.length) { addPairs(i); i += 1 }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    while (round < numMerges && counts.nonEmpty) {
      // most frequent pair; ties go to the lexicographically smallest —
      // any deterministic rule works, it just has to BE a rule
      val best = counts.minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      index.remove(best).foreach(_.foreach { wi =>
        val syms = words(wi)
        var contains = false
        var j = 0
        while (j < syms.length - 1 && !contains) {
          if (syms(j) == best._1 && syms(j + 1) == best._2) contains = true
          j += 1
        }
        if (contains) { // skip stale index entries
          subtractPairs(wi)
          words(wi) = applyMerge(syms, best)
          addPairs(wi)
        }
      })
      round += 1
    }
    merges.toSeq
  }

  private def applyMerge(syms: Array[String], p: Merge): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word: repeatedly merge the present pair with the LOWEST
    * learned rank (standard BPE inference; rank order, not left-to-right
    * scan order, decides among competing pairs). */
  private[ext] def encodeWord(word: String,
      ranks: Map[Merge, Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms: Array[String] = baseSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: Merge = null
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = applyMerge(syms, bestPair)
    }
    syms
  }

  /** Attach the BPE token array (`outCol`) for each row: lowercase,
    * whitespace-split, each word encoded with the learned ranks. Null
    * text encodes to an empty array. */
  def withBpeTokens(df: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "bpe_tokens"): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val bc = df.sparkSession.sparkContext.broadcast(ranks)
    // Per-task memo: encodeWord is a pure function of the word under a
    // fixed rank table, and corpus word frequencies are Zipfian — the
    // same words recur constantly, so caching cuts the encode kernel by
    // the type/token ratio. @transient lazy rebuilds the (empty) map on
    // each deserialization, so tasks never share state across executors;
    // the size cap bounds memory on adversarial vocabularies (2^16 per
    // task instance: the Zipfian head is what pays, and worst-case memory
    // multiplies by the number of concurrent tasks per executor).
    val enc = udf(new (String => Array[String]) with Serializable {
      @transient private lazy val cache =
        new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
      override def apply(s: String): Array[String] =
        if (s == null) Array.empty[String]
        else s.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .flatMap { w =>
            val hit = cache.get(w)
            if (hit != null) hit
            else {
              val t = encodeWord(w, bc.value)
              if (cache.size < (1 << 16)) cache.put(w, t)
              t
            }
          }
    })
    df.withColumn(outCol, enc(col(textCol)))
  }

  /** The roundtrip invariant as a column: concatenated tokens equal the
    * document's normalized (lowercased, whitespace-stripped) text. True
    * for every document by construction — q92 hash-checks it corpus-wide,
    * which catches any encode-path bug that drops, duplicates, or
    * reorders symbols. */
  def roundtripOk(tokensCol: Column, textCol: Column): Column =
    concat_ws("", tokensCol) ===
      regexp_replace(lower(coalesce(textCol, lit(""))), "\\s+", "")

  /** PERSISTED BPE model — index-once-query-many (the lmTableUpdate
    * contract): fold `batch`'s word frequencies into the versioned
    * `<prefix>_dict` table (additive counts, full-outer merge — ANY
    * batch arrival order folds to the one-shot dictionary, so the
    * derived model is fold-order-INVARIANT), then re-derive the merge
    * sequence from the frozen dictionary and overwrite
    * `<prefix>_merges` (merge_rank, lhs, rhs). The merge loop runs on
    * the capped dictionary driver-side — O(numMerges × dict),
    * corpus-independent — while the dictionary fold is one word-key
    * shuffle over the BATCH only, never a corpus re-scan. Returns the
    * merge count written. */
  def bpeTableUpdate(spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, prefix: String,
      batch: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 50000): Long = {
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    val fresh = batch
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val dictTable = s"${prefix}_dict"
    val merged = Versioned.latestVersion(
        Catalog.tablePath(lh, dictTable)) match {
      case None => fresh
      case Some(_) =>
        TableIO.selectTable(spark, lh, dictTable)
          .withColumnRenamed("c", "__old")
          .join(fresh.withColumnRenamed("c", "__new"), Seq("w"),
            "full_outer")
          .select(col("w"),
            (coalesce(col("__old"), lit(0L)) +
              coalesce(col("__new"), lit(0L))).as("c"))
    }
    TableIO.writeTable(spark, lh, dictTable, merged)
    // re-derive the merges from the FROZEN dictionary: cap by
    // (frequency desc, word) exactly like learnBpeMerges, so the
    // persisted model equals the from-scratch model on the same corpus
    val dict = TableIO.selectTable(spark, lh, dictTable)
      .orderBy(col("c").desc, col("w")).limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = learnFromDict(dict, numMerges)
    val rows = merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
    TableIO.writeTable(spark, lh, s"${prefix}_merges",
      spark.createDataFrame(rows).toDF("merge_rank", "lhs", "rhs"))
      .rowCount
  }

  /** The persisted merge sequence of [[bpeTableUpdate]]'s model, in
    * rank order — a bounded O(numMerges) collect. */
  def loadBpeMerges(spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, prefix: String): Seq[Merge] = {
    import graft.lakehouse.TableIO
    TableIO.selectTable(spark, lh, s"${prefix}_merges")
      .orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** [[withBpeTokens]] against the persisted model — encoding a new
    * batch costs O(batch + model), never a retrain. */
  def withPersistedBpeTokens(spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, prefix: String, df: DataFrame,
      textCol: String, outCol: String = "bpe_tokens"): DataFrame =
    withBpeTokens(df, textCol, loadBpeMerges(spark, lh, prefix), outCol)
}
