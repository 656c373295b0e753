package graft.lakehouse.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  * Everything except the langId/winnowing UDFs is built from codegen'd
  * built-in functions, so the hot path stays inside whole-stage codegen
  * and scales linearly with input (no shuffle — all per-row).
  */

/** One scored term of [[TextStats.tfidfTopTerms]]'s per-document top-k
  * (top-level so Spark derives its Product encoder for the kernel UDF). */
case class TfIdfTerm(term: String, score: Double)

/** Per-document output of [[TextStats.bm25TopK]]'s tokenize kernel:
  * document length and one term frequency per query term. */
case class Bm25DocStats(dl: Long, tfs: Array[Long])

object TextStats {

  /** Per-executor-thread zlib deflater for [[deflateRatio]] — created on
    * the executor, never serialized into a task closure. */
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(9))

  /** Whitespace token count (0 for empty/blank). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — the pre-tokenization grid a byte-pair
    * encoder would refine. Regex kept RE2-compatible so oracle engines
    * agree. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeishPattern), lit(0)))

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this", "are")

  /** Per-document quality metrics + a combined score in [0,1].
    * All-double arithmetic in a fixed operation order (deterministic and
    * engine-portable). Columns: n_chars, n_tokens, avg_token_len,
    * punct_ratio, digit_ratio, stopword_ratio, quality_score. */
  def qualityMetrics(c: Column): Seq[(String, Column)] = {
    val nChars = length(c).cast("double")
    val nTokens = tokenCount(c).cast("double")
    // chars that are neither alphanumeric nor whitespace
    val punctCount = length(regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    val digitCount = length(c) - length(regexp_replace(c, "[0-9]", ""))
    // one array literal, not CreateArray(|stopwords| scalar literals) —
    // keeps the codegen'd expression tree (and Janino compile time) small
    val stopArr = typedlit(Stopwords.toSeq)
    val stopHits = size(filter(split(lower(c), "\\s+"),
      w => array_contains(stopArr, w))).cast("double")
    val safeChars = when(nChars === 0, lit(1.0)).otherwise(nChars)
    val safeTokens = when(nTokens === 0, lit(1.0)).otherwise(nTokens)
    val punctRatio = punctCount.cast("double") / safeChars
    val digitRatio = (length(c) - length(regexp_replace(c, "[0-9]", ""))).cast("double") / safeChars
    val stopRatio = stopHits / safeTokens
    val avgTokLen = nChars / safeTokens
    // score: reward stopword presence + mid-length tokens, punish symbol soup
    val lenTerm = when(nChars >= 100 && nChars <= 10000, lit(0.25)).otherwise(lit(0.0))
    val stopTerm = least(stopRatio * 2.5, lit(0.25))
    val punctTerm = greatest(lit(0.25) - punctRatio * 2.5, lit(0.0))
    val tokTerm = when(avgTokLen >= 3.0 && avgTokLen <= 12.0, lit(0.25)).otherwise(lit(0.0))
    val score = lenTerm + stopTerm + punctTerm + tokTerm
    Seq(
      "n_chars" -> length(c).cast("long"),
      "n_tokens" -> tokenCount(c).cast("long"),
      "avg_token_len" -> avgTokLen,
      "punct_ratio" -> punctRatio,
      "digit_ratio" -> digitRatio,
      "stopword_ratio" -> stopRatio,
      "quality_score" -> score)
  }

  /** Attach all quality metric columns to df. */
  def withQualityMetrics(df: DataFrame, textCol: String): DataFrame =
    qualityMetrics(col(textCol)).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

  // ---- language ID: tiny stopword-profile classifier ----------------------

  private val LangProfiles: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "zu", "mit", "von", "auf", "für", "den", "im", "sich"),
    "en" -> Set("the", "and", "of", "to", "in", "is", "it", "that", "for",
      "on", "with", "as", "at", "by", "this", "are"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "los", "del", "las",
      "un", "una", "por", "con", "para", "es", "no"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "en", "un", "une",
      "du", "que", "est", "pour", "dans", "qui", "pas"))

  /** n-gram/stopword-heuristic language ID. CJK scripts are detected by
    * codepoint range (they don't tokenize on whitespace); otherwise the
    * language with the most stopword hits wins, alphabetical tie-break,
    * "und" (undetermined) when nothing scores. */
  def langIdOf(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val cjk = text.codePoints().toArray.count(cp =>
      (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF))
    if (cjk * 50 >= text.length) return "zh"
    val words = text.toLowerCase.split("\\s+")
    val scored = LangProfiles.map { case (lang, stops) =>
      lang -> words.count(stops.contains)
    }
    val top = scored.map(_._2).max
    if (top == 0) "und"
    else scored.filter(_._2 == top).map(_._1).min // alphabetical tie-break
  }

  val langIdUdf = udf[String, String](langIdOf _)

  // ---- fingerprinting ------------------------------------------------------

  /** Exact content fingerprint: xxhash64 of the whitespace-normalized,
    * lowercased text — codegen'd built-ins only. */
  def contentFingerprint(c: Column): Column =
    xxhash64(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03): rolling
    * Rabin–Karp hashes of k-grams, minimum per window of w, rightmost-min
    * tie-break; returns the distinct selected hashes sorted. Robust to
    * local edits — near-dup docs share most fingerprint values. */
  def winnowingFingerprint(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    if (text == null) return Array.empty
    val s = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (s.length < k) return if (s.isEmpty) Array.empty else Array(s.hashCode.toLong)
    val B = 1000003L
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var h = 0L
    var pow = 1L
    for (_ <- 1 until k) pow *= B
    for (i <- 0 until k) h = h * B + s.charAt(i)
    hashes(0) = h
    for (i <- 1 until n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hashes(i) = h
    }
    val selected = scala.collection.mutable.LinkedHashSet.empty[Long]
    for (start <- 0 to n - w) {
      var minIdx = start
      for (j <- start until start + w)
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost minimum
      selected += hashes(minIdx)
    }
    selected.toArray.sorted
  }

  val winnowingUdf = udf[Array[Long], String]((t: String) => winnowingFingerprint(t))

  /** Winnowing fingerprints with a PORTABLE gram hash — first 8 hex chars
    * of sha-256, recomputable by any engine — so the selection algorithm
    * (k-gram → window-of-w minimum → distinct) is verifiable end-to-end
    * against an independent implementation. [[winnowingFingerprint]]'s
    * compiled rolling-hash kernel stays the production path (one hash
    * update per char vs one sha-256 per gram, ~10× cheaper); semantics
    * differ only in hash function and its text normalization.
    *
    * The k-gram hashes, the window-of-`w` minima, and the per-doc distinct
    * all happen in ONE compiled pass per document
    * ([[Dedup.portableWinnowKernel]]): the earlier explode-then-window
    * formulation pushed ~length(text) rows per document through a UDF
    * boundary and a window exchange; this produces the identical set with
    * zero shuffle (a doc's fingerprints are independent of every other
    * doc's, so nothing ever needs co-location). */
  def portableFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val kern = udf((s: String) => Dedup.portableWinnowKernel(s, k, w))
    df.select(col(idCol), explode(kern(col(textCol))).as("fp"))
  }

  /** Register the extension-tier scalar kernels for SQL use, mirroring the
    * core UDF surface (Strings.registerUdfs): SQL users get the same
    * text-pipeline primitives DataFrame users compose. */
  def registerUdfs(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("graft_lang_id", langIdUdf)
    spark.udf.register("graft_simhash64", Dedup.simHashUdf)
    spark.udf.register("graft_winnow_fp", winnowingUdf)
  }

  // ---- chunking & corpus composition --------------------------------------

  /** Boilerplate line removal (RefinedWeb / C4-style): drop every line
    * whose TRIMMED form appears in more than `maxDocFreq` distinct
    * documents — navigation chrome, cookie banners, license headers — and
    * rebuild each document from its surviving lines in original order
    * (docs reduced to nothing keep an empty-string row: dropping them is a
    * separate quality-gate decision). Line-level dedup is orthogonal to
    * document-level dedup: two unique documents can still share a
    * boilerplate footer that should train zero times.
    *
    * Scale shape: one distinct + count aggregation over (trimmedLine)
    * builds the frequency table; a semi-join keeps surviving lines; one
    * per-document aggregation rebuilds the text. Lines shuffle once;
    * nothing collects to the driver. */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "ln")))
    val ok = lines.select(col(idCol), trim(col("ln")).as("key"))
      .distinct()
      .groupBy("key").agg(count(lit(1)).as("df_docs"))
      .filter(col("df_docs") <= maxDocFreq)
    val kept = lines.join(ok, trim(col("ln")) === col("key"), "left_semi")
    val rebuilt = kept.groupBy(idCol)
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(pos, ln))), x -> x.ln)"),
        "\n").as(textCol))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** Corpus-wide exact PARAGRAPH dedup (the C4/RefinedWeb span-dedup
    * sibling at paragraph granularity): a paragraph (a `\n\n`-separated
    * block, keyed by its trimmed text) is kept only at its FIRST
    * occurrence in (document id, position) order — every later exact copy
    * anywhere in the corpus is dropped, and documents are rebuilt from
    * their surviving paragraphs in order. Whitespace-only blocks are
    * structural separators, not content, and always survive. Documents
    * reduced to nothing persist as empty rows (the drop decision is a
    * separate quality gate, as with [[dropBoilerplateLines]]).
    *
    * Scale shape: one aggregation over trimmed-paragraph keys finds the
    * min (id, pos) owner — paragraphs shuffle once on their key — and a
    * semi-join keeps the owners; the per-document rebuild is the same
    * sorted-collect as the line dedup. Nothing collects to the driver. */
  def dedupParagraphs(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val paras = df.select(col(idCol),
      posexplode(split(col(textCol), "\n\n", -1)).as(Seq("pos", "para")))
    val firsts = paras.filter(trim(col("para")) =!= "")
      .groupBy(trim(col("para")).as("key"))
      .agg(min(struct(col(idCol).as("fid"), col("pos").as("fpos"))).as("f"))
      .select(col("key"), col("f.fid").as("fid"), col("f.fpos").as("fpos"))
    val kept = paras.join(firsts,
        trim(col("para")) === col("key") &&
          col(idCol) === col("fid") && col("pos") === col("fpos"),
        "left_semi")
      .unionByName(paras.filter(trim(col("para")) === ""))
    val rebuilt = kept.groupBy(idCol)
      .agg(array_join(expr(
        "transform(sort_array(collect_list(struct(pos, para))), x -> x.para)"),
        "\n\n").as(textCol))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** Split documents into fixed-size character windows with `overlap`
    * characters of context between consecutive chunks (the standard
    * pretraining/RAG chunker). Pure codegen'd built-ins: the chunk starts
    * are a `sequence`, the slices are `substring` — a narrow explode, no
    * UDF, no shuffle; a 100 TB corpus chunks in one pass.
    * Output: (…idCol, chunk_no int, chunk_text). Null text yields no rows;
    * text shorter than one stride yields a single chunk. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val nChunks = // at least 1; last window may be short
      greatest(ceil((length(col(textCol)) - lit(overlap)) /
        lit(stride.toDouble)).cast("long"), lit(1L))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0L), nChunks - lit(1L))).as("chunk_no"))
      .select(col(idCol), col("chunk_no").cast("int").as("chunk_no"),
        expr(s"substring(`$textCol`, CAST(chunk_no * $stride AS INT) + 1, " +
          s"$chunkSize)").as("chunk_text"))
  }

  /** Repetition metrics (the Gopher-rules family): per document, the
    * fraction of repeated non-empty lines and the fraction of characters
    * living in repeated lines — the cheap structural signals that catch
    * boilerplate/templated pages. Implemented as explode + one aggregation
    * keyed on (id, line): per-row array gymnastics would bound memory by the
    * longest document, the exploded form shuffles (id, line) pairs and
    * scales with the corpus, not the worst row. */
  def repetitionMetrics(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = df.select(col(idCol),
        explode(split(col(textCol), "\n")).as("raw"))
      .select(col(idCol), trim(col("raw")).as("line"))
      .where(length(col("line")) > 0)
    lines.groupBy(idCol, "line")
      .agg(count(lit(1)).as("cnt"), length(col("line")).as("len"))
      .groupBy(idCol).agg(
        sum("cnt").cast("long").as("n_lines"),
        count(lit(1)).cast("long").as("distinct_lines"),
        (lit(1.0) - count(lit(1)).cast("double") / sum("cnt"))
          .as("dup_line_frac"),
        (sum(when(col("cnt") > 1, col("cnt") * col("len")).otherwise(0L))
          .cast("double") / sum(col("cnt") * col("len"))).as("dup_char_frac"))
  }

  /** Per-document character-level Shannon entropy (bits/char): the cheap
    * information-density signal that flags gibberish (near-max entropy) and
    * degenerate repetition (near-zero) — computed as
    * H = log2(n) − (Σ c·log2 c)/n over per-character counts, one explode +
    * two aggregations, all codegen'd built-ins. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .where(length(col("ch")) > 0)
      .groupBy(idCol, "ch").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol).agg(
        sum("cnt").cast("long").as("n_chars"),
        (log2(sum("cnt")) -
          sum(col("cnt") * log2(col("cnt"))) / sum("cnt")).as("entropy"))

  /** Per-document top-k TF-IDF terms (smooth idf: ln((N+1)/(df+1)) + 1).
    * Keyword extraction over a corpus, as TWO corpus scans and ONE
    * counts-only shuffle: pass 1 explodes each document's DISTINCT terms
    * (plus a ` ` sentinel standing for "this doc has terms", so
    * N rides the same aggregation) into a per-term document-frequency
    * count — map-side combine makes the exchange O(vocab), never
    * O(tokens). The df_t map is vocabulary-bounded (the q121 top-k-vocab
    * boundedness class), so it broadcasts into pass 2's per-row kernel:
    * count tfs in a hash map over the split array, score, keep the local
    * top-k — no (doc, term) shuffle, no join, no window, zero exchange.
    * Past `maxVocab` distinct terms the operator falls back to the
    * distributed join + window-top-k plan (same answer; the guard steers
    * cost, never correctness). Ties rank alphabetically. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int, maxVocab: Long = 8000000L): DataFrame = {
    val spark = df.sparkSession
    val toksCol = filter(
      split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " "),
      t => length(t) > 0)
    // Each pass tokenizes off its own column-pruned scan — deliberately
    // NOT a persisted token cache: at 100 TB materializing token arrays
    // spills the whole corpus to executor disk, while a second pruned
    // parquet scan is the cheap path; at bench scale it also drops the
    // persist + eager-release jobs.
    val d = spreadIfNarrow(df.select(col(idCol), col(textCol)))
      .select(col(idCol), toksCol.as("toks"))
    // ONE job: aggregates df_t off the scan and collects at most
    // maxVocab+2 rows (CollectLimit bounds driver memory — the guard IS
    // the collect, no separate count job)
    val rows = d.select(
        when(size(col("toks")) > 0,
          concat(array(lit(" ")), array_distinct(col("toks"))))
          .otherwise(array().cast("array<string>")).as("dts"))
      .select(explode(col("dts")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df_t"))
      .limit((maxVocab + 2).min(Int.MaxValue).toInt)
      .collect()
    if (rows.length > maxVocab + 1)
      return tfidfTopTermsJoined(df, idCol, textCol, k)
    var nDocs = 0L
    val dft = new java.util.HashMap[String, Long](rows.length * 2)
    rows.foreach { r =>
      val t = r.getString(0)
      if (t == " ") nDocs = r.getLong(1) else dft.put(t, r.getLong(1))
    }
    val bc = spark.sparkContext.broadcast(dft)
    val n = nDocs
    val kk = k
    val topUdf = udf((toks: Seq[String]) => {
      if (toks == null || toks.isEmpty) Array.empty[TfIdfTerm]
      else {
        val counts = new java.util.HashMap[String, Int]
        toks.foreach(t => counts.put(t, counts.getOrDefault(t, 0) + 1))
        val m = bc.value
        val scored = new Array[TfIdfTerm](counts.size)
        var i = 0
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          // identical IEEE arithmetic to the join plan's column formula
          val s = e.getValue.toDouble *
            (math.log((n + 1.0) / (m.getOrDefault(e.getKey, 0L) + 1.0)) + 1.0)
          scored(i) = TfIdfTerm(e.getKey, s)
          i += 1
        }
        java.util.Arrays.sort(scored, new java.util.Comparator[TfIdfTerm] {
          def compare(a: TfIdfTerm, b: TfIdfTerm): Int = {
            val c = java.lang.Double.compare(b.score, a.score)
            if (c != 0) c else a.term.compareTo(b.term)
          }
        })
        scored.take(kk)
      }
    })
    d.select(col(idCol), posexplode(topUdf(col("toks"))).as(Seq("p", "ts")))
      .select(col(idCol), col("ts.term").as("term"),
        (col("p") + 1).cast("int").as("rank"), col("ts.score").as("score"))
  }

  /** Spread a frame across cores when its scan arrived too narrow (a
    * small corpus often reads as ONE parquet split, serializing every
    * downstream per-row kernel onto a single task); a no-op on
    * well-split inputs, so at scale no exchange is added. */
  private def spreadIfNarrow(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < par) df.repartition(par) else df
  }

  /** The distributed fallback plan for [[tfidfTopTerms]] (vocabulary too
    * large to broadcast): one shuffle to (doc, word) term frequencies,
    * one per-term AGGREGATE for document frequency (joined back — never
    * the window-over-term alternative, which SORTS the whole tf table
    * and hands a stop-word's billion-row partition to a single task),
    * one window over docs for the top-k cut. */
  private def tfidfTopTermsJoined(df: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = df.select(col(idCol),
        explode(split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "),
          " ")).as("term"))
      .where(length(col("term")) > 0)
    val tf = words.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val nDocs = broadcast(tf.agg(countDistinct(col(idCol)).as("n_docs")))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val scored = tf
      .join(dfT, "term")
      .crossJoin(nDocs)
      .withColumn("score", col("tf") *
        (log((col("n_docs") + 1.0) / (col("df_t") + 1.0)) + 1.0))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("rank"), col("score"))
  }

  /** BM25 retrieval scoring (Robertson/Spärck Jones, k1/b standard form):
    * rank documents against a bag-of-words query. Query terms are a tiny
    * driver-side set compiled INTO the per-row kernel: one pass over each
    * document's text produces its length and per-query-term counts — no
    * token explosion, no wide shuffle; at 100 TB the only exchanges are
    * the single-row stats agg and the top-k merge. (The earlier
    * formulation ran one higher-order `filter` per query term over a
    * split() array — Spark interprets HOF lambdas per element, so the
    * token stream was traversed |query|+2 times interpreted; the kernel
    * is one compiled traversal.)
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)); returns top-k docs. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      query: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qTerms = query.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
    require(qTerms.nonEmpty, "empty query")
    // Same tokenization as lower(trim(text)) split on \s+ minus empties,
    // as one compiled pass. Null text stays null (excluded from scoring,
    // counted in n_docs — the column formulation's exact semantics).
    val qIndex: Map[String, Int] = qTerms.zipWithIndex.toMap
    val nq = qTerms.length
    val kernel = udf((text: String) => {
      if (text == null) null
      else {
        val toks = text.toLowerCase(java.util.Locale.ROOT).trim
          .split("\\s+")
        var dl = 0L
        val tfs = new Array[Long](nq)
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          if (t.nonEmpty) {
            dl += 1
            qIndex.get(t) match {
              case Some(j) => tfs(j) += 1
              case None =>
            }
          }
          i += 1
        }
        Bm25DocStats(dl, tfs)
      }
    })
    // Persisted: the stats agg AND the scoring pass both consume this
    // frame, and without the cache each would re-scan the full text
    // through the kernel — at 100 TB that is 2× the corpus read, while
    // the cached frame is O(docs) narrow (id, dl, one long per query
    // term). At bench scale the persist is wall-clock neutral (measured
    // ±0.05 s vs lazy); at scale it halves the dominant cost.
    val withToks = df
      .select(col(idCol), kernel(col(textCol)).as("s"))
      .select((col(idCol) +: col("s.dl").as("dl")
        +: qTerms.indices.map(i => col("s.tfs")(i).as(s"tf_$i"))).map(identity): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // corpus statistics — ONE partial-agg pass to a single broadcast row:
    // doc count, average length, and each term's document frequency
    val statCols = avg("dl").as("avgdl") +: qTerms.indices.map { i =>
      count_if(col(s"tf_$i") > 0).as(s"df_$i") }
    val corpus = broadcast(withToks.agg(count(lit(1)).as("n_docs"),
      statCols: _*))
    // per-document score: fixed-order sum over the query terms (idf > 0
    // always, so only term-matching documents can appear in the top-k —
    // same candidate set as the (doc, term) join formulation)
    val scored = withToks.crossJoin(corpus)
      .where(qTerms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .withColumn("bm25", qTerms.indices.map { i =>
        val idf = log(lit(1.0) +
          (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
        when(col(s"tf_$i") > 0,
          idf * col(s"tf_$i") * (lit(k1) + 1.0) /
            (col(s"tf_$i") + lit(k1) *
              (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
          .otherwise(lit(0.0))
      }.reduce(_ + _))
      .select(col(idCol), col("bm25"))
    // orderBy+limit plans as TakeOrderedAndProject (partition-local top-k,
    // driver merge of k·partitions rows); the rank window then runs over at
    // most k rows — never a global single-partition sort of all matches
    val topk = scored.orderBy(col("bm25").desc, col(idCol).asc).limit(k)
    val out = topk.withColumn("rank",
        row_number().over(Window.orderBy(col("bm25").desc, col(idCol).asc)))
      .select(col(idCol), col("rank"), col("bm25"))
      // eager k-row materialization so the token cache can be released
      .localCheckpoint(true)
    withToks.unpersist()
    out
  }

  // ---- PII scrubbing -------------------------------------------------------

  // Deliberately conservative patterns that mean the same thing in Java
  // regex (Spark) and RE2 (most SQL engines): no lookarounds, no
  // backreferences, character classes + bounded repetition only.
  private[ext] val UrlRe = "https?://[^\\s]+"
  private[ext] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ext] val PhoneRe = "\\+?[0-9][0-9\\- ]{7,}[0-9]"

  /** Mask URLs, email addresses, and phone-shaped digit runs (in that
    * order — URLs may embed '@', emails embed digits). Pure codegen'd
    * regexp_replace chain: per-row, no UDF, no shuffle. Masking, not
    * deletion, preserves token positions for downstream chunkers. */
  def scrubPII(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, "[URL]"),
        EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")

  /** Per-document vocabulary coverage against a corpus-derived vocab: the
    * vocabulary is the `vocabSize` most frequent whitespace tokens
    * (deterministic tie-break: count desc, token asc), and each document
    * reports how many of its tokens fall outside it. High OOV rate flags
    * documents a fixed-vocabulary model tokenizes badly — a standard
    * pre-training corpus-quality signal.
    *
    * Scale shape: one explode + partial-agg pass builds the frequency
    * table (shuffles |vocab| partial rows per partition, not tokens), the
    * top-k is a TakeOrdered of the tiny distinct-token frame, and the
    * membership test is a BROADCAST left join — the token stream itself
    * is never shuffled. */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val tok = df.select(col(idCol),
        explode(split(col(textCol), "\\s+")).as("w"))
      .where(col("w") =!= "")
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(true).as("__in_vocab"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("total_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_rate",
        col("oov_tokens").cast("double") / col("total_tokens").cast("double"))
  }

  /** Corpus mixture accounting for dataset-mixing decisions: per stratum
    * (source, language, …) document count, token total, and share of the
    * whole corpus' tokens. One partial+final aggregation plus a broadcast
    * of the single-row total. */
  def mixtureStats(df: DataFrame, stratumCol: String,
      tokenCol: String): DataFrame = {
    val per = df.groupBy(stratumCol).agg(
      count(lit(1)).as("n_docs"),
      sum(col(tokenCol).cast("long")).as("tokens"))
    val total = per.agg(sum("tokens").as("total_tokens"))
    per.crossJoin(broadcast(total))
      .withColumn("token_share",
        col("tokens").cast("double") / col("total_tokens").cast("double"))
      .drop("total_tokens")
  }

  /** Whitespace tokens as an array column (empty array for blank/null). */
  private def tokArray(textCol: String): Column =
    expr(s"filter(split(coalesce(`$textCol`, ''), '\\\\s+'), t -> t <> '')")

  /** All stride-1 W-token window hashes of a document in one compiled
    * pass: (1-based start, RAW 16-byte md5 of the space-joined window) —
    * the same 128-bit value as `md5(array_join(slice(toks, i, w), ' '))`
    * in binary rather than 32-hex form: the hash never leaves the
    * operator (only merged spans do), and the binary key halves the
    * corpus-wide (key, id, pos) shuffle width. 128 bits stays
    * collision-safe at 100 TB window counts where a 64-bit key would
    * not (birthday at ~2^32 windows). One UDF boundary per DOCUMENT;
    * the digest object is reused across windows. */
  private[ext] case class SpanGram(start: Long, g: Array[Byte])
  private val windowMd5Kernel = udf { (toks: Seq[String], w: Int) =>
    if (toks == null || toks.length < w) Seq.empty[SpanGram]
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val arr = toks.toArray
      val out = new Array[SpanGram](arr.length - w + 1)
      var i = 0
      while (i <= arr.length - w) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < w) {
          if (j > 0) sb.append(' ')
          sb.append(arr(i + j))
          j += 1
        }
        md.reset()
        out(i) = SpanGram((i + 1).toLong, md.digest(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        i += 1
      }
      out.toSeq
    }
  }

  /** Exact duplicated-span detection (substring-level dedup, Lee et al.
    * 2022 "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499): every substring of at least `windowTokens`
    * whitespace tokens that occurs at more than one (document, position)
    * in the corpus is reported, as maximal merged token spans per
    * document — `(id, span_start, span_end)`, 1-based, end-exclusive.
    *
    * The reference method builds a corpus-wide suffix array — inherently
    * single-machine. The distributed re-expression: slide a
    * `windowTokens`-wide window (stride 1) over each document and group
    * windows by content; a duplicated substring of length >= W duplicates
    * every W-window inside it, so detection is EXACT for substrings >= W
    * tokens (span boundaries are conservative by construction — every
    * token inside a reported span lies in some duplicated window).
    * Overlapping/adjacent duplicated windows merge per document via
    * gaps-and-islands.
    *
    * Scale shape: windows shuffle ONCE keyed by md5(window text) — a
    * fixed 32-hex key regardless of window width, with map-side partial
    * aggregation on the count; the per-document merge windows over doc-id
    * partitions bounded by document length. Nothing collects; a 100 TB
    * corpus needs one wide shuffle of (key, id, pos) triples. md5 is used
    * (not the gram text) so the shuffle width is constant; a collision
    * would need 2^64 windows. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    val w = windowTokens
    val toks = df.select(col(idCol), tokArray(textCol).as("toks"))
      .where(size(col("toks")) >= w)
    // all window hashes for a document in ONE compiled pass (the HOF
    // slice + array_join + md5 chain paid an interpreted lambda and two
    // array allocations per window); values are identical — java MD5
    // over the UTF-8 bytes of the space-joined window, lowercase hex,
    // exactly Spark's md5() and the oracle's
    val grams = toks.select(col(idCol),
      explode(windowMd5Kernel(col("toks"), lit(w))).as("sg"))
      .select(col(idCol), col("sg.start").as("start"), col("sg.g").as("g"))
    val dup = grams.groupBy("g").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("g")
    val hits = grams.join(dup, Seq("g"), "left_semi")
      .select(col(idCol), col("start"), (col("start") + w).as("end"))
    val byDoc = Window.partitionBy(idCol).orderBy("start")
    val islands = hits
      .withColumn("prevMax", max(col("end")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isNew",
        when(col("prevMax").isNull || col("start") > col("prevMax"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("isNew")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col(idCol), col("island"))
      .agg(min("start").as("span_start"), max("end").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Remove every duplicated span found by [[duplicatedSpans]] from every
    * document: the text is rebuilt from the surviving tokens joined by
    * single spaces (tokenization normalizes whitespace, so untouched
    * documents come back whitespace-normalized too — the standard
    * trade of reconstruction pipelines). Documents shorter than one
    * window pass through; documents that were ALL duplication come back
    * empty rather than vanishing.
    *
    * Scale shape: the span list per document is tiny (merged islands), so
    * spans aggregate per document and join back in one co-partitioned
    * shuffle; token filtering is a codegen'd higher-order `filter` —
    * no token-level explode on the rebuild side. */
  def stripDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, windowTokens)
      .groupBy(idCol).agg(collect_list(
        struct(col("span_start"), col("span_end"))).as("spans"))
    df.select(col(idCol), tokArray(textCol).as("toks"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), expr(
        "array_join(transform(filter(" +
          "transform(toks, (t, i) -> struct(t AS t, CAST(i + 1 AS BIGINT) AS p)), " +
          "x -> spans IS NULL OR NOT exists(spans, " +
          "s -> x.p >= s.span_start AND x.p < s.span_end)), " +
          "x -> x.t), ' ')").as(textCol))
  }

  /** One-row corpus "dataset card": the release-gate summary a training
    * run wants stapled to every corpus snapshot — volume (docs, tokens,
    * chars), nullity, diversity (distinct languages/sources), and the
    * exact-duplicate count (docs minus distinct md5(text), the same
    * identity q29's dedup keys on). Every figure is integer-exact
    * (mean tokens/doc is reported in permille via integer division), so
    * any engine reproduces the card bit-for-bit.
    *
    * Scale shape: one pass, one aggregation. The distinct counts expand
    * to a single multi-distinct aggregate over a 1-row result; md5 keys
    * keep the distinct-docs shuffle at constant width. At 100 TB this is
    * the cheapest full-corpus statement there is — no joins, no windows,
    * output is ONE row. */
  def corpusReport(df: DataFrame, idCol: String, textCol: String,
      langCol: String, sourceCol: String): DataFrame = {
    val toks = size(tokArray(textCol))
    df.select(col(idCol), col(textCol), col(langCol), col(sourceCol),
        toks.as("ntok"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("n_null_text"),
        sum(col("ntok")).cast("long").as("n_tokens"),
        sum(length(coalesce(col(textCol), lit("")))).cast("long").as("n_chars"),
        countDistinct(col(langCol)).as("n_langs"),
        countDistinct(col(sourceCol)).as("n_sources"),
        (count(col(textCol)) - countDistinct(md5(col(textCol))))
          .as("exact_dup_docs"),
        max(col("ntok")).cast("long").as("max_doc_tokens"),
        min(col("ntok")).cast("long").as("min_doc_tokens"))
      .withColumn("mean_tokens_permille",
        ((col("n_tokens") * 1000L) / col("n_docs")).cast("long"))
  }

  /** PERSISTED incremental per-source corpus card — the additive subset
    * of [[corpusReport]] (docs, null-text, tokens, chars, max/min doc
    * tokens) maintained as a versioned state table folded one batch at a
    * time: every counter is associative (sums, max, min), so any fold
    * order equals the from-scratch card bit-for-bit, each batch costs
    * O(batch) aggregation + an O(|sources|) full-outer merge, and the
    * corpus history is never rescanned — the dataset card that stays
    * current under continuous ingestion. Distinct-counts (langs, exact
    * dups) are deliberately NOT here: they aren't additive — the KMV
    * sketch table (q245) carries per-group distincts at scale. Token
    * counts treat null text as zero tokens (the [[corpusReport]]
    * contract), so min/max merge needs no null gymnastics beyond the
    * full-outer coalesce-swap. Returns the state's row count. */
  def corpusStatsTableUpdate(spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      batch: DataFrame, textCol: String, sourceCol: String,
      extraMeta: Map[String, String] = Map.empty): Long = {
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    val ntok = size(tokArray(textCol))
    val fresh = batch
      .select(col(sourceCol).as("source"), col(textCol).as("__t"),
        ntok.as("__ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__t").isNull, 1L).otherwise(0L)).as("n_null_text"),
        sum(col("__ntok")).cast("long").as("n_tokens"),
        sum(length(coalesce(col("__t"), lit("")))).cast("long")
          .as("n_chars"),
        max(col("__ntok")).cast("long").as("max_doc_tokens"),
        min(col("__ntok")).cast("long").as("min_doc_tokens"))
    val dir = Catalog.tablePath(lh, tableName)
    val merged = Versioned.latestVersion(dir) match {
      case None => fresh
      case Some(_) =>
        val renamed = fresh.columns.filter(_ != "source")
          .foldLeft(fresh)((d, c) => d.withColumnRenamed(c, "__" + c))
        def add(n: String) =
          (coalesce(col(n), lit(0L)) + coalesce(col("__" + n), lit(0L)))
            .as(n)
        TableIO.selectTable(spark, lh, tableName)
          .join(renamed, Seq("source"), "full_outer")
          .select(col("source"), add("n_docs"), add("n_null_text"),
            add("n_tokens"), add("n_chars"),
            greatest(coalesce(col("max_doc_tokens"),
                col("__max_doc_tokens")),
              coalesce(col("__max_doc_tokens"), col("max_doc_tokens")))
              .as("max_doc_tokens"),
            least(coalesce(col("min_doc_tokens"), col("__min_doc_tokens")),
              coalesce(col("__min_doc_tokens"), col("min_doc_tokens")))
              .as("min_doc_tokens"))
    }
    TableIO.writeTable(spark, lh, tableName, merged,
      extraMeta = extraMeta).rowCount
  }

  /** Streaming corpus card — [[corpusStatsTableUpdate]] driven by a live
    * document stream: each micro-batch folds in exactly once (the
    * streamKmvSketch txn-watermark contract — the batch id commits
    * atomically with the folded counters, so a crash-replayed batch is
    * skipped, never double-counted). State per fold is one O(batch)
    * aggregation + the O(|sources|) merge; the stream's history lives in
    * the card, never in operator memory. */
  def streamCorpusStats(docs: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      textCol: String, sourceCol: String,
      checkpoint: Option[String] = None,
      appId: Option[String] = None) = {
    val txnId = appId.orElse(checkpoint)
    val w = docs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          foldCorpusStatsExactlyOnce(spark, lh, tableName, batch.toDF(),
            textCol, sourceCol, txnId, batchId)
          ()
      }
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  private[ext] def foldCorpusStatsExactlyOnce(
      spark: org.apache.spark.sql.SparkSession,
      lh: graft.lakehouse.LakehouseProps, tableName: String,
      batch: DataFrame, textCol: String, sourceCol: String,
      txnId: Option[String], batchId: Long): Boolean = {
    import graft.lakehouse.Catalog
    val (_, committed) = EventWindows.txnWatermark(
      Catalog.tablePath(lh, tableName), None, txnId)
    if (committed().exists(_ >= batchId)) false
    else {
      corpusStatsTableUpdate(spark, lh, tableName, batch, textCol,
        sourceCol,
        extraMeta = txnId.map(id => s"txn:$id" -> batchId.toString).toMap)
      true
    }
  }

  /** Most-frequent word n-gram per document (the Gopher repetition
    * quality-filter signals, Rae et al. '21 §A1.1): for each doc and each
    * n in `ns`, the single most frequent n-token window (ties break to
    * the lexicographically-first gram, so the answer is deterministic),
    * its occurrence count, and the integer permille of normalized-text
    * characters its occurrences account for
    * (`len(gram) * count * 1000 div len(ws-normalized text)`). High
    * values flag degenerate repetition ("click here click here …") that
    * the dup-LINE metrics (q52) miss because the repetition lives inside
    * one line. Occurrence mass counts overlapping windows, so a
    * self-overlapping gram can exceed 1000 permille — it is a monotone
    * repetition signal, not a coverage share (the doc says so; Gopher's
    * own thresholds are on the same raw-count shape). Docs with fewer
    * than n tokens emit no row at that n.
    *
    * 100 TB shape: one per-row compiled kernel emits each doc's windows
    * in-row (slice over the token array — no self-join, no
    * explode-then-window), ONE (doc, n, gram) hash aggregation counts
    * them, and the per-(doc, n) argmax is a row_number over
    * aggregation-bounded rows — the window never sees the raw corpus. */
  def topNgramRepetition(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 16),
      "topNgramRepetition: each n must be in [1, 16]")
    require(ns.distinct == ns, "topNgramRepetition: duplicate n")
    val base = df.select(col(idCol), tokArray(textCol).as("__w"))
      .select(col(idCol), col("__w"),
        length(array_join(col("__w"), " ")).as("__len"))
    val grams = ns.map { n =>
      base.filter(size(col("__w")) >= n)
        .select(col(idCol), col("__len"), lit(n).as("n"),
          explode(expr(
            s"transform(sequence(1, size(__w) - ${n - 1}), " +
              s"i -> array_join(slice(__w, i, $n), ' '))")).as("gram"))
    }.reduce(_ unionByName _)
    val counted = grams
      .groupBy(col(idCol), col("__len"), col("n"), col("gram"))
      .agg(count(lit(1)).as("occurrences"))
    val w = Window.partitionBy(col(idCol), col("n"))
      .orderBy(col("occurrences").desc, col("gram").asc)
    counted.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("n"), col("gram").as("top_gram"),
        col("occurrences"),
        expr("(length(gram) * occurrences * 1000) div __len")
          .as("char_permille"))
  }

  /** Per-document n-gram novelty of a NEW batch against a REFERENCE
    * corpus: the share (exact integer permille) of each new document's
    * DISTINCT w-token windows that appear nowhere in the reference — the
    * incremental-ingest triage number (near-zero novelty = the crawl
    * re-fetched what the corpus already has; the complement of q53's
    * contamination check, which asks the opposite direction).
    *
    * Scale shape: both sides hash windows with the same compiled
    * per-document kernel as q139 (constant 16-byte keys); the reference
    * side reduces to DISTINCT gram keys; ONE anti-join keyed on the
    * binary hash answers membership, then a per-doc count aggregation.
    * Nothing is quadratic; the reference gram set shuffles once and is
    * re-usable via bucketing at 100 TB. Documents shorter than one
    * window report n_grams = 0 with a NULL permille. */
  def ngramNovelty(newDf: DataFrame, refDf: DataFrame, idCol: String,
      textCol: String, windowTokens: Int): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    val w = windowTokens
    def grams(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ array_distinct(transform(
        windowMd5Kernel(tokArray(textCol), lit(w)), x => x("g"))).as("grams"): _*)
    val newG = grams(newDf, col(idCol))
    val refG = grams(refDf).select(explode(col("grams")).as("g")).distinct()
    val novel = newG.select(col(idCol), explode(col("grams")).as("g"))
      .join(refG, Seq("g"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("n_novel"))
    newG.select(col(idCol), size(col("grams")).cast("long").as("n_grams"))
      .join(novel, Seq(idCol), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty_permille",
        when(col("n_grams") > 0,
          expr("(n_novel * 1000) div n_grams")).otherwise(lit(null)))
  }

  /** Paragraph-level language segmentation: run the q27 stopword/CJK
    * language heuristic PER PARAGRAPH (blank-line splits) and summarize
    * per document — paragraph count, distinct predicted languages,
    * token-weighted dominant language (ties alphabetical), and the
    * mixed-language flag. A document whose paragraphs disagree is a
    * boilerplate-splice / mis-crawl signal document-level language ID
    * averages away (the document-level call can be right while a third
    * of the text is another language). Documents with no non-blank
    * paragraph are not reported.
    *
    * Scale shape: one paragraph explode (bounded by document size), the
    * per-paragraph heuristic is a per-row kernel, then a (doc, lang)
    * token rollup and a per-document fold whose input is at most
    * |langs| rows per document; the token-weighted dominant language
    * rides a min(struct) — no window anywhere. */
  def langSegments(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val paras = df.select(col(idCol),
        explode(split(coalesce(col(textCol), lit("")), "\\n{2,}")).as("para"))
      .where(length(trim(col("para"))) > 0)
      .select(col(idCol),
        langIdUdf(col("para")).as("para_lang"),
        size(expr("filter(split(trim(para), '\\\\s+'), t -> t <> '')"))
          .cast("long").as("para_tokens"))
    val byLang = paras.groupBy(col(idCol), col("para_lang"))
      .agg(count(lit(1)).as("np"), sum("para_tokens").as("lt"))
    byLang.groupBy(idCol).agg(
        sum("np").cast("long").as("n_paras"),
        count(lit(1)).as("n_langs"),
        min(struct((col("lt") * -1L).as("neg"),
          col("para_lang").as("l"))).as("__dom"),
        sum("lt").cast("long").as("n_tokens"))
      .select(col(idCol), col("n_paras"), col("n_langs"),
        col("__dom.l").as("dominant_lang"), col("n_tokens"),
        (col("n_langs") > 1).as("mixed_lang"))
  }

  /** Tokenizer fertility per group (language, source): BPE-ish subword
    * tokens per whitespace word, in exact integer permille — the
    * standard "how much does this tokenizer fragment this language"
    * diagnostic (fertility far above the corpus norm means the tokenizer
    * under-serves that slice and its effective context shrinks). Two
    * codegen'd per-row counts into ONE aggregation. */
  def tokenFertility(df: DataFrame, textCol: String,
      groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol))).cast("long").as("ws_tokens"),
        sum(bpeishTokenCount(col(textCol))).cast("long").as("bpeish_tokens"))
      .withColumn("fertility_permille",
        when(col("ws_tokens") > 0,
          expr("(bpeish_tokens * 1000) div ws_tokens")).otherwise(lit(null)))

  /** Truncation-loss report: for a per-doc size column and a context
    * cutoff, how much content each group loses to truncation — docs over
    * the cutoff, units lost (Σ max(size − cutoff, 0)), and the lost
    * share in integer permille. ONE hash aggregation; the planning
    * readout for choosing a sequence length (pair with
    * [[Packing.paddingWasteReport]], which measures the opposite
    * failure). */
  def truncationLossReport(df: DataFrame, sizeCol: String,
      groupCol: String, cutoff: Long): DataFrame = {
    require(cutoff >= 1, "truncationLossReport needs cutoff >= 1")
    df.filter(col(sizeCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col(sizeCol) > cutoff, lit(1))).as("n_truncated"),
        sum(col(sizeCol).cast("long")).as("units_total"),
        sum(greatest(col(sizeCol).cast("long") - cutoff, lit(0L)))
          .as("units_lost"))
      .withColumn("lost_permille",
        expr("CAST(units_lost * 1000 div units_total AS BIGINT)"))
  }

  // ---- HTML text extraction ------------------------------------------------

  /** Visible text from raw HTML — the first step of any web-scrape
    * ingestion pipeline: drop script/style/comment blocks wholesale
    * (their CONTENT is not text), replace every remaining tag with a
    * space (tags are word boundaries — `<p>a</p><p>b</p>` must not fuse
    * "ab"), decode the six entities that actually occur at corpus scale
    * (`&lt; &gt; &quot; &#39; &nbsp; &amp;` — amp LAST so `&amp;lt;`
    * decodes once, to `&lt;`), collapse runs of ASCII whitespace and
    * trim. A pure codegen'd regexp_replace/replace chain — per-row,
    * zero shuffle — in the same engine-portable regex discipline as
    * [[scrubPII]]: lazy quantifiers and explicit classes both Java
    * regex and RE2 read identically; the whitespace class is the
    * explicit `[ \t\r\n]` (Java's `\s` and RE2's disagree on vertical
    * tab). Not a full HTML5 parser by design — malformed markup
    * degrades to leftover text, never to a failed job. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    // entity names contain no regex metacharacters in either dialect
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        regexp_replace(c, from, to)
      }
    trim(regexp_replace(decoded, "[ \t\r\n]+", " "))
  }

  /** [[htmlToText]] over a frame, appending `outCol`. */
  def withHtmlText(df: DataFrame, htmlCol: String,
      outCol: String = "text_clean"): DataFrame =
    df.withColumn(outCol, htmlToText(coalesce(col(htmlCol), lit(""))))

  /** Prose from Markdown — the other dominant source format in scraped
    * training corpora ([[htmlToText]]'s sibling, same engine-portable
    * regex discipline): fenced code blocks drop wholesale (code is not
    * prose), inline code/links/images keep their text and lose their
    * syntax, ATX headers / blockquote markers / list bullets strip at
    * line starts, emphasis runs vanish, whitespace collapses. A pure
    * codegen'd per-row regexp chain, zero shuffle; CommonMark's exotic
    * corners (reference links, setext headers, HTML blocks) degrade to
    * leftover text, never to a failed job. */
  def markdownToText(md: Column): Column = {
    val noFence = regexp_replace(md, "(?s)```.*?```", " ")
    val noInline = regexp_replace(noFence, "`([^`]*)`", "$1")
    // images BEFORE links: ![alt](url) is a link-with-prefix
    val noImg = regexp_replace(noInline, "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noLink = regexp_replace(noImg, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noHead = regexp_replace(noLink, "(?m)^#{1,6}[ \t]+", "")
    val noMark = regexp_replace(noHead,
      "(?m)^[ \t]*(>[ \t]?|[-*+][ \t]+|[0-9]+\\.[ \t]+)", "")
    val noEm = regexp_replace(noMark, "[*_]{1,3}", "")
    trim(regexp_replace(noEm, "[ \t\r\n]+", " "))
  }

  /** [[markdownToText]] over a frame, appending `outCol`. */
  def withMarkdownText(df: DataFrame, mdCol: String,
      outCol: String = "text_clean"): DataFrame =
    df.withColumn(outCol, markdownToText(coalesce(col(mdCol), lit(""))))

  /** Corpus-trained gibberish signal: the `topK` most frequent character
    * trigrams of the corpus (by total occurrences; ties broken by gram
    * ascending so the cut is deterministic) form the "common core", and
    * each document scores the permille of its trigram occurrences falling
    * OUTSIDE that core. Natural-language text concentrates its trigram
    * mass in a small common core; OCR noise, mojibake and binary spills
    * do not — a model-free quality filter trained on the corpus itself
    * (the n-gram cousin of the fastText-style classifier in
    * [[graft.lakehouse.ext.QualityModel]]).
    *
    * Shape is the tfidf one: a per-row compiled gram-counting kernel
    * feeds a counts-only aggregate whose key space is bounded by the
    * corpus charset (≤ charset³ distinct trigrams — NOT corpus-sized),
    * the topK cut collects exactly `topK` rows to broadcast, and a
    * second per-row kernel scores each document against the broadcast
    * core. Two pruned scans, one (gram, count) exchange, no row
    * explosion. Text normalizes as lower + trim + whitespace collapse
    * (the [[Dedup.wordNgrams]] canonicalization); documents with fewer
    * than 3 normalized chars have no trigrams and are dropped. */
  def rareGramScore(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 256): DataFrame = {
    require(topK > 0, "rareGramScore needs topK >= 1")
    val spark = df.sparkSession
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val d = spreadIfNarrow(df.select(col(idCol), col(textCol)))
      .select(col(idCol), norm.as("__t"))
    // grams step over CODE POINTS, not UTF-16 units — Java substring
    // would split surrogate pairs and disagree with any engine that
    // counts characters (the portable contract)
    val gramCounts = udf((s: String) => {
      val cp = if (s == null) Array.empty[Int] else s.codePoints().toArray
      if (cp.length < 3) Map.empty[String, Int]
      else {
        val m = new java.util.HashMap[String, Int]
        var i = 0
        while (i <= cp.length - 3) {
          val g = new String(cp, i, 3)
          m.merge(g, 1, (a: Int, b: Int) => a + b)
          i += 1
        }
        scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toMap
      }
    })
    val common = d
      .select(explode(gramCounts(col("__t"))).as(Seq("gram", "c")))
      .groupBy("gram").agg(sum(col("c")).as("c"))
      .orderBy(col("c").desc, col("gram").asc)
      .limit(topK)
      .collect().map(_.getString(0)).toSet
    val bc = spark.sparkContext.broadcast(common)
    val score = udf((s: String) => {
      val cp = if (s == null) Array.empty[Int] else s.codePoints().toArray
      if (cp.length < 3) (0L, 0L)
      else {
        val core = bc.value
        var total = 0L
        var inCore = 0L
        var i = 0
        while (i <= cp.length - 3) {
          total += 1
          if (core.contains(new String(cp, i, 3))) inCore += 1
          i += 1
        }
        (total, inCore)
      }
    })
    d.select(col(idCol), score(col("__t")).as("__s"))
      .filter(col("__s._1") > 0)
      .select(col(idCol), col("__s._1").as("total_grams"),
        expr("(__s._1 - __s._2) * 1000 div __s._1").as("rare_permille"))
  }

  /** URL canonicalization for web-corpus dedup — the CCNet/Common Crawl
    * ingestion step that collapses crawl-time aliases of one page into
    * one key: drop the `#fragment`, lowercase ONLY the
    * `scheme://host[:port]` prefix (paths are case-sensitive by spec),
    * strip the scheme-default port (`:80` http, `:443` https), and
    * remove `utm_*` tracking parameters (param split on `&`, relative
    * order of survivors preserved — reordering can change semantics, so
    * we don't). A pure per-row string chain, zero shuffle: regexps stay
    * in the RE2-safe discipline (no lookaround, no backrefs) so any ANSI
    * engine replays the same rules, and the param filter is an explicit
    * split/filter/rejoin rather than a regex, because a global regex
    * pass cannot delete two ADJACENT utm params (the scanner resumes
    * after the replaced region and misses the second). Scheme-less
    * strings pass through with fragment/query rules still applied. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // lowercase scheme://host[:port]; everything after it is untouched
    val prefix = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", 0)
    val lowered = concat(lower(prefix),
      substring(noFrag, length(prefix) + 1, lit(Int.MaxValue)))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?]+):443([/?]|$)", "$1$2"),
      "^(http://[^/:?]+):80([/?]|$)", "$1$2")
    val base = regexp_replace(noPort, "\\?.*", "")
    val params = filter(split(regexp_extract(noPort, "\\?(.*)", 1), "&"),
      p => length(p) > 0 && !p.startsWith("utm_"))
    when(size(params) > 0,
      concat(base, lit("?"), array_join(params, "&"))).otherwise(base)
  }

  /** Host of a [[normalizeUrl]]-normalized URL ("" when scheme-less). */
  def urlDomain(urlNorm: Column): Column =
    regexp_extract(urlNorm, "^[a-z][a-z0-9+.-]*://([^/:?]+)", 1)

  /** Distinctive terms per group — corpus-analysis keyword extraction
    * ("what does each source talk about that the corpus doesn't"): for
    * each group, the top-k tokens by EXCESS SHARE, the integer-permille
    * occurrence share within the group minus the share across the whole
    * corpus (a fixed-point reading of Monroe '08's log-odds idea: rate
    * difference instead of log-odds keeps every step integer and
    * engine-portable; negative scores never surface in a top-k over
    * k << vocab). Ties break token-asc, so the extraction is
    * deterministic.
    *
    * 100 TB shape: ONE (group, token) hash aggregation over the
    * tokenized corpus; group totals, corpus token totals, and the grand
    * total all derive from that aggregate (no second corpus pass); the
    * top-k window partitions over aggregation-bounded rows. */
  def distinctiveTerms(df: DataFrame, textCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "distinctiveTerms: k must be >= 1")
    // the (group, token) aggregate feeds FOUR consumers (group totals,
    // token totals, grand total, the scored join) — without the persist
    // each AQE query stage re-tokenizes and re-aggregates the corpus
    // (ReusedExchange does not cross stages); the persisted frame is
    // vocab-bounded, not corpus-sized
    val gt = df.select(col(groupCol).as("group"),
        explode(filter(split(lower(coalesce(col(textCol), lit(""))),
          "\\s+"), w => w =!= "")).as("token"))
      .groupBy(col("group"), col("token"))
      .agg(count(lit(1)).as("n_gt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gTot = gt.groupBy(col("group")).agg(sum(col("n_gt")).as("n_g"))
    val tTot = gt.groupBy(col("token")).agg(sum(col("n_gt")).as("n_t"))
    val grand = gt.agg(sum(col("n_gt")).as("n_all"))
    val scored = gt.join(gTot, Seq("group")).join(tTot, Seq("token"))
      .crossJoin(grand)
      .select(col("group"), col("token"), col("n_gt"),
        expr("(n_gt * 1000) div n_g - (n_t * 1000) div n_all")
          .as("excess_permille"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("excess_permille").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("group").as(groupCol),
        col("rank").cast("int").as("rank"),
        col("token"), col("n_gt"), col("excess_permille"))
  }

  /** Per-domain quality scorecard — the RefinedWeb/C4 curation step where
    * filtering decisions move from documents to WEB DOMAINS: for each
    * canonical domain ([[urlDomain]] over [[normalizeUrl]]), document and
    * token totals, exact-duplicate document count (docs whose full text
    * md5 appears more than once ANYWHERE in the corpus — cross-domain
    * mirrors count for every domain that hosts a copy), the duplicate
    * share and mean doc length as integer permille. A domain with a high
    * dup share is a mirror/boilerplate farm; a domain with tiny mean
    * length is a link farm — both get dropped wholesale, which is cheaper
    * and safer than per-document filtering of their tail.
    *
    * 100 TB shape: one (md5 → count) aggregation joined back on the
    * 16-byte hash (both sides shuffle once on the same key), then ONE
    * |domains|-bounded aggregation; null/invalid URLs group under the
    * empty domain so the scorecard always accounts for every document. */
  def domainScorecard(df: DataFrame, idCol: String, urlCol: String,
      textCol: String): DataFrame = {
    val perDoc = df.select(col(idCol),
      coalesce(urlDomain(normalizeUrl(col(urlCol))), lit(""))
        .as("domain"),
      size(tokArray(textCol)).cast("long").as("__ntok"),
      md5(coalesce(col(textCol), lit(""))).as("__h"))
    val dupCounts = perDoc.groupBy(col("__h"))
      .agg(count(lit(1)).as("__copies"))
    perDoc.join(dupCounts, Seq("__h"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(when(col("__copies") > 1, 1L).otherwise(0L))
          .as("n_dup_docs"))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        col("n_dup_docs"),
        expr("(n_dup_docs * 1000) div n_docs").as("dup_permille"),
        expr("(n_tokens * 1000) div n_docs").as("tokens_per_doc_permille"))
  }

  /** LIX readability per group (Björnsson 1968 — the readability index
    * with no syllable counting, so it is exactly computable from
    * whitespace tokens and sentence-ending punctuation in any engine):
    * LIX = W/S + 100·L/W over group TOTALS (words W, sentences S = count
    * of [.!?] characters, long words L = tokens longer than 6 chars),
    * reported ×100 as integer centi-LIX. < 30 easy, > 60 very hard —
    * a per-source complexity profile for curriculum/mixture decisions.
    * Per-row compiled kernels into ONE aggregation; S clamps to ≥ 1 so
    * punctuation-free groups stay defined. */
  def lixReadability(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val trimmed = trim(col(textCol))
    val toks = split(trimmed, "\\s+")
    val empty = length(trimmed) === 0
    val words = when(empty, 0L).otherwise(size(toks).cast("long"))
    val longWords = when(empty, 0L)
      .otherwise(size(filter(toks, w => length(w) > 6)).cast("long"))
    val sentences = length(regexp_replace(col(textCol), "[^.!?]", ""))
      .cast("long")
    df.filter(col(textCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(words).as("n_words"),
        sum(sentences).as("n_sentences"),
        sum(longWords).as("n_longwords"))
      .filter(col("n_words") > 0L)
      .select(col("group"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_longwords"),
        expr("(n_words * 100) div greatest(n_sentences, 1) " +
          "+ (n_longwords * 10000) div n_words").as("lix_centi"))
  }

  /** Chao1 vocabulary-richness estimate + Good–Turing unseen mass — the
    * "how much vocabulary have we NOT seen yet" pair that tells a corpus
    * curator whether more data keeps buying new words (complements the
    * [[StatTests.heapsFit]] growth exponent with a closed-form total):
    * Chao1 ≈ V + f1(f1−1)/(2(f2+1)) (the bias-corrected form, defined
    * even at f2 = 0; Chao 1984) where f1/f2 are singleton/doubleton
    * counts, and the Good–Turing estimate of the probability mass on
    * UNSEEN words is f1/N (Good 1953). Whitespace tokens over lowered
    * text (the [[StatTests.heapsFit]] recipe); one token-count
    * aggregation → a 1-row integer fold — milli-scaled integer outputs,
    * cross-engine exact. */
  def chao1VocabRichness(df: DataFrame, textCol: String): DataFrame = {
    df.select(explode(filter(split(lower(coalesce(col(textCol),
        lit(""))), "\\s+"), t => t =!= "")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("vocab"),
        sum("c").as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("vocab"), col("n_tokens"), col("f1"), col("f2"),
        expr("vocab * 1000 + (f1 * (f1 - 1) * 1000) div (2 * (f2 + 1))")
          .as("chao1_milli"),
        expr("(f1 * 1000) div n_tokens").as("gt_unseen_permille"))
  }

  /** Vocabulary Jaccard matrix between groups (sources): per unordered
    * group pair, the distinct-token intersection, both vocab sizes, and
    * Jaccard as integer permille — the lexical cousin of
    * [[Dedup.sourceOverlapMatrix]] (that one asks "are the DOCUMENTS
    * shared?", this one "is the LANGUAGE shared?" — a source can be
    * document-disjoint yet vocabulary-identical, which matters for
    * mixture weighting). Zero-overlap pairs are materialized (complete
    * upper triangle). Scale shape: the corpus collapses to the DISTINCT
    * (group, token) frame first, so the token-keyed self-join is
    * vocab-bounded and each token contributes at most |groups|² cells —
    * never a document-level pair space. */
  def vocabJaccardMatrix(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val tok = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(filter(split(lower(coalesce(col(textCol), lit(""))),
          "\\s+"), t => t =!= "")).as("tok"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = tok.groupBy("g").agg(count(lit(1)).as("sz"))
    val inter = tok.select(col("g").as("ga"), col("tok"))
      .join(tok.select(col("g").as("gb"), col("tok")), Seq("tok"))
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb").agg(count(lit(1)).as("n_common"))
    val cells = sizes.select(col("g").as("ga"), col("sz").as("n_a"))
      .join(sizes.select(col("g").as("gb"), col("sz").as("n_b")),
        col("ga") < col("gb"))
      .join(inter, Seq("ga", "gb"), "left")
      .select(col("ga").as("src_a"), col("gb").as("src_b"),
        col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("jaccard_permille",
        expr("(n_common * 1000) div (n_a + n_b - n_common)"))
      .localCheckpoint(true)
    tok.unpersist(false)
    cells
  }

  /** Token Lorenz curve: documents sorted by token count into `buckets`
    * equal-population buckets (shortest first), each bucket's token mass
    * and the cumulative share in permille — the concentration table
    * under the Gini scalar (q323): "the longest 10% of documents hold
    * X% of the tokens" is the number that decides length-capped sampling
    * and packing strategy. Integer-exact; the ntile runs over one
    * doc-level frame (one global sort — the q109 deciles shape),
    * deterministic via the (count, id) tie-break. */
  def tokenLorenzCurve(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "tokenLorenzCurve needs buckets >= 1")
    // scale shape: NO doc-level ntile (a partition-less window would
    // global-sort the corpus) — the corpus collapses to the
    // (length → doc count) frame first, and ntile's bucket populations
    // are derived ARITHMETICALLY from cumulative counts: equal-length
    // documents are interchangeable (identical token count), so the
    // overlap of a length's rank interval with each bucket's rank
    // window reproduces the doc-level ntile sums exactly. ntile sizing:
    // boundary b_k = k·(N div B) + min(k, N mod B).
    val lens = df.select(
      size(filter(split(lower(coalesce(col(textCol), lit(""))), "\\s+"),
        t => t =!= "")).cast("long").as("__n"))
    val counts = lens.groupBy("__n").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy().orderBy("__n")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val wBk = Window.partitionBy().orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("__t", sum("c").over(wAll))
      .withColumn("bucket", explode(sequence(lit(1), lit(buckets))))
      .withColumn("__bk",
        expr(s"bucket * (__t div $buckets) + least(cast(bucket as " +
          s"bigint), __t % $buckets)"))
      .withColumn("__bk0",
        expr(s"(bucket - 1) * (__t div $buckets) + least(cast(bucket " +
          s"- 1 as bigint), __t % $buckets)"))
      .withColumn("__ov",
        greatest(lit(0L), least(col("cum"), col("__bk")) -
          greatest(col("cum") - col("c"), col("__bk0"))))
      .groupBy("bucket")
      .agg(sum("__ov").as("n_docs"),
        sum(col("__ov") * col("__n")).as("n_tokens"))
      .filter(col("n_docs") > 0)
      .withColumn("__cum2", sum("n_tokens").over(wBk))
      .withColumn("__tot", sum("n_tokens").over(wAll))
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        expr("(__cum2 * 1000) div __tot").as("cum_permille"))
  }

  /** Burstiness of the top-`topK` tokens: the variance-to-mean ratio
    * (index of dispersion) of per-document counts, zeros included —
    * D ≈ 1 is Poisson scatter, D ≫ 1 a bursty term that piles into few
    * documents (topical/boilerplate), the distinction TF-IDF can't see
    * from totals alone. Division-cleared exact integers: with N docs,
    * S = Σc, SS = Σc², D = (N·SS − S²)/(N·S), reported milli-scaled.
    * One (doc, token) count aggregation → one vocab-bounded fold →
    * top-K; the zeros never materialize. */
  def tokenBurstiness(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, "tokenBurstiness needs topK >= 1")
    val tok = df.select(col(idCol).as("__id"),
        explode(filter(split(lower(coalesce(col(textCol), lit(""))),
          "\\s+"), t => t =!= "")).as("token"))
      .groupBy("__id", "token").agg(count(lit(1)).as("c"))
    val st = tok.groupBy("token").agg(
      sum("c").as("n_total"),
      sum(col("c") * col("c")).as("__ss"),
      count(lit(1)).as("n_docs_present"))
    st.orderBy(col("n_total").desc, col("token").asc).limit(topK)
      .crossJoin(df.agg(count(lit(1)).as("__nd")))
      .select(col("token"), col("n_total"), col("n_docs_present"),
        expr("((__nd * __ss - n_total * n_total) * 1000) " +
          "div (__nd * n_total)").as("dispersion_milli"))
  }

  /** CROSS-document repeated n-gram census — the corpus-level view the
    * within-document repetition reports (q259) and the eval-set novelty
    * check (q224) don't give: which W-token windows recur across ≥
    * `minDocs` DISTINCT documents (boilerplate, licenses, templated
    * spam — exactly the spans substring-level dedup would remove, cf.
    * Lee et al. 2021 §4). One compiled per-document window-hash kernel
    * (the q224 gram machinery), per-document dedup in-row, then ONE
    * (gram → doc-count) aggregation; the output is top-K by reach with
    * the id span as provenance. The md5 window hash is what shuffles —
    * 16 bytes per distinct (doc, gram), never the text. */
  def crossDocGramCensus(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, minDocs: Int = 2, topK: Int = 50): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    require(minDocs >= 2 && topK >= 1, "minDocs >= 2, topK >= 1")
    val grams = df.select(col(idCol).as("__id"),
      explode(array_distinct(transform(
        windowMd5Kernel(tokArray(textCol), lit(windowTokens)),
        x => lower(hex(x("g")))))).as("gram"))
    grams.groupBy("gram")
      .agg(count(lit(1)).as("n_docs"),
        min("__id").as("first_doc"), max("__id").as("last_doc"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("gram").asc)
      .limit(topK)
  }

  /** Fragment-chain candidate pairs: document A's LAST `windowTokens`
    * tokens equal document B's FIRST `windowTokens` — the signature of a
    * crawl/pagination split (one source page sharded into overlapping
    * fragments), which near-dup banding misses because the documents as
    * wholes are different. One boundary hash per document per side, one
    * equi-join on the 16-byte md5 — never content, never all-pairs.
    * Self-chains (a doc whose own head equals its tail) are excluded. */
  /** Flesch–Kincaid grade level per group (Kincaid '75), on the
    * deterministic vowel-group syllable heuristic: per document words =
    * whitespace tokens, sentences = max(1, count of [.!?]), syllables =
    * count of [aeiouy]+ runs in the lowercased text — three exact
    * integers any regex engine reproduces — then ONE aggregation per
    * group and the grade 0.39·(W/S) + 11.8·(Y/W) − 15.59 as a pinned
    * IEEE chain over the summed integers. The corpus-difficulty
    * dashboard next to LIX (q327), which needs no syllables but tracks
    * long words instead. */
  def fleschKincaid(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val perDoc = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"),
        size(filter(split(text, "\\s+"), t => t =!= "")).cast("long")
          .as("__w"),
        greatest(regexp_count(text, lit("[.!?]")), lit(1)).cast("long")
          .as("__s"),
        regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
          .as("__y"))
    perDoc.groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum("__w").as("words"), sum("__s").as("sentences"),
        sum("__y").as("syllables"))
      .filter(col("words") > 0)
      .withColumn("fk_grade",
        lit(0.39) * (col("words").cast("double") /
          col("sentences").cast("double")) +
          lit(11.8) * (col("syllables").cast("double") /
            col("words").cast("double")) - lit(15.59))
  }

  def fragmentChainPairs(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 5): DataFrame = {
    require(windowTokens >= 2, "windowTokens must be >= 2")
    val w = windowTokens
    val toks = tokArray(textCol)
    val base = df
      .select(col(idCol).cast("long").as("__id"), toks.as("__t"))
      .filter(size(col("__t")) >= w)
      .select(col("__id"),
        md5(concat_ws(" ", expr(s"slice(__t, 1, $w)"))).as("head_gram"),
        md5(concat_ws(" ",
          expr(s"slice(__t, size(__t) - ${w - 1}, $w)"))).as("tail_gram"))
    base.select(col("__id").as("id_a"), col("tail_gram").as("gram"))
      .join(base.select(col("__id").as("id_b"),
        col("head_gram").as("gram")), Seq("gram"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("gram"))
  }

  /** DEFLATE compression ratio per document (zlib level 9 over UTF-8
    * bytes) — the classic "does this text compress suspiciously well?"
    * quality gate (repetitive boilerplate compresses far below normal
    * prose; an LZ-order signal [[charEntropy]]'s order-0 statistic
    * cannot see — "abcabcabc..." has high char entropy but collapses
    * under DEFLATE). Engine-specific by nature (the exact byte count
    * depends on the zlib implementation), so correctness rides the
    * rows-only check with [[charEntropy]] (q60) as the hash-matched
    * portable twin — the q28/q75 fingerprint pattern. Per-row kernel,
    * zero shuffle; the Deflater is reused per thread, reset per row. */
  def deflateRatio(df: DataFrame, idCol: String, textCol: String,
      maxDocLen: Int = 1 << 20): DataFrame = {
    val kernel = udf((t: String) => {
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // object-level ThreadLocal: static access from the lambda, so the
      // (non-serializable) Deflater never rides the task closure
      val d = TextStats.deflaters.get()
      d.reset()
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      (bytes.length.toLong, out)
    })
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) >= 1)
      .select(col(idCol).as("id"),
        kernel(substring(col(textCol), 1, maxDocLen)).as("__k"))
      .select(col("id"), col("__k._1").as("n_bytes"),
        col("__k._2").as("deflate_bytes"),
        expr("(__k._2 * 1000) div __k._1").as("ratio_permille"))
  }
}
