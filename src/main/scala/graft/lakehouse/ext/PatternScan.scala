package graft.lakehouse.ext

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern literal scanning via an Aho–Corasick automaton
  * (Aho & Corasick, CACM 1975) — the blocklist / keyword / PII-term
  * census a curation pipeline runs over every document.
  *
  * Scale shape: the automaton builds ONCE on the driver from the
  * bounded pattern list (goto trie + BFS failure links + flattened
  * dictionary-suffix outputs), broadcasts whole, and each document is
  * scanned in a single O(len) pass that reports ALL occurrences of
  * ALL patterns — independent of pattern count. The naive alternative
  * (one `instr`/regex pass per pattern) is O(patterns × corpus) scans;
  * at 10k blocklist terms over 100 TB that is the difference between
  * one job and an impossible one. Zero shuffle until the final
  * per-document explode of the bounded hit map.
  *
  * The census ([[multiPatternHits]]) and the scrub ([[redactPatterns]])
  * both derive from ONE shared kernel, [[scanAndRedact]]: a pipeline
  * that runs the blocklist gate AND the redaction (the normal curation
  * order) pays a single O(len) corpus pass instead of two.
  *
  * Matching contract: case-insensitive via locale-independent
  * `Locale.ROOT` folding on BOTH sides (a Turkish default locale would
  * otherwise fold 'I' to dotless 'ı' and silently diverge from the
  * oracle's lower()), counting EVERY occurrence including overlapping
  * ones (the dictionary-suffix chain reports a match at every end
  * position — "aa" occurs 2× in "aaa"), which is exactly the
  * per-position count an engine-portable oracle replays. */
object PatternScan {

  /** Immutable flattened automaton: per node a sorted (char → next)
    * transition table, a failure link, and the pattern ids ending at
    * the node (dictionary-suffix chain pre-flattened at build, so the
    * scan never walks suffix links). */
  private[ext] final class Automaton(
    val transChars: Array[Array[Char]],
    val transNext: Array[Array[Int]],
    val fail: Array[Int],
    val outputs: Array[Array[Int]]) extends Serializable

  private[ext] def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "PatternScan needs a non-empty list of non-empty patterns")
    // two patterns identical after case folding would end at the same
    // node with distinct ids — both counters increment but the output
    // hit Map keeps one key silently; refuse loudly instead
    val folded = patterns.map(_.toLowerCase(Locale.ROOT))
    require(folded.distinct.size == patterns.size,
      "PatternScan: patterns must be distinct after case folding, got " +
        folded.diff(folded.distinct).distinct.mkString("dups [", ", ", "]"))
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    folded.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        node = gotoMaps(node).getOrElseUpdate(ch, {
          gotoMaps += scala.collection.mutable.HashMap.empty[Char, Int]
          ends += scala.collection.mutable.ArrayBuffer.empty[Int]
          gotoMaps.length - 1
        })
      }
      ends(node) += pi
    }
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val outputs = new Array[Array[Int]](n)
    // BFS: failure links + flattened outputs (own ends ++ fail's outputs)
    val queue = scala.collection.mutable.Queue.empty[Int]
    outputs(0) = ends(0).toArray
    gotoMaps(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outputs(u) = (ends(u) ++ outputs(fail(u))).toArray
      gotoMaps(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
        fail(v) = if (gotoMaps(f).contains(ch) && gotoMaps(f)(ch) != v)
          gotoMaps(f)(ch) else 0
        queue += v
      }
    }
    val transChars = new Array[Array[Char]](n)
    val transNext = new Array[Array[Int]](n)
    (0 until n).foreach { u =>
      val sorted = gotoMaps(u).toArray.sortBy(_._1)
      transChars(u) = sorted.map(_._1)
      transNext(u) = sorted.map(_._2)
    }
    new Automaton(transChars, transNext, fail, outputs)
  }

  @inline private def step(a: Automaton, state: Int, ch: Char): Int = {
    var s = state
    while (true) {
      val i = java.util.Arrays.binarySearch(a.transChars(s), ch)
      if (i >= 0) return a.transNext(s)(i)
      if (s == 0) return 0
      s = a.fail(s)
    }
    0 // unreachable
  }

  /** SHARED single-pass kernel: per document, ONE automaton scan
    * produces BOTH the per-pattern hit census and the coverage-based
    * redaction. One row per input document (null ids dropped):
    * `(id, hits: Map[pattern → n_hits], n_spans, n_chars_removed,
    * redacted_len, redacted_sha)`. Null text yields an empty hit map
    * and null redaction fields (nothing to scrub).
    *
    * Redaction semantics (the [[SuffixDedup.removeDuplicateSpans]]
    * interval idiom): every char covered by ANY occurrence splices out,
    * so the covered set — and the output — is independent of matching
    * discipline, which is what makes it engine-portable. The redacted
    * text is the LOWERCASE (`Locale.ROOT`) normalization — the form the
    * scan runs on — so splice positions are aligned by construction
    * even where locale-special case folding changes string length, and
    * the oracle replays with lower(text). */
  def scanAndRedact(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val auto = build(patterns)
    val pats = patterns.map(_.toLowerCase(Locale.ROOT)).toArray
    val bc = df.sparkSession.sparkContext.broadcast((auto, pats))
    val scan = udf((text: String) => {
      if (text == null)
        (Map.empty[String, Long], null.asInstanceOf[java.lang.Long],
          null.asInstanceOf[java.lang.Long], null.asInstanceOf[String])
      else {
        val (a, ps) = bc.value
        val counts = new Array[Long](ps.length)
        val t = text.toLowerCase(Locale.ROOT)
        // occurrence intervals for the splice, collected in the same pass
        val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
        val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
        var state = 0
        var i = 0
        while (i < t.length) {
          state = step(a, state, t.charAt(i))
          val out = a.outputs(state)
          var k = 0
          while (k < out.length) {
            val pi = out(k)
            counts(pi) += 1L
            starts += i - ps(pi).length + 1; ends += i + 1
            k += 1
          }
          i += 1
        }
        val hits = ps.indices.collect {
          case pi if counts(pi) > 0L => ps(pi) -> counts(pi)
        }.toMap
        // sort occurrences by start, merge into islands, splice out
        val order = starts.indices.sortBy(starts(_))
        val sb = new java.lang.StringBuilder(t.length)
        var nSpans = 0L
        var removed = 0L
        var cur = 0            // next uncopied position in the original
        var islandStart = -1   // open merged island, or -1
        var islandEnd = -1
        def closeIsland(): Unit = {
          sb.append(t, cur, islandStart)
          removed += islandEnd - islandStart
          nSpans += 1L
          cur = islandEnd
        }
        order.foreach { oi =>
          val s = starts(oi); val e = ends(oi)
          if (islandEnd < 0) { islandStart = s; islandEnd = e }
          else if (s > islandEnd) { closeIsland(); islandStart = s; islandEnd = e }
          else if (e > islandEnd) islandEnd = e
        }
        if (islandEnd >= 0) closeIsland()
        sb.append(t, cur, t.length)
        (hits, java.lang.Long.valueOf(nSpans),
          java.lang.Long.valueOf(removed), sb.toString)
      }
    })
    df.filter(col(idCol).isNotNull)
      .withColumn("__r", scan(col(textCol)))
      .select(col(idCol),
        col("__r._1").as("hits"),
        col("__r._2").as("n_spans"),
        col("__r._3").as("n_chars_removed"),
        length(col("__r._4")).cast("long").as("redacted_len"),
        substring(sha2(col("__r._4"), 256), 1, 16).as("redacted_sha"))
  }

  /** Per-document pattern hit census: one row per (document, pattern)
    * with at least one occurrence — `(id, pattern, n_hits)`. Null or
    * empty text yields no rows for that document. A view over
    * [[scanAndRedact]]'s shared pass. */
  def multiPatternHits(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    scanAndRedact(df, idCol, textCol, patterns)
      .select(col(idCol), explode(col("hits")).as(Seq("pattern", "n_hits")))

  /** Corpus-level blocklist scorecard on top of [[multiPatternHits]]:
    * per pattern, how many documents hit it and the total occurrence
    * count — the "which blocklist terms actually fire" triage frame,
    * bounded by the pattern list. */
  def patternScorecard(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    multiPatternHits(df, idCol, textCol, patterns)
      .groupBy(col("pattern"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_hits")).as("n_hits"))

  /** COVERAGE-based redaction — the PII / blocklist scrub: every char
    * covered by ANY pattern occurrence is spliced out of the document.
    * Output per doc: n_spans (merged intervals), n_chars_removed,
    * redacted_len, redacted_sha (sha-256 prefix; clean docs pass
    * through with zero counts). Null text rows are dropped (nothing to
    * scrub). A view over [[scanAndRedact]]'s shared pass. */
  def redactPatterns(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    scanAndRedact(df.filter(col(textCol).isNotNull), idCol, textCol,
        patterns)
      .select(col(idCol), col("n_spans"), col("n_chars_removed"),
        col("redacted_len"), col("redacted_sha"))
}
