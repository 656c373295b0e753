package graft.lakehouse.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.lakehouse.functions.TextNormFunctions.graft_normalize

/** Unicode hygiene for text corpora: normalization-form canonicalization
  * and per-document script profiling. Both are pure per-row kernels —
  * zero shuffle, zero exchange; at 100 TB they run at scan speed inside
  * whole-stage codegen (the normalizer is a native expression,
  * [[graft.lakehouse.functions.UnicodeNormalize]]).
  *
  * Reference scope: the reference's string cleaners
  * (`common.py:584-718` — cleanString / custom_initcap / fixUp*) assume
  * ASCII-ish input; this is the extension tier that makes that
  * assumption safe to make at corpus scale.
  */
object TextNorm {

  /** NFC-canonicalize a document frame: composed/decomposed variants of
    * the same visible text become bit-identical, so downstream exact
    * dedup, vocab lookup, and equality joins stop missing. Emits
    * before/after code-point lengths and a changed flag (the audit trail
    * a release pipeline wants: how much of the corpus was denormalized).
    */
  def normalizeDocuments(df: DataFrame, idCol: String, textCol: String,
      form: String = "NFC"): DataFrame = {
    val norm = graft_normalize(col(textCol), form)
    df.select(col(idCol),
      norm.as("text_norm"),
      length(col(textCol)).cast("long").as("len_raw"),
      length(norm).cast("long").as("len_norm"),
      (length(col(textCol)) - length(norm) =!= 0).as("changed"))
  }

  /** Count code points of `script` in `c` via regex subtraction —
    * length(s) - length(s with the script class removed). Stays inside
    * codegen'd built-ins (no UDF, no explode). */
  private def scriptCount(c: Column, javaClass: String): Column =
    length(c) - length(regexp_replace(c, javaClass, ""))

  /** Per-document Unicode script histogram + mixed-script flag.
    * Script mixing (Latin text salted with Cyrillic homoglyphs, CJK
    * fragments inside an English page) is a spam / boilerplate /
    * mis-crawl signal every corpus quality gate wants; counts are
    * integer-exact so any engine replays them. One projection, zero
    * shuffle. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val latin = scriptCount(t, "\\p{IsLatin}").cast("long")
    val cyr = scriptCount(t, "\\p{IsCyrillic}").cast("long")
    val han = scriptCount(t, "\\p{IsHan}").cast("long")
    val greek = scriptCount(t, "\\p{IsGreek}").cast("long")
    val digit = scriptCount(t, "[0-9]").cast("long")
    df.select(col(idCol),
      latin.as("latin_n"), cyr.as("cyrillic_n"), han.as("han_n"),
      greek.as("greek_n"), digit.as("digit_n"),
      // dominant letter script by count, ties broken alphabetically by
      // script name (cyrillic < greek < han < latin)
      when(greatest(latin, cyr, han, greek) === 0, lit("none"))
        .when(cyr >= greatest(greek, han, latin), lit("cyrillic"))
        .when(greek >= greatest(han, latin), lit("greek"))
        .when(han >= latin, lit("han"))
        .otherwise(lit("latin")).as("dominant_script"),
      (Seq(latin, cyr, han, greek).map(s => when(s > 0, 1).otherwise(0))
        .reduce(_ + _) >= 2).as("mixed_script"))
  }

  /** The encoding-damage classes [[mojibakeAudit]] inventories, each a
    * (name, regex) pair valid in BOTH Java regex and RE2: U+FFFD
    * replacement chars (a decoder already gave up), C1 control range
    * (almost always CP-1252 bytes mislabeled as Latin-1), the classic
    * UTF-8-read-as-Latin-1 artifacts ('Ã' + continuation-range char, or
    * the 'â€' prefix every smart-quote/dash mangles into), non-breaking
    * spaces, and raw C0 control characters. */
  val MojibakeIssues: Seq[(String, String)] = Seq(
    "replacement_char" -> "\uFFFD",
    "c1_controls" -> "[\u0080-\u009F]",
    "latin1_utf8_artifact" -> "\u00C3[\u0080-\u00BF]|\u00E2\u20AC",
    "nbsp" -> "\u00A0",
    // starts at U+0001: NUL can't travel through a SQL string literal in
    // most engines, and a NUL that survived into a VARCHAR column is
    // already flagged by the decoder upstream
    "c0_controls" -> "[\u0001-\u0008\u000B\u000C\u000E-\u001F]")

  /** Encoding-damage audit: per mojibake class, how many documents are
    * affected and how many total hits — the report that decides whether
    * a source needs re-decoding before it poisons tokenization (mojibake
    * inflates vocab and splits tokens silently; counting it is cheap,
    * discovering it after training is not). One pass: five codegen'd
    * `regexp_count` kernels per row folded into ONE aggregation, then a
    * 5-row unpivot — zero joins, zero extra shuffles, scan-speed at
    * 100 TB. Deterministic integer counts; portable (every pattern is
    * valid RE2, so any engine replays it). */
  def mojibakeAudit(df: DataFrame, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val aggs = MojibakeIssues.flatMap { case (name, re) =>
      val cnt = regexp_count(t, lit(re))
      Seq(sum(when(cnt > 0, 1L).otherwise(0L)).as(s"__d_$name"),
        sum(cnt.cast("long")).as(s"__h_$name"))
    }
    val stacked = MojibakeIssues.map { case (name, _) =>
      s"'$name', __d_$name, __h_$name"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${MojibakeIssues.size}, $stacked) " +
        "AS (issue, n_docs, n_hits)"))
  }
}
