package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSuite {
  import spark.implicits._

  test("tokenCount: whitespace + blank handling") {
    val df = Seq("a b  c", "", "   ", "one").toDF("t")
    val out = df.select(TextStats.tokenCount(col("t"))).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(3, 0, 0, 1))
  }

  test("bpeishTokenCount: letters/digits/punct split") {
    val df = Seq("hello world42!", "a-b").toDF("t")
    val out = df.select(TextStats.bpeishTokenCount(col("t"))).collect().map(_.getInt(0))
    // hello|world|42|!  and  a|-|b
    assert(out.toSeq == Seq(4, 3))
  }

  test("quality metrics: hand-computed example") {
    val text = "the cat sat on a mat with 1 hat!"
    val df = Seq(text).toDF("t")
    val m = TextStats.withQualityMetrics(df, "t").head()
    assert(m.getAs[Long]("n_chars") == text.length)
    assert(m.getAs[Long]("n_tokens") == 9)
    assert(math.abs(m.getAs[Double]("punct_ratio") - 1.0 / text.length) < 1e-12)
    // stopwords: the, on, a, with = 4 of 9
    assert(math.abs(m.getAs[Double]("stopword_ratio") - 4.0 / 9.0) < 1e-12)
    val score = m.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
  }

  test("langId: stopword profiles + CJK + und") {
    assert(TextStats.langIdOf("the cat and the hat are on this mat") == "en")
    assert(TextStats.langIdOf("el perro y la casa en los campos") == "es")
    assert(TextStats.langIdOf("le chat et les maisons dans la rue qui est") == "fr")
    assert(TextStats.langIdOf("der hund und die katze ist nicht im haus") == "de")
    assert(TextStats.langIdOf("你好世界你好") == "zh")
    assert(TextStats.langIdOf("zzz qqq xxx") == "und")
    assert(TextStats.langIdOf("") == "und")
    assert(TextStats.langIdOf(null) == "und")
  }

  test("winnowing fingerprint: deterministic, edit-robust, order-insensitive") {
    val a = TextStats.winnowingFingerprint("the quick brown fox jumps over the lazy dog")
    val a2 = TextStats.winnowingFingerprint("the quick brown fox jumps over the lazy dog")
    val b = TextStats.winnowingFingerprint("the quick brown fox jumps over the lazy cat")
    val c = TextStats.winnowingFingerprint("entirely different content here folks")
    assert(a.toSeq == a2.toSeq)
    val overlapB = a.intersect(b).length.toDouble / a.length
    val overlapC = a.intersect(c).length.toDouble / math.max(a.length, 1)
    assert(overlapB > 0.5, s"near-dup overlap $overlapB")
    assert(overlapC < 0.2, s"unrelated overlap $overlapC")
    assert(TextStats.winnowingFingerprint(null).isEmpty)
    assert(TextStats.winnowingFingerprint("").isEmpty)
  }

  test("contentFingerprint: whitespace/case-insensitive equality") {
    val df = Seq(("A  b\tC", "a b c"), ("x", "y")).toDF("p", "q")
    val out = df.select(
      (TextStats.contentFingerprint(col("p")) ===
        TextStats.contentFingerprint(col("q"))).as("eq")).collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, false))
  }

  test("scrubPII masks urls, emails, phone runs; leaves prose alone") {
    import spark.implicits._
    val df = Seq(
      "mail me at jo.doe+spam@sub.example.org thanks",
      "see https://a.example.com/path?q=1 for details",
      "call +1 555-123-4567 now",
      "just ordinary text with number 42").toDF("t")
    val out = df.select(TextStats.scrubPII(col("t")).as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail me at [EMAIL] thanks", out(0))
    assert(out(1) == "see [URL] for details", out(1))
    assert(out(2) == "call [PHONE] now", out(2))
    assert(out(3) == "just ordinary text with number 42")
  }

  test("bm25TopK: term-matching docs rank by the standard formula") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark"),          // high tf for 'spark'
      (2L, "spark flink beam"),           // one hit, short doc
      (3L, "completely unrelated words"), // no hits -> absent
      (4L, "spark " + ("filler " * 50).trim)) // one hit, long doc
      .toDF("doc_id", "text")
    val out = TextStats.bm25TopK(docs, "doc_id", "text", "spark", k = 10)
      .collect()
    val ids = out.sortBy(_.getInt(1)).map(_.getLong(0)).toSeq
    assert(!ids.contains(3L))
    assert(ids.head == 1L, s"tf-heavy doc must rank first: $ids")
    // short doc with one hit beats long doc with one hit (length norm)
    assert(ids.indexOf(2L) < ids.indexOf(4L))
    // manual check of doc 2's score: tf=1, df=3, N=4, dl=3
    val dls = Seq(3.0, 3.0, 3.0, 51.0)
    val avgdl = dls.sum / 4
    val idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
    val expected = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 3.0 / avgdl))
    val got = out.find(_.getLong(0) == 2L).get.getDouble(2)
    assert(math.abs(got - expected) < 1e-9, s"$got vs $expected")
  }

  test("tfidfTopTerms: rare terms outrank common ones, k rows per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared shared rareword"),
      (2L, "shared another"),
      (3L, "shared third")).toDF("doc_id", "text")
    val out = TextStats.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    assert(out.count(_.getLong(0) == 1L) == 2)
    val d1 = out.filter(_.getLong(0) == 1L)
    // "rareword" (df=1) must beat "shared" (df=3) despite tf 1 vs 2:
    // 1*(ln(4/2)+1) = 1.69 > 2*(ln(4/4)+1) = 2.0? No — tf wins here; verify
    // the actual ordering is by the formula, deterministically:
    val byTerm = d1.map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(byTerm.keySet == Set("shared", "rareword"))
    assert(math.abs(byTerm("shared") - 2.0 * (math.log(4.0 / 4.0) + 1.0)) < 1e-9)
    assert(math.abs(byTerm("rareword") - (math.log(4.0 / 2.0) + 1.0)) < 1e-9)
    assert(d1.head.getString(1) == "shared") // 2.0 > 1.693
  }

  test("repetitionMetrics: duplicate-line and duplicate-char fractions") {
    import spark.implicits._
    val docs = Seq(
      // 4 non-empty lines, "dup" twice: dup_line_frac = 1 - 3/4;
      // chars in repeated lines = 2*3 of total 3+3+5+4 = 15
      (1L, "dup\ndup\nhello\n\nmore"),
      (2L, "a\nb\nc") // no repetition
    ).toDF("doc_id", "text")
    val m = TextStats.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val d1 = m(0)
    assert(d1.getAs[Long]("n_lines") == 4L)
    assert(d1.getAs[Long]("distinct_lines") == 3L)
    assert(math.abs(d1.getAs[Double]("dup_line_frac") - 0.25) < 1e-12)
    assert(math.abs(d1.getAs[Double]("dup_char_frac") - 6.0 / 15.0) < 1e-12)
    assert(m(1).getAs[Double]("dup_line_frac") == 0.0)
    assert(m(1).getAs[Double]("dup_char_frac") == 0.0)
  }

  test("oovRate: tokens outside the top-k vocab are counted, ties broken by token") {
    val df = Seq(
      (1L, "a a a b b zz"),   // vocab(2) = {a, b}: 1 OOV of 6
      (2L, "a b b qq qq"),    // qq freq 2 ties b; 'b' < 'qq' keeps b
      (3L, "a a a a"))        // all in-vocab
      .toDF("doc_id", "text")
    // corpus freqs: a=8, b=4, qq=2, zz=1 -> top-2 vocab {a, b}
    val out = TextStats.oovRate(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("total_tokens"), r.getAs[Long]("oov_tokens"))).toMap
    assert(out == Map(1L -> (6L, 1L), 2L -> (5L, 2L), 3L -> (4L, 0L)))
  }

  test("portableFingerprints: near-dup docs share fingerprints, unrelated don't") {
    // fixture plants doc 8 ~= doc 12 (98.5% shingle overlap)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id").isin(0L, 8L, 12L))
    val fps = TextStats.portableFingerprints(docs, "doc_id", "text")
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    def jac(a: Set[Long], b: Set[Long]): Double =
      (a & b).size.toDouble / (a | b).size
    assert(jac(fps(8L), fps(12L)) > 0.8,
      s"planted near-dups diverge: ${jac(fps(8L), fps(12L))}")
    assert(jac(fps(8L), fps(0L)) < 0.2,
      s"unrelated docs collide: ${jac(fps(8L), fps(0L))}")
  }

  test("dropBoilerplateLines: corpus-wide frequent lines vanish, order " +
      "and unique lines survive, emptied docs keep an empty row") {
    import spark.implicits._
    val df = Seq(
      (1L, "unique one\nCOOKIE BANNER\nunique two"),
      (2L, "COOKIE BANNER\nother text"),
      (3L, "  COOKIE BANNER  \nthird body"), // trim-matches the banner
      (4L, "COOKIE BANNER")) // reduced to nothing
      .toDF("doc_id", "text")
    val out = TextStats.dropBoilerplateLines(df, "doc_id", "text",
        maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique one\nunique two", out(1L))
    assert(out(2L) == "other text")
    assert(out(3L) == "third body")
    assert(out(4L) == "", "emptied doc must keep an empty-string row")
    // below the threshold nothing is dropped
    val loose = TextStats.dropBoilerplateLines(df, "doc_id", "text",
        maxDocFreq = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(loose(1L) == "unique one\nCOOKIE BANNER\nunique two")
  }

  test("duplicatedSpans: shared >=W-token substring found in every copy, " +
      "maximal merged spans, unique text untouched") {
    val shared = (1 to 6).map(i => s"dup$i").mkString(" ") // 6 shared tokens
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"$shared tail1 tail2 tail3 tail4"),
      (3L, "all unique words nothing repeats here at all ok")).toDF("id", "t")
    val spans = TextStats.duplicatedSpans(docs, "id", "t", windowTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: shared occupies tokens 3..8 -> duplicated 4-windows start at
    // 3,4,5 -> merged span [3, 9); doc 2: tokens 1..6 -> [1, 7)
    assert(spans == Set((1L, 3L, 9L), (2L, 1L, 7L)), spans)
    // within-document repetition also counts: the same window at two
    // positions of ONE doc is a duplicate
    val self = Seq((9L, "x1 x2 x3 x4 mid x1 x2 x3 x4")).toDF("id", "t")
    val s2 = TextStats.duplicatedSpans(self, "id", "t", windowTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(s2 == Set((9L, 1L, 5L), (9L, 6L, 10L)), s2)
  }

  test("stripDuplicatedSpans: spanned tokens removed, short and unique " +
      "docs pass through normalized, all-duplicate docs come back empty") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"keep1   keep2 $shared keep3"), // extra whitespace normalizes
      (2L, s"$shared"),                     // all duplication -> empty
      (3L, "tiny doc"),                     // shorter than one window
      (4L, "totally unique text that repeats nowhere else at all")
    ).toDF("id", "t")
    val out = TextStats.stripDuplicatedSpans(docs, "id", "t",
        windowTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "keep1 keep2 keep3", out(1L))
    assert(out(2L) == "", out(2L))
    assert(out(3L) == "tiny doc")
    assert(out(4L) == "totally unique text that repeats nowhere else at all")
    assert(out.size == 4)
  }

  test("dedupParagraphs: keep-first across docs, separators survive, " +
      "emptied docs persist") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\n\nshared para\n\nbeta"),
      (2L, "shared para\n\ngamma"), // loses its copy of "shared para"
      (3L, "shared para"),          // emptied entirely
      (4L, "  shared para  \n\ndelta") // trimmed-key match also drops
    ).toDF("doc_id", "text")
    val out = TextStats.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha\n\nshared para\n\nbeta"),
      (2L, "gamma"),
      (3L, ""),
      (4L, "delta")))
    // whitespace-only blocks are separators, never deduped away
    val ws = Seq((1L, "a\n\n\n\nb"), (2L, "c\n\n\n\nd")).toDF("doc_id", "text")
    val kept = TextStats.dedupParagraphs(ws, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(kept == Seq((1L, "a\n\n\n\nb"), (2L, "c\n\n\n\nd")))
  }

  test("corpusReport: one-row card with exact counts") {
    val df = Seq(
      (1L, "a b c", "en", "s1"),
      (2L, "a b c", "en", "s2"),       // exact dup of doc 1
      (3L, "d e", "fr", "s1"),
      (4L, null.asInstanceOf[String], "en", "s3")
    ).toDF("doc_id", "text", "lang", "source")
    val r = TextStats.corpusReport(df, "doc_id", "text", "lang", "source").head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_null_text") == 1L)
    assert(r.getAs[Long]("n_tokens") == 8L)
    assert(r.getAs[Long]("n_chars") == 13L)
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[Long]("n_sources") == 3L)
    assert(r.getAs[Long]("exact_dup_docs") == 1L)
    assert(r.getAs[Long]("max_doc_tokens") == 3L)
    assert(r.getAs[Long]("min_doc_tokens") == 0L)
    assert(r.getAs[Long]("mean_tokens_permille") == 2000L)
  }

  test("ngramNovelty: seen text scores 0, unseen 1000, overlap in " +
      "between, short docs report NULL permille") {
    val ref = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val nw = Seq(
      (1L, "a b c d e f g h"),       // every window seen -> 0
      (2L, "p q r s t u"),           // nothing seen -> 1000
      (3L, "a b c d e x y z w"),     // 1 of 5 distinct windows seen
      (4L, "too short")              // < w tokens -> 0 grams, NULL
    ).toDF("doc_id", "text")
    val out = TextStats.ngramNovelty(nw, ref, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_grams") == 4L &&
      out(0).getAs[Long]("n_novel") == 0L &&
      out(0).getAs[Long]("novelty_permille") == 0L)
    assert(out(1).getAs[Long]("novelty_permille") == 1000L)
    assert(out(2).getAs[Long]("n_grams") == 5L &&
      out(2).getAs[Long]("n_novel") == 4L &&
      out(2).getAs[Long]("novelty_permille") == 800L)
    assert(out(3).getAs[Long]("n_grams") == 0L && out(3).isNullAt(3))
  }

  test("langSegments: per-paragraph language, token-weighted dominant, " +
      "mixed flag; blank paragraphs and empty docs drop") {
    val en = "the cat is on the mat and it is that"
    val es = "el que de la los y en una por con"
    val df = Seq(
      (1L, s"$en\n\n$es\n\n$es extra"),   // es outweighs en by tokens
      (2L, en),
      (3L, s"$en\n\n \n\nxyzzy plugh"),   // blank para drops; und para
      (4L, ""),                            // no paragraphs -> not reported
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextStats.langSegments(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_paras") == 3L &&
      out(0).getAs[Long]("n_langs") == 2L &&
      out(0).getAs[String]("dominant_lang") == "es" &&
      out(0).getAs[Boolean]("mixed_lang"))
    assert(out(1).getAs[Long]("n_paras") == 1L &&
      out(1).getAs[String]("dominant_lang") == "en" &&
      !out(1).getAs[Boolean]("mixed_lang"))
    assert(out(2).getAs[Long]("n_paras") == 2L &&
      out(2).getAs[Long]("n_langs") == 2L &&
      out(2).getAs[String]("dominant_lang") == "en")
  }

  test("tokenFertility: punctuation-heavy groups fragment more; " +
      "empty group reports NULL permille") {
    val df = Seq(
      ("plain", "three plain words"),
      ("plain", "four more plain words"),
      ("punct", "v2.0-beta! x+y"),
      ("empty", "   ")
    ).toDF("g", "text")
    val out = TextStats.tokenFertility(df, "text", "g").orderBy("g").collect()
    val empty = out(0)
    assert(empty.getAs[Long]("ws_tokens") == 0L && empty.isNullAt(4))
    val plain = out(1)
    assert(plain.getAs[Long]("ws_tokens") == 7L &&
      plain.getAs[Long]("bpeish_tokens") == 7L &&
      plain.getAs[Long]("fertility_permille") == 1000L)
    val punct = out(2)
    // v|2|.|0|-|beta|! = 7, x|+|y = 3 -> 10 bpeish over 2 ws tokens
    assert(punct.getAs[Long]("ws_tokens") == 2L &&
      punct.getAs[Long]("bpeish_tokens") == 10L &&
      punct.getAs[Long]("fertility_permille") == 5000L)
  }

  test("htmlToText: blocks drop, tags are word boundaries, entities " +
      "decode once, malformed markup degrades instead of failing") {
    import spark.implicits._
    def clean(html: String): String =
      Seq(Tuple1(html)).toDF("h")
        .select(TextStats.htmlToText(col("h"))).head().getString(0)
    assert(clean("<html><head><title>T</title>" +
      "<script>if (a < b) { alert(\"x\"); }</script>" +
      "<style>p { color: red; }</style></head>" +
      "<body><!-- hidden --><p>Hello</p><p>world</p></body></html>")
      == "T Hello world")
    // tags separate words; entities decode; &amp;lt; decodes ONCE to &lt;
    assert(clean("<p>a</p><p>b</p>") == "a b")
    assert(clean("1 &lt; 2 &amp;&amp; 3 &gt; 2, &quot;q&#39;s&quot;," +
      " x&nbsp;y, literal &amp;lt;") == "1 < 2 && 3 > 2, \"q's\", x y," +
      " literal &lt;")
    // SCRIPT/STYLE match case-insensitively and across newlines
    assert(clean("<SCRIPT>\nvar a = 1;\n</SCRIPT>ok") == "ok")
    // malformed: unclosed tag swallows to the next '>' or survives as text
    assert(clean("before <unclosed after") == "before <unclosed after")
    assert(clean("  collapse \t\r\n   runs  ") == "collapse runs")
  }

  test("withHtmlText appends the cleaned column; null html cleans to " +
      "empty") {
    import spark.implicits._
    val out = TextStats.withHtmlText(
      Seq((1L, "<b>bold</b>"), (2L, null.asInstanceOf[String]))
        .toDF("id", "h"), "h")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "bold", 2L -> ""))
  }
  test("rareGramScore: hand-computed core membership and permille") {
    val df = Seq((1L, "aaaa"), (2L, "aab"), (3L, "xy"))
      .toDF("doc_id", "text")
    // corpus trigrams: aaa x2 (doc 1), aab x1 (doc 2); topK=1 -> {aaa};
    // doc 3 has no trigram and is dropped
    val out = TextStats.rareGramScore(df, "doc_id", "text", topK = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 0L), (2L, 1L, 1000L)))
  }

  test("rareGramScore: normalization collapses case/whitespace; topK tie " +
      "breaks by gram ascending") {
    // "AB  C" normalizes to "ab c": grams {"ab ", "b c"} tie at count 1;
    // the deterministic cut keeps "ab " (gram asc), so rare = 500
    val df = Seq((1L, "AB  C")).toDF("doc_id", "text")
    val out = TextStats.rareGramScore(df, "doc_id", "text", topK = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 500L)))
  }

  test("rareGramScore: grams step over code points, not UTF-16 units") {
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq((1L, emoji + "ab")).toDF("doc_id", "text")
    // 3 code points -> exactly ONE trigram (5 UTF-16 units would give 3
    // broken ones); with topK=8 it lands in the core -> rare 0
    val out = TextStats.rareGramScore(df, "doc_id", "text", topK = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0L)))
  }

  test("normalizeUrl: rule chain (fragment, prefix case, default ports, " +
      "utm removal incl. adjacent params, order preserved)") {
    val cases = Seq(
      "HTTPS://Ex.COM:443/A/B?utm_a=1&utm_b=2&x=3#f"
        -> "https://ex.com/A/B?x=3",
      "http://EX.com:80/" -> "http://ex.com/",
      "http://ex.com:8080/p" -> "http://ex.com:8080/p",
      "https://ex.com:443" -> "https://ex.com",
      "http://ex.com/p?utm_only=1" -> "http://ex.com/p",
      "no-scheme/Path#frag" -> "no-scheme/Path",
      "http://ex.com/p?a=1&utm_x=2&b=2" -> "http://ex.com/p?a=1&b=2")
    val df = cases.zipWithIndex
      .map { case ((in, want), i) => (i.toLong, in, want) }
      .toDF("id", "url", "want")
    val bad = df.select(col("want"),
        TextStats.normalizeUrl(col("url")).as("got"), col("url"))
      .collect().filter(r => r.getString(0) != r.getString(1))
      .map(r => s"${r.getString(2)}: got ${r.getString(1)}, " +
        s"want ${r.getString(0)}")
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("urlDomain extracts the host of a normalized url") {
    val df = Seq((1L, "https://www.ex.com/p?a=1"), (2L, "relative/path"))
      .toDF("id", "u")
    val out = df.select(col("id"), TextStats.urlDomain(col("u")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "www.ex.com", 2L -> ""))
  }
  test("topNgramRepetition: hand-computed argmax, deterministic " +
      "tie-break, overlap mass can exceed 1000, short docs emit no row") {
    // doc 1: "go go go stop" -> bigrams: "go go" x2, "go stop" x1;
    //   trigrams: "go go go", "go go stop"; len = 13
    // doc 2: one token -> no bigram/trigram rows at all
    // doc 3: "a b a b" -> bigrams "a b" x2, "b a" x1; tie-free;
    //   trigrams "a b a", "b a b" -> tie breaks to "a b a"
    val df = Seq((1L, "go go go stop"), (2L, "one"), (3L, "a b a b"))
      .toDF("doc_id", "text")
    val out = TextStats.topNgramRepetition(df, "doc_id", "text",
      ns = Seq(2, 3)).orderBy("doc_id", "n").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 2, "go go", 2L, (5L * 2 * 1000) / 13),
      (1L, 3, "go go go", 1L, (8L * 1000) / 13),
      (3L, 2, "a b", 2L, (3L * 2 * 1000) / 7),
      (3L, 3, "a b a", 1L, (5L * 1000) / 7)), out.mkString(","))
    // a fully degenerate doc overshoots 1000 permille (overlap mass)
    val degen = Seq((9L, "x x x x x x")).toDF("doc_id", "text")
    val d = TextStats.topNgramRepetition(degen, "doc_id", "text", Seq(2))
      .collect().head
    assert(d.getString(2) == "x x" && d.getLong(3) == 5L &&
      d.getLong(4) == (3L * 5 * 1000) / 11 && d.getLong(4) > 1000)
    intercept[IllegalArgumentException] {
      TextStats.topNgramRepetition(df, "doc_id", "text", Seq(2, 2))
    }
  }

  test("domainScorecard: per-domain totals, cross-domain mirrors count " +
      "as dups on both sides, null URLs bucket under the empty domain") {
    val docs = Seq(
      (1L, "https://A.com/x", "one two three"),
      (2L, "https://a.com:443/y", "one two three"), // same domain + dup text
      (3L, "http://B.org/z", "one two three"),      // cross-domain mirror
      (4L, "http://B.org/w", "unique words here and more"),
      (5L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("doc_id", "url", "text")
    val out = TextStats.domainScorecard(docs, "doc_id", "url", "text")
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("", 1L, 0L, 0L, 0L, 0L),
      ("a.com", 2L, 6L, 2L, 1000L, 3000L),
      ("b.org", 2L, 8L, 1L, 500L, 4000L)), out.mkString(","))
  }

  test("corpusStatsTableUpdate: batch folds equal the one-shot card in " +
      "any order; new sources join; null text counts as zero tokens") {
    import graft.lakehouse.{Catalog, TableIO}
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("cstats_test").toString,
      "ws_cs", "lh_cs").lakehouses.head
    val docs = Seq((1L, "a b c", "web"), (2L, null.asInstanceOf[String], "web"),
      (3L, "d", "web"), (4L, "e f", "books"), (5L, "g h i j", "books"),
      (6L, "k", "code")).toDF("doc_id", "text", "source")
    def card(name: String, batches: Seq[org.apache.spark.sql.DataFrame]) = {
      TableIO.dropTable(spark, lh, name)
      batches.foreach(b => TextStats.corpusStatsTableUpdate(
        spark, lh, name, b, "text", "source"))
      TableIO.selectTable(spark, lh, name).orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    }
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 =!= 0)
    val a = card("cs_a", Seq(even, odd))
    val b = card("cs_b", Seq(odd, even))
    val one = card("cs_c", Seq(docs))
    assert(a == one && b == one, s"a=$a b=$b one=$one")
    // the "web" row: 3 docs, 1 null text (0 tokens -> min 0), 4 tokens
    val web = one.find(_._1 == "web").get
    assert(web == (("web", 3L, 1L, 4L, 6L, 3L, 0L)), web.toString)
    Seq("cs_a", "cs_b", "cs_c").foreach(TableIO.dropTable(spark, lh, _))
  }

  test("distinctiveTerms: excess-share argmax per group, deterministic " +
      "tie-break, output keeps the caller's group column name") {
    // corpus: g1 says "apple" a lot, g2 says "banana"; "the" is common
    val df = Seq(
      ("g1", "the apple apple apple"),
      ("g2", "the banana banana banana"))
      .toDF("src", "text")
    val out = TextStats.distinctiveTerms(df, "text", "src", k = 2)
      .orderBy("src", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // per group: 4 tokens; apple 3/4=750 in g1, 3/8=375 corpus -> 375
    assert(out.toSeq == Seq(
      ("g1", 1, "apple", 3L, 750L - 375L),
      ("g1", 2, "the", 1L, 250L - 250L),
      ("g2", 1, "banana", 3L, 750L - 375L),
      ("g2", 2, "the", 1L, 250L - 250L)), out.mkString(","))
  }


  test("streamCorpusStats: micro-batch folds equal the one-shot card; " +
      "a replayed batch id is skipped, never double-counted") {
    import graft.lakehouse.{Catalog, TableIO}
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("cstats_stream").toString,
      "ws_css", "lh_css").lakehouses.head
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = TextStats.streamCorpusStats(
      mem.toDF().toDF("doc_id", "text", "source"), spark, lh,
      "cs_stream", "text", "source", appId = Some("css_test"))
    try {
      mem.addData((1L, "a b c", "web"), (2L, "d", "web"))
      q.processAllAvailable()
      mem.addData((3L, "e f", "books"), (4L, null, "web"))
      q.processAllAvailable()
      val got = TableIO.selectTable(spark, lh, "cs_stream")
        .orderBy("source").collect().map(_.toSeq)
      val one = Seq((1L, "a b c", "web"), (2L, "d", "web"),
        (3L, "e f", "books"), (4L, null.asInstanceOf[String], "web"))
        .toDF("doc_id", "text", "source")
      TableIO.dropTable(spark, lh, "cs_one")
      TextStats.corpusStatsTableUpdate(spark, lh, "cs_one", one,
        "text", "source")
      val expect = TableIO.selectTable(spark, lh, "cs_one")
        .orderBy("source").collect().map(_.toSeq)
      assert(got.toSeq == expect.toSeq, s"stream=$got batch=$expect")
    } finally q.stop()
    // crash-replay: folding an already-committed batch id is a no-op
    val before = TableIO.selectTable(spark, lh, "cs_stream").collect()
      .map(_.toSeq).toSeq
    val replayed = TextStats.foldCorpusStatsExactlyOnce(spark, lh,
      "cs_stream",
      Seq((9L, "x y z", "web")).toDF("doc_id", "text", "source"),
      "text", "source", Some("css_test"), batchId = 0L)
    assert(!replayed, "batch 0 is already committed; fold must skip")
    val after = TableIO.selectTable(spark, lh, "cs_stream").collect()
      .map(_.toSeq).toSeq
    assert(before == after)
  }

  test("lixReadability: hand arithmetic, punctuation-free group clamps " +
    "sentences, empty-only group dropped") {
    import spark.implicits._
    val df = Seq(
      ("a", "The elephant wandered. It was gigantic."),
      ("b", "no stops here"),
      ("c", "   ")).toDF("src", "text")
    val got = TextStats.lixReadability(df, "text", "src")
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_sentences"), r.getAs[Long]("n_longwords"),
        r.getAs[Long]("lix_centi")))
    // a: 6 words, 2 sentences, 3 long ("elephant","wandered.","gigantic.")
    //    -> 600/2 + 30000/6 = 5300
    // b: 3 words, 0 sentences (clamped to 1), 0 long -> 300
    // c: zero words -> dropped
    assert(got.toSeq == Seq(("a", 6L, 2L, 3L, 5300L), ("b", 3L, 0L, 0L, 300L)))
  }

  test("chao1VocabRichness: hand-checked singleton/doubleton fold") {
    import spark.implicits._
    // tokens: a a b c -> V=3, N=4, f1=2 (b,c), f2=1 (a)
    // chao1_milli = 3000 + 2*1*1000 div 4 = 3500; gt = 2000 div 4 = 500
    val docs = Seq("a a b", "c", null).toDF("text")
    val r = TextStats.chao1VocabRichness(docs, "text").head()
    assert(r.getAs[Long]("vocab") == 3L &&
      r.getAs[Long]("n_tokens") == 4L &&
      r.getAs[Long]("f1") == 2L && r.getAs[Long]("f2") == 1L &&
      r.getAs[Long]("chao1_milli") == 3500L &&
      r.getAs[Long]("gt_unseen_permille") == 500L)
    // no doubletons: bias-corrected form stays defined (f2+1)
    val nof2 = Seq("x y z").toDF("text")
    assert(TextStats.chao1VocabRichness(nof2, "text").head()
      .getAs[Long]("chao1_milli") == 3000L + 3L * 2L * 1000L / 2L)
  }

  test("vocabJaccardMatrix: hand-checked overlap, zero cells " +
    "materialized, duplicates collapse") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "a b c"), ("s1", "a a"),            // s1 vocab {a,b,c}
      ("s2", "b c d"),                           // s2 vocab {b,c,d}
      ("s3", "x y")                              // s3 vocab {x,y}
    ).toDF("source", "text")
    val got = TextStats.vocabJaccardMatrix(docs, "text", "source")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("s1", "s2", 3L, 3L, 2L, 500L),   // {b,c} / {a,b,c,d} = 2/4
      ("s1", "s3", 3L, 2L, 0L, 0L),
      ("s2", "s3", 3L, 2L, 0L, 0L)))
  }

  test("tokenLorenzCurve: hand-checked cumulative shares over 1..10 " +
    "token docs") {
    import spark.implicits._
    val docs = (1 to 10).map(n => (n.toLong, Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextStats.tokenLorenzCurve(docs, "doc_id", "text")
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10 && got.forall(_._2 == 1L))
    assert(got.map(_._3).toSeq == (1L to 10L).toSeq,
      "shortest docs land in the first buckets")
    // cumulative: k(k+1)/2 of 55, in permille (integer div)
    assert(got.map(_._4).toSeq ==
      (1 to 10).map(k => k.toLong * (k + 1) / 2 * 1000 / 55).toSeq)
    assert(got.last._4 == 1000L)
  }

  test("tokenBurstiness: bursty token scores above spread-out token, " +
    "zeros counted via total doc count") {
    import spark.implicits._
    // 'a' piles 2 occurrences into one of three docs; 'b' spreads 1x1
    val docs = Seq((1L, "a a"), (2L, ""), (3L, "b")).toDF("doc_id", "text")
    val got = TextStats.tokenBurstiness(docs, "doc_id", "text", topK = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // a: N=3, S=2, SS=4 -> (12-4)*1000 div 6 = 1333
    assert(got("a") == (2L, 1L, 1333L))
    // b: N=3, S=1, SS=1 -> (3-1)*1000 div 3 = 666
    assert(got("b") == (1L, 1L, 666L))
  }

  test("crossDocGramCensus: shared 5-gram surfaces with its doc reach, " +
    "within-doc repeats collapse, unique docs absent") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, shared),
      (2L, "intro " + shared + " outro"),
      // doc 3 repeats the shared gram TWICE -> still one (doc, gram)
      (3L, shared + " and " + shared),
      (4L, "one two three four five")).toDF("doc_id", "text")
    val got = TextStats.crossDocGramCensus(docs, "doc_id", "text",
      windowTokens = 5, minDocs = 3, topK = 10).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(shared.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(got.exists(r => r.getString(0) == hex &&
      r.getAs[Long]("n_docs") == 3L &&
      r.getAs[Long]("first_doc") == 1L &&
      r.getAs[Long]("last_doc") == 3L), got.mkString(","))
    // nothing else reaches 3 docs
    assert(got.count(_.getAs[Long]("n_docs") >= 3L) == 1)
  }

  test("fleschKincaid: hand-counted words/sentences/vowel groups, " +
    "sentence floor of 1, empty groups dropped") {
    import spark.implicits._
    // 5 words, 2 sentence marks, 5 vowel groups
    val docs = Seq(("en", "The cat sat. It ran!"), ("zz", ""))
      .toDF("lang", "text")
    val got = TextStats.fleschKincaid(docs, "text", "lang")
      .orderBy("grp").collect()
    val en = got.find(_.getString(0) == "en").get
    assert(en.getAs[Long]("words") == 5L &&
      en.getAs[Long]("sentences") == 2L &&
      en.getAs[Long]("syllables") == 5L, en.toString)
    val grade = 0.39 * (5.0 / 2) + 11.8 * (5.0 / 5) - 15.59
    assert(math.abs(en.getAs[Double]("fk_grade") - grade) < 1e-12)
    // the empty doc has 0 words -> its group drops (sentences floor to
    // 1 but the words>0 filter removes it)
    assert(!got.exists(_.getString(0) == "zz"))
  }

  test("fragmentChainPairs: tail-head splice found, self-chains and " +
    "short docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog"),
      // doc 2 starts with doc 1's last five tokens: a chain
      (2L, "jumps over a lazy dog and then runs away"),
      (3L, "completely unrelated text with enough tokens here"),
      // doc 4: head == tail of ITSELF (5 tokens): must not self-pair
      (4L, "alpha beta gamma delta epsilon"),
      (5L, "tiny doc")).toDF("doc_id", "text")
    val got = TextStats.fragmentChainPairs(docs, "doc_id", "text",
      windowTokens = 5).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
    assert(got == Seq((1L, 2L)), got.mkString(","))
  }

  test("deflateRatio: repetitive text compresses far below prose; " +
      "counts are positive and ratio is exact integer permille") {
    import spark.implicits._
    val prose = "The five boxing wizards jump quickly over a lazy " +
      "brown dog while seventeen quirky gnomes vexed by fog " +
      "juggle zinc pots and weave hemp rope near the old pier."
    val docs = Seq((1L, "ab" * 400), (2L, prose * 3))
      .toDF("doc_id", "text")
    val got = TextStats.deflateRatio(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (nRep, dRep, rRep) = got(1L)
    val (nPr, dPr, rPr) = got(2L)
    assert(nRep == 800L && dRep > 0L && rRep == dRep * 1000 / nRep)
    assert(nPr > 0L && dPr > 0L && rPr == dPr * 1000 / nPr)
    assert(rRep < rPr / 4,
      s"repetitive permille $rRep should be far below prose $rPr")
  }
}
