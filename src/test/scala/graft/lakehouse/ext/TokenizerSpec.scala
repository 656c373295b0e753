package graft.lakehouse.ext

import graft.lakehouse.SparkSuite

/** BPE contracts: the merge loop reproduces the classic worked example
  * (Sennrich et al. 2016 §3.2's dictionary), encoding follows merge-rank
  * order (not scan order), and the encode path satisfies the roundtrip
  * invariant on awkward inputs. */
class TokenizerSpec extends SparkSuite {
  import spark.implicits._

  // the paper's toy dictionary
  private val dict = Array[(String, Long)](
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnFromDict: first merges match the hand-computed pair counts " +
      "(es/st tie broken lexicographically)") {
    val merges = Tokenizer.learnFromDict(dict, numMerges = 4)
    // counts round 1: (e,s)=9, (s,t)=9, (w,e)=8, (l,o)=7, (o,w)=7 …
    assert(merges.head == (("e", "s")),
      s"most frequent pair must merge first, got ${merges.head}")
    // after (e,s): (es,t)=9 dominates
    assert(merges(1) == (("es", "t")), s"got ${merges(1)}")
    // merges are deterministic end-to-end
    assert(merges == Tokenizer.learnFromDict(dict, numMerges = 4))
  }

  test("merge learning exhausts gracefully when every word is one symbol") {
    val merges = Tokenizer.learnFromDict(
      Array(("ab", 3L)), numMerges = 10)
    assert(merges == Seq(("a", "b")),
      s"one mergeable pair means one merge, got $merges")
  }

  test("encodeWord applies lowest-rank merges first and handles unseen " +
      "symbol runs") {
    val merges = Tokenizer.learnFromDict(dict, numMerges = 10)
    val ranks = merges.zipWithIndex.toMap
    // a trained word collapses (enough merges cover the whole dict)
    val newest = Tokenizer.encodeWord("newest", ranks)
    assert(newest.mkString("") == "newest")
    assert(newest.length < "newest".length,
      s"trained word must compress below characters, got ${newest.toSeq}")
    // an UNSEEN word still roundtrips, falling back to finer pieces
    val unseen = Tokenizer.encodeWord("slowest", ranks)
    assert(unseen.mkString("") == "slowest")
    assert(Tokenizer.encodeWord("", ranks).isEmpty)
  }

  test("symbols are code points, not UTF-16 units: non-BMP text " +
      "roundtrips (lone surrogate tokens would be mangled to '?')") {
    val emoji = new String(Character.toChars(0x1F642)) // outside the BMP
    val merges = Tokenizer.learnFromDict(
      Array((s"a${emoji}b", 2L)), numMerges = 0)
    assert(merges.isEmpty)
    val toks = Tokenizer.encodeWord(s"a${emoji}b", Map.empty)
    assert(toks.toSeq == Seq("a", emoji, "b"),
      s"surrogate pair must stay one symbol, got ${toks.toSeq}")
  }

  test("withBpeTokens: corpus-wide roundtrip over nulls, empties, " +
      "messy whitespace, and non-BMP text") {
    val df = Seq(
      (1L, "the lowest newest widest"),
      (2L, "  Tabs\tand   runs \n of space  "),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "emoji " + new String(Character.toChars(0x1F642)) + " inline"))
      .toDF("doc_id", "text")
    val merges = Tokenizer.learnBpeMerges(df, "text", numMerges = 50)
    val out = Tokenizer.withBpeTokens(df, "text", merges)
      .select($"doc_id", Tokenizer.roundtripOk($"bpe_tokens", $"text")
        .as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.values.forall(identity), s"roundtrip failed: $out")
  }

  test("persisted BPE: dictionary folds are order-invariant and the " +
      "persisted model encodes identically to the from-scratch one") {
    import graft.lakehouse.{Catalog, TableIO}
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("bpe_test").toString,
      "ws_bpe", "lh_bpe").lakehouses.head
    val docs = Seq(
      (1L, "the lowest newest widest"),
      (2L, "lower newer wider slower"),
      (3L, "the low new wide slow"),
      (4L, "lowest of the low")).toDF("doc_id", "text")
    def build(prefix: String, batches: Seq[org.apache.spark.sql.DataFrame]) = {
      TableIO.dropTable(spark, lh, s"${prefix}_dict")
      TableIO.dropTable(spark, lh, s"${prefix}_merges")
      batches.foreach(b =>
        Tokenizer.bpeTableUpdate(spark, lh, prefix, b, "text",
          numMerges = 30))
      Tokenizer.loadBpeMerges(spark, lh, prefix)
    }
    val oneShot = build("bpe_a", Seq(docs))
    val twoFolds = build("bpe_b",
      Seq(docs.filter($"doc_id" <= 2L), docs.filter($"doc_id" > 2L)))
    val reversed = build("bpe_c",
      Seq(docs.filter($"doc_id" > 2L), docs.filter($"doc_id" <= 2L)))
    assert(oneShot == twoFolds && oneShot == reversed,
      s"fold order changed the model: $oneShot vs $twoFolds vs $reversed")
    val scratch = Tokenizer.learnBpeMerges(docs, "text", numMerges = 30)
    assert(oneShot == scratch,
      s"persisted=$oneShot scratch=$scratch")
    val enc = Tokenizer.withPersistedBpeTokens(spark, lh, "bpe_a", docs,
      "text", "p")
    val both = Tokenizer.withBpeTokens(enc, "text", scratch, "s")
      .select($"doc_id", ($"p" === $"s").as("eq"),
        Tokenizer.roundtripOk($"p", $"text").as("rt"))
      .collect()
    assert(both.forall(r => r.getBoolean(1) && r.getBoolean(2)),
      both.mkString(","))
  }
}
