package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("exactDedup keeps the min-id row per key") {
    val df = Seq((3L, "x"), (1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, Seq("text"), "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("minhash signature is deterministic and length numHashes") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val sig1 = Dedup.withMinHashSignature(df, "text", "sig", 5, 16)
      .select("sig").head().getSeq[Long](0)
    val sig2 = Dedup.withMinHashSignature(df, "text", "sig", 5, 16)
      .select("sig").head().getSeq[Long](0)
    assert(sig1.length == 16)
    assert(sig1 == sig2)
  }

  test("minhash LSH finds injected near-dups, not unrelated docs") {
    val base = docs.limit(20)
    val nearDup = base.filter($"doc_id" < 5)
      .withColumn("doc_id", $"doc_id" + 100000)
      .withColumn("text", concat($"text", lit(" tail")))
    val aug = base.unionByName(nearDup)
    val pairs = Dedup.minHashNearDupPairs(aug, "doc_id", "text",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.8)
      .collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach { i =>
      assert(found.contains((i, i + 100000)), s"missing pair $i")
    }
    // the fixture plants genuine near-dups: docs 8 and 12 share 98.5% of
    // 5-gram shingles (independently confirmed with python). LSH must
    // surface that pair too.
    assert(found.contains((8L, 12L)), s"missed planted near-dup: $found")
    assert(pairs.forall(_.getDouble(2) >= 0.8))
    // dedupByPairs drops the 5 injected copies + planted dup doc 12
    val deduped = Dedup.dedupByPairs(aug, "doc_id",
      Dedup.minHashNearDupPairs(aug, "doc_id", "text", threshold = 0.8))
    assert(deduped.count() == 19)
    assert(deduped.filter($"doc_id" === 12).isEmpty)
  }

  test("simhash near-dup pairs: hamming banding") {
    // exact copies have hamming 0 and MUST be recalled by the 4-band join;
    // (token-level perturbations can flip >3 bits on short docs, so recall
    // is only guaranteed for genuinely close hashes — that's the contract)
    val base = docs.limit(20)
    val copies = base.filter($"doc_id" < 3)
      .withColumn("doc_id", $"doc_id" + 100000)
    val aug = base.unionByName(copies)
    val pairs = Dedup.simHashNearDupPairs(aug, "doc_id", "text", maxDist = 3)
      .collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    (0L until 3L).foreach(i => assert(found.contains((i, i + 100000, 0)), s"missing $i"))
  }

  test("simHash64 pure function: deterministic, distance small for near text") {
    val a = Dedup.simHash64("spark makes big data simple and fast for everyone today")
    val b = Dedup.simHash64("spark makes big data simple and fast for everyone now")
    val c = Dedup.simHash64("completely unrelated words about gardening and cooking recipes")
    assert(a == Dedup.simHash64("spark makes big data simple and fast for everyone today"))
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }

  test("portableSimHash: near texts land near, far texts far, in hamming") {
    val df = Seq(
      (1L, "spark makes big data simple and fast for everyone today"),
      (2L, "spark makes big data simple and fast for everyone now"),
      (3L, "completely unrelated words about gardening and cooking recipes"),
      (1001L, "spark makes big data simple and fast for everyone today"))
      .toDF("doc_id", "text")
    val hs = Dedup.portableSimHash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(1001L), "identical text must hash identically")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) <
      java.lang.Long.bitCount(hs(1L) ^ hs(3L)))
    // 60-bit contract: the sign bit can never be set
    assert(hs.values.forall(_ >= 0L))
  }

  test("ngram jaccard pairs: exact overlap values") {
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 1,
      threshold = 0.5, maxDocFreq = 100).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(math.abs(r.getDouble(2) - 0.6) < 1e-12) // |{a,b,c}| / |{a,b,c,d,e}|
  }

  test("prefixFilterJaccardPairs: exact values, equals the no-prune " +
      "inverted-index answer on every threshold") {
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"),
      (4L, "a b c d"), (5L, "the the the a b"), (6L, "c d e f g"))
      .toDF("doc_id", "text")
    // All three plans must match the no-prune inverted-index oracle:
    // (0, 0)     -> prefix + positional-filter plan
    // (4096, 0)  -> dense inverted-index plan (bitset disabled)
    // (4096, 4096) -> bitset plan (this 6-doc input fits every guard)
    for (t <- Seq(0.4, 0.6, 0.99);
         (dense, bitset) <- Seq((0L, 0L), (4096L, 0L), (4096L, 4096L))) {
      val got = Dedup.prefixFilterJaccardPairs(df, "doc_id", "text", t,
          denseMaxDocs = dense, bitsetMaxVocab = bitset)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2)).toSeq
      // oracle: the inverted-index path with pruning disabled is exact
      val exp = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 1,
        threshold = t, maxDocFreq = Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2)).toSeq
      assert(got == exp, s"threshold $t dense $dense bitset $bitset")
    }
    // the exact-dup pair survives the tightest threshold on every plan
    for ((dense, bitset) <- Seq((0L, 0L), (4096L, 0L), (4096L, 4096L))) {
      val tight = Dedup.prefixFilterJaccardPairs(df, "doc_id", "text", 1.0,
          denseMaxDocs = dense, bitsetMaxVocab = bitset)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(tight.toSeq == Seq((1L, 4L)), s"dense $dense bitset $bitset")
    }
  }

  test("prefixFilterJaccardPairs: bitset plan crosses the 64-bit word " +
      "boundary exactly") {
    // >64 distinct tokens force multi-word masks; doc pairs share tokens
    // in BOTH words so the zip_with/popcount fold is exercised across the
    // boundary. Oracle: the no-prune inverted index.
    val vocabA = (0 until 50).map(i => s"w$i").mkString(" ")
    val vocabB = (40 until 90).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, vocabA), (2L, vocabA + " extra"), (3L, vocabB),
      (4L, vocabB + " other"), (5L, vocabA + " " + vocabB))
      .toDF("doc_id", "text")
    val got = Dedup.prefixFilterJaccardPairs(df, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    val exp = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 1,
      threshold = 0.3, maxDocFreq = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("dedupKeepBest: NULL-id rows are singletons and all survive") {
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val df = Seq((Some(1L), 1.0), (Some(2L), 9.0), (None, 5.0), (None, 7.0))
      .toDF("doc_id", "q")
    val kept = Dedup.dedupKeepBest(df, "doc_id", "q", pairs).collect()
    assert(kept.length == 3, kept.toSeq.toString) // 2 wins; both nulls stay
    assert(kept.count(_.isNullAt(0)) == 2)
  }

  test("connectedComponents: transitive clusters get one canonical") {
    // chain 1-2-3 (1~3 never emitted), pair 10-11, singleton edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L), cc.toString)
    // dedupByComponents keeps exactly the canonicals + untouched rows
    val df = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 99L).toDF("doc_id")
    val kept = Dedup.dedupByComponents(df, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 20L, 99L), kept.toString)
    // dedupKeepBest keeps the argmax-score member per cluster instead
    // (ties to smallest id), singletons always survive
    val scored = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0), (10L, 1.0),
      (11L, 1.0), (20L, 3.0), (21L, 8.0), (99L, 0.0)).toDF("doc_id", "q")
    val best = Dedup.dedupKeepBest(scored, "doc_id", "q", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(best == Set(2L, 10L, 21L, 99L), best.toString)
  }

  test("incremental dedup: new batch against a persisted band index") {
    val corpus = docs.limit(30)
    val index = Dedup.minHashBandIndex(corpus, "doc_id", "text")
    // new batch: 3 lightly-edited copies of corpus docs + 2 genuinely new
    val copies = corpus.filter($"doc_id" < 3)
      .withColumn("doc_id", $"doc_id" + 500000)
      .withColumn("text", concat($"text", lit(" minor tail edit")))
    val fresh = Seq(
      (600001L, "entirely novel content about walrus migration patterns"),
      (600002L, "unrelated text describing submarine cable maintenance"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDupsAgainstIndex(
      copies.select("doc_id", "text").unionByName(fresh),
      corpus.select("doc_id", "text"), index, "doc_id", "text",
      threshold = 0.8).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 3L).foreach { i =>
      assert(found.contains((i + 500000, i)), s"missed edited copy $i: $found")
    }
    assert(!found.exists(_._1 >= 600000L), s"fresh docs must not match: $found")
  }

  test("ngram contamination: containment of eval grams in train docs") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different content about spark aggregation plans")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "the quick brown fox jumps over the lazy dog") // 9 words, 5 grams
    ).toDF("doc_id", "text")
    val out = Dedup.ngramContamination(train, eval_, "doc_id", "text",
      n = 5, threshold = 0.5).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 100L))
    // train doc 1 contains all 5 of the eval doc's 5-grams
    assert(r.getLong(2) == 5L && r.getDouble(3) == 1.0)
  }

  test("embedding near-dup: identical vectors pair up, distinct ones don't") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val copies = emb.filter($"vec_id" < 3).withColumn("vec_id", $"vec_id" + 100000)
    val aug = emb.unionByName(copies)
    val pairs = Dedup.embeddingNearDupPairs(aug, "vec_id", "embedding",
      threshold = 0.999999).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 3L).foreach(i => assert(found.contains((i, i + 100000)), s"missing $i"))
  }

  test("semanticDedup: exact copies die at any nClusters; clustered " +
      "survivors are a superset of the exhaustive rule's") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val copies = emb.filter($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 100000)
    val aug = emb.unionByName(copies)
    val ids = (df: org.apache.spark.sql.DataFrame) =>
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Dedup.semanticDedup(aug, "vec_id", "embedding",
      threshold = 0.95, nClusters = 1))
    val clustered = ids(Dedup.semanticDedup(aug, "vec_id", "embedding",
      threshold = 0.95, nClusters = 8))
    // an exact copy shares its original's cluster (deterministic
    // tie-break), so it dies in BOTH modes
    (100000L until 100005L).foreach { i =>
      assert(!exact.contains(i) && !clustered.contains(i), s"copy $i survived")
    }
    // clustering only splits the comparison set — it can never drop MORE
    assert(exact.subsetOf(clustered),
      s"clustered mode dropped ids the exhaustive rule kept: ${exact -- clustered}")
  }

  test("fuzzyDecontaminate: verbatim and near-verbatim eval copies are " +
      "dropped from train, unrelated and short docs survive") {
    val bench = "the quick brown fox jumps over the lazy dog again and again"
    val train = Seq(
      (1L, bench),                                  // verbatim leak -> drop
      (2L, bench + " trailing tokens appended"),    // near-verbatim -> drop
      (3L, "completely unrelated text about spark partitions and shuffles"),
      (4L, "tiny"))                                 // too short to band -> keep
      .toDF("doc_id", "text")
    val evalDocs = Seq((100L, bench)).toDF("doc_id", "text")
    val kept = Dedup.fuzzyDecontaminate(train, evalDocs, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(3L, 4L), s"got $kept")
  }

  test("containmentPairs: asymmetric — the excerpt scores 1.0 against " +
      "its superset, never the reverse") {
    val df = Seq(
      (1L, "alpha beta gamma"),                       // excerpt of 2
      (2L, "alpha beta gamma delta epsilon zeta"),    // superset
      (3L, "unrelated words entirely different here"))
      .toDF("doc_id", "text")
    val strict = Dedup.containmentPairs(df, "doc_id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(strict.toSeq == Seq((1L, 2L, 1.0)), s"got ${strict.toSeq}")
    // at 0.5 the reverse direction (3 of 6 tokens) reaches the bar too
    val loose = Dedup.containmentPairs(df, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(loose == Set((1L, 2L, 1.0), (2L, 1L, 0.5)), s"got $loose")
  }

  test("containmentPairs equals the unpruned brute force across " +
      "thresholds, boundary pairs included") {
    // deterministic corpus with heavy overlap and repeated tokens
    val docs = (0L until 40L).map { i =>
      val toks = (0L until 6 + i % 5).map(j => s"w${(i * 3 + j * 7) % 23}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
        explode(Dedup.wordNgrams("text", 1)).as("w"))
      .filter(col("w") =!= "").distinct().persist()
    val sz = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val brute = toks.select(col("doc_id").as("a"), col("w"))
      .join(toks.select(col("doc_id").as("b"), col("w")), "w")
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
      .join(sz.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
      .withColumn("containment",
        col("common").cast("double") / col("sza").cast("double"))
    for (t <- Seq(0.5, 0.7, 0.9, 1.0)) {
      val want = brute.filter(col("containment") >= t)
        .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Double]("containment"))).toSet
      // both plans must match the brute force: the cost-based dense plan
      // (default guards admit this corpus) and the forced prefix plan
      val dense = Dedup.containmentPairs(docs, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val prefix = Dedup.containmentPairs(docs, "doc_id", "text", t,
          denseMaxDocs = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(dense == want, s"dense @ $t: got ${dense.size}, want ${want.size}")
      assert(prefix == want,
        s"prefix @ $t: got ${prefix.size}, want ${want.size}")
    }
    toks.unpersist()
  }
  test("dedupIngest: min-id within batch, first batch wins cross-batch, " +
      "replay is a no-op") {
    import graft.lakehouse.{Catalog, TableIO}
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("dedup_ingest_test").toString,
      "ws_di", "lh_di").lakehouses.head
    val b1 = Seq((5L, "k1"), (3L, "k1"), (7L, "k2")).toDF("id", "k")
    val b2 = Seq((1L, "k1"), (8L, "k3")).toDF("id", "k")
    assert(Dedup.dedupIngest(spark, lh, "gold", b1, Seq("k"), "id")
      == ((2L, 1L))) // k1 keeps id=3 (batch min), 5 dropped
    // id=1 would win a global min-id dedup, but batch 1 already owns k1
    assert(Dedup.dedupIngest(spark, lh, "gold", b2, Seq("k"), "id")
      == ((1L, 1L)))
    val got = TableIO.selectTable(spark, lh, "gold").select("id", "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((3L, "k1"), (7L, "k2"), (8L, "k3")))
    // refolding an already-seen batch: every key anti-joins away
    assert(Dedup.dedupIngest(spark, lh, "gold", b2, Seq("k"), "id")
      == ((0L, 2L)))
    assert(TableIO.selectTable(spark, lh, "gold").count() == 3)
    TableIO.dropTable(spark, lh, "gold")
  }

  test("dedupIngest: null keys take the sentinel; multi-column keys are " +
      "unambiguous across the separator") {
    import graft.lakehouse.{Catalog, TableIO}
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("dedup_ingest_nulls").toString,
      "ws_din", "lh_din").lakehouses.head
    val b = Seq((1L, null.asInstanceOf[String], "x"),
      (2L, "x", null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String], "x"),
      (4L, "ab", "c"), (5L, "a", "bc")).toDF("id", "a", "b")
    val (kept, dropped) =
      Dedup.dedupIngest(spark, lh, "gold_n", b, Seq("a", "b"), "id")
    assert((kept, dropped) == ((4L, 1L))) // only (null,x) collides: 1 with 3
    val ids = TableIO.selectTable(spark, lh, "gold_n").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L, 5L))
    TableIO.dropTable(spark, lh, "gold_n")
  }

  test("streamDedupIngest: exactly-once micro-batch folds; a replayed " +
      "batch id neither appends nor versions the state") {
    import graft.lakehouse.{Catalog, TableIO, Versioned}
    implicit val sqlCtx = spark.sqlContext
    val lh = Catalog.registerLocalWorkspace(
      java.nio.file.Files.createTempDirectory("dedup_stream_test").toString,
      "ws_ds", "lh_ds").lakehouses.head
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = Dedup.streamDedupIngest(mem.toDF().toDF("id", "k"), spark, lh,
      "gold_s", Seq("k"), "id", appId = Some("dis_test"))
    try {
      mem.addData((5L, "k1"), (3L, "k1"), (7L, "k2"))
      q.processAllAvailable()
      mem.addData((1L, "k1"), (8L, "k3"))
      q.processAllAvailable()
      val got = TableIO.selectTable(spark, lh, "gold_s").select("id", "k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((3L, "k1"), (7L, "k2"), (8L, "k3")))
      val dir = Catalog.tablePath(lh, "gold_s")
      val vBefore = Versioned.latestVersion(dir).get
      // replayed batch id: the txn watermark skips the fold entirely
      val replay = Dedup.streamDedupIngest(mem.toDF().toDF("id", "k"),
        spark, lh, "gold_s", Seq("k"), "id", appId = Some("dis_test"))
      replay.processAllAvailable(); replay.stop()
      assert(Versioned.latestVersion(dir).get == vBefore,
        "replayed batches must not version the state forward")
    } finally q.stop()
  }
  test("crossSplitLeakage: heldout docs sharing a train n-gram are " +
      "counted per stratum") {
    val split = Seq(
      (1L, "en", "alpha beta gamma delta epsilon zeta", "train"),
      (2L, "en", "alpha beta gamma delta epsilon eta", "heldout"),
      (3L, "en", "one two three four five six", "heldout"),
      (4L, "fr", "un deux trois quatre cinq", "train"),
      (5L, "fr", "six sept huit neuf dix", "heldout")
    ).toDF("doc_id", "lang", "text", "split")
    val out = Dedup.crossSplitLeakage(split, "doc_id", "text", "split",
      "train", "heldout", n = 5, groupCols = Seq("lang"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // en: doc 2 shares "alpha beta gamma delta epsilon", doc 3 shares
    // nothing; fr: "six" appears in en-train? no -- train grams are
    // 5-grams, so "six sept huit neuf dix" never matches en's grams
    assert(out.toSeq == Seq(("en", 2L, 1L, 500L), ("fr", 1L, 0L, 0L)))
  }

  test("sourceOverlapMatrix: cross-source copies hit, diagonal is the " +
      "internal near-dup rate, zero cells materialize, short docs only " +
      "count in denominators") {
    val body = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, body, "a"),                 // identical copy lives in b (4)
      (2L, "completely different content with no overlap here at all", "a"),
      (3L, "zz", "a"),                 // too short for a 5-shingle
      (4L, body, "b"),
      (5L, body, "b"),                 // b-internal duplicate of 4
      (6L, "another unrelated document body entirely on its own", "c")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlapMatrix(docs, "doc_id", "text", "source")
      .orderBy("src_a", "src_b").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 9, "complete 3x3 matrix expected")
    // a -> b: doc 1 collides with b's copies => 1 of a's 3 docs
    assert(out(("a", "b")) == ((3L, 1L, 333L)), out(("a", "b")).toString)
    // b -> a: docs 4 AND 5 collide with a's doc 1
    assert(out(("b", "a")) == ((2L, 2L, 1000L)))
    // diagonal: a has no internal near-dup (1's copy is in b, 3 is
    // bandless); b's two docs are mutual dups
    assert(out(("a", "a"))._2 == 0L)
    assert(out(("b", "b"))  == ((2L, 2L, 1000L)))
    // c overlaps nothing; zero cells still present
    assert(out(("c", "a")) == ((1L, 0L, 0L)) && out(("c", "c"))._2 == 0L)
  }


  test("clusterCensus: histogram over component sizes with removable " +
      "counts") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("id", "cc")
    val out = Dedup.clusterCensus(comps, "cc").orderBy("cluster_size")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L, 1L, 0L), (2L, 1L, 2L, 1L),
      (3L, 1L, 3L, 2L)), out.mkString(","))
  }


  test("exactDedupWithProvenance: numeric-sorted absorbed ids, " +
      "singletons keep empty lineage, maxCopies raises loudly") {
    val d = Seq((9L, "k1"), (10L, "k1"), (2L, "k1"), (7L, "k2"))
      .toDF("doc_id", "key")
    val out = Dedup.exactDedupWithProvenance(d, Seq("key"), "doc_id")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // ids sort NUMERICALLY: 2 survives, absorbed "9#10" not "10#9"
    assert(out.toSeq == Seq(("k1", 2L, 2L, "9#10"), ("k2", 7L, 0L, "")),
      out.mkString(","))
    val e = intercept[Exception] {
      Dedup.exactDedupWithProvenance(d, Seq("key"), "doc_id",
        maxCopies = 2).collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("maxCopies"), chain(e))
  }


  test("candidateJaccardHistogram: identical docs land in decile 10, " +
      "near-dups in a middle decile, unrelated docs never become " +
      "candidates") {
    val body = "the quick brown fox jumps over the lazy dog once more"
    val near = body.replace("dog", "cat")
    val docs = Seq((1L, body), (2L, body), (3L, near),
      (4L, "completely different content entirely unrelated here"),
      (5L, "zz")).toDF("doc_id", "text")
    val out = Dedup.candidateJaccardHistogram(docs, "doc_id", "text")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // (1,2) identical -> jaccard 1000 -> decile 10, always a candidate
    assert(out.getOrElse(10, 0L) >= 1L, out.toString)
    // doc 4 shares no band with anything: every histogram pair involves
    // docs 1/2/3 only
    val total = out.values.sum
    assert(total <= 3L && total >= 1L, out.toString)
    // if the near-dup pair surfaced, its decile is below 10
    if (total > 1L) assert(out.exists { case (d, _) => d < 10 })
  }

  test("sortedNeighborhoodPairs: adjacent-rank pairs within blocks only, " +
    "same-key flag, singleton blocks and short keys drop out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello World Alpha One"), // key helloworldal, block hell
      (2L, "hello, world alpha two!"), // same key -> same_key pair
      (3L, "help me now zzz"), // block help: singleton
      (4L, "hellish morning walk today"), // block hell, sorts first
      (5L, "zebra quick fox jumps"), // block zebr: singleton
      (6L, "ab")).toDF("doc_id", "text") // key too short: dropped
    val got = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text",
      window = 3, blockChars = 4, keyChars = 12)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("gap"), r.getAs[Boolean]("same_key"))).toSeq
    // block hell ranks: 4 (hellishmorni), 1, 2 (helloworldal twins)
    assert(got == Seq(
      (1L, 2L, 1, true),
      (4L, 1L, 1, false),
      (4L, 2L, 2, false)), got.mkString(","))
  }

  test("fellegiSunterScore: full agreement matches, partial agreement " +
    "lands possible, null fields agree null-safely, guards fire") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val attrs = Seq(
      (1L, "en", "web", 5L), (2L, "en", "web", 5L),
      (3L, "fr", "web", 5L), (4L, "fr", "api", 9L))
      .toDF("doc_id", "lang", "source", "len_bucket")
    val got = Dedup.fellegiSunterScore(pairs, attrs, "doc_id",
      Seq(("lang", 6, -4), ("source", 8, -5), ("len_bucket", 10, -6)),
      matchAt = 18, possibleAt = 4)
      .orderBy("id_b").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (2L, 24L, "match"),
      (3L, 14L, "possible"),
      (4L, -15L, "non_match")), got.mkString(","))
    intercept[IllegalArgumentException] {
      Dedup.fellegiSunterScore(pairs, attrs, "doc_id",
        Seq(("lang", 6, -4)), matchAt = 4, possibleAt = 4)
    }
  }
}
