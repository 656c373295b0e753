package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("every pack respects the budget; oversize docs get singleton packs") {
    val docs = Seq(
      (1L, 400L), (2L, 500L), (3L, 300L), (4L, 900L), (5L, 1200L), // 1200 > budget
      (6L, 100L), (7L, 100L), (8L, 50L)
    ).toDF("doc_id", "n_tokens").repartition(2)
    val packed = Packing.packSequences(docs, "n_tokens", budget = 1000L)
    val rows = packed.collect()
    assert(rows.length == 8) // row-preserving
    val byPack = rows.groupBy(_.getAs[Long]("pack_id"))
    byPack.foreach { case (_, rs) =>
      val tot = rs.map(_.getAs[Long]("n_tokens")).sum
      assert(tot <= 1000L || rs.length == 1, s"pack overflow: $tot")
    }
    // the oversize doc is alone in its pack
    val p5 = rows.find(_.getAs[Long]("doc_id") == 5L).get.getAs[Long]("pack_id")
    assert(byPack(p5).length == 1)
  }

  test("chunkDocuments: overlap, short docs, null docs") {
    val docs = Seq(
      (1L, "a" * 500),      // 500 chars, chunk 200 / overlap 40 -> 3 chunks
      (2L, "short"),        // single chunk
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val chunks = TextStats.chunkDocuments(docs, "doc_id", "text", 200, 40)
      .orderBy("doc_id", "chunk_no").collect()
    val d1 = chunks.filter(_.getLong(0) == 1L)
    assert(d1.length == 3)
    assert(d1.map(_.getAs[String]("chunk_text").length).toSeq == Seq(200, 200, 180))
    // consecutive chunks share `overlap` characters of context
    assert(d1(0).getAs[String]("chunk_text").takeRight(40)
      == d1(1).getAs[String]("chunk_text").take(40))
    assert(chunks.filter(_.getLong(0) == 2L).map(_.getAs[String]("chunk_text")).toSeq
      == Seq("short"))
    assert(!chunks.exists(_.getLong(0) == 3L)) // null text -> no rows
  }

  test("mixtureStats: shares sum to 1 over strata") {
    val docs = Seq(("web", 100L), ("web", 300L), ("book", 600L))
      .toDF("source", "n_tokens")
    val m = TextStats.mixtureStats(docs, "source", "n_tokens")
      .orderBy("source").collect()
    assert(m.map(_.getAs[String]("source")).toSeq == Seq("book", "web"))
    assert(m.map(_.getAs[Long]("tokens")).toSeq == Seq(600L, 400L))
    assert(math.abs(m.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-12)
  }

  test("sampleMixture: seeded, deterministic, tracks target fractions") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val fractions = Map("src0" -> 0.5, "src1" -> 1.0)
    val present = docs.select("source").distinct().collect()
      .map(_.getString(0)).toSet
    val wanted = fractions.filter { case (k, _) => present(k) }
    if (wanted.nonEmpty) {
      val a = Packing.sampleMixture(docs, "source", wanted, seed = 7L)
      val b = Packing.sampleMixture(docs, "source", wanted, seed = 7L)
      assert(a.collect().toSeq == b.collect().toSeq) // deterministic
      val counts = a.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val base = docs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      wanted.foreach { case (src, f) =>
        val got = counts.getOrElse(src, 0L).toDouble / base(src)
        assert(math.abs(got - f) < 0.25, s"$src: $got vs $f")
      }
      // strata not in the fraction map are dropped
      assert(!a.select("source").distinct().collect()
        .map(_.getString(0)).exists(s => !wanted.contains(s)))
    } else cancel("fixture lacks expected strata")
  }

  test("packing is deterministic and pack ids are partition-scoped") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", length($"text").cast("long").as("n_tokens"))
    val a = Packing.packSequences(docs, "n_tokens", budget = 4096L)
      .select("doc_id", "pack_id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Packing.packSequences(docs, "n_tokens", budget = 4096L)
      .select("doc_id", "pack_id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    // summary: no pack over budget (fixture docs are all under it)
    val bad = Packing.packSummary(
      Packing.packSequences(docs, "n_tokens", budget = 4096L), "n_tokens")
      .filter($"sum_tokens" > 4096L && $"n_docs" > 1).count()
    assert(bad == 0)
  }

  test("concatChunkPlan: distributed prefix sum matches the sequential plan") {
    val docs = spark.range(0, 5000)
      .selectExpr("id", "(id * 37) % 900 AS n").repartition(8)
    val plan = Packing.concatChunkPlan(docs, "id", "n", budget = 1024L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // sequential reference
    var cum = 0L
    val want = (0L until 5000L).map { id =>
      val n = (id * 37) % 900
      val before = cum
      cum += n
      (id, n, before / 1024, (before + math.max(n, 1) - 1) / 1024, before % 1024)
    }
    assert(plan.toSeq == want)
    // invariants: offsets within budget, pack ids monotone in doc order
    assert(plan.forall(p => p._5 >= 0 && p._5 < 1024 && p._3 <= p._4))
    assert(plan.map(_._3).toSeq == plan.map(_._3).toSeq.sorted)
  }

  test("deterministicShuffle: stable permutation, seed changes it") {
    val ids = spark.range(0, 2000).toDF("id")
    val p1 = Packing.deterministicShuffle(ids, "id", 1L)
      .collect().map(_.getLong(0)).toSeq
    val p2 = Packing.deterministicShuffle(ids, "id", 1L)
      .collect().map(_.getLong(0)).toSeq
    val p3 = Packing.deterministicShuffle(ids, "id", 2L)
      .collect().map(_.getLong(0)).toSeq
    assert(p1 == p2, "same seed must reproduce the permutation exactly")
    assert(p1 != p3, "a new seed must be a fresh permutation")
    assert(p1.sorted == (0L until 2000L), "it is a permutation, not a sample")
    assert(p1 != (0L until 2000L).toSeq, "and it actually shuffles")
  }

  test("hashSplit: weights tracked, assignment stable under corpus growth") {
    val small = spark.range(0, 5000).toDF("id")
    val big = spark.range(0, 10000).toDF("id")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Packing.hashSplit(small, "id", 7L, w)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 4000.0) < 200, counts.toString)
    assert(math.abs(counts("val") - 500.0) < 100, counts.toString)
    // growing the corpus never reassigns an existing id (pure function of
    // (id, seed) — the property row-number modulo splits lack)
    val a1 = s1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = Packing.hashSplit(big, "id", 7L, w).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1.forall { case (k, v) => a2(k) == v })
    // weights validated
    intercept[IllegalArgumentException] {
      Packing.hashSplit(small, "id", 7L, Seq("a" -> 0.0))
    }
  }

  test("samplePerGroup: exact k per group, deterministic, growth-stable") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val s1 = Packing.samplePerGroup(df, "id", "g", k = 10, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("g0" -> 10, "g1" -> 10, "g2" -> 10))
    // same seed = same sample; different seed = (almost surely) different
    val s2 = Packing.samplePerGroup(df, "id", "g", k = 10, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.sorted.toSeq == s2.sorted.toSeq)
    val s3 = Packing.samplePerGroup(df, "id", "g", k = 10, seed = 43L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.sorted.toSeq != s3.sorted.toSeq)
    // groups smaller than k keep every row
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    assert(Packing.samplePerGroup(tiny, "id", "g", 10, 1L).count() == 3)
    // growth stability: a member stays sampled unless displaced by a
    // smaller-ranked newcomer — adding rows to OTHER groups changes nothing
    val grown = df.unionByName(
      (301 to 400).map(i => (i.toLong, "g9")).toDF("id", "g"))
    val s4 = Packing.samplePerGroup(grown, "id", "g", 10, 42L)
      .filter($"g" =!= "g9")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s4.sorted.toSeq == s1.sorted.toSeq)
  }

  test("qualityWeightedSample: deterministic, score-monotone acceptance, " +
      "exponent 0 + frac 1 keeps everything") {
    val df = (1L to 2000L).map(i => (i, (i % 101).toDouble / 100.0))
      .toDF("id", "score")
    // frac=1, k=0: threshold = 1 * 1 * 2^60 -> every 60-bit hash accepts
    assert(Packing.qualityWeightedSample(df, "id", "score", 0, 1.0, 5L)
      .count() == 2000)
    val kept = Packing.qualityWeightedSample(df, "id", "score", 2, 0.5, 5L)
    val ids = kept.collect().map(_.getLong(0)).toSet
    // deterministic under repartitioning
    val ids2 = Packing.qualityWeightedSample(df.repartition(7), "id",
      "score", 2, 0.5, 5L).collect().map(_.getLong(0)).toSet
    assert(ids == ids2)
    // quality gradient: the top-score quartile must survive at a higher
    // rate than the bottom quartile (acceptance ~ score^2)
    val byScore = kept.collect().map(r => r.getDouble(1))
    val hi = byScore.count(_ >= 0.75).toDouble / 500.0
    val lo = byScore.count(_ <= 0.25).toDouble / 500.0
    assert(hi > lo + 0.2, s"hi=$hi lo=$lo")
    // out-of-range scores clamp instead of corrupting thresholds
    val odd = Seq((1L, -3.0), (2L, 99.0)).toDF("id", "score")
    val keptOdd = Packing.qualityWeightedSample(odd, "id", "score", 1, 1.0, 5L)
    assert(!keptOdd.collect().map(_.getLong(0)).contains(1L)) // weight 0
  }

  test("rebalanceMixture: equal shares on equal strata keep everything; " +
      "skewed corpus downsamples the heavy stratum to the target ratio") {
    val bal = ((1L to 100L).map(i => (i, "a")) ++
      (101L to 200L).map(i => (i, "b"))).toDF("id", "src")
    assert(Packing.rebalanceMixture(bal, "id", "src",
      Map("a" -> 1.0, "b" -> 1.0), 3L).count() == 200)
    // 900 a vs 100 b, target 1:1 -> b keeps all, a keeps ~100
    val skew = ((1L to 900L).map(i => (i, "a")) ++
      (901L to 1000L).map(i => (i, "b"))).toDF("id", "src")
    val out = Packing.rebalanceMixture(skew, "id", "src",
      Map("a" -> 1.0, "b" -> 1.0), 3L).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (as, bs) = (out.count(_._2 == "a"), out.count(_._2 == "b"))
    assert(bs == 100, s"b kept $bs")
    assert(as > 60 && as < 140, s"a kept $as")
    // strata with no target share drop entirely
    val out2 = Packing.rebalanceMixture(skew, "id", "src",
      Map("b" -> 1.0), 3L).collect()
    assert(out2.length == 100 && out2.forall(_.getString(1) == "b"))
    // column order of the input is preserved
    assert(Packing.rebalanceMixture(skew, "id", "src",
      Map("a" -> 1.0), 3L).columns.toSeq == Seq("id", "src"))
  }

  test("temperatureRebalance: sqrt temperature keeps the tail whole and " +
      "halves the 4x head; alpha=1000 is the natural mixture; bad alpha " +
      "refused") {
    val skew = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 125L).map(i => (i, "small"))).toDF("id", "src")
    // shares sqrt: big 10, small 5; t = min(100/10, 25/5) = 5
    // -> big keeps ~0.5, small keeps all
    val out = Packing.temperatureRebalance(skew, "id", "src", 500, 3L)
      .collect().map(r => r.getString(1))
    assert(out.count(_ == "small") == 25, "tail stratum must survive whole")
    val bigKept = out.count(_ == "big")
    assert(bigKept > 30 && bigKept < 70, s"head kept $bigKept of 100")
    // identity temperature = natural mixture, nothing dropped
    assert(Packing.temperatureRebalance(skew, "id", "src", 1000, 3L)
      .count() == 125)
    intercept[IllegalArgumentException] {
      Packing.temperatureRebalance(skew, "id", "src", 700, 3L)
    }
  }

  test("stratifiedSplit: exact per-stratum proportions, deterministic") {
    // two strata of 10 and 25 rows; 800/100/100 permille
    val df = ((1L to 10L).map(i => (i, "a")) ++
      (11L to 35L).map(i => (i, "b"))).toDF("id", "g")
    val out = Packing.stratifiedSplit(df, "id", Seq("g"), 7L,
      Seq("train" -> 800, "val" -> 100, "test" -> 100)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val a = out.filter(_._2 == "a").map(_._3)
    val b = out.filter(_._2 == "b").map(_._3)
    // 10 rows: floor(8)/floor(9)-8/rest -> 8/1/1; 25: 20/2/3
    assert(a.count(_ == "train") == 8 && a.count(_ == "val") == 1 &&
      a.count(_ == "test") == 1)
    assert(b.count(_ == "train") == 20 && b.count(_ == "val") == 2 &&
      b.count(_ == "test") == 3)
    // deterministic across runs
    val again = Packing.stratifiedSplit(df, "id", Seq("g"), 7L,
      Seq("train" -> 800, "val" -> 100, "test" -> 100)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a different seed reshuffles membership (overwhelmingly likely)
    val seed2 = Packing.stratifiedSplit(df, "id", Seq("g"), 8L,
      Seq("train" -> 800, "val" -> 100, "test" -> 100)).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(seed2.toSet != out.map(r => (r._1, r._3)).toSet)
    // guards
    intercept[IllegalArgumentException] {
      Packing.stratifiedSplit(df, "id", Seq("g"), 7L, Seq("x" -> 999))
    }
    intercept[IllegalArgumentException] {
      Packing.stratifiedSplit(df, "id", Seq.empty, 7L, Seq("x" -> 1000))
    }
  }

  test("budgetAllocation: water-filling caps at supply, sums to " +
      "min(budget, total), remainder to smallest strata first") {
    val df = Seq(("a", 10L), ("b", 50L), ("c", 100L)).toDF("src", "toks")
    def alloc(b: Long) = Packing.budgetAllocation(df, "src", "toks", b)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // b=90: a saturates at 10, b/c split 80 evenly
    assert(alloc(90L) == Map("a" -> 10L, "b" -> 40L, "c" -> 40L))
    // budget above total supply: everyone takes their whole supply
    assert(alloc(500L) == Map("a" -> 10L, "b" -> 50L, "c" -> 100L))
    // b=7: nobody saturates; 7 div 3 = 2, remainder 1 to the smallest
    assert(alloc(7L) == Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
    assert(alloc(0L).values.sum == 0L)
    intercept[IllegalArgumentException] {
      Packing.budgetAllocation(df, "src", "toks", -1L)
    }
  }

  test("splitManifest: fingerprint is order-independent and flips on " +
      "any membership change") {
    val df = (1L to 50L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "g")
    val m1 = Packing.splitManifest(df, "id", Seq("g"), 7L,
      Seq("train" -> 800, "test" -> 200)).orderBy("split").collect()
    assert(m1.map(_.getAs[Long]("n_rows")).sum == 50L)
    // same data in a different row order and partitioning -> same receipt
    val m2 = Packing.splitManifest(df.orderBy(col("id").desc).repartition(7),
      "id", Seq("g"), 7L, Seq("train" -> 800, "test" -> 200))
      .orderBy("split").collect()
    assert(m1.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      m2.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    // dropping one row changes that split's fingerprint
    val m3 = Packing.splitManifest(df.filter(col("id") =!= 2L), "id",
      Seq("g"), 7L, Seq("train" -> 800, "test" -> 200))
      .orderBy("split").collect()
    assert(m1.map(_.getLong(2)).toSet != m3.map(_.getLong(2)).toSet)
  }

  test("contentDefinedChunks: chunks partition the token stream; " +
      "boundaries are content-local (append-stable)") {
    val text = (1 to 60).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "t")
    val out = Packing.contentDefinedChunks(df, "id", "t", 4, 8)
      .orderBy("chunk_idx").collect()
    // chunks cover all 60 tokens, indices contiguous from 0, none empty
    assert(out.map(_.getLong(2)).sum == 60L)
    assert(out.map(_.getLong(1)).toSeq == out.indices.map(_.toLong))
    assert(out.forall(_.getLong(2) > 0))
    assert(out.length > 1, "divisor 8 over 60 tokens should cut at least once")
    // appending tokens at the end leaves every earlier chunk's hash
    // unchanged (the CDC property fixed-size chunking lacks)
    val grown = Seq((1L, text + " extra tokens appended here")).toDF("id", "t")
    val out2 = Packing.contentDefinedChunks(grown, "id", "t", 4, 8)
      .orderBy("chunk_idx").collect()
    val stable = out.dropRight(1).map(_.getString(3))
    assert(out2.take(stable.length).map(_.getString(3)).toSeq == stable.toSeq)
    // short doc -> single chunk; empty/null -> no rows
    val shortDf = Seq((1L, "a b c")).toDF("id", "t")
    val sc = Packing.contentDefinedChunks(shortDf, "id", "t", 4, 8).collect()
    assert(sc.length == 1 && sc(0).getLong(2) == 3L)
    val empty = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("id", "t")
    assert(Packing.contentDefinedChunks(empty, "id", "t", 4, 8).count() == 0)
    intercept[IllegalArgumentException] {
      Packing.contentDefinedChunks(shortDf, "id", "t", 1, 8)
    }
  }

  test("balancedShards: serpentine deal is deterministic and every " +
      "shard lands within one max-document of every other") {
    // hand-checkable: ranks 0..5 over 3 shards -> passes 0,1 serpentine
    val small = Seq((1L, 60), (2L, 50), (3L, 40), (4L, 30), (5L, 20),
      (6L, 10)).toDF("doc_id", "n_tokens")
    val out = Packing.balancedShards(small, "doc_id", "n_tokens", 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    // sorted desc: docs 1..6; pass0 -> shards 0,1,2; pass1 -> 2,1,0
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 1,
      6L -> 0), out.toString)
    // balance bound on a skewed corpus
    val docs = (1 to 500)
      .map(i => (i.toLong, (i * i) % 997 + 1)).toDF("doc_id", "n_tokens")
      .repartition(7)
    val shards = Packing.balancedShards(docs, "doc_id", "n_tokens", 8)
    val totals = shards.groupBy("shard")
      .agg(sum(col("n_tokens")).as("tot"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(totals.length == 8)
    val maxDoc = 997L
    assert(totals.map(_._1).max - totals.map(_._1).min <= maxDoc,
      totals.mkString(","))
    // doc counts differ by at most 1
    assert(totals.map(_._2).max - totals.map(_._2).min <= 1)
    // deterministic across physical layouts
    val again = Packing.balancedShards(docs.repartition(3), "doc_id",
      "n_tokens", 8).orderBy("doc_id").collect().map(_.getInt(2)).toSeq
    val first = shards.orderBy("doc_id").collect().map(_.getInt(2)).toSeq
    assert(first == again)
  }

  test("mixtureInterleave: every prefix holds each source's weighted " +
      "share within O(1); unweighted sources drop; deterministic") {
    val docs = (1 to 300).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "x")
    }.toDF("doc_id", "source")
    val w = Map("a" -> 600, "b" -> 300)
    val out = Packing.mixtureInterleave(docs, "doc_id", "source", w, 7L)
      .orderBy("interleave_key", "source", "src_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(out.forall(_._2 != "x"), "unweighted source must drop")
    assert(out.length == 200)
    // prefix shares: after K docs, source counts track K*w_s/sum(w) +-2
    Seq(30, 60, 90, 150).foreach { k =>
      val pre = out.take(k)
      val na = pre.count(_._2 == "a").toDouble
      val nb = pre.count(_._2 == "b").toDouble
      assert(math.abs(na - k * 2.0 / 3) <= 2, s"K=$k a=$na")
      assert(math.abs(nb - k * 1.0 / 3) <= 2, s"K=$k b=$nb")
    }
    // keys are the WFQ virtual finish times: rank r of source s sits at
    // (r * 1e6) div w_s
    assert(out.forall(t => t._4 == (t._3.toLong * 1000000L) / w(t._2)))
    // deterministic under repartition
    val again = Packing.mixtureInterleave(docs.repartition(5), "doc_id",
      "source", w, 7L)
      .orderBy("interleave_key", "source", "src_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq == again.toSeq)
    intercept[IllegalArgumentException] {
      Packing.mixtureInterleave(docs, "doc_id", "source", Map("a" -> 0), 7L)
    }
  }

  test("paddingWasteReport: hand-computed ceil arithmetic, zero-token " +
      "docs consume nothing") {
    // L=10: docs 5, 10, 11, 0/null -> seqs 1+1+2+0 = 4, waste 5+0+9 = 14
    val d = Seq(Some(5L), Some(10L), Some(11L), Some(0L), None)
      .toDF("ntok")
    val r = Packing.paddingWasteReport(d, "ntok", seqLen = 10L).collect()
      .head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 26L, 4L, 14L)), r.toString)
    assert(r.getLong(4) == (14L * 1000) / 40)   // waste permille of grid
    assert(r.getLong(5) == 3L)                  // ceil(26/10)
    assert(r.getLong(6) == ((4L - 3L) * 1000) / 4)
    intercept[IllegalArgumentException] {
      Packing.paddingWasteReport(d, "ntok", seqLen = 0L)
    }
  }

  test("groupKFold keeps every group in one fold; splitLeakageAudit " +
    "reports zero for it and catches a row-level split") {
    val df = (1 to 200).map(i => (i.toLong, (i % 37).toLong))
      .toDF("row_id", "grp")
    val grouped = Packing.groupKFold(df, "grp", seed = 5L, k = 4)
    val audit = Packing.splitLeakageAudit(grouped, "grp", "fold").head()
    assert(audit.getAs[Long]("n_groups") == 37L)
    assert(audit.getAs[Long]("n_leaking_groups") == 0L)
    assert(audit.getAs[Int]("max_folds_per_group") == 1)
    assert(audit.getAs[Long]("rows_in_leaking_groups") == 0L)
    // folds are a pure function of (group, seed): two assignments agree
    val again = Packing.groupKFold(df.repartition(7), "grp", seed = 5L, k = 4)
    assert(grouped.select("grp", "fold").distinct().collect().toSet ==
      again.select("grp", "fold").distinct().collect().toSet)
    val naive = Packing.groupKFold(df, "row_id", seed = 5L, k = 4)
    val bad = Packing.splitLeakageAudit(naive, "grp", "fold").head()
    assert(bad.getAs[Long]("n_leaking_groups") > 0L)
    assert(bad.getAs[Long]("rows_in_leaking_groups") > 0L)
  }

  test("temporalEmbargoSplit: the embargo window belongs to neither side") {
    val df = Seq(
      ("2024-01-01 00:00:00", 1), ("2024-01-17 23:59:59", 2),
      ("2024-01-18 00:00:00", 3), ("2024-01-19 23:59:59", 4),
      ("2024-01-20 00:00:00", 5), ("2024-01-25 12:00:00", 6))
      .toDF("ts_s", "id")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val roles = Packing.temporalEmbargoSplit(df, "ts",
        "2024-01-20 00:00:00", 2L * 86400)
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("role")).toMap
    assert(roles == Map(1 -> "train", 2 -> "train", 3 -> "embargo",
      4 -> "embargo", 5 -> "test", 6 -> "test"))
  }

  test("weightedSampleWithoutReplacement: exactly k rows, a dominating " +
    "weight always survives, zero weights never drawn, deterministic") {
    val df = ((1L to 99L).map(i => (i, 1L)) :+ (100L, 1000000L) :+
      (101L, 0L)).toDF("id", "w")
    def run(parts: Int) = Packing.weightedSampleWithoutReplacement(
        df.repartition(parts), "id", "w", k = 10, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    val got = run(1)
    assert(got.size == 10)
    assert(got.contains(100L), "the dominating weight must be drawn")
    assert(!got.contains(101L), "zero weight cannot be drawn")
    assert(got == run(6))
  }


  test("seqLenSweep: hand-checked truncation and padding shares") {
    import spark.implicits._
    // sizes 10 and 30; L=16: lost 14/40, kept 26, pad (32-26)/32
    val df = Seq(10L, 30L).toDF("n_tok")
    val got = Packing.seqLenSweep(df, "n_tok", Seq(16, 32))
      .orderBy("max_len").collect()
    val l16 = got(0)
    assert(l16.getAs[Long]("n_truncated") == 1L &&
      l16.getAs[Long]("tokens_lost_permille") == 14L * 1000 / 40 &&
      l16.getAs[Long]("padding_waste_permille") == 6L * 1000 / 32)
    val l32 = got(1)
    assert(l32.getAs[Long]("n_truncated") == 0L &&
      l32.getAs[Long]("tokens_lost_permille") == 0L &&
      l32.getAs[Long]("padding_waste_permille") == 24L * 1000 / 64)
  }

  test("rendezvousShardReport: HRW moves ~1/(N+1) of keys while mod " +
    "moves most, totals conserved, partition-order independent") {
    import spark.implicits._
    val keys = (1L to 400L).toDF("k")
    def run(parts: Int) = Packing.rendezvousShardReport(
      keys.repartition(parts), "k", nShards = 4)
      .orderBy("shard_n", "shard_n1").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    val got = run(1)
    val total = got.map(_._3).sum
    assert(total == 400L, got.mkString(","))
    val hrwMoved = got.filter(_._5).map(_._3).sum
    val modMoved = got.map(_._4).sum
    // expectation: 400/5 = 80 HRW moves vs ~320 mod moves
    assert(hrwMoved > 40L && hrwMoved < 140L, s"hrw moved $hrwMoved")
    assert(modMoved > 250L, s"mod moved only $modMoved")
    assert(got == run(7), "sha assignment must be partition-order free")
    // stability: a key's shard at N is its shard at N+1 unless shard N
    // itself is the loser -> every moved cell lands on the NEW shard id
    assert(got.filter(_._5).forall(_._2 == 4),
      "HRW N->N+1 movement must target only the new shard")
  }

  test("fimExamples: spans partition the document and reassembly is exact") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij"), (2L, "0123456789abcdef"),
      (3L, "ab")) // too short -> null example row, not dropped
      .toDF("doc_id", "text")
    val got = Packing.fimExamples(docs, "doc_id", "text", seed = 5L,
      minChars = 8).orderBy("doc_id").collect()
    assert(got.length == 3)
    got.take(2).foreach { r =>
      val (lo, hi) = (r.getAs[Long]("lo"), r.getAs[Long]("hi"))
      val len = if (r.getAs[Long]("doc_id") == 1L) 10L else 16L
      assert(lo >= 0 && lo < hi && hi < len, r.toString)
      assert(r.getAs[Long]("prefix_len") == lo)
      assert(r.getAs[Long]("middle_len") == hi - lo)
      assert(r.getAs[Long]("suffix_len") == len - hi)
      // reassembled sha matches a driver-side replay of the same cuts
      val text = if (r.getAs[Long]("doc_id") == 1L) "abcdefghij"
        else "0123456789abcdef"
      val expected = "<PRE>" + text.substring(0, lo.toInt) + "<SUF>" +
        text.substring(hi.toInt) + "<MID>" +
        text.substring(lo.toInt, hi.toInt)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(expected.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("fim_sha") == sha, r.toString)
    }
    assert(got(2).isNullAt(got(2).fieldIndex("fim_sha")),
      "short docs report null, not a bogus example")
    // determinism: same seed -> same cuts
    val again = Packing.fimExamples(docs, "doc_id", "text", seed = 5L,
      minChars = 8).orderBy("doc_id").collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("domainCapSample: registered-domain buckets and the cap binds") {
    import spark.implicits._
    val rows = (1L to 30L).map(i => (i,
      s"https://www.bulk${i % 2}.com/p/$i")) ++
      Seq((100L, "https://unique.org/x"),
        (101L, "http://Sub.News.example.co/y")) // multi-label host
    val got = Packing.domainCapSample(rows.toDF("doc_id", "url"),
      "doc_id", "url", cap = 10, seed = 3L)
      .orderBy("domain", "rnk").collect()
    val byDomain = got.groupBy(_.getAs[String]("domain"))
    assert(byDomain("bulk0.com").length == 10, "cap must bind")
    assert(byDomain("bulk1.com").length == 10)
    assert(byDomain("unique.org").length == 1)
    // registered domain = last two labels of the host (www. stripped)
    assert(byDomain.contains("example.co"), byDomain.keySet.toString)
    assert(byDomain("bulk0.com").head.getAs[Long]("n_domain") == 15L)
    // ranks within a domain are 1..kept and deterministic for the seed
    assert(byDomain("bulk0.com").map(_.getAs[Long]("rnk")).sorted.toSeq
      == (1L to 10L))
  }

  test("chunkDocuments: stride/overlap arithmetic, final partial chunk " +
      "kept iff >= minLen, short/null docs drop") {
    import spark.implicits._
    // len 10, chunkLen 4, stride 3, minLen 2: starts 0,3,6 (last start
    // with >= 2 chars is 8? len-minLen = 8 -> starts 0,3,6 then next=9
    // > 8 stops; chunk at 6 = 4 chars, none partial), and len 9 gives
    // starts 0,3,6 with the chunk at 6 only 3 chars long
    val docs = Seq((1L, Some("abcdefghij")), (2L, Some("abcdefghi")),
      (3L, Some("a")), (4L, None)).toDF("doc_id", "text")
    val got = Packing.chunkDocuments(docs, "doc_id", "text",
        chunkLen = 4, stride = 3, minLen = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 0, 0L, 4L), (1L, 1, 3L, 4L), (1L, 2, 6L, 4L),
      (2L, 0, 0L, 4L), (2L, 1, 3L, 4L), (2L, 2, 6L, 3L)), got.toString)
    // sha of a known chunk
    val sha = Packing.chunkDocuments(docs, "doc_id", "text", 4, 3, 2)
      .filter(col("id") === 1L && col("chunk_id") === 0)
      .head().getString(4)
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest("abcd".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      .take(16)
    assert(sha == want)
  }
}
